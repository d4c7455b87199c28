package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One vertex of a sharded hierarchical small-world graph: `neighbors`
  * are the layer-0 edges, `layers(i)` the edges at layer i+1 (a node of
  * level L carries L upper-layer lists; `layers.length` IS the node's
  * level). All edge endpoints are ids within the same shard — edges
  * never cross shards. Top-level case class so the product encoder
  * never captures a SparkSession (see spark-perf-traps note 5 /
  * BatchEncode). */
case class GraphNode(shard: Int, id: Long, vec: Array[Double],
                     neighbors: Array[Long], layers: Array[Array[Long]])

/** Partition-local hierarchical navigable-small-world graph ANN — the
  * HNSW counterpart of the reference's actual index (hnswlib via
  * ChromaDB, M=16 / ef_construction=100 / max_level=3 / mult=1/ln(16),
  * decoded from the reference's chroma_db_store header; BASELINE.md
  * rows 4–5).
  *
  * A beam-searched proximity graph is pointer-chasing: it cannot span
  * executors, and a driver-side graph caps out at one machine's RAM —
  * the exact failure the reference hits past ~10⁸ vectors. The
  * Spark-native shape is the standard sharded-HNSW architecture:
  *
  *  1. hash-shard the corpus (uniform by construction — no hot shard);
  *  2. per shard, build an independent HNSW graph IN the executor
  *     (`mapPartitions` — the genuine per-partition-imperative case):
  *     each node draws a geometric level (P(level ≥ k) = m^-k, the
  *     hnswlib mult = 1/ln(m) distribution, derived DETERMINISTICALLY
  *     from the id hash — no RNG state), upper layers link ≤ m
  *     neighbors, layer 0 links ≤ 2m (hnswlib's M0 = 2M);
  *  3. a query enters each shard at its top-level node, greedy-descends
  *     the upper layers (ef=1 — O(log n) hops straight to the right
  *     neighborhood), then beam-searches layer 0 with width `ef`; each
  *     shard ships its local top-`ef`, so `ef × S` rows reach the
  *     driver's `TakeOrderedAndProject` merge — never the corpus.
  *
  * The upper layers are what the flat round-5 NSW lacked: entry at a
  * fixed stored node pays O(log n) extra layer-0 beam hops per search
  * at shard sizes in the 10⁶–10⁷ range; the layered descent replaces
  * those wide layer-0 hops with ef=1 hops on geometrically sparser
  * graphs (measured distance-evaluation counts in BASELINE.md).
  *
  * Determinism: insert order is id-ascending within a shard (sorted
  * after the shuffle — fetch order is NOT deterministic), node levels
  * are a pure function of the id (splitmix64 trials, one per level),
  * every candidate ordering ties on id, and hash-sharding is a pure
  * function of the id — the built edge set is identical on any cluster
  * layout (asserted in GraphAnnSpec). Approximate ⇒ rows-only
  * correctness per SURVEY §5.2; with `ef` ≥ shard size the layer-0 beam
  * is exhaustive over the shard graph, so results EQUAL brute force —
  * the machinery proof, same pattern as q_knn_join_exhaustive. (Caveat
  * shared with hnswlib itself: every insert links bidirectionally and
  * pruning keeps full degree via the keepPruned fill, but degree-capped
  * pruning can in principle drop a node's last in-edge and strand it
  * from the beam — exhaustive-equals-exact is an empirical property of
  * the built graph, held across all tested corpora and scale factors,
  * not a structural guarantee.)
  */
object GraphAnn {

  /** (squared-dist, id) ascending — the one ordering every queue in the
    * build and search uses; ties break on id so runs are identical. */
  private val byDistThenId: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** splitmix64 finalizer — the avalanche step behind the level draw. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic hnswlib level draw: level ≥ k iff k independent
    * 1/m-probability trials all pass — the geometric distribution
    * mult = 1/ln(m) samples, with the id hash as the "randomness" so the
    * level is a pure function of (id, m) and identical on rebuild. */
  private[graft] def levelOf(id: Long, m: Int, maxLevel: Int): Int = {
    var lvl = 0
    while (lvl < maxLevel &&
        java.lang.Long.remainderUnsigned(
          mix64(id + lvl * 0x9e3779b97f4a7c15L), m) == 0L)
      lvl += 1
    lvl
  }

  /** hnswlib's greedy beam on ONE layer: walk from `entry`, keep the
    * best `ef` seen, stop when the closest open candidate is worse than
    * the worst kept result. `ef = 1` is the upper-layer greedy descent.
    * Returns (distSq, id) ascending. `evals`, when non-null, accumulates
    * the distance-evaluation count in slot 0 (one per visited node) — so
    * the measurement harness counts exactly the algorithm queries run,
    * not a copy that can drift. */
  private def beamSearch(entry: Long, query: Array[Double], ef: Int,
      vecs: mutable.LongMap[Array[Double]],
      adj: mutable.LongMap[mutable.ArrayBuffer[Long]],
      evals: Array[Long] = null): Seq[(Double, Long)] = {
    val visited = mutable.HashSet[Long](entry)
    // candidates: min-heap (reverse of max ordering); results: max-heap
    val candidates =
      mutable.PriorityQueue.empty[(Double, Long)](byDistThenId.reverse)
    val results = mutable.PriorityQueue.empty[(Double, Long)](byDistThenId)
    if (evals != null) evals(0) += 1
    val d0 = (l2sq(query, vecs(entry)), entry)
    candidates.enqueue(d0); results.enqueue(d0)
    var done = false
    while (!done && candidates.nonEmpty) {
      val closest = candidates.dequeue()
      if (results.size >= ef && byDistThenId.gt(closest, results.head)) done = true
      else adj.getOrElse(closest._2, mutable.ArrayBuffer.empty).foreach { nb =>
        if (!visited(nb)) {
          visited += nb
          if (evals != null) evals(0) += 1
          val cand = (l2sq(query, vecs(nb)), nb)
          if (results.size < ef || byDistThenId.lt(cand, results.head)) {
            candidates.enqueue(cand); results.enqueue(cand)
            if (results.size > ef) results.dequeue()
          }
        }
      }
    }
    results.dequeueAll.reverse.toSeq // max-heap drains worst-first
  }

  /** The in-memory shard graph under construction/search: vectors, the
    * layer-0 adjacency, one adjacency map per upper layer, and the
    * entry point (highest-level node, ties on min id — DERIVABLE from
    * stored data, so search needs no persisted entry pointer). */
  private[operators] final class ShardGraph(maxLevel: Int) {
    val vecs = mutable.LongMap.empty[Array[Double]]
    val adj0 = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    val adjUpper: Array[mutable.LongMap[mutable.ArrayBuffer[Long]]] =
      Array.fill(maxLevel)(mutable.LongMap.empty)
    var entryId: Long = Long.MaxValue // MaxValue = empty graph
    var entryLevel: Int = -1

    def load(nodes: Array[GraphNode]): Unit = nodes.foreach { n =>
      vecs(n.id) = n.vec
      adj0(n.id) = mutable.ArrayBuffer(n.neighbors: _*)
      val lvl = if (n.layers == null) 0 else n.layers.length
      var l = 1
      while (l <= lvl) {
        adjUpper(l - 1)(n.id) = mutable.ArrayBuffer(n.layers(l - 1): _*)
        l += 1
      }
      maybePromoteEntry(n.id, lvl)
    }

    def maybePromoteEntry(id: Long, lvl: Int): Unit =
      if (lvl > entryLevel || (lvl == entryLevel && id < entryId)) {
        entryId = id; entryLevel = lvl
      }

    /** Greedy ef=1 descent from the entry through layers above `toLayer`;
      * returns the layer-(toLayer) entry node. */
    def descend(query: Array[Double], toLayer: Int): Long = {
      var cur = entryId
      var l = entryLevel
      while (l > toLayer) {
        cur = beamSearch(cur, query, 1, vecs, adjUpper(l - 1)).head._2
        l -= 1
      }
      cur
    }

    def node(shard: Int, id: Long): GraphNode = {
      val lvl = (maxLevel to 1 by -1).find(l => adjUpper(l - 1).contains(id))
        .getOrElse(0)
      GraphNode(shard, id, vecs(id), adj0(id).toArray.sorted,
        (1 to lvl).map(l => adjUpper(l - 1)(id).toArray.sorted).toArray)
    }
  }

  /** hnswlib's neighbor-selection heuristic (select_neighbors_heuristic,
    * the library default): walk candidates by increasing distance to the
    * query and KEEP one only if it is closer to the query than to every
    * neighbor already kept. On clustered data this is what preserves
    * navigability — plain keep-the-m-closest links a node only into its
    * own cluster, and beams can never cross between clusters (measured:
    * 0.74 → see BASELINE.md round-6 heuristic row). Deterministic given
    * the (dist, id)-ordered candidate list. The closest candidate is
    * always kept, so the graph stays connected. */
  private def selectHeuristic(cands: Seq[(Double, Long)], m: Int,
      vecs: mutable.LongMap[Array[Double]]): Seq[(Double, Long)] = {
    val kept = mutable.ArrayBuffer.empty[(Double, Long)]
    val it = cands.iterator
    while (kept.size < m && it.hasNext) {
      val (d, c) = it.next()
      if (kept.forall { case (_, k) => l2sq(vecs(c), vecs(k)) > d })
        kept += ((d, c))
    }
    kept.toSeq
  }

  /** Insert `adds` id-ascending into the shard graph: each insert draws
    * its deterministic level, greedy-descends the layers above it, then
    * per layer beam-searches (width `efConstruction`) and links to the
    * [[selectHeuristic]] pick of its results bidirectionally — ≤ m edges
    * on upper layers (hnswlib maxM = M), ≤ 2m on layer 0 (maxM0 = 2M);
    * any endpoint pushed past its cap re-selects with the same heuristic
    * — degree stays bounded, so search cost does too. */
  private def insertAll(g: ShardGraph, adds: Array[(Long, Array[Double])],
      m: Int, efConstruction: Int, maxLevel: Int): Unit =
    adds.sortBy(_._1).foreach { case (id, vec) =>
      val lvl = levelOf(id, m, maxLevel)
      // register the vector FIRST: neighbor pruning below computes
      // distances to the just-appended id. The beam can't reach id —
      // nothing links to it until after each layer's search.
      g.vecs(id) = vec
      if (g.entryId == Long.MaxValue) {
        g.adj0(id) = mutable.ArrayBuffer.empty
        (1 to lvl).foreach(l => g.adjUpper(l - 1)(id) = mutable.ArrayBuffer.empty)
      } else {
        var cur = g.descend(vec, math.min(lvl, g.entryLevel))
        // layers above the current top that only this node occupies
        (g.entryLevel + 1 to lvl).foreach(l =>
          g.adjUpper(l - 1)(id) = mutable.ArrayBuffer.empty)
        var l = math.min(lvl, g.entryLevel)
        while (l >= 0) {
          val adj = if (l == 0) g.adj0 else g.adjUpper(l - 1)
          val cap = if (l == 0) 2 * m else m
          val res = beamSearch(cur, vec, efConstruction, g.vecs, adj)
          val near = selectHeuristic(res, m, g.vecs).map(_._2)
          adj(id) = mutable.ArrayBuffer(near: _*)
          near.foreach { nb =>
            val edges = adj(nb); edges += id
            if (edges.length > cap) {
              // hnswlib's shrink: heuristic-select, then FILL the
              // remaining capacity with the closest pruned candidates
              // (keepPrunedConnections) — the endpoint keeps its full
              // degree, which lowers the chance a pruned edge was some
              // node's last in-edge
              val cands = edges
                .map(e => (l2sq(g.vecs(nb), g.vecs(e)), e))
                .sorted(byDistThenId).toSeq
              val diverse = selectHeuristic(cands, cap, g.vecs)
              val keptSet = diverse.map(_._2).toSet
              val fill = cands.filterNot(c => keptSet(c._2))
                .take(cap - diverse.size)
              adj(nb) = mutable.ArrayBuffer(
                (diverse ++ fill).sorted(byDistThenId).map(_._2): _*)
            }
          }
          cur = res.head._2
          l -= 1
        }
      }
      g.maybePromoteEntry(id, lvl)
    }

  /** Build one shard's HNSW graph from scratch. */
  private[graft] def buildShard(shard: Int,
      rows: Array[(Long, Array[Double])],
      m: Int, efConstruction: Int, maxLevel: Int = 3): Iterator[GraphNode] = {
    val g = new ShardGraph(maxLevel)
    insertAll(g, rows, m, efConstruction, maxLevel)
    rows.sortBy(_._1).iterator.map { case (id, _) => g.node(shard, id) }
  }

  /** Incremental insert into an existing shard graph — the HNSW insert
    * lifecycle: load the stored adjacency, run the SAME insert
    * discipline for the new ids only (O(|adds|·ef·M·log n), not a shard
    * rebuild). Ids already present must not be passed (callers detect
    * replacement and rebuild the shard deterministically instead —
    * edge surgery on a pruned HNSW graph is not well-defined). */
  private[graft] def insertIntoShard(shard: Int, existing: Array[GraphNode],
      adds: Array[(Long, Array[Double])], m: Int,
      efConstruction: Int, maxLevel: Int = 3): Iterator[GraphNode] = {
    // size the layer array by the DEEPEST stored node too: an index
    // written with a larger maxLevel must load without out-of-bounds
    // (new inserts still cap their own levels at this call's maxLevel)
    val effMax = math.max(maxLevel, existing.iterator
      .map(n => if (n.layers == null) 0 else n.layers.length)
      .foldLeft(0)(math.max))
    val g = new ShardGraph(effMax)
    g.load(existing)
    insertAll(g, adds, m, efConstruction, maxLevel)
    (existing.iterator.map(_.id) ++ adds.iterator.map(_._1)).toArray.sorted
      .iterator.map(id => g.node(shard, id))
  }

  /** Build the sharded graph index: (shard, id, vec, neighbors, layers)
    * — one self-contained HNSW graph per shard, `numShards` ≈ executor
    * count at scale (each build task holds one shard: n/S vectors +
    * ~3m·n/S edge ids in memory, the same budget a hash-join build side
    * gets). */
  def buildGraph(df: DataFrame, idCol: Column, vecCol: Column,
                 numShards: Int = 32, m: Int = 16,
                 efConstruction: Int = 100, maxLevel: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(idCol.cast("long").as("id"),
        vecCol.cast("array<double>").as("vec"))
      .withColumn("shard", pmod(hash(col("id")), lit(numShards)).cast("int"))
      .repartition(numShards, col("shard"))
      .as[(Long, Seq[Double], Int)]
      .mapPartitions { it =>
        // a hash partition can hold several shard keys — each builds its
        // own independent graph
        it.toArray.groupBy(_._3).iterator.flatMap { case (shard, rows) =>
          buildShard(shard, rows.map(r => (r._1, r._2.toArray)),
            m, efConstruction, maxLevel)
        }
      }
      .toDF()
  }

  // ---- shard growth: extendible-hash dir naming -----------------------
  //
  // The build writes dirs shard=n, n = pmod(hash(id), S) — depth 0. A
  // size-triggered SPLIT of dir n at depth j rehashes its rows by
  // pmod(hash(id), S·2^(j+1)): every row lands on n or n + S·2^j (the
  // two residues of n at the doubled modulus), so the split touches
  // exactly one parent dir and creates exactly one sibling — the
  // touched-dirs-only publication the upsert swap already uses. No
  // metadata file is needed: the dir SET encodes each leaf's depth,
  // because sibling n + S·2^j can only exist if n split at depth j
  // (its name is ≥ S·2^j, so its minimum depth is j+1, and its unique
  // parent at that depth is n). Serving never consults the mapping —
  // it fans out over whatever shard=* dirs exist — so splits are
  // invisible to every read path; only upsert ROUTING needs the rule.

  /** Smallest depth a dir named `n` can have: 0 for base names (n < S),
    * else j+1 where 2^j ≤ n/S < 2^(j+1) (the depth its creating split
    * ran at). */
  private[graft] def minShardDepth(n: Int, s: Int): Int =
    if (n < s) 0 else 32 - Integer.numberOfLeadingZeros(n / s)

  /** Actual depth of leaf dir `n` given the current dir set: walk up
    * from the minimum while the sibling its split-at-depth-j would have
    * created exists. */
  private[graft] def shardDepth(n: Int, s: Int, dirs: Set[Int]): Int = {
    var j = minShardDepth(n, s)
    while (dirs.contains(n + (s << j))) j += 1
    j
  }

  /** The shard ids present under an index dir (one driver listing). */
  private[graft] def listShardDirIds(fs: org.apache.hadoop.fs.FileSystem,
      base: String): Set[Int] = {
    val root = new org.apache.hadoop.fs.Path(base)
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).iterator.filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case nm if nm.startsWith("shard=") =>
        nm.stripPrefix("shard=").toInt }
      .toSet
  }

  /** Route an id to its leaf shard dir under the extendible-hash dir
    * set: among the candidate residues pmod(hash(id), S·2^j), the one
    * naming an existing depth-j leaf wins (checked deepest-first; a
    * residue equal to a leaf's name at the leaf's OWN modulus implies
    * membership, and leaves partition the id space, so at most one
    * level matches). Ids whose leaf dir does not exist yet fall back to
    * the base residue — the pre-split behavior. With an unsplit index
    * (all dirs at depth 0) this reduces to pmod(hash(id), S) exactly. */
  private[graft] def routeShard(idCol: Column, s: Int,
      dirs: Set[Int]): Column = {
    val h = hash(idCol)
    val base = pmod(h, lit(s)).cast("int")
    if (dirs.isEmpty) base
    else {
      val depths = dirs.iterator.map(n => n -> shardDepth(n, s, dirs)).toMap
      (1 to depths.values.max).foldLeft(base) { (acc, j) =>
        val atJ = depths.collect { case (n, d) if d == j => n }.toSeq
        if (atJ.isEmpty) acc
        else {
          val cand = pmod(h, lit(s << j)).cast("int")
          // fold builds inner-out: deeper levels wrap later, so the
          // deepest check evaluates first
          when(cand.isInCollection(atJ), cand).otherwise(acc)
        }
      }
    }
  }

  /** Backfill the `layers` column for indexes written by the pre-layers
    * flat-NSW format (no such column): they load as all-level-0 graphs
    * and search exactly as they did when written — a format upgrade,
    * not a break. Used by every read path that selects `layers`. */
  private[graft] def withLayers(df: DataFrame): DataFrame =
    if (df.columns.contains("layers")) df
    else df.withColumn("layers", lit(null).cast("array<array<bigint>>"))

  /** Search every shard: greedy-descend that shard's upper layers from
    * its top node (ef=1 — the O(log n) hops), then beam-search layer 0
    * with width `ef`. Output: (vec_id, dist) — dist rounded L2 like
    * [[Knn.knnExact]], ties on id.
    *
    * Merge bound (the 256-shard question): `ef` caps per-shard WORK
    * only; each shard ships just its top-`k` (beamSearch returns
    * best-first — no result outside a shard's top-k can reach the
    * global top-k), so k × numShards rows total feed the final merge,
    * and that merge is `TakeOrderedAndProject` (plan-asserted in
    * GraphAnnSpec): per-PARTITION top-k executor-side, k × partitions
    * rows at the driver — never ef × shards, never the corpus.
    * Measured at 256 shards in BASELINE.md (Scratch graphserve). */
  def graphTopK(graph: DataFrame, query: Seq[Double], k: Int,
                ef: Int = 100): DataFrame =
    graphTopKNodes(shardWhole(graph), query, k, ef)

  /** [[graphTopK]] served straight from a persisted index directory via
    * [[readGraphIndexAligned]]: each task reads exactly one shard
    * directory, so the plan carries NO Exchange over the corpus-sized
    * graph — the serving path a persisted store should use (the
    * DataFrame overload must re-shuffle, because an arbitrary frame
    * gives no shard-wholeness guarantee). Plan-asserted in GraphAnnSpec. */
  def graphTopKIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
                       query: Seq[Double], k: Int, ef: Int = 100): DataFrame =
    graphTopKNodes(readGraphIndexAligned(spark, dir), query, k, ef)

  /** Core search over a node stream whose every partition holds only
    * WHOLE shards — guaranteed either by [[shardWhole]]'s shuffle or by
    * [[readGraphIndexAligned]]'s per-directory read. */
  private def graphTopKNodes(nodes: org.apache.spark.sql.Dataset[GraphNode],
                             query: Seq[Double], k: Int, ef: Int): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val q = query.toArray
    val efEff = math.max(ef, k)
    nodes
      .mapPartitions { it =>
        materializeGuarded(it).groupBy(_.shard).iterator.flatMap {
          case (_, nodes) =>
          val maxLevel = nodes.iterator
            .map(n => if (n.layers == null) 0 else n.layers.length)
            .foldLeft(0)(math.max)
          val g = new ShardGraph(maxLevel)
          g.load(nodes)
          val entry0 = g.descend(q, 0)
          // top-k of the shard's top-ef: ef bounds search width (recall),
          // k bounds what ships — nothing past a shard's k-th can make
          // the global top-k. The trim MUST use the exact downstream
          // ordering (ROUNDED dist, id): trimming on raw d2 could drop
          // an element that wins a rounded tie on the smaller id, which
          // the hash-oracled exhaustive keys would see.
          beamSearch(entry0, q, efEff, g.vecs, g.adj0)
            .map { case (d2, id) => (id, d2) }
            .sortBy { case (id, d2) => (roundedDist(d2), id) }
            .take(k)
        }
      }
      .toDF("vec_id", "_d2")
      .withColumn("dist", round(sqrt(col("_d2")), 6))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "dist")
  }

  /** Spark `round(sqrt(d2), 6)` replicated exactly (double path =
    * BigDecimal HALF_UP — the MmrSpec reference-arithmetic note): the
    * per-shard trim in [[graphTopKNodes]] must order by the IDENTICAL
    * value the final `orderBy` computes. */
  private def roundedDist(d2: Double): Double =
    java.math.BigDecimal.valueOf(math.sqrt(d2))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Fail-fast ceiling on the shard-graph bytes ONE search task may
    * materialize on-heap (a task holds every node of its shards —
    * vectors plus adjacency — for the duration of the beam searches).
    * Default 4 GiB; configurable via the `graft.graph.maxShardBytes`
    * JVM property (on a cluster, set it in the EXECUTOR JVM options —
    * the guard runs inside tasks). Shard-count sizing is the real fix:
    * shards-per-task bytes ≈ corpus bytes / numShards, so a corpus that
    * trips this guard needs `buildGraph(numShards = ...)` raised until
    * each shard fits, not a bigger cap. */
  private[graft] val DefaultMaxShardBytes: Long = 4L << 30

  private def maxShardBytes: Long =
    java.lang.Long.getLong("graft.graph.maxShardBytes", DefaultMaxShardBytes)

  /** Estimated on-heap payload bytes of one node: vector, layer-0
    * adjacency, upper-layer adjacency, plus fixed object overhead. */
  private def nodeBytes(n: GraphNode): Long = {
    var b = 64L +
      (if (n.vec == null) 0L else n.vec.length * 8L) +
      (if (n.neighbors == null) 0L else n.neighbors.length * 8L)
    if (n.layers != null) {
      var i = 0
      while (i < n.layers.length) {
        b += 24L + (if (n.layers(i) == null) 0L else n.layers(i).length * 8L)
        i += 1
      }
    }
    b
  }

  /** Materialize a search task's node stream with a RUNNING byte guard:
    * fails fast the moment the estimate crosses [[maxShardBytes]]
    * instead of OOMing the executor after minutes of decode (the
    * round-7 verdict's 100× concern — shard-count sizing was the only
    * guard). The cap covers the whole partition (a hash partition may
    * hold several whole shards — all of them sit on-heap together). */
  private def materializeGuarded(it: Iterator[GraphNode]): Array[GraphNode] = {
    val cap = maxShardBytes
    val buf = mutable.ArrayBuffer.empty[GraphNode]
    var bytes = 0L
    while (it.hasNext) {
      val n = it.next()
      bytes += nodeBytes(n)
      require(bytes <= cap,
        s"graph search task exceeds maxShardBytes=$cap on-heap " +
          s"(${buf.length + 1} nodes so far): raise numShards in " +
          "buildGraph so each shard fits a task's heap, or raise " +
          "-Dgraft.graph.maxShardBytes (executor JVM options) consciously")
      buf += n
    }
    buf.toArray
  }

  /** The typed node stream every DataFrame-overload search runs over: an
    * arbitrary frame gives no shard-wholeness guarantee, so it pays one
    * full shuffle on `shard` to make every shard's graph whole. */
  private def shardWhole(graph: DataFrame)
      : org.apache.spark.sql.Dataset[GraphNode] = {
    val spark = graph.sparkSession
    import spark.implicits._
    withLayers(graph)
      .select(col("shard"), col("id"), col("vec"), col("neighbors"),
        col("layers"))
      .as[GraphNode]
      .repartition(col("shard"))
  }

  /** Count of distance evaluations one shard-local search performs —
    * the comparable cost metric for the layered-vs-flat measurement
    * (BASELINE.md): every l2sq against a new candidate counts, both in
    * the descent and the layer-0 beam. Runs the SAME [[beamSearch]] the
    * queries run (instrumented via its counter slot, not a copy that
    * could drift). Measurement harness only, not a query path. */
  private[graft] def countDistEvals(nodes: Array[GraphNode],
      query: Array[Double], ef: Int): Long = {
    val maxLevel = nodes.iterator
      .map(n => if (n.layers == null) 0 else n.layers.length)
      .foldLeft(0)(math.max)
    val g = new ShardGraph(maxLevel)
    g.load(nodes)
    val evals = Array(0L)
    var cur = g.entryId
    var l = g.entryLevel
    while (l > 0) {
      cur = beamSearch(cur, query, 1, g.vecs, g.adjUpper(l - 1), evals).head._2
      l -= 1
    }
    beamSearch(cur, query, math.max(ef, 1), g.vecs, g.adj0, evals)
    evals(0)
  }

  /** Batch kNN join over the sharded hierarchical graph — the graph
    * family's counterpart of [[Knn.knnJoinIvf]]. Every query must search
    * every shard (a hash-sharded graph has no routing structure above
    * the shard level), so the query BATCH ships to each shard task as a
    * broadcast — bounded by `maxBatch` (query batches are request-sized;
    * the CORPUS-sized graph is what stays partitioned and never moves).
    * Each shard task loads its graph once and runs all queries through
    * it: per-shard work Q × O(ef·M·log n_s), emitted rows ≤ ef per
    * (query, shard), then ONE balanced shuffle on query_id for the
    * global per-query top-k ([[TopK.topKPerGroup]], the bounded-buffer
    * aggregator every batch join here uses). Output matches
    * [[Knn.knnJoin]]: (query_id, match_id, dist, rn). With `ef` ≥ shard
    * size the beams are exhaustive and the result EQUALS brute force —
    * the q_knn_join_exhaustive machinery-proof pattern, hash-oracled as
    * q_graph_join_exhaustive. */
  def graphKnnJoin(queries: DataFrame, qIdCol: Column, qVecCol: Column,
                   graph: DataFrame, k: Int, ef: Int = 100,
                   maxBatch: Int = 100000): DataFrame =
    graphKnnJoinNodes(queries, qIdCol, qVecCol, shardWhole(graph), k, ef,
      maxBatch)

  /** [[graphKnnJoin]] served straight from a persisted index directory
    * ([[readGraphIndexAligned]]): the corpus-sized graph side plans NO
    * Exchange — the only shuffle left is the bounded per-query top-k
    * merge (≤ ef rows per (query, shard)). Plan-asserted in
    * GraphAnnSpec. */
  def graphKnnJoinIndexed(queries: DataFrame, qIdCol: Column,
                          qVecCol: Column, dir: String, k: Int,
                          ef: Int = 100, maxBatch: Int = 100000): DataFrame =
    graphKnnJoinNodes(queries, qIdCol, qVecCol,
      readGraphIndexAligned(queries.sparkSession, dir), k, ef, maxBatch)

  /** Collect the query batch driver-side, guarded BEFORE an oversized
    * batch is materialized (limit maxBatch+1, then require) — shared by
    * every batch-join flavor. */
  private def collectQueryBatch(queries: DataFrame, qIdCol: Column,
      qVecCol: Column, maxBatch: Int): Array[(Long, Array[Double])] = {
    val qRows: Array[(Long, Array[Double])] = queries
      .select(qIdCol.cast("long"), qVecCol.cast("array<double>"))
      .limit(maxBatch + 1)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(qRows.length <= maxBatch,
      s"query batch exceeds maxBatch=$maxBatch — a graph join " +
        "replicates the batch to every shard; chunk the batch or raise " +
        "the cap consciously")
    qRows
  }

  private def graphKnnJoinNodes(queries: DataFrame, qIdCol: Column,
      qVecCol: Column, nodes: org.apache.spark.sql.Dataset[GraphNode],
      k: Int, ef: Int, maxBatch: Int): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val qRows = collectQueryBatch(queries, qIdCol, qVecCol, maxBatch)
    val bq = spark.sparkContext.broadcast(qRows)
    val efEff = math.max(ef, k)
    val perShard = nodes
      .mapPartitions { it =>
        materializeGuarded(it).groupBy(_.shard).iterator.flatMap {
          case (_, nodes) =>
          val maxLevel = nodes.iterator
            .map(n => if (n.layers == null) 0 else n.layers.length)
            .foldLeft(0)(math.max)
          val g = new ShardGraph(maxLevel)
          g.load(nodes)
          bq.value.iterator.flatMap { case (qid, q) =>
            val entry0 = g.descend(q, 0)
            beamSearch(entry0, q, efEff, g.vecs, g.adj0)
              .map { case (d2, id) => (qid, id, d2) }
          }
        }
      }
      .toDF("query_id", "match_id", "_d2")
      .select(col("query_id"), col("match_id"),
        (-round(sqrt(col("_d2")), 6)).as("negdist"))
    TopK.topKPerGroup(spark, perShard, "query_id", "match_id", "negdist", k)
      .select(col("query_id"), col("match_id"),
        (-col("negdist")).as("dist"), col("rn"))
  }

  /** Total distance evaluations one query costs across every shard of
    * `graph` — [[countDistEvals]] run where each shard lives, summed.
    * Measurement harness (Scratch / AnnMatrix), not a query path. */
  private[graft] def distEvalsTotal(graph: DataFrame, query: Seq[Double],
                                    ef: Int): Long = {
    val spark = graph.sparkSession
    import spark.implicits._
    val q = query.toArray
    withLayers(graph)
      .select(col("shard"), col("id"), col("vec"), col("neighbors"),
        col("layers"))
      .as[GraphNode]
      .repartition(col("shard"))
      .mapPartitions { it =>
        materializeGuarded(it).groupBy(_.shard).iterator.map {
          case (_, nodes) => countDistEvals(nodes, q, ef) }
      }.reduce(_ + _)
  }

  /** Persist the index partitioned by shard: each search task's input is
    * one directory, and a rebuilt shard swaps in file-atomically — the
    * same layout contract as [[Ann.writePartitioned]]. */
  def writeGraphIndex(graph: DataFrame, dir: String): Unit =
    graph.repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  def readGraphIndex(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame =
    withLayers(spark.read.parquet(dir))

  /** Read the persisted index SHARD-ALIGNED: one whole-index scan
    * sliced into per-shard partition-pruned RDDs ([[buildShardRdds]]),
    * concatenated with an RDD union — every resulting partition holds
    * exactly one whole shard, and NOTHING in the lineage is a shuffle.
    * A plain partitioned-parquet read carries
    * no partitioning metadata Spark can trust — scan splits may slice a
    * shard across tasks, and a partial shard is a broken graph — which
    * is why the DataFrame search overloads must `repartition(shard)` per
    * invocation. This read makes that exchange structurally unnecessary:
    * at 100 TB the index never moves, each search task does one
    * data-local directory read.
    *
    * The concatenation is `sparkContext.union`, not DataFrame union:
    * Spark's UnionExec folds an all-single-partition union INTO one
    * partition (observed on the 4.x planner — `SinglePartition` output,
    * one task reading every shard serially), while RDD union GUARANTEES
    * partition concatenation. The shard count bounds read parallelism
    * (= #shards tasks), which is the intended serving layout —
    * `numShards` ≈ executor count at build time. */
  def readGraphIndexAligned(spark: org.apache.spark.sql.SparkSession,
                            dir: String)
      : org.apache.spark.sql.Dataset[GraphNode] = {
    import spark.implicits._
    val union = spark.sparkContext.union(
      shardRdds(spark, dir).map(_._4).toIndexedSeq)
    // the name is the only place the lineage surfaces in a SQL plan
    // (ExternalRDDScan) — GraphAnnSpec asserts on it to prove the
    // serving path reads this on-disk index
    union.setName(s"graft-graph-aligned:$dir")
    spark.createDataset(union)
  }

  /** Session-scoped cache of the QUERY-INDEPENDENT per-shard node RDDs
    * (shard, dirPath, fingerprint, rdd) — driver-side LINEAGE handles,
    * not data (the session-cache size contract). Building them is ONE
    * `spark.read.parquet` over the whole index (one file-listing job,
    * one footer read, one physical plan) sliced into per-shard RDDs by
    * partition pruning — constant driver jobs in the shard count. The
    * round-12 shape was one `spark.read.parquet` PER shard dir —
    * footer/schema/plan work on the driver, measured 134 s of pure
    * planning at 1024 dirs (~9 min extrapolated at 4096; Scratch
    * graphshards) — the O(shards) driver-work defect the round-12
    * verdict flagged. Reuse is validated by the same file-listing
    * fingerprints the resident cache uses, so a rewritten shard rebuilds
    * the lineage on the next query; the RDDs hold no data, so the
    * indexed path still re-READS parquet per invocation — only the
    * planning is amortized. */
  private val shardRddCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String,
        (Seq[String],
         Seq[(Int, String, String, org.apache.spark.rdd.RDD[GraphNode])])]]())

  private[graft] def shardRdds(spark: org.apache.spark.sql.SparkSession, dir: String)
      : Seq[(Int, String, String, org.apache.spark.rdd.RDD[GraphNode])] = {
    import spark.implicits._
    val fps = shardDirsFingerprinted(spark, dir)
    val perSession = shardRddCache.synchronized {
      shardRddCache.computeIfAbsent(spark, _ =>
        new java.util.concurrent.ConcurrentHashMap[String,
          (Seq[String],
           Seq[(Int, String, String, org.apache.spark.rdd.RDD[GraphNode])])]())
    }
    val cached = perSession.get(dir)
    if (cached != null && cached._1 == fps.map(_._3)) cached._2
    else {
      val built = buildShardRdds(spark, dir, fps)
      perSession.put(dir, (fps.map(_._3), built))
      built
    }
  }

  /** Slice ONE whole-index read into per-shard node RDDs — the
    * constant-job session-planning path. `spark.read.parquet(dir)` over
    * the `shard=N`-partitioned layout is a single file-listing job
    * (InMemoryFileIndex lists leaf dirs with a distributed job past 32
    * paths), one footer read, one physical plan; its scan partitions are
    * `FilePartition`s whose file paths carry the shard directory, so a
    * [[org.apache.spark.rdd.PartitionPruningRDD]] per shard — a pure
    * lineage object, no job, no data — recovers exactly the
    * one-whole-shard-per-partition layout the per-dir read gave, at
    * O(1) driver jobs instead of O(shards).
    *
    * Shard-wholeness needs one scan partition to never MIX shards:
    * `spark.sql.files.openCostInBytes` is raised to `maxPartitionBytes`
    * for the planning window, which makes the bin-packer close a
    * partition after every file (currentSize ≥ openCost ≥ maxSplitBytes
    * once one file is in). A file larger than maxSplitBytes still
    * splits WITHIN the file — single-shard splits — and the shard's
    * pruned RDD coalesces them back (narrow). `rdd.partitions` is
    * forced inside the conf window because FileSourceScanExec packs
    * lazily, at first partition access. A concurrent reader racing the
    * window at worst plans more, smaller partitions — never a wrong
    * result. If any scan partition is not attributable to exactly one
    * shard (a non-FileScan source, a future planner change), the
    * per-dir fallback preserves round-12 behavior. */
  private def buildShardRdds(spark: org.apache.spark.sql.SparkSession,
      dir: String, fps: Seq[(Int, String, String)])
      : Seq[(Int, String, String, org.apache.spark.rdd.RDD[GraphNode])] = {
    import spark.implicits._
    val openCostKey = "spark.sql.files.openCostInBytes"
    val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
    val oldOpen = spark.conf.getOption(openCostKey)
    val whole = try {
      spark.conf.set(openCostKey, maxBytes.toString)
      val rdd = withLayers(spark.read.parquet(dir))
        .select(col("shard").cast("int").as("shard"), col("id"),
          col("vec"), col("neighbors"), col("layers"))
        .as[GraphNode]
        .rdd
      rdd.partitions // force scan-partition packing under the raised openCost
      rdd
    } finally oldOpen match {
      case Some(v) => spark.conf.set(openCostKey, v)
      case None    => spark.conf.unset(openCostKey)
    }
    val shardOfPart: Array[Option[Int]] = whole.partitions.map {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
        val shards = fp.files.iterator.map { f =>
          f.filePath.toString.split('/')
            .find(_.startsWith("shard="))
            .map(_.stripPrefix("shard=").toInt)
        }.toSeq
        if (shards.forall(_.isDefined) && shards.flatten.distinct.size == 1)
          shards.head
        else None
      case _ => None
    }
    if (shardOfPart.contains(None)) buildShardRddsPerDir(spark, fps)
    else {
      val idxsByShard: Map[Int, Set[Int]] = shardOfPart.iterator.zipWithIndex
        .collect { case (Some(s), i) => (s, i) }.toSeq
        .groupMap(_._1)(_._2).map { case (s, is) => (s, is.toSet) }
      val hosts = executorHosts(spark)
      fps.map { case (shard, path, fp) =>
        // each prune closure captures ONLY its own partition-index set
        // (usually one element) — the per-stage task binary stays small
        // at cluster shard counts
        val mine = idxsByShard.getOrElse(shard, Set.empty[Int])
        val pruned =
          org.apache.spark.rdd.PartitionPruningRDD.create(whole, mine.contains)
        val one =
          if (pruned.getNumPartitions <= 1) pruned
          else pruned.coalesce(1, shuffle = false)
        (shard, path, fp, homed(shard, one, hosts))
      }
    }
  }

  /** Distinct executor hosts, sorted — the home ring for [[homed]].
    * Computed once per lineage build (the plan is session-cached); a
    * fleet change (dynamic allocation, executor loss) re-rings on the
    * next rebuild — shards re-home, caches refill, never a wrong
    * answer. Empty/singleton ⇒ homing is a no-op (local mode). */
  private def executorHosts(
      spark: org.apache.spark.sql.SparkSession): IndexedSeq[String] =
    spark.sparkContext.statusTracker.getExecutorInfos
      .map(_.host()).distinct.sorted.toIndexedSeq

  /** Pin a shard RDD's preferred location to `hosts(shard mod |hosts|)`
    * — the stable shard→host home (round-13 verdict item 2).
    * [[org.apache.spark.rdd.PartitionPruningRDD]] tasks carry no
    * locality preference, so without this the scheduler sprays each
    * shard's serves across the fleet and every executor's
    * [[ResidentCache]] working set trends toward the WHOLE index; with
    * it, delay scheduling sends shard S's serves to one host and the
    * cluster-wide resident set PARTITIONS ≈ |index|/|hosts| per host.
    * A preference, not a constraint: a busy/lost home falls back to any
    * executor after the locality wait — a cache miss there, never a
    * wrong answer. Host-level (public `statusTracker` surface) — on
    * multi-executor hosts the per-host cache count stays ≥ 1 but the
    * cross-HOST replication is what OOMs at 100 TB. */
  private def homed[T: scala.reflect.ClassTag](shard: Int,
      rdd: org.apache.spark.rdd.RDD[T],
      hosts: IndexedSeq[String]): org.apache.spark.rdd.RDD[T] =
    if (hosts.length <= 1) rdd
    else new HomedRdd(rdd, Seq(hosts(math.floorMod(shard, hosts.length))))

  /** Narrow identity wrapper carrying a pinned preferred location. */
  private final class HomedRdd[T](prev: org.apache.spark.rdd.RDD[T],
      home: Seq[String])(implicit ct: scala.reflect.ClassTag[T])
      extends org.apache.spark.rdd.RDD[T](prev) {
    override def getPartitions: Array[org.apache.spark.Partition] =
      firstParent[T].partitions
    override def compute(split: org.apache.spark.Partition,
        ctx: org.apache.spark.TaskContext): Iterator[T] =
      firstParent[T].iterator(split, ctx)
    override protected def getPreferredLocations(
        split: org.apache.spark.Partition): Seq[String] = home
  }

  /** Round-12 per-shard-directory planning, kept as the fallback when
    * the whole-index scan's partitions cannot be attributed to single
    * shards. O(shards) driver planning — correct, just slow at cluster
    * shard counts. */
  private def buildShardRddsPerDir(spark: org.apache.spark.sql.SparkSession,
      fps: Seq[(Int, String, String)])
      : Seq[(Int, String, String, org.apache.spark.rdd.RDD[GraphNode])] = {
    import spark.implicits._
    val hosts = executorHosts(spark)
    fps.map { case (shard, path, fp) =>
      (shard, path, fp,
        homed(shard,
          withLayers(spark.read.parquet(path))
            .withColumn("shard", lit(shard))
            .select(col("shard"), col("id"), col("vec"), col("neighbors"),
              col("layers"))
            .as[GraphNode]
            .coalesce(1)
            .rdd, hosts))
    }
  }

  // ---- resident serving tier ------------------------------------------

  /** Executor-side cache of LOADED shard graphs for the resident serving
    * paths. The indexed paths are exchange-free but still decode the
    * whole parquet index per invocation (measured 8–11 s/query at
    * 1M × 384, BASELINE.md round 7 — all decode); a serving deployment
    * keeps its shards resident across queries, which is what every
    * in-memory vector store (hnswlib's mmap'd layout included,
    * header.bin forensics in BASELINE.md) does.
    *
    * Key = shard directory path; value = (fingerprint, graph). The
    * fingerprint is the shard dir's file listing (name:length:mtime)
    * hashed DRIVER-side at invocation — a shard rewritten by the
    * streaming upserters (dir-swap publishes new file names) reloads on
    * its next query, while an unchanged shard's task leaves its input
    * iterator unconsumed so the parquet files are never even opened
    * (FileScanRDD opens lazily). At most one graph per served shard dir
    * stays cached, and the TOTAL resident bytes are LRU-bounded by
    * [[capBytes]] (round-13 verdict item 2: without a bound, long
    * serving sessions trend each executor's working set toward the
    * whole index — executor-OOM territory at 100 TB-corpus index
    * sizes). Eviction order is least-recently-SERVED; the entry being
    * served is never evicted, so a cap smaller than one shard still
    * serves correctly (it just reloads every time). An evicted shard's
    * next query is a reload — never a wrong answer. Stable shard→host
    * homes come from the planning side ([[homed]]): with locality
    * honored, the cluster-wide working set PARTITIONS across executors
    * instead of converging to full replication, and this bound is the
    * backstop for locality misses. */
  private[graft] object ResidentCache {
    private final class Entry(val fp: String, val g: ShardGraph,
        val bytes: Long) {
      val tick = new java.util.concurrent.atomic.AtomicLong
    }
    private val graphs =
      new java.util.concurrent.ConcurrentHashMap[String, Entry]()
    private val ticker = new java.util.concurrent.atomic.AtomicLong
    private val bytesUsed = new java.util.concurrent.atomic.AtomicLong
    private val evictLock = new Object
    /** Resident-byte budget per JVM (per executor on a cluster).
      * Default: `graft.graph.residentCacheBytes` system property, else
      * unbounded (the pre-round-14 behavior — a deployment opts into a
      * budget sized to executor memory). Settable at runtime; shrinking
      * takes effect at the next load. */
    private[graft] val capBytes = new java.util.concurrent.atomic.AtomicLong(
      sys.props.get("graft.graph.residentCacheBytes").map(_.toLong)
        .getOrElse(Long.MaxValue))
    /** Total cold loads — observable cache behavior for GraphAnnSpec. */
    private[graft] val loads = new java.util.concurrent.atomic.AtomicLong
    /** Total LRU evictions (fingerprint-change replacements excluded). */
    private[graft] val evictions = new java.util.concurrent.atomic.AtomicLong
    private[graft] def residentBytes: Long = bytesUsed.get()
    private[graft] def residentEntries: Int = graphs.size()

    /** Decoded size estimate: vector payload + adjacency payload + JVM
      * object/LongMap-slot overhead per node and per edge list. An
      * estimate (eviction budget, not an allocator) — deliberately on
      * the high side so the cap errs toward evicting early. */
    private def estimateBytes(g: ShardGraph): Long = {
      var b = 0L
      g.vecs.foreachValue(v => b += 64L + v.length * 8L)
      def adj(m: mutable.LongMap[mutable.ArrayBuffer[Long]]): Unit =
        m.foreachValue(a => b += 64L + a.length * 8L)
      adj(g.adj0)
      g.adjUpper.foreach(adj)
      b
    }

    private[operators] def getOrLoad(key: String, fingerprint: String,
        load: () => Array[GraphNode]): ShardGraph = {
      // per-key atomic: concurrent tasks for the SAME shard load once;
      // different shards load in parallel (no global lock around load())
      val e = graphs.compute(key, (_, cur) =>
        if (cur != null && cur.fp == fingerprint) cur
        else {
          if (cur != null) bytesUsed.addAndGet(-cur.bytes)
          loads.incrementAndGet()
          val nodes = load()
          val maxLevel = nodes.iterator
            .map(n => if (n.layers == null) 0 else n.layers.length)
            .foldLeft(0)(math.max)
          val g = new ShardGraph(maxLevel)
          g.load(nodes)
          val entry = new Entry(fingerprint, g, estimateBytes(g))
          bytesUsed.addAndGet(entry.bytes)
          entry
        })
      e.tick.set(ticker.incrementAndGet())
      if (bytesUsed.get() > capBytes.get()) evictLru(keep = key)
      e.g
    }

    /** Evict least-recently-served entries until under budget. One
      * evictor at a time (the scan is O(resident entries) — executor
      * shard counts, not corpus sizes); `keep` (the entry being served
      * right now) is exempt so the serve in flight never loses its
      * graph. Removal is conditional on identity, so a concurrent
      * fingerprint-swap of the victim key is never double-subtracted. */
    private def evictLru(keep: String): Unit = evictLock.synchronized {
      val cap = capBytes.get()
      while (bytesUsed.get() > cap && graphs.size() > 1) {
        var victimKey: String = null
        var victim: Entry = null
        var minTick = Long.MaxValue
        graphs.forEach { (k, e) =>
          if (k != keep && e.tick.get() < minTick) {
            minTick = e.tick.get(); victimKey = k; victim = e
          }
        }
        if (victimKey == null) return
        if (graphs.remove(victimKey, victim)) {
          bytesUsed.addAndGet(-victim.bytes)
          evictions.incrementAndGet()
        }
      }
    }

    def clear(): Unit = evictLock.synchronized {
      graphs.clear()
      bytesUsed.set(0L)
    }
  }

  /** One (shard, dirPath, fingerprint) per shard=N directory, from ONE
    * bulk file listing grouped by parent directory. The round-12 shape
    * was one `listStatus` PER shard dir — O(shards) driver RPC on every
    * staleness check, tens of thousands of list calls per query at
    * cluster shard counts. The bulk strategy is scheme-dependent:
    * remote filesystems use `fs.listFiles(root, recursive)` — on HDFS a
    * single batched RPC stream, on S3A/GCS/ABFS a flat paginated LIST
    * with no per-directory round trips; `file:` uses a driver-side
    * `listStatus` walk, because LocalFileSystem's listFiles stats every
    * file for block locations (measured 15.2 s vs 0.10 s for 2048 dirs
    * — local listing is cheap, it's the REMOTE per-dir RPC that the
    * bulk path exists to avoid). Fingerprint format (sorted
    * `name:len:mtime`, MD5) is unchanged from round 12, so
    * resident-cache entries stay valid across the swap. */
  private def shardDirsFingerprinted(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : Seq[(Int, String, String)] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val isLocal = {
      val scheme = Option(fs.getUri.getScheme).getOrElse("file")
      scheme == "file" || scheme == "local"
    }
    val byShard = mutable.Map.empty[Int, (String, mutable.ArrayBuffer[String])]
    def record(f: org.apache.hadoop.fs.FileStatus): Unit = {
      val parent = f.getPath.getParent
      if (parent != null && parent.getName.startsWith("shard=")) {
        val shard = parent.getName.stripPrefix("shard=").toInt
        byShard.getOrElseUpdate(shard,
          (parent.toString, mutable.ArrayBuffer.empty[String]))._2 +=
          s"${f.getPath.getName}:${f.getLen}:${f.getModificationTime}"
      }
    }
    if (isLocal) {
      fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
        .foreach(d => fs.listStatus(d.getPath).filter(_.isFile).foreach(record))
    } else {
      val it = fs.listFiles(root, true)
      while (it.hasNext) record(it.next())
    }
    require(byShard.nonEmpty,
      s"no shard=* directories under $dir — not a writeGraphIndex layout")
    byShard.toIndexedSeq.sortBy(_._1).map { case (shard, (path, files)) =>
      (shard, path,
        java.security.MessageDigest.getInstance("MD5")
          .digest(files.sorted.mkString("|").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString)
    }
  }

  /** Per-shard search over the resident cache: each task looks its shard
    * up by (path, fingerprint) and only on a miss consumes its parquet
    * input. Same partition-per-shard union shape as
    * [[readGraphIndexAligned]] — no shuffle anywhere in the lineage. */
  private def residentRdd[T: scala.reflect.ClassTag](
      spark: org.apache.spark.sql.SparkSession, dir: String,
      perShard: ShardGraph => Iterator[T],
      shardsPerTask: Int = 1): org.apache.spark.rdd.RDD[T] = {
    require(shardsPerTask >= 1, s"shardsPerTask must be >= 1, got $shardsPerTask")
    // node RDDs from the session cache ([[shardRdds]] — per-query work is
    // one fingerprint listing plus the query's own mapPartitions lambda)
    val rdds = shardRdds(spark, dir).map { case (_, path, fp, nodes) =>
      nodes.mapPartitions { it =>
        perShard(ResidentCache.getOrLoad(path, fp,
          () => materializeGuarded(it)))
      }
    }
    val union = spark.sparkContext.union(rdds.toIndexedSeq)
    union.setName(s"graft-graph-resident:$dir")
    // shard-GROUP serving: at cluster shard counts (10k+) a one-task-
    // per-shard serve is bound by SCHEDULING (tasks × waves), not beam
    // work — ~244-row shards cost microseconds of search under
    // milliseconds of task dispatch. A no-shuffle coalesce groups g
    // parent partitions per task: the task runs its g shards' compute
    // SEQUENTIALLY in place, the lazy-input contract survives (a
    // ResidentCache hit still never opens its shard's parquet), and the
    // per-query task count drops to ⌈shards/g⌉. Grouping is a READ-side
    // choice per query — the index layout on disk is untouched.
    if (shardsPerTask == 1) union
    else {
      val nParts = math.max(1,
        (union.getNumPartitions + shardsPerTask - 1) / shardsPerTask)
      union.coalesce(nParts, shuffle = false)
    }
  }

  /** [[graphTopKIndexed]] from the executor-resident cache: first query
    * per (shard, index version) decodes that shard, every later one runs
    * beam-only. Results are IDENTICAL to the indexed path (same stored
    * graph, same search). */
  def graphTopKResident(spark: org.apache.spark.sql.SparkSession,
                        dir: String, query: Seq[Double], k: Int,
                        ef: Int = 100, shardsPerTask: Int = 1): DataFrame = {
    import spark.implicits._
    val q = query.toArray
    val efEff = math.max(ef, k)
    spark.createDataset(residentRdd(spark, dir, g =>
        if (g.vecs.isEmpty) Iterator.empty
        else beamSearch(g.descend(q, 0), q, efEff, g.vecs, g.adj0)
          .map { case (d2, id) => (id, d2) }
          // the graphTopKNodes k-trim, same rounded-tie ordering
          .sortBy { case (id, d2) => (roundedDist(d2), id) }
          .iterator.take(k), shardsPerTask))
      .toDF("vec_id", "_d2")
      .withColumn("dist", round(sqrt(col("_d2")), 6))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "dist")
  }

  /** [[graphKnnJoinIndexed]] from the executor-resident cache — the
    * recurring-batch serving shape: only the request-sized query batch
    * moves (broadcast), the graph decodes once per index version, and
    * the one shuffle is the bounded per-query top-k merge. */
  def graphKnnJoinResident(queries: DataFrame, qIdCol: Column,
                           qVecCol: Column, dir: String, k: Int,
                           ef: Int = 100, maxBatch: Int = 100000,
                           shardsPerTask: Int = 1)
      : DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qRows = collectQueryBatch(queries, qIdCol, qVecCol, maxBatch)
    val bq = spark.sparkContext.broadcast(qRows)
    val efEff = math.max(ef, k)
    val perShard = spark.createDataset(residentRdd(spark, dir, g =>
        if (g.vecs.isEmpty) Iterator.empty
        else bq.value.iterator.flatMap { case (qid, q) =>
          beamSearch(g.descend(q, 0), q, efEff, g.vecs, g.adj0)
            .map { case (d2, id) => (qid, id, d2) }
        }, shardsPerTask))
      .toDF("query_id", "match_id", "_d2")
      .select(col("query_id"), col("match_id"),
        (-round(sqrt(col("_d2")), 6)).as("negdist"))
    TopK.topKPerGroup(spark, perShard, "query_id", "match_id", "negdist", k)
      .select(col("query_id"), col("match_id"),
        (-col("negdist")).as("dist"), col("rn"))
  }
}
