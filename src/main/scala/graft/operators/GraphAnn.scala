package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One vertex of a sharded small-world graph: `neighbors` are ids within
  * the same shard (edges never cross shards). Top-level case class so the
  * product encoder never captures a SparkSession (see spark-perf-traps
  * note 5 / BatchEncode). */
case class GraphNode(shard: Int, id: Long, vec: Array[Double],
                     neighbors: Array[Long])

/** Partition-local navigable-small-world graph ANN — the HNSW-class
  * counterpart of the reference's actual index (hnswlib via ChromaDB,
  * M=16 / ef_construction=100, decoded from the reference's
  * chroma_db_store header; BASELINE.md rows 4–5).
  *
  * A beam-searched proximity graph is pointer-chasing: it cannot span
  * executors, and a driver-side graph caps out at one machine's RAM —
  * the exact failure the reference hits past ~10⁸ vectors. The
  * Spark-native shape is the standard sharded-HNSW architecture:
  *
  *  1. hash-shard the corpus (uniform by construction — no hot shard);
  *  2. per shard, build an independent NSW graph IN the executor
  *     (`mapPartitions` — the genuine per-partition-imperative case:
  *     greedy insert, beam width `efConstruction`, bidirectional edges
  *     pruned to a degree cap, exactly hnswlib's layer-0 discipline);
  *  3. a query beam-searches every shard in parallel (one task per
  *     shard, each touching only its own ~n/S vectors) and ships its
  *     local top-`ef` — the driver merge sees `ef × S` rows through
  *     `TakeOrderedAndProject`, never the corpus.
  *
  * Search work is Σ_shards O(ef·M·log n_s) distance evaluations versus
  * IVF's probed-cell scan — sub-linear per shard where IVF is linear
  * per probed cell. The trade: every shard is searched (S beam
  * searches), so shard count tunes latency-vs-fanout; at 100 TB,
  * S = executors and each beam search rides where its shard's parquet
  * partition already lives ([[writeGraphIndex]] partitions by shard).
  *
  * Determinism: insert order is id-ascending within a shard (sorted
  * after the shuffle — fetch order is NOT deterministic), every
  * candidate ordering ties on id, and hash-sharding is a pure function
  * of the id — the built edge set is identical on any cluster layout
  * (asserted in GraphAnnSpec). Approximate ⇒ rows-only correctness per
  * SURVEY §5.2; with `ef` ≥ shard size the beam is exhaustive over the
  * (connected by construction) shard graph, so results EQUAL brute
  * force — the machinery proof, same pattern as q_knn_join_exhaustive.
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

  /** hnswlib's layer-0 greedy beam: walk from `entry`, keep the best
    * `ef` seen, stop when the closest open candidate is worse than the
    * worst kept result. Returns (distSq, id) ascending. */
  private def beamSearch(entry: Long, query: Array[Double], ef: Int,
      vecs: mutable.LongMap[Array[Double]],
      adj: mutable.LongMap[mutable.ArrayBuffer[Long]]): Seq[(Double, Long)] = {
    val visited = mutable.HashSet[Long](entry)
    // candidates: min-heap (reverse of max ordering); results: max-heap
    val candidates =
      mutable.PriorityQueue.empty[(Double, Long)](byDistThenId.reverse)
    val results = mutable.PriorityQueue.empty[(Double, Long)](byDistThenId)
    val d0 = (l2sq(query, vecs(entry)), entry)
    candidates.enqueue(d0); results.enqueue(d0)
    var done = false
    while (!done && candidates.nonEmpty) {
      val closest = candidates.dequeue()
      if (results.size >= ef && byDistThenId.gt(closest, results.head)) done = true
      else adj.getOrElse(closest._2, mutable.ArrayBuffer.empty).foreach { nb =>
        if (!visited(nb)) {
          visited += nb
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

  /** Insert `adds` id-ascending into the (possibly empty) graph held in
    * `vecs`/`adj`: each insert beam-searches the graph-so-far (width
    * `efConstruction`) from `entry`, links to its `m` nearest results
    * bidirectionally, and any endpoint pushed past `2m` edges keeps only
    * its `2m` closest (hnswlib's level-0 M0 = 2M cap) — degree stays
    * bounded, so search cost does too. Returns the new entry (the
    * running min id — [[graphTopK]] enters at the min). */
  private def insertAll(vecs: mutable.LongMap[Array[Double]],
      adj: mutable.LongMap[mutable.ArrayBuffer[Long]], entry0: Long,
      adds: Array[(Long, Array[Double])], m: Int,
      efConstruction: Int): Long = {
    var entry = entry0 // Long.MaxValue = empty graph
    adds.sortBy(_._1).foreach { case (id, vec) =>
      // register the vector FIRST: neighbor pruning below computes
      // distances to the just-appended id. The beam can't reach id —
      // nothing links to it until after the search.
      vecs(id) = vec
      if (entry == Long.MaxValue) adj(id) = mutable.ArrayBuffer.empty
      else {
        val near = beamSearch(entry, vec, efConstruction, vecs, adj)
          .take(m).map(_._2)
        adj(id) = mutable.ArrayBuffer(near: _*)
        near.foreach { nb =>
          val edges = adj(nb); edges += id
          if (edges.length > 2 * m) {
            val kept = edges.map(e => (l2sq(vecs(nb), vecs(e)), e))
              .sorted(byDistThenId).take(2 * m).map(_._2)
            adj(nb) = kept
          }
        }
      }
      if (id < entry) entry = id
    }
    entry
  }

  /** Build one shard's NSW graph from scratch. */
  private[graft] def buildShard(shard: Int,
      rows: Array[(Long, Array[Double])],
      m: Int, efConstruction: Int): Iterator[GraphNode] = {
    val vecs = mutable.LongMap.empty[Array[Double]]
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    insertAll(vecs, adj, Long.MaxValue, rows, m, efConstruction)
    rows.sortBy(_._1).iterator.map { case (id, vec) =>
      GraphNode(shard, id, vec, adj(id).toArray.sorted)
    }
  }

  /** Incremental insert into an existing shard graph — the HNSW insert
    * lifecycle: load the stored adjacency, run the SAME insert
    * discipline for the new ids only (O(|adds|·ef·M·log n), not a shard
    * rebuild). Ids already present must not be passed (callers detect
    * replacement and rebuild the shard deterministically instead —
    * edge surgery on a pruned NSW graph is not well-defined). */
  private[graft] def insertIntoShard(shard: Int, existing: Array[GraphNode],
      adds: Array[(Long, Array[Double])], m: Int,
      efConstruction: Int): Iterator[GraphNode] = {
    val vecs = mutable.LongMap.empty[Array[Double]]
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    var entry = Long.MaxValue
    existing.foreach { n =>
      vecs(n.id) = n.vec
      adj(n.id) = mutable.ArrayBuffer(n.neighbors: _*)
      if (n.id < entry) entry = n.id
    }
    insertAll(vecs, adj, entry, adds, m, efConstruction)
    (existing.iterator.map(_.id) ++ adds.iterator.map(_._1)).toArray.sorted
      .iterator.map(id =>
        GraphNode(shard, id, vecs(id), adj(id).toArray.sorted))
  }

  /** Build the sharded graph index: (shard, id, vec, neighbors) — one
    * self-contained NSW graph per shard, `numShards` ≈ executor count at
    * scale (each build task holds one shard: n/S vectors + 3m·n/S edge
    * ids in memory, the same budget a hash-join build side gets). */
  def buildGraph(df: DataFrame, idCol: Column, vecCol: Column,
                 numShards: Int = 32, m: Int = 16,
                 efConstruction: Int = 100): DataFrame = {
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
            m, efConstruction)
        }
      }
      .toDF()
  }

  /** Beam-search every shard, merge the per-shard top-`ef` on the
    * driver. Output: (vec_id, dist) — dist rounded L2 like
    * [[Knn.knnExact]], ties on id. `ef` caps per-shard work AND what
    * each search task ships (ef × numShards rows total reach the
    * `TakeOrderedAndProject` merge — never the corpus). */
  def graphTopK(graph: DataFrame, query: Seq[Double], k: Int,
                ef: Int = 100): DataFrame = {
    val spark = graph.sparkSession
    import spark.implicits._
    val q = query.toArray
    val efEff = math.max(ef, k)
    graph.select(col("shard"), col("id"), col("vec"), col("neighbors"))
      .as[GraphNode]
      .repartition(col("shard")) // keep each shard's graph whole
      .mapPartitions { it =>
        it.toArray.groupBy(_.shard).iterator.flatMap { case (_, nodes) =>
          val vecs = mutable.LongMap.empty[Array[Double]]
          val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
          var entry = Long.MaxValue
          nodes.foreach { n =>
            vecs(n.id) = n.vec
            adj(n.id) = mutable.ArrayBuffer(n.neighbors: _*)
            if (n.id < entry) entry = n.id
          }
          beamSearch(entry, q, efEff, vecs, adj)
            .map { case (d2, id) => (id, d2) }
        }
      }
      .toDF("vec_id", "_d2")
      .withColumn("dist", round(sqrt(col("_d2")), 6))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(k)
      .select("vec_id", "dist")
  }

  /** Persist the index partitioned by shard: each search task's input is
    * one directory, and a rebuilt shard swaps in file-atomically — the
    * same layout contract as [[Ann.writePartitioned]]. */
  def writeGraphIndex(graph: DataFrame, dir: String): Unit =
    graph.repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)

  def readGraphIndex(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame =
    spark.read.parquet(dir)
}
