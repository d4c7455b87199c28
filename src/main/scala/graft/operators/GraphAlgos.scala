package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph statistics beyond the rank/component family: exact triangle
  * counting with DEGREE ORIENTATION (the node-iterator bound of
  * Schank & Wagner 2005 / the GraphX pattern): orient every undirected
  * edge from the (degree, id)-smaller endpoint to the larger, so each
  * node's oriented out-degree is bounded by O(√m) on any graph
  * (arboricity bound) — the wedge self-join's Σ outdeg² is then
  * O(m^1.5) worst case instead of Σ deg² (which a single hub node
  * makes quadratic). The wedge join is the only quadratic-OUTPUT
  * stage and carries the fixed-N pin; the closing-edge join is a
  * linear fetch.
  */
object GraphAlgos {

  /** Global triangle census over a directed edge list (interpreted as
    * undirected, self-loops and parallel edges collapsed): one row of
    * (n_triangles, n_wedges, global_cc) where n_wedges = Σ C(deg, 2)
    * and global_cc = 3·T / W (the transitivity ratio, 0.0 on a
    * wedge-free graph) — exact integers and one exact double
    * division. */
  def triangleStats(edges: DataFrame, srcCol: Column,
                    dstCol: Column): DataFrame = {
    val und = edges
      .select(least(srcCol, dstCol).as("a"), greatest(srcCol, dstCol).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("nd"))
      .groupBy("nd").agg(count(lit(1)).as("dg"))
    val ed = und
      .join(deg.select(col("nd").as("a"), col("dg").as("da")), "a")
      .join(deg.select(col("nd").as("b"), col("dg").as("db")), "b")
    val fwd = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val ork = ed.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, col("b")).otherwise(col("a")).as("w"),
      when(fwd, col("db")).otherwise(col("da")).as("dw"))
    // fixed-N pin on the wedge self-join's key: its OUTPUT is
    // Σ outdeg² — quadratically larger than its input (the
    // jaccardPairs/AQE-coalescing rule); both sides are the identical
    // shuffle, which AQE dedups via ReusedExchange
    val orkD = ork.repartition(
      edges.sparkSession.sessionState.conf.numShufflePartitions, col("u"))
    val wedgePairs = orkD.as("x")
      .join(orkD.as("y").hint("merge"),
        col("x.u") === col("y.u") &&
          (struct(col("x.dw"), col("x.w")) <
            struct(col("y.dw"), col("y.w"))))
    // the closing edge is oriented low-rank -> high-rank by
    // construction, so exactly one orientation needs checking
    val tri = wedgePairs.join(ork.as("z"),
        col("z.u") === col("x.w") && col("z.w") === col("y.w"))
      .agg(count(lit(1)).as("n_triangles"))
    val wedges = deg.agg(
      expr("sum(dg * (dg - 1) div 2)").cast("bigint").as("n_wedges"))
    tri.crossJoin(broadcast(wedges))
      .select(col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") === 0, lit(0.0))
          .otherwise((col("n_triangles") * 3).cast("double") /
            col("n_wedges").cast("double")).as("global_cc"))
  }

  /** SYNCHRONOUS label propagation (Raghavan, Albert & Kumara 2007 —
    * the near-linear community-detection baseline; the GraphX/GraphFrames
    * LPA contract): label(v, 0) = v; each round every node adopts the
    * most frequent label among its neighbors' PREVIOUS-round labels,
    * ties broken by the SMALLEST label. The async/random variants the
    * paper prefers are order-dependent — the synchronous min-tie-break
    * form is the deterministic one (bit-reproducible, oracle-able as an
    * unrolled CTE chain, the PageRank proof shape), at the cost of the
    * paper's documented label oscillation on bipartite-ish structure;
    * a fixed iteration count makes that a bounded, deterministic
    * artifact rather than a termination hazard.
    *
    * Scale shape: per round one join of the (node-keyed) label frame
    * against the symmetrized edge list + one (node, label) count
    * groupBy + one per-node argmax — all linear in |E|; the argmax is
    * a single map-side-combinable max over a (cnt, -label) struct, so
    * no per-node window sort. Isolated nodes keep their own label via
    * the left join. Edges are collapsed to the undirected simple graph
    * first (parallel/self edges dropped), matching [[triangleStats]].
    * Lineage stays lazy across the fixed rounds (the [[PageRank]]
    * pattern — at 100 TB with many rounds, checkpoint per round via
    * [[Dedup.checkpointed]] instead). */
  def labelPropagation(nodes: DataFrame, nodeCol: Column,
                       edges: DataFrame, srcCol: Column, dstCol: Column,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val und = edges
      .select(least(srcCol, dstCol).as("a"), greatest(srcCol, dstCol).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val adj = und.select(col("a").as("node"), col("b").as("nbr"))
      .union(und.select(col("b").as("node"), col("a").as("nbr")))
    // isolated nodes never appear in adj, so their label is their own
    // id FOREVER — hoisting them out of the loop means the round body
    // references the previous labels exactly ONCE (the neighbor join).
    // With a per-round keep-old left join the previous labels are
    // referenced twice and the lazy plan tree DOUBLES per round —
    // measured 7.9 s → 178 s the moment exchange reuse stopped
    // collapsing the duplicated subtrees. Every connected node has a
    // neighbor, so the argmax emits a fresh label for all of them each
    // round and no keep-old path is needed.
    val base = nodes.select(nodeCol.as("node"))
    val isolated = base.join(adj.select(col("node")), Seq("node"),
        "left_anti")
      .withColumn("lbl", col("node"))
    var labels = base.join(adj.select(col("node")), Seq("node"),
        "left_semi")
      .withColumn("lbl", col("node"))
    // per round ONE node-keyed exchange carries both the (node, label)
    // count and the argmax: HashPartitioning(node) satisfies BOTH the
    // (node, lbl) count grouping and the node argmax grouping (the
    // round-10 window-satisfies-grouping rule), so the two chained
    // hash aggregates plan with NO further exchange — and, against the
    // former window-count formulation, NO per-partition (node, lbl)
    // SORT either: the count runs as a hash aggregate over the same
    // rows (WindowExec sorted every joined edge row per round).
    // Degree-skew note (ADVICE r15): the node repartition ships every
    // joined edge row un-reduced — a power-law hot node's full
    // duplicated row set lands on one reducer, and the fixed partition
    // count opts this exchange out of AQE skew splitting. Map-side
    // partial aggregation would need the exchange keyed (node, lbl)
    // (the pre-r15 two-exchange form — measured slower at bench scale);
    // at a 100 TB power-law graph prefer that form, or salt the hot
    // nodes, over this one.
    val nPart = nodes.sparkSession.sessionState.conf.numShufflePartitions
    for (_ <- 1 to iters) {
      val counted = adj
        .join(labels.select(col("node").as("nbr"), col("lbl")), "nbr")
        .select(col("node"), col("lbl"))
        .repartition(nPart, col("node"))
        .groupBy(col("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      // argmax(count, then min label) as ONE struct max: lexicographic
      // (cnt, -lbl) max = highest count, smallest label
      labels = counted.groupBy(col("node"))
        .agg(max(struct(col("cnt").as("c"), (-col("lbl")).as("nl")))
          .as("m"))
        .select(col("node"), (-col("m.nl")).as("lbl"))
    }
    labels.unionByName(isolated)
      .select(col("node"), col("lbl").as("community"))
  }
}
