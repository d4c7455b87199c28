package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank over an explicit edge list — the link-graph authority signal
  * web-curation pipelines weight crawl hosts/URLs with (Common Crawl
  * publishes host-level ranks computed exactly this way; the rank feeds
  * crawl prioritization and per-host quality weighting beside
  * q_host_cap's diversity quota).
  *
  * Determinism contract (the hash-oracle recipe): `damping` must be an
  * exact binary fraction (default 7/8 — 0.85 is not exactly
  * representable and would fold differently from a decimal literal);
  * each node's incoming contributions fold in (src, ord)-sorted order
  * (the bm25 term-ordered-fold rule), and every contribution is one
  * correctly-rounded double division rank/outdeg — so a FIXED number of
  * iterations is bit-reproducible by any engine replaying the same fold
  * order, and the DuckDB oracle unrolls the iterations as a CTE chain
  * (the BPE-training pattern).
  *
  * Scale shape: per iteration ONE shuffle join of the 16 B/row rank
  * table onto the edge list's src distribution and ONE dst-keyed
  * aggregation — the edge payload never moves, and with the edge list
  * pre-partitioned by src the join exchange on the big side disappears
  * (the Bucketing recurring-join shape). The sorted-fold agg buffers one
  * in-neighbor list per node (bounded by max in-degree); at 100 TB swap
  * the fold for a plain map-side-partial `sum()` — addition-order float
  * noise, immaterial to ranking, is the price of partial aggregation,
  * which is why the oracle form keeps the fold and the swap is a
  * documented variant rather than the default. Dangling nodes (no
  * out-edges) leak their mass — the standard simplification; documents
  * synthesized with uniform out-degree have none. Iterations are FIXED:
  * no data-dependent driver loop, no convergence collect.
  */
object PageRank {
  /** @param nodes one row per node (`nodeCol`)
    * @param edges  one row per directed edge; `ordCol` breaks ties among
    *               parallel edges from one src (fold-order key, must be
    *               unique per (src, dst) duplicate)
    * @return (node, pagerank) — Σ pagerank < 1 only by dangling leakage */
  def pageRank(nodes: DataFrame, nodeCol: Column,
               edges: DataFrame, srcCol: Column, dstCol: Column,
               ordCol: Column, iters: Int,
               damping: Double = 0.875): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    val n = nodes.select(nodeCol.as("node"))
    // bounded driver reduction: one long (the resampleToMix count rule)
    val nn = n.count().toDouble
    val e = edges.select(srcCol.as("src"), dstCol.as("dst"),
      ordCol.as("ord"))
    val od = e.groupBy("src").agg(count(lit(1)).cast("double").as("odeg"))
    val eo = e.join(od, "src")
    val base = lit(1.0 - damping) / lit(nn)
    var ranks = n.withColumn("r", lit(1.0) / lit(nn))
    for (_ <- 1 to iters) {
      val contribs = eo.join(ranks, eo("src") === ranks("node"))
        .select(col("dst"), struct(col("src"), col("ord"),
          (col("r") / col("odeg")).as("c")).as("e"))
      val sums = contribs.groupBy("dst")
        .agg(aggregate(array_sort(collect_list(col("e"))), lit(0.0),
          (a, x) => a + x.getField("c")).as("s"))
      ranks = n.join(sums, col("node") === col("dst"), "left")
        .select(col("node"),
          (base + lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
    }
    ranks.select(col("node"), col("r").as("pagerank"))
  }
}
