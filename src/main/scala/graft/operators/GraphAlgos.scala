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
}
