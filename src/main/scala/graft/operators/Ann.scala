package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate nearest-neighbor search — the scale path past brute force.
  *
  * The reference relies on an in-process HNSW graph (hnswlib via ChromaDB,
  * decoded params M=16/ef=100 in BASELINE.md). A pointer-chasing graph
  * doesn't distribute; the Spark-native equivalent is IVF (inverted file):
  * partition vectors by nearest centroid, search only the closest
  * `nProbe` cells. With the table *written partitioned by cell id*,
  * Catalyst partition-prunes the scan — at 100 TB a top-k touches
  * nProbe/nCells of the data instead of all of it.
  *
  * Centroid sets here are data-derived (per-`label` means — the synthetic
  * corpus's cluster structure); swap in k-means or sampled seeds for real
  * corpora. Approximate results are recall-tested (not hash-matched) per
  * SURVEY §5.2.
  */
object Ann {

  /** Per-cell mean vectors: explode to (cell, pos, component), average,
    * reassemble. One shuffle of n×dim scalar rows — fine for centroid
    * counts in the thousands; use a vector-sum TypedImperativeAggregate
    * when dim×cells gets large. */
  def centroids(df: DataFrame, cellCol: Column, vecCol: Column): DataFrame =
    df.select(cellCol.as("cell"), posexplode(vecCol).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** The `nProbe` cell ids whose centroids are nearest the query. */
  def probeCells(cents: DataFrame, query: Seq[Double], nProbe: Int): Seq[Any] =
    cents.withColumn("d", l2Sq(col("centroid"), typedlit(query)))
      .orderBy(col("d").asc, col("cell").asc)
      .limit(nProbe)
      .select("cell").collect().map(_.get(0)).toSeq

  /** IVF top-k: restrict the scan to the probed cells (partition pruning
    * when the table is partitioned by cell), then exact top-k within. */
  def ivfTopK(df: DataFrame, cellCol: Column, vecCol: Column,
              cents: DataFrame, query: Seq[Double], k: Int,
              nProbe: Int = 2, tieBreak: String = "vec_id"): DataFrame = {
    val cells = probeCells(cents, query, nProbe)
    Knn.knnExact(df.filter(cellCol.isin(cells: _*)), vecCol, query, k,
      preFilter = None, tieBreak = tieBreak)
  }

  /** Assign every vector to its nearest centroid (the IVF index-build
    * step): broadcast the centroid table, native-L2 per (row, cell),
    * `min_by` argmin with a deterministic (dist, cell) tiebreak. Work is
    * rows × cells distance evaluations, all map-side against the
    * broadcast; one shuffle for the argmin aggregation. */
  def assignCells(df: DataFrame, idCol: Column, vecCol: Column,
                  cents: DataFrame): DataFrame = {
    import graft.plans.NativeFunctions.l2Native
    val assigned = df.select(idCol.as("_aid"), vecCol.as("_avec"))
      .crossJoin(broadcast(cents.select(col("cell"), col("centroid"))))
      .withColumn("_cdist", l2Native(col("_avec"), col("centroid")))
      .groupBy(col("_aid"))
      .agg(min_by(col("cell"), struct(col("_cdist"), col("cell"))).as("cell"))
    df.join(assigned, idCol === col("_aid")).drop("_aid")
  }

  /** Persist the collection partitioned by cell id: each IVF cell is a
    * directory, so [[ivfTopK]]'s probe filter becomes a PartitionFilter —
    * at 100 TB a probe touches nProbe/nCells of the files, verified in
    * PlanSpec. */
  def writePartitioned(df: DataFrame, dir: String): Unit =
    df.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
}
