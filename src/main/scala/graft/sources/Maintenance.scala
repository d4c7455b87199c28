package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators for long-lived collections.
  *
  * At 100 TB the killers are small files (incremental appends → metadata
  * blowup + tiny scans) and unstable row identity. These keep a persisted
  * collection healthy:
  *  - [[compact]]: rewrite a parquet directory into ~`targetFileRows`-row
  *    files (read → repartition → atomic-ish overwrite via temp dir);
  *  - [[withDenseIds]]: assign contiguous 0..n-1 labels in a deterministic
  *    key order — the analogue of the reference's `id_to_label` map
  *    (hnswlib needs dense int labels; `index_metadata.pickle` decodes to
  *    exactly this). One sort; the zip is per-partition arithmetic.
  */
object Maintenance {

  /** Rewrite `dir` into ceil(rows/targetFileRows) files. Returns the new
    * file count. Writes to a sibling temp dir first, then swaps, so a
    * failed compaction never corrupts the source. */
  def compact(spark: SparkSession, dir: String,
              targetFileRows: Long = 1000000L): Int = {
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetFileRows).toInt)
    val tmp = dir.stripSuffix("/") + "__compacting"
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(dir)
    fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), target)
    nFiles
  }

  /** Deterministic dense 0-based labels in `orderCol` order. Uses
    * zipWithIndex on the sorted plan — one sort, then per-partition
    * offset arithmetic (no window over a single partition, which would
    * serialize on one task). */
  def withDenseIds(spark: SparkSession, df: DataFrame, orderCol: Column,
                   out: String = "label_id"): DataFrame = {
    val sorted = df.orderBy(orderCol.asc)
    val schema = sorted.schema
    val zipped = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(zipped,
      schema.add(out, org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** Observed write: attach pipeline-health metrics (row count, null-key
    * count, …) to a job with `df.observe` — they're computed DURING the
    * write, no second pass over the data — and return them. The batch
    * analogue of streaming query progress metrics; at 100 TB a validation
    * re-scan is a job of its own, this is free. */
  def observedWrite(df: DataFrame, dir: String,
                    metrics: (String, Column)*): Map[String, Any] = {
    val obs = org.apache.spark.sql.Observation()
    val first +: rest = metrics.map { case (n, c) => c.as(n) }.toSeq
    df.observe(obs, first, rest: _*)
      .write.mode("overwrite").parquet(dir)
    obs.get
  }

  /** Window-based variant for comparison/small data: row_number() − 1 over
    * a global order — simple, but the single unbounded partition caps
    * parallelism; prefer [[withDenseIds]] at scale. */
  def withDenseIdsWindow(df: DataFrame, orderCol: Column,
                         out: String = "label_id"): DataFrame =
    df.withColumn(out,
      row_number().over(Window.orderBy(orderCol.asc)).cast("long") - 1)
}
