package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * Writing both sides of a recurring large⋈large join bucketed (and
  * sorted) by the join key makes the sort-merge join read pre-shuffled,
  * pre-sorted buckets — no Exchange on either side at query time. At
  * 100 TB this converts the dominant repeated shuffle into a one-time
  * layout cost; asserted in PlanSpec ("bucketed join plans no exchange").
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (bucket + sort by `key`).
    * Bucket counts must match across join partners. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
