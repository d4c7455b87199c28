package graft.operators

import org.apache.spark.sql.DataFrame

/** Kernel-input spreading, shared by every CPU-bound per-row pipeline
  * (codec decodes, shingle hashing): a single-file parquet source is
  * usually ONE row group, so everything fused downstream of the scan
  * runs in ONE task at any scale unless an exchange intervenes.
  *
  * The probe is restricted to SCAN-SHAPED plans because under AQE the
  * final RDD of a plan that CONTAINS exchanges materializes its query
  * stages — probing an input that embeds upstream work would execute it
  * once for the probe and again for the real run (measured: an sf1
  * MJPEG decode went 4 s → 54 s). A scan-shaped plan has no stages to
  * materialize, so its probe runs no job; any wider pipeline is assumed
  * to have managed its own parallelism. */
object Spread {

  def forKernel(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def scanShaped(p: LogicalPlan): Boolean = p match {
      case p: Project => scanShaped(p.child)
      case f: Filter => scanShaped(f.child)
      case a: SubqueryAlias => scanShaped(a.child)
      case _: LeafNode => true
      case _ => false
    }
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (scanShaped(df.queryExecution.analyzed) &&
        df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
