package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver's t1 check: `SparkEntry.entry` rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local mode has no executor liveness to protect: a host stall or
      // full-GC pause past the 120 s default makes HeartbeatReceiver
      // remove the DRIVER executor, which strands every in-flight AQE
      // stage (observed killing a full test run mid-suite after a 156 s
      // stall). Generous timeouts are strictly better here.
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(false)
    println(s"[smoke] entry rows = ${df.count()}")
    // GraftExtensions registration check: native functions reachable via SQL
    val ext = spark.sql(
      """SELECT l2_native(array(0.0D, 3.0D), array(4.0D, 0.0D)) AS l2,
        |  simhash16('hello world') AS sh,
        |  size(feature_hash_embed('a b c', 8)) AS fh,
        |  size(hashed_shingles('a b c d', 3, 4, true)) AS hs""".stripMargin)
      .collect()(0)
    println(s"[smoke] native sql: l2=${ext.getDouble(0)} fh_dim=${ext.getInt(2)} " +
      s"shingles=${ext.getInt(3)}")
    spark.stop()
  }
}
