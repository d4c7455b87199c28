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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(false)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
