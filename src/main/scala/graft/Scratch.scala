package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Scratch profiling main — not part of the driver contract. */
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, d)
    docs.count()

    time("langid current")(noop(docs.select(col("doc_id"),
      langId(col("text")).as("l"))))

    // staged: materialize scores in one projection, pick in the next —
    // does breaking the expression into two Projects help codegen share?
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val scored = docs.select(col("doc_id"), col("text"),
      array(langMarkers.map { case (_, ms) => langScore(padded, ms) }: _*)
        .as("sc"))
    val best = greatest((1 to 4).map(i => element_at(col("sc"), i)): _*)
    val pick = langMarkers.map(_._1).zipWithIndex.foldRight(lit("und")) {
      case ((l, i), el) =>
        when(element_at(col("sc"), i + 1) === col("best") &&
          element_at(col("sc"), i + 1) > 0, lit(l)).otherwise(el)
    }
    time("langid staged")(noop(
      scored.withColumn("best", best)
        .select(col("doc_id"),
          when(cjkCount(col("text")) > 0, lit("zh")).otherwise(pick).as("l"))))
    spark.stop()
  }
}
