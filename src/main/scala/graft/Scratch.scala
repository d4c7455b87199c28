package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup

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

    val scored = withLangId(withQualityScore(docs, col("text")), col("text"))
    time("scored")(noop(scored))
    val filtered = scored.filter(col("pred_lang") =!= "und" && col("quality") >= 0.5)
    time("filtered")(noop(filtered))
    val kept = filtered.withColumn("_rn", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_rn")
    time("kept")(noop(kept))
    time("lsh(kept)")(noop(
      Dedup.lshCandidatePairs(kept, col("doc_id"), col("text"))))
    val dropIds = Dedup.lshCandidatePairs(kept, col("doc_id"), col("text"))
      .select(col("id2").as("drop_id")).distinct()
    time("full anti")(noop(kept.join(dropIds,
      kept("doc_id") === dropIds("drop_id"), "left_anti")
      .select(col("doc_id"), col("pred_lang"), col("quality"))))
    spark.stop()
  }
}
