package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Rounding.floorRound6
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

    def sh = docs.select(col("doc_id"), col("lang"), col("source"),
      array_distinct(transform(Dedup.wordShingles(col("text"), 3),
        tokenHash32(_))).as("sh"))
    def pairsFrom(right: org.apache.spark.sql.DataFrame) = {
      val cond = col("a.lang") === col("b.lang") &&
        col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id")
      sh.as("a").join(right.as("b"), cond)
        .withColumn("inter",
          size(array_intersect(col("a.sh"), col("b.sh"))).cast("double"))
        .withColumn("uni",
          (size(col("a.sh")) + size(col("b.sh"))).cast("double") - col("inter"))
        .withColumn("jaccard", floorRound6(col("inter") / col("uni")))
        .filter(col("jaccard") >= 0.2)
        .select(col("a.doc_id"), col("b.doc_id"), col("jaccard"))
    }
    time("jaccard current")(noop(pairsFrom(sh)))
    time("jaccard merge hint")(noop(pairsFrom(sh.hint("merge"))))
    time("jaccard shuffle_hash")(noop(pairsFrom(sh.hint("shuffle_hash"))))
    val p = {
      val df = pairsFrom(sh.hint("merge")); df.collect()
      df.queryExecution.executedPlan.toString
    }
    println("[scratch] merge ReusedExchange: " + p.contains("ReusedExchange"))
    spark.stop()
  }
}
