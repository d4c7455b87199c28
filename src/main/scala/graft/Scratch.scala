package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.operators.Dedup
import graft.plans.NativeFunctions

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
    import spark.implicits._
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, d)
    docs.count()

    // does the jaccard self-join reuse the exchange?
    val jp = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
      Seq("lang", "source"), 3, 0.2)
    jp.collect()
    val p = jp.queryExecution.executedPlan.toString
    println("[scratch] jaccard ReusedExchange: " + p.contains("ReusedExchange"))
    println("[scratch] jaccard joins: " +
      "SortMergeJoin\\(|BroadcastHashJoin".r.findAllIn(p).size)

    // native vs HOF L2 at realistic vector scale: 200k x 128-dim
    val vecs = spark.range(200000).select(col("id"),
      transform(sequence(lit(0), lit(127)),
        i => ((col("id") * 31 + i * 7) % 997).cast("double") / 997.0)
        .as("v")).cache()
    vecs.count()
    val q = (0 until 128).map(i => (i * 13 % 997) / 997.0)
    time("L2 HOF 200k x 128")(noop(
      vecs.select(VectorFunctions.l2(col("v"), typedlit(q)).as("d"))))
    time("L2 native 200k x 128")(noop(
      vecs.select(NativeFunctions.l2Native(col("v"), typedlit(q)).as("d"))))
    time("topk native 200k x 128")(
      vecs.select(col("id"),
        NativeFunctions.l2Native(col("v"), typedlit(q)).as("d"))
        .orderBy(col("d").asc, col("id").asc).limit(10).collect())
    spark.stop()
  }
}
