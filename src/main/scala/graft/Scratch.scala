package graft

import org.apache.spark.sql.SparkSession
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
    println("[scratch] docs stats:")
    docs.select(count(lit(1)), avg(length(col("text"))),
      max(length(col("text")))).show()
    time("warm")(noop(docs.select(col("doc_id"))))

    time("tokens")(noop(docs.select(tokens(col("text")).as("t"))))
    time("shingles")(noop(docs.select(
      Dedup.wordShingles(col("text"), 3).as("s"))))
    time("shingles+hash32")(noop(docs.select(
      transform(Dedup.wordShingles(col("text"), 3), tokenHash32(_)).as("s"))))
    val sh = docs.select(col("doc_id"), col("lang"), col("source"),
      array_distinct(transform(Dedup.wordShingles(col("text"), 3),
        tokenHash32(_))).as("sh"))
    time("sh full")(noop(sh))
    val cached = sh.cache()
    time("sh cache")(noop(cached))
    val cond = col("a.lang") === col("b.lang") &&
      col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id")
    time("join+intersect (cached)")(noop(
      cached.as("a").join(cached.as("b"), cond)
        .select(col("a.doc_id"), col("b.doc_id"),
          size(array_intersect(col("a.sh"), col("b.sh"))).as("i"))))
    time("join only (cached)")(noop(
      cached.as("a").join(cached.as("b"), cond)
        .select(col("a.doc_id"), col("b.doc_id"))))
    time("full jaccardPairs")(noop(Dedup.jaccardPairs(docs, col("doc_id"),
      col("text"), Seq("lang", "source"), 3, 0.2)))

    time("langid cold")(noop(docs.select(langId(col("text")).as("l"))))
    time("langid warm")(noop(docs.select(langId(col("text")).as("l"))))
    val lidPlan = docs.select(langId(col("text")).as("l"))
      .queryExecution.executedPlan.toString
    println("[scratch] langid codegen: " + lidPlan.contains("WholeStageCodegen"))
    println(lidPlan.linesIterator.take(6).mkString("\n"))
    time("cjk only")(noop(docs.select(cjkCount(col("text")).as("c"))))
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    time("1 substrCount")(noop(docs.select(
      substrCount(padded, " the ").as("c"))))
    time("12 substrCount")(noop(docs.select(
      langMarkers.flatMap(_._2).map(m => substrCount(padded, m)).reduce(_ + _)
        .as("c"))))
    time("minhash full")(noop(Dedup.lshCandidatePairs(docs, col("doc_id"),
      col("text"))))
    val hv = docs.select(col("doc_id"),
      transform(Dedup.wordShingles(col("text"), 3), tokenHash16(_)).as("hv"))
    time("minhash hv only")(noop(hv))
    time("minhash sig from hv")(noop(hv.select(col("doc_id"),
      Dedup.minhashFromHashes(col("hv"), 8).as("sig"))))
    spark.stop()
  }
}
