package graft

import org.apache.spark.sql.functions._

import graft.operators.C4Filters

/** C4 rule-cleanse semantics (Raffel et al. 2020 §2.2): each line rule
  * and page rule fires independently, the cleaned text preserves kept
  * lines in order, and the whole cleanse stays a shuffle-free
  * projection (the scan-speed contract the scaladoc claims). */
class C4FiltersSpec extends SparkSuite {
  import spark.implicits._

  private def page(lines: String*): String = lines.mkString("\n")

  private val keptLine = Seq(
    "this line survives every rule.",
    "does this line survive as well?",
    "yes it certainly does!",
    "the fourth keeper ends in a quote\"",
    "and a fifth keeper closes the set.")

  test("line rules: terminal punctuation, minimum words, javascript") {
    val pg = page(
      (keptLine :+
        "no terminal punctuation here" :+   // dropped: no terminal
        "too short." :+                      // dropped: 2 words
        "please enable JavaScript now."): _*) // dropped: javascript
    val got = C4Filters.clean(Seq((1L, pg)).toDF("id", "pg"),
        col("id"), col("pg"))
      .as[(Long, Int, Int, Boolean, Option[Int], Option[String])].head()
    assert(got._2 === 8)          // n_lines
    assert(got._3 === 5)          // n_kept_lines
    assert(got._4)                // page kept (5 survivors)
    val clean = C4Filters.clean(Seq((1L, pg)).toDF("id", "pg"),
        col("id"), col("pg"))
    // cleaned text = the five keepers in original order
    val md = clean.select("clean_md5").as[String].head()
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest(keptLine.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(md === exp)
  }

  test("page rules: lorem ipsum, curly bracket, minimum kept lines") {
    val base = keptLine
    val pages = Seq(
      (1L, page(base: _*)),                                  // kept
      (2L, page((base :+ "lorem ipsum dolor sit amet."): _*)), // marker
      (3L, page((base :+ "code { display: none; }"): _*)),     // bracket
      (4L, page(base.take(4): _*)))                           // 4 < 5
    val got = C4Filters.clean(pages.toDF("id", "pg"), col("id"), col("pg"))
      .orderBy("doc_id")
      .select("doc_id", "page_kept").as[(Long, Boolean)].collect().toSeq
    assert(got === Seq((1L, true), (2L, false), (3L, false), (4L, false)))
  }

  test("cleanText: NULL for dropped pages, ordered keepers otherwise") {
    val df = Seq(
      (1L, page(keptLine: _*)),
      (2L, page((keptLine :+ "lorem ipsum again."): _*)))
      .toDF("id", "pg")
      .select(col("id"), C4Filters.cleanText(col("pg")).as("c"))
      .orderBy("id")
    val got = df.as[(Long, Option[String])].collect().toSeq
    assert(got(0)._2 === Some(keptLine.mkString("\n")))
    assert(got(1)._2 === None)
  }

  test("the cleanse is one shuffle-free projection (no Exchange)") {
    val plan = C4Filters.clean(
        Seq((1L, "a line that stays put.")).toDF("id", "pg"),
        col("id"), col("pg"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
