package graft

import org.apache.spark.sql.functions._

import graft.operators.SpanCorrupt

/** T5 span-corruption planning: exact behavior on full blocks, the
  * partial-block clip re-derived independently from the md5 offset,
  * the 15% rate on long documents, and the empty-doc guard. */
class SpanCorruptSpec extends SparkSuite {
  import spark.implicits._

  private def md5h16(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(2)
        .map("%02x".format(_)).mkString, 16)

  test("a full 20-token block corrupts exactly one 3-token span " +
      "wherever the hash places it") {
    val doc = (1 to 20).map(i => s"w$i").mkString(" ")
    val got = SpanCorrupt.stats(Seq((1L, doc)).toDF("id", "text"),
        col("id"), col("text"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // (doc_id, n_tokens, n_spans, n_corrupt, n_input, n_target)
    assert(got === ((1L, 20L, 1L, 3L, 18L, 4L)))
  }

  test("partial final block clips by the independently re-derived " +
      "md5 offset") {
    val doc = (1 to 25).map(i => s"w$i").mkString(" ")
    val got = SpanCorrupt.stats(Seq((7L, doc)).toDF("id", "text"),
        col("id"), col("text"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val h1 = md5h16("sc|7|1") % 18 // block 1 offset
    val clip = math.max(0L, math.min(3L, 25L - (20L + h1)))
    val spans = 1L + (if (clip > 0) 1L else 0L)
    assert(got._4 === 3L + clip, s"h1=$h1")
    assert(got._3 === spans)
    assert(got._5 === 25L - (3L + clip) + spans)
    assert(got._6 === 3L + clip + spans)
  }

  test("long documents corrupt at the paper's 15% rate (final block " +
      "excepted); the plan is deterministic across evaluations") {
    val doc = (1 to 2000).map(i => s"w$i").mkString(" ")
    val df = Seq((3L, doc)).toDF("id", "text")
    val a = SpanCorrupt.stats(df, col("id"), col("text"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(a._4 === 300L, "100 full blocks x 3") // 2000/20 blocks, no clip
    assert(a._3 === 100L)
    val b = SpanCorrupt.stats(df, col("id"), col("text"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(a === b)
  }

  test("empty and whitespace-only docs plan zero spans") {
    val got = SpanCorrupt.stats(
        Seq((1L, ""), (2L, "   ")).toDF("id", "text"),
        col("id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L, 0L, 0L, 0L, 0L), (2L, 0L, 0L, 0L, 0L, 0L)))
  }
}
