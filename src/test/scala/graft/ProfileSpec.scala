package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunk, Profile}

/** One-pass profiling semantics: null counting, distinct cardinality,
  * string-surfaced extrema, one output row per column — plus the token
  * chunker's coverage guarantees. */
class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profile: nulls, distincts, extrema in one pass") {
    val df = Seq(
      (1L, Some("en"), 10),
      (2L, None, 20),
      (3L, Some("ko"), 20),
      (4L, Some("en"), 30))
      .toDF("id", "lang", "n")
    val out = Profile.profile(df, Seq("id", "lang", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(out("id") === ((4L, 4L, 4L, "1", "4")))
    assert(out("lang") === ((4L, 3L, 2L, "en", "ko"))) // null excluded
    assert(out("n") === ((4L, 4L, 3L, "10", "30")))
    assert(out.size === 3)
  }

  test("chunkByTokens: every token covered, overlap = chunk − stride") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, "   ")) // zero tokens → no chunks
      .toDF("doc_id", "text")
    val out = Chunk.chunkByTokens(docs, col("doc_id"), col("text"),
        chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6,9 → windows of 4,4,4,1
    assert(d1.map(_._3) === Array(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(d1.map(_._4) === Array(4, 4, 4, 1))
    // consecutive chunks overlap by chunk − stride = 1 token
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._3.split(" ").last === b._3.split(" ").head)
    }
    assert(out.filter(_._1 == 2L).map(_._3) === Array("only three tokens"))
    assert(!out.exists(_._1 == 3L))
  }
}
