package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Lexical diversity and vocabulary growth semantics. */
class CorpusStatsSpec extends SparkSuite {
  import spark.implicits._

  test("tokenDiversity: hand-computed TTR and Simpson index") {
    val docs = Seq((1L, "a a b"), (2L, "x y z")).toDF("doc_id", "text")
    val got = CorpusStats.tokenDiversity(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // doc 1: n=3 types=2 ttr=2/3 simpson=(2²+1²)/3²=5/9
    // doc 2: all distinct → ttr=1, simpson=3/9=1/3
    assert(got === Seq(
      (1L, 3L, 2L, 2.0 / 3.0, 5.0 / 9.0),
      (2L, 3L, 3L, 1.0, 3.0 / 9.0)))
  }

  test("vocabGrowth: new gram types land in the decile of their first " +
      "document; a fully-duplicated tail adds none") {
    // ids 0..9 → decile = id + 1. Docs 0-2 each introduce one new
    // 3-gram; docs 3-9 repeat doc 0's text — no new types after
    // decile 3, cum flatlines at 3.
    val fresh = Seq("a b c", "b c d", "c d e")
    val docs = (0L to 9L).map(i =>
      (i, if (i < 3) fresh(i.toInt) else fresh(0))).toDF("doc_id", "text")
    val got = CorpusStats.vocabGrowth(docs, col("doc_id"), col("text"))
      .orderBy("decile")
      .as[(Int, Long, Long)].collect().toSeq
    assert(got === Seq((1, 1L, 1L), (2, 1L, 2L), (3, 1L, 3L)))
  }

  test("vocabGrowth: an empty corpus returns the empty curve (same " +
      "schema) and int-typed ids work — no NPE, no getLong cast") {
    val empty = CorpusStats.vocabGrowth(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    assert(empty.columns.toSeq === Seq("decile", "new_types", "cum_types"))
    assert(empty.count() === 0L)
    val intIds = (0 to 9).map(i => (i, "a b c")).toDF("doc_id", "text")
    val got = CorpusStats.vocabGrowth(intIds, col("doc_id"), col("text"))
      .as[(Int, Long, Long)].collect().toSeq
    assert(got === Seq((1, 1L, 1L)))
  }
}
