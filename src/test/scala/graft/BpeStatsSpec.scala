package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeStats, LmScore}

class BpeStatsSpec extends SparkSuite {
  import spark.implicits._

  test("bpePairCounts: vocab-weighted adjacent char pairs") {
    // "aba ab" x2, "ab" x1 → words: aba:2, ab:3
    val df = Seq("aba ab", "aba ab", "ab").toDF("text")
    val got = BpeStats.bpePairCounts(df, col("text"), k = 10)
      .as[(String, Long)].collect().toMap
    // ab: 2 (from aba) + 3 (from ab) = 5; ba: 2
    assert(got === Map("ab" -> 5L, "ba" -> 2L))
  }

  test("bpePairCounts: multi-byte chars pair by character, not byte") {
    val df = Seq("한국어").toDF("text")
    val got = BpeStats.bpePairCounts(df, col("text"), k = 10)
      .as[(String, Long)].collect().toMap
    assert(got === Map("한국" -> 1L, "국어" -> 1L))
  }

  test("bpePairCounts: single-char words emit no pairs; k truncates " +
      "deterministically on (cnt desc, pair)") {
    val df = Seq("a b c ab ac").toDF("text")
    val got = BpeStats.bpePairCounts(df, col("text"), k = 1)
      .as[(String, Long)].collect()
    assert(got.toSeq === Seq(("ab", 1L))) // tie with "ac" broken by pair asc
  }

  test("perplexityBuckets: rank-based terciles per language") {
    // 6 en docs with ordered scores → 2/2/2 split; 1 doc with null lang
    // lands in 'und' where the rank cut puts a singleton in tail (the
    // conservative bucket for a quality split).
    val docs = Seq(
      (1L, "the the the the", "en"), // all frequent tokens → highest score
      (2L, "the the the rare1", "en"),
      (3L, "the the rare2 rare3", "en"),
      (4L, "the rare4 rare5 rare6", "en"),
      (5L, "rare7 rare8 rare9 rarea", "en"),
      (6L, "rareb rarec rared raree", "en"),
      (7L, "solo doc", null)
    ).toDF("doc_id", "text", "lang")
    val got = LmScore.perplexityBuckets(docs, col("doc_id"), col("text"),
        col("lang"))
      .select("doc_id", "lang", "bucket")
      .as[(Long, String, String)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got(1L) === ("en", "head"))
    assert(got(2L) === ("en", "head"))
    assert(got(3L) === ("en", "middle"))
    assert(got(4L) === ("en", "middle"))
    assert(got(5L) === ("en", "tail"))
    assert(got(6L) === ("en", "tail"))
    assert(got(7L) === ("und", "tail"))
  }

  test("perplexityBuckets: tercile sizes differ by at most 1 and are " +
      "ordered head<=middle<=tail within each language") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sizes = LmScore.perplexityBuckets(docs, col("doc_id"), col("text"),
        col("lang"))
      .groupBy("lang", "bucket").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (l, rows) =>
        l -> rows.map(r => r._2 -> r._3).toMap
      }
    sizes.foreach { case (lang, m) =>
      val h = m.getOrElse("head", 0L)
      val md = m.getOrElse("middle", 0L)
      val t = m.getOrElse("tail", 0L)
      assert(h <= md && md <= t, s"$lang: $m")
      assert(t - h <= 1, s"$lang: $m")
    }
  }
}
