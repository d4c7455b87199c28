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

  test("wordpieceTokens: greedy longest-match-first against a " +
      "hand-tokenized fixture; no-match and over-length words are [UNK]") {
    val vocab = Seq("un", "##aff", "##able", "##b", "a", "ab")
    val df = Seq(
      (1L, "unaffable"),       // un ##aff ##able → 3 (the BERT-paper case)
      (2L, "ab"),              // LONGEST match: 'ab' (1), never a + ##b
      (3L, "ab ax"),           // 'ax': a matches, ##x doesn't → UNK (1)
      (4L, "a" * 17))          // over maxWordChars → UNK without scanning
      .toDF("doc_id", "text")
    val got = BpeStats.wordpieceTokens(df, col("doc_id"), col("text"),
        vocab).orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 0L, 1L),
      (2L, 1L, 0L, 1L),
      (3L, 2L, 1L, 2L),
      (4L, 1L, 1L, 1L)))
  }

  test("wordpieceVocab: ##-marked units of the merge-segmented " +
      "vocabulary, distinct and sorted") {
    // merges (a,b): "abc" segments "ab c", "ab" segments "ab"
    val df = Seq("abc ab").toDF("text")
    val vocab = BpeStats.wordpieceVocab(df, col("text"),
      Seq((1, "a", "b", 1L)))
    assert(vocab === Seq("##c", "ab"))
  }

  test("trainMerges: canonical greedy merge order on a known corpus") {
    // words: aaab x3, ab x2.
    // seg0: "a a a b":3, "a b":2 → pairs: (a,a):6, (a,b):5 → merge (a,a)
    // seg1: "aa a b":3, "a b":2 → pairs: (a,b):5, (aa,a):3 → merge (a,b)
    // seg2: "aa ab":3, "ab":2  → pairs: (aa,ab):3       → merge (aa,ab)
    // seg3: "aaab":3, "ab":2   → no pairs → early stop
    val df = Seq("aaab ab", "aaab ab", "aaab").toDF("text")
    val got = BpeStats.trainMerges(df, col("text"), nMerges = 10)
    assert(got === Seq(
      (1, "a", "a", 6L), (2, "a", "b", 5L), (3, "aa", "ab", 3L)))
  }

  test("trainMerges: multi-byte symbols merge by character") {
    val df = Seq("한국어 한국").toDF("text")
    val got = BpeStats.trainMerges(df, col("text"), nMerges = 2)
    assert(got === Seq((1, "한", "국", 2L), (2, "한국", "어", 1L)))
  }

  test("mergeFold: greedy left-to-right, no re-merge within a pass") {
    val df = Seq("a a a a", "a a a", "b a a", "c").toDF("seg")
    val got = df.select(
        BpeStats.mergeFold(col("seg"), lit("a"), lit("a")).as("m"))
      .as[String].collect().toSeq
    assert(got === Seq("aa aa", "aa a", "b aa", "c"))
  }

  test("bpeTokens: per-doc token counts under a trained merge table") {
    val df = Seq(
      (1L, "aaab ab aaab"),
      (2L, "ab")).toDF("doc_id", "text")
    // after 2 merges (a,a)+(a,b): aaab → "aa ab" (2 tokens), ab → 1
    val merges = Seq((1, "a", "a", 6L), (2, "a", "b", 5L))
    val got = BpeStats.bpeTokens(df, col("doc_id"), col("text"), merges)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 3L), (2L, 1L, 1L)))
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

  test("perplexityBucketsSampled: rate 1.0 + distinct scores == exact " +
      "rank form; sampled thresholds keep score ties together") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = LmScore.perplexityBuckets(docs, col("doc_id"),
        col("text"), col("lang"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val full = LmScore.perplexityBucketsSampled(docs, col("doc_id"),
        col("text"), col("lang"), rate = 1.0)
      .select("doc_id", "lm_score", "lang", "bucket")
      .as[(Long, Double, String, String)].collect()
    // at rate 1.0 the thresholds are the exact cuts: any disagreement
    // must be a score TIED with a threshold (rank cuts split ties,
    // score compare keeps them together)
    val scores = full.groupBy(r => (r._3, r._4)).view
      .mapValues(_.map(_._2).toSet).toMap
    full.foreach { case (id, score, lang, bucket) =>
      if (exact(id) != bucket) {
        val exactPeers = scores.getOrElse((lang, exact(id)), Set())
        assert(exactPeers.contains(score) ||
            scores((lang, bucket)).contains(score),
          s"doc $id: exact=${exact(id)} sampled=$bucket score=$score " +
            "disagrees without a tie at the cut")
      }
    }
    // buckets are score-monotone per language: min(head) >= max(middle)
    // >= ... within each lang
    full.groupBy(_._3).foreach { case (lang, rows) =>
      val byB = rows.groupBy(_._4).view.mapValues(_.map(_._2)).toMap
      for {
        h <- byB.get("head"); m <- byB.get("middle")
      } assert(h.min >= m.max, s"$lang head/middle overlap")
      for {
        m <- byB.get("middle"); t <- byB.get("tail")
      } assert(m.min >= t.max, s"$lang middle/tail overlap")
    }
  }

  test("perplexityBucketsSampled: rate 0.25 agreement with the exact " +
      "form stays high; every doc is bucketed") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = LmScore.perplexityBuckets(docs, col("doc_id"),
        col("text"), col("lang"))
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val sampled = LmScore.perplexityBucketsSampled(docs, col("doc_id"),
        col("text"), col("lang"), rate = 0.25)
      .select("doc_id", "bucket").as[(Long, String)].collect()
    assert(sampled.length === exact.size)
    assert(sampled.forall(r => Set("head", "middle", "tail")(r._2)))
    val agree = sampled.count(r => exact(r._1) == r._2).toDouble
    assert(agree / sampled.length >= 0.75,
      f"sampled-vs-exact agreement ${agree / sampled.length}%.2f under 0.75")
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
