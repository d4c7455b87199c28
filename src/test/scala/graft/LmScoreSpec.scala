package graft

import org.apache.spark.sql.functions._

import graft.operators.LmScore

/** Bigram stupid-backoff LM semantics: word-order sensitivity (the
  * signal the unigram score cannot see), exact backoff arithmetic under
  * stored statistics, and unigram/bigram score agreement on
  * order-insensitive corpora. */
class LmScoreSpec extends SparkSuite {
  import spark.implicits._

  test("lmScore2: a scrambled doc scores strictly worse than its " +
      "unscrambled twin; the unigram score cannot tell them apart") {
    val natural = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog lazy the over jumps fox brown quick the"
    val docs = ((1L to 10L).map(i => (i, natural)) :+ (11L, scrambled))
      .toDF("doc_id", "text")
    val bi = LmScore.lmScore2(docs, col("doc_id"), col("text"))
      .select("doc_id", "lm_score2").as[(Long, Double)].collect().toMap
    assert(bi(11L) < bi(1L),
      s"scrambled ${bi(11L)} should score below natural ${bi(1L)}")
    val uni = LmScore.lmScore(docs, col("doc_id"), col("text"))
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    // same token multiset => identical unigram score
    assert(uni(11L) === uni(1L))
  }

  test("lmScore2With: stored-stats scoring takes the exact backoff path " +
      "for unseen bigrams (alpha = 1/4, exact binary fraction)") {
    val corpus = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val uni = LmScore.unigramProbs(corpus, col("doc_id"), col("text"))
    val bi = LmScore.bigramProbs(corpus, col("doc_id"), col("text"))
    // corpus: N=6, cnt(a)=3, cnt(b)=2, cnt(c)=1; bigrams (a,b):2, (a,c):1
    val got = LmScore.lmScore2With(
        Seq((10L, "a b"), (11L, "b a")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), uni, bi)
      .select("doc_id", "lm_score2").as[(Long, Double)].collect().toMap
    // "a b": S(a)=3/6, S(b|a)=2/3 seen bigram
    val expSeen = fr6((3.0 / 6.0 + 2.0 / 3.0) / 2.0)
    // "b a": S(b)=2/6, (b,a) unseen -> 0.25 * 3/6
    val expBackoff = fr6((2.0 / 6.0 + 0.25 * (3.0 / 6.0)) / 2.0)
    assert(got(10L) === expSeen)
    assert(got(11L) === expBackoff)
  }

  test("lmScore2With: terms unseen in the stored stats contribute zero") {
    val corpus = Seq((1L, "a b")).toDF("doc_id", "text")
    val uni = LmScore.unigramProbs(corpus, col("doc_id"), col("text"))
    val bi = LmScore.bigramProbs(corpus, col("doc_id"), col("text"))
    val got = LmScore.lmScore2With(
        Seq((10L, "zz zz")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), uni, bi)
      .select("lm_score2").as[Double].head()
    assert(got === 0.0)
  }

  test("lmScore2 self-scored never fires backoff: every occurrence's own " +
      "bigram is in the corpus counts") {
    // each doc's bigram appears at least once (its own), so scores are
    // built purely from seen-bigram ratios: doc "x y" alone in a corpus
    // gets S(x)=1/2, S(y|x)=1/1
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val got = LmScore.lmScore2(docs, col("doc_id"), col("text"))
      .select("lm_score2").as[Double].head()
    assert(got === fr6((1.0 / 2.0 + 1.0) / 2.0))
  }

  test("collocations: an always-together pair outranks a chance pair; " +
      "minCount suppresses rare pairs") {
    // "new york" always adjacent (5×); "the cat"/"the dog" mix freely;
    // "rare pair" occurs once (below minCount=2)
    val docs = Seq(
      (1L, "new york the cat the dog new york"),
      (2L, "the dog new york the cat rare pair"),
      (3L, "new york the cat new york the dog"))
      .toDF("doc_id", "text")
    val got = LmScore.collocations(docs, col("doc_id"), col("text"),
        minCount = 2, topK = 5)
      .select("w1", "w2", "rn").as[(String, String, Int)].collect()
    assert(got.head === (("new", "york", 1)))
    assert(!got.exists(r => r._1 == "rare"))
  }

  test("oovRate: fraction outside the deterministic top-k vocab") {
    // vocab size 2 → {"aa","bb"} (counts 3,2; "zz","qq" tie at 1 but
    // lose on count); doc 2 is half OOV
    val docs = Seq(
      (1L, "aa aa bb"),
      (2L, "aa bb zz qq"))
      .toDF("doc_id", "text")
    val got = LmScore.oovRate(docs, col("doc_id"), col("text"),
        vocabSize = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 3L, 0L, 0.0), (2L, 4L, 2L, 0.5)))
  }

  test("lmScoreKn: hand-computed interpolated Kneser-Ney on a 2-doc " +
      "corpus (D = 3/4)") {
    // corpus "a b", "a c": bigram types (a,b):1, (a,c):1
    // pc(a)=2, N1+(a·)=2; N1+(·b)=N1+(·c)=1, N1+(··)=2 → pcont(b)=1/2
    // doc "a b": pos0 'a' → pcont(a)=0 (a never a bigram's cur);
    // pos1 (a,b) → (1−.75)/2 + (.75·2/2)·(1/2) = 0.125+0.375 = 0.5
    val docs = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = LmScore.lmScoreKn(docs, col("doc_id"), col("text"))
      .select("doc_id", "lm_score_kn").as[(Long, Double)].collect().toMap
    assert(got(1L) === fr6((0.0 + 0.5) / 2.0))
  }

  test("lmScoreKn: the estimator is exactly normalized — sum over the " +
      "continuation vocabulary of P(w|v) is 1 for every seen context v") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick dog sleeps over the brown fox"),
      (3L, "a quick brown dog jumps a fence")).toDF("doc_id", "text")
    // independent driver-side re-derivation from the persistable table
    val bi = LmScore.knBigramCounts(
        docs.select(col("doc_id"), col("text"),
          posexplode(split(col("text"), " ")).as(Seq("p", "cur")))
          .withColumn("prev", when(col("p") > 0,
            element_at(split(col("text"), " "), col("p"))).otherwise(lit("")))
          .select(col("doc_id"), col("prev"), col("cur")))
      .as[(String, String, Long)].collect()
    val pc = bi.groupBy(_._1).map { case (v, xs) => v -> xs.map(_._3).sum }
    val n1f = bi.groupBy(_._1).map { case (v, xs) => v -> xs.length.toLong }
    val n1r = bi.groupBy(_._2).map { case (w, xs) => w -> xs.length.toLong }
    val btot = n1f.values.sum.toDouble
    val vocab = n1r.keys.toSeq
    for (v <- pc.keys) {
      val seen = bi.filter(_._1 == v).map { case (_, w, c) =>
        math.max(c - 0.75, 0.0) / pc(v) }.sum
      val interp = vocab.map(w =>
        (0.75 * n1f(v) / pc(v)) * (n1r(w) / btot)).sum
      assert(math.abs(seen + interp - 1.0) < 1e-9,
        s"sum_w P(w|$v) = ${seen + interp}")
    }
  }

  test("lmScoreKn: a scrambled doc scores strictly below its twin") {
    val natural = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog lazy the over jumps fox brown quick the"
    val docs = ((1L to 10L).map(i => (i, natural)) :+ (11L, scrambled))
      .toDF("doc_id", "text")
    val got = LmScore.lmScoreKn(docs, col("doc_id"), col("text"))
      .select("doc_id", "lm_score_kn").as[(Long, Double)].collect().toMap
    assert(got(11L) < got(1L),
      s"scrambled ${got(11L)} should score below natural ${got(1L)}")
  }

  test("lmScoreKnWith: unseen prev backs off to the continuation " +
      "probability; unseen cur contributes zero") {
    val corpus = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val stats = LmScore.knBigramCounts(
      Seq(("a", "b"), ("a", "c")).toDF("prev", "cur")
        .groupBy("prev", "cur").count()
        .select(col("prev"), col("cur"), col("count").as("_bc")))
    // doc "b z a": pos0 'b' → pcont(b)=1/2; (b,z): prev b unseen as a
    // context → pcont(z)=0; (z,a): prev unseen → pcont(a)=0
    val got = LmScore.lmScoreKnWith(
        Seq((10L, "b z a")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), stats)
      .select("lm_score_kn").as[Double].head()
    assert(got === fr6((0.5 + 0.0 + 0.0) / 3.0))
    // sanity: the self-scored corpus agrees with lmScoreKnWith under
    // its own statistics
    val self = LmScore.lmScoreKn(corpus, col("doc_id"), col("text"))
      .select("doc_id", "lm_score_kn").as[(Long, Double)].collect().toMap
    val withOwn = LmScore.lmScoreKnWith(corpus, col("doc_id"), col("text"),
        stats)
      .select("doc_id", "lm_score_kn").as[(Long, Double)].collect().toMap
    assert(self === withOwn)
  }

  test("lmScoreKnWith: an EMPTY bigram table (single-token docs, or a " +
      "serve before any stream batch) scores everything 0 — no NPE") {
    val stats = Seq.empty[(String, String, Long)].toDF("prev", "cur", "_bc")
    val got = LmScore.lmScoreKnWith(
        Seq((10L, "a b c"), (11L, "z")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), stats)
      .select("doc_id", "lm_score_kn").as[(Long, Double)].collect().toMap
    assert(got === Map(10L -> 0.0, 11L -> 0.0))
    // self-scored single-token corpus: its own bigram table is empty too
    val self = LmScore.lmScoreKn(
        Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .select("lm_score_kn").as[Double].collect()
    assert(self.toSeq === Seq(0.0, 0.0))
  }

  /** The repo's floorRound6: floor(x·10⁶ + 0.5)/10⁶. */
  private def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
}
