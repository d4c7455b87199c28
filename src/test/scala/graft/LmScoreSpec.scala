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

  /** The repo's floorRound6: floor(x·10⁶ + 0.5)/10⁶. */
  private def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
}
