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

  test("lmScoreKn3: hand-computed modified KN on a 2-doc corpus " +
      "(fallback D = 3/4 — no count variety)") {
    // corpus "a b c", "a b d": trigrams (a,b,c):1, (a,b,d):1 → t2=t3=0
    // → 3/4 fallback at both orders.
    // doc "a b c": p0 'a' → pcont(a)=0 (a never a continuation w);
    // p1 (v=a,w=b): context a unseen in bc → pcont(b)=0;
    // p2 (a,b,c): (1−.75)/2 + ((.75·2)/2)·P2(c|b)
    //   P2(c|b) = (1−.75)/2 + ((.75·2)/2)·pcont(c) = .125 + .75·.5 = .5
    //   → .125 + .75·.5 = .5
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = LmScore.lmScoreKn3(docs, col("doc_id"), col("text"))
      .select("doc_id", "lm_score_kn3").as[(Long, Double)].collect().toMap
    assert(got(1L) === fr6((0.0 + 0.0 + 0.5) / 3.0))
  }

  test("modKnDiscounts: Chen & Goodman closed form at n1..n4 = 1 and " +
      "the 3/4 fallback when undefined") {
    val (d1, d2, d3) = LmScore.modKnDiscounts(1, 1, 1, 1)
    // Y = 1/3: D1 = 1 − 2/3, D2 = 2 − 1, D3 = 3 − 4/3
    assert(d1 === 1.0 - 2.0 * (1.0 / 3.0) * 1.0 / 1.0)
    assert(d2 === 2.0 - 3.0 * (1.0 / 3.0) * 1.0 / 1.0)
    assert(d3 === 3.0 - 4.0 * (1.0 / 3.0) * 1.0 / 1.0)
    assert(LmScore.modKnDiscounts(5, 0, 2, 1) === ((0.75, 0.75, 0.75)))
    assert(LmScore.modKnDiscounts(0, 0, 0, 0) === ((0.75, 0.75, 0.75)))
  }

  test("lmScoreKn3: a scrambled doc scores strictly below its twin") {
    val natural = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog lazy the over jumps fox brown quick the"
    val docs = ((1L to 10L).map(i => (i, natural)) :+ (11L, scrambled))
      .toDF("doc_id", "text")
    val got = LmScore.lmScoreKn3(docs, col("doc_id"), col("text"))
      .select("doc_id", "lm_score_kn3").as[(Long, Double)].collect().toMap
    assert(got(11L) < got(1L),
      s"scrambled ${got(11L)} should score below natural ${got(1L)}")
  }

  test("lmScoreKn3: exactly normalized at BOTH orders — sum over the " +
      "continuation vocabulary of P(w|u,v) and P(w|v) is 1 for every " +
      "seen context, on the MODIFIED-discount path") {
    // count variety at the trigram order (counts 1..4 present) so the
    // closed-form discounts engage, and multiple distinct predecessors
    // for (b,c) so continuation counts vary too
    val docs = (
      Seq((1L, "a b c")) ++
      (2L to 3L).map(i => (i, "d e f")) ++
      (4L to 6L).map(i => (i, "g h i")) ++
      (7L to 10L).map(i => (i, "j k l")) ++
      Seq((11L, "x b c"), (12L, "y b c"), (13L, "z b c x y"))
    ).toDF("doc_id", "text")
    // independent re-derivation from the persistable trigram table
    val tri = LmScore.kn3TrigramCountsOf(docs, col("doc_id"), col("text"))
      .as[(String, String, String, Long)].collect().toSeq
    val bc = tri.groupBy(t => (t._2, t._3))
      .map { case (k, xs) => k -> xs.length.toLong }
    val n1r = bc.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size }
    val bt = bc.size.toDouble
    val tcc = (1 to 4).map(k => tri.count(_._4 == k).toLong)
    val (t1, t2, t3) = LmScore.modKnDiscounts(tcc(0), tcc(1), tcc(2), tcc(3))
    assert(Set(t1, t2, t3) !== Set(0.75),
      s"fixture must exercise the modified path, got ($t1,$t2,$t3)")
    val bcc = (1 to 4).map(k => bc.values.count(_ == k).toLong)
    val (b1, b2, b3) = LmScore.modKnDiscounts(bcc(0), bcc(1), bcc(2), bcc(3))
    def dSel(c: Long, d: (Double, Double, Double)): Double =
      if (c == 1) d._1 else if (c == 2) d._2 else d._3
    val vocab = n1r.keys.toSeq
    def pcont(w: String): Double = n1r.getOrElse(w, 0).toDouble / bt
    def p2(v: String, w: String): Double = {
      val inCtx = bc.filter(_._1._1 == v)
      if (inCtx.isEmpty) pcont(w)
      else {
        val cv2 = inCtx.values.sum.toDouble
        val gamma = inCtx.values.map(c => dSel(c, (b1, b2, b3))).sum / cv2
        val num = inCtx.getOrElse((v, w), 0L) match {
          case 0L => 0.0
          case c => (c.toDouble - dSel(c, (b1, b2, b3))) / cv2
        }
        num + gamma * pcont(w)
      }
    }
    for (v <- bc.keys.map(_._1).toSeq.distinct) {
      val s = vocab.map(w => p2(v, w)).sum
      assert(math.abs(s - 1.0) < 1e-9, s"sum_w P2(w|$v) = $s")
    }
    for ((u, v) <- tri.map(t => (t._1, t._2)).distinct) {
      val inCtx = tri.filter(t => t._1 == u && t._2 == v)
      val cv3 = inCtx.map(_._4).sum.toDouble
      val gamma = inCtx.map(t => dSel(t._4, (t1, t2, t3))).sum / cv3
      val s = vocab.map { w =>
        val num = inCtx.find(_._3 == w).map(_._4) match {
          case None => 0.0
          case Some(c) => (c.toDouble - dSel(c, (t1, t2, t3))) / cv3
        }
        num + gamma * p2(v, w)
      }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"sum_w P3(w|$u,$v) = $s")
    }
  }

  test("lmScoreKn3With: stored-count serving equals self-scoring; an " +
      "EMPTY trigram table scores everything 0") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "b c d a"))
      .toDF("doc_id", "text")
    val tri = LmScore.kn3TrigramCountsOf(docs, col("doc_id"), col("text"))
    val self = LmScore.lmScoreKn3(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val served = LmScore.lmScoreKn3With(docs, col("doc_id"), col("text"),
        tri)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(self === served)
    val empty = Seq.empty[(String, String, String, Long)]
      .toDF("u", "v", "w", "_tc")
    val got = LmScore.lmScoreKn3With(
        Seq((9L, "a b c")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), empty)
      .select("lm_score_kn3").as[Double].collect()
    assert(got.toSeq === Seq(0.0))
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
