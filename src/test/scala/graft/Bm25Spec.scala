package graft

import org.apache.spark.sql.functions._

import graft.operators.Bm25

/** BM25 operator gates: the MaxScore rewrite's bit-equality AND its
  * actual pruning (a rewrite that never prunes is vacuous), serving
  * under maintained statistics == batch, and the additivity the
  * bm25Stream lifecycle rests on. */
class Bm25Spec extends SparkSuite {
  import spark.implicits._

  private val kws = Seq("alpha", "beta", "gamma")

  /** Skewed fixture: a few docs stuffed with query terms, a long tail
    * of single-hit docs — the distribution upper-bound pruning exists
    * for (tail docs' bound sums sit far below the top scores). The
    * head count EXCEEDS k so the θ seeds are all multi-term docs and
    * θ clears every single-term tail bound; with fewer heads than k a
    * tail doc seeds θ and nothing prunes (correct, just vacuous). */
  private def skewed = {
    val heads = (0L until 6L).map(i =>
      (i, ("alpha beta gamma " * 6) + "filler"))
    val tail = (6L until 64L).map(i =>
      (i, s"alpha ${"filler word salad " * (1 + (i % 5).toInt)}"))
    (heads ++ tail).toDF("doc_id", "text")
  }

  /** The readBm25Stats split, derived from a statsPartial frame via
    * collected scalars — building the 1-row stats frame with a lazy
    * division would let Catalyst push it below the partial's union and
    * constant-fold the df branch's literal 0/0 into an ANSI error. */
  private def statsFrames(part: org.apache.spark.sql.DataFrame) = {
    val dfreq = part.filter(col("term") =!= "")
      .select(col("term"), col("_df").as("df"))
    val (sdl, sn) = part.filter(col("term") === "")
      .select(col("_dl"), col("_n")).as[(Long, Long)].head()
    val stats = Seq((sdl.toDouble / sn.toDouble, sn.toDouble))
      .toDF("avgdl", "nd")
    (dfreq, stats)
  }

  test("topKMaxScore equals exhaustive top-k AND prunes the tail") {
    val docs = skewed
    val n = docs.count()
    val k = 5
    val exhaustive = Bm25.scores(docs, col("doc_id"), col("text"), kws, n)
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
      .as[(Long, Double)].collect().toSeq
    val (ubDoc, survivors, topk) =
      Bm25.maxScoreParts(docs, col("doc_id"), col("text"), kws, n, k)
    assert(topk.as[(Long, Double)].collect().toSeq === exhaustive,
      "upper-bound pruning must be a pure physical rewrite")
    val matched = ubDoc.count()
    val kept = survivors.count()
    assert(kept < matched,
      s"pruning must actually drop docs on the skewed fixture " +
        s"(kept $kept of $matched)")
    assert(kept >= k.toLong, "at least the seeded k docs survive")
  }

  test("topKMaxScore: no-match query yields the (empty) exhaustive " +
      "result, not an NPE on the θ scalar") {
    val docs = skewed
    val out = Bm25.topKMaxScore(docs, col("doc_id"), col("text"),
      Seq("zzz_absent"), docs.count(), 5)
    assert(out.count() === 0L)
  }

  test("topKMaxScore with k >= matched docs degenerates to the full " +
      "exhaustive ranking") {
    val docs = skewed
    val n = docs.count()
    val all = Bm25.scores(docs, col("doc_id"), col("text"), kws, n)
      .orderBy(col("score").desc, col("doc_id").asc)
      .as[(Long, Double)].collect().toSeq
    val viaMax = Bm25.topKMaxScore(docs, col("doc_id"), col("text"),
        kws, n, all.size + 10)
      .as[(Long, Double)].collect().toSeq
    assert(viaMax === all)
  }

  test("scoresWith under statsPartial-derived statistics equals batch " +
      "scores over the same corpus") {
    val docs = skewed
    val (dfreq, stats) = statsFrames(
      Bm25.statsPartial(docs, col("doc_id"), col("text")))
    val served = Bm25.scoresWith(docs, col("doc_id"), col("text"),
        kws, dfreq, stats)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val batch = Bm25.scores(docs, col("doc_id"), col("text"), kws,
        docs.count())
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(served === batch)
  }

  test("statsPartial is additive over doc-disjoint splits (the " +
      "bm25Stream contract)") {
    val docs = skewed
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    def toMap(df: org.apache.spark.sql.DataFrame)
        : Map[String, (Long, Long, Long)] =
      df.as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val merged = toMap(
      Bm25.statsPartial(a, col("doc_id"), col("text"))
        .unionByName(Bm25.statsPartial(b, col("doc_id"), col("text")))
        .groupBy("term")
        .agg(sum(col("_df")).as("_df"), sum(col("_dl")).as("_dl"),
          sum(col("_n")).as("_n")))
    val whole = toMap(Bm25.statsPartial(docs, col("doc_id"), col("text")))
    assert(merged === whole)
  }

  test("scoresWith drops terms the maintained corpus has never seen " +
      "(df inner join) instead of scoring them") {
    val docs = skewed
    val (dfreq, stats) = statsFrames(
      Bm25.statsPartial(docs, col("doc_id"), col("text")))
    // "beta" only lives in the head docs; a query mixing a known and
    // an unknown term scores exactly like the known term alone
    val mixed = Bm25.scoresWith(docs, col("doc_id"), col("text"),
        Seq("beta", "zzz_absent"), dfreq, stats)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val known = Bm25.scoresWith(docs, col("doc_id"), col("text"),
        Seq("beta"), dfreq, stats)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(mixed === known)
  }
}
