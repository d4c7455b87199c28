package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding.floorRound6
import graft.functions.TextFunctions.tokens

/** Okapi BM25 scoring (Robertson & Spärck Jones probabilistic family;
  * the Elasticsearch/Lucene default ranking the reference's keyword
  * pre-filter approximates — `talent_recommender.py:96-118` counts
  * keyword hits, BM25 is the principled form of the same signal).
  *
  * k1=1.2, b=0.75, the +0.5 idf smoothing kept RATIONAL — no ln(),
  * which would be libm-divergent cross-engine; log only rescales the
  * ranking. Per-doc score folds term-contributions in TERM-SORTED
  * order so float accumulation is cross-engine deterministic.
  *
  * Scale shape: tokenization map-side; tf/df are keyword-filtered
  * (tiny) aggregates sharing one Exchange; doc length is the token-
  * array size computed in the scan projection (no corpus shuffle); df
  * and the 1-row avgdl/N stats broadcast; the only corpus shuffle left
  * is the per-doc score regroup over MATCHED docs — linear.
  *
  * Three entry points:
  *  - [[scores]]: batch — corpus statistics derived from the scored
  *    corpus itself (the q_bm25_rank form).
  *  - [[scoresWith]]: serving — candidates scored under EXTERNALLY
  *    maintained corpus statistics (df table + 1-row avgdl/N), the
  *    [[graft.streaming.Streams.bm25Stream]] merge-on-read output.
  *    At 100 TB the statistics are index metadata maintained
  *    incrementally; a query never re-aggregates the corpus.
  *  - [[topKMaxScore]]: top-k under term-upper-bound pruning (the
  *    MaxScore family — Turtle & Flood 1995; doc upper bounds as in
  *    Broder et al. WAND 2003) — a PHYSICAL rewrite proven
  *    bit-identical to the exhaustive top-k, the q_bloom_join /
  *    q_skew_join proof pattern.
  */
object Bm25 {

  /** Per-(doc, term) exact BM25 contribution given joined tf/df/dl and
    * the broadcast 1-row stats (avgdl DOUBLE, nd DOUBLE). */
  private def termScore: Column = {
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    ((col("nd") - dfD + lit(0.5)) / (dfD + lit(0.5))) *
      (tfD * lit(2.2)) /
      (tfD + lit(1.2) *
        (lit(1.0) - lit(0.75) + lit(0.75) * dlD / col("avgdl")))
  }

  /** tf ⋈ bc(df) ⋈ dl × bc(stats) → per-(doc, term) contribution
    * `ts`. Shared by the scoring regroup and the upper-bound pass. */
  private def contributions(tf: DataFrame, dfreq: DataFrame,
                            dls: DataFrame, stats: DataFrame): DataFrame =
    tf.join(broadcast(dfreq), "term").join(dls, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("ts", termScore)

  /** Fold per-(doc, term) contributions to `(doc_id, score)` in
    * term-sorted order (cross-engine float determinism). */
  private def foldScores(contrib: DataFrame): DataFrame =
    contrib
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("ts"))))
        .as("arr"))
      .withColumn("score", floorRound6(aggregate(col("arr"), lit(0.0),
        (a, x) => a + x.getField("ts"))))
      .select(col("doc_id"), col("score"))

  private def termsOf(docs: DataFrame, idCol: Column,
                      textCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"), explode(tokens(textCol)).as("term"))

  /** Per-doc length WITHOUT the corpus shuffle: dl = the token-array
    * size, computed in the scan projection — the former
    * `terms.groupBy(doc_id).count()` exploded every occurrence and paid
    * a full corpus doc-keyed exchange for a value the array already
    * knows. The `dl > 0` filter keeps the doc set identical to the
    * explode-derived form (zero-token docs never produced occurrence
    * rows), so avgdl's numerator AND denominator are unchanged. */
  private def docLens(docs: DataFrame, idCol: Column,
                      textCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"),
        size(tokens(textCol)).cast("long").as("dl"))
      .filter(col("dl") > 0)

  /** The keyword-filtered (doc_id, term, tf) table — keyword-sized, so
    * its count shuffle is tiny. df(term) is its per-term row count:
    * deriving df FROM this aggregate (instead of the former
    * distinct+regroup over a separate explode) makes the df subtree
    * identical to the tf subtree, so one Exchange serves both
    * (ReusedExchange — the former shape's filter pushdown split the
    * trees and re-tokenized the corpus per consumer, a measured 36-scan
    * plan for MaxScore: plans/r16/q_bm25_maxscore_before.txt). */
  private def kwTf(docs: DataFrame, idCol: Column, textCol: Column,
                   kws: Seq[String]): DataFrame =
    termsOf(docs, idCol, textCol).filter(col("term").isin(kws: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Batch BM25: corpus statistics derived from `docs` itself. Emits
    * one `(doc_id, score)` row per doc matching ≥ 1 keyword. */
  def scores(docs: DataFrame, idCol: Column, textCol: Column,
             kws: Seq[String], nDocs: Long): DataFrame = {
    val dls = docLens(docs, idCol, textCol)
    // avgdl as a lazy 1-row broadcast aggregate (scalar-subquery shape,
    // one double division = the oracle's sum(dl)::DOUBLE / count(*)):
    // the query stays single-action instead of paying an eager
    // agg().head() before the measured dataflow builds. N rides the
    // same row as a constant column — identical double to the former
    // literal, so scores are bit-unchanged.
    val stats = dls.agg(
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      .withColumn("nd", lit(nDocs.toDouble))
    val tf = kwTf(docs, idCol, textCol, kws)
    // df = docs containing the term = the term's (doc, term) row count
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    foldScores(contributions(tf, dfreq, dls, stats))
  }

  /** Serving BM25: score `cands` under externally maintained corpus
    * statistics — `dfreq(term, df)` over the FULL ingested corpus and
    * the 1-row `stats(avgdl DOUBLE, nd DOUBLE)`. Candidate tf/dl are
    * re-derived from the candidate text (a doc's length is a property
    * of the doc); df/avgdl/N come from the maintained state, so the
    * scores equal [[scores]] over the full corpus exactly when the
    * candidates are ingested members. Terms absent from `dfreq`
    * (never ingested) drop out via the inner join — they contribute
    * nothing under a corpus that has never seen them. */
  def scoresWith(cands: DataFrame, idCol: Column, textCol: Column,
                 kws: Seq[String], dfreq: DataFrame,
                 stats: DataFrame): DataFrame = {
    // dl map-side from the token array ([[docLens]] — no corpus
    // shuffle), tf from the keyword-filtered count ([[kwTf]])
    val dls = docLens(cands, idCol, textCol)
    val tf = kwTf(cands, idCol, textCol, kws)
    val kf = dfreq.filter(col("term").isin(kws: _*))
      .select(col("term"), col("df"))
    foldScores(contributions(tf, kf, dls, stats))
  }

  /** One batch's ADDITIVE corpus-statistics partial for the
    * [[graft.streaming.Streams.bm25Stream]] lifecycle: per-term
    * document frequencies plus one sentinel row (`term = ""` — the
    * tokenizer drops empties, so the sentinel can never collide with a
    * real term) carrying the batch's total token count and doc count.
    * All three quantities are sums over doc-disjoint batches, so the
    * merged table equals the batch-computed statistics exactly.
    * Vocabulary-sized — NOT keyword-filtered: the maintained state
    * serves ANY future query's terms, like real postings metadata. */
  def statsPartial(docs: DataFrame, idCol: Column,
                   textCol: Column): DataFrame = {
    val terms = termsOf(docs, idCol, textCol)
    val dfp = terms.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("_df"))
      .select(col("term"), col("_df"), lit(0L).as("_dl"),
        lit(0L).as("_n"))
    val scal = docs.select(size(tokens(textCol)).cast("long").as("tl"))
      .agg(coalesce(sum(col("tl")), lit(0L)).as("_dl"),
        count(lit(1)).as("_n"))
      .select(lit("").as("term"), lit(0L).as("_df"), col("_dl"),
        col("_n"))
    dfp.unionByName(scal)
  }

  /** Top-k BM25 under term-upper-bound pruning (MaxScore / WAND
    * family). Exhaustive scoring pays the per-doc regroup fold for
    * EVERY matching doc; this prunes docs that provably cannot enter
    * the top-k before that regroup:
    *
    *  1. UB(t) = max over the corpus of t's exact contribution — at
    *     100 TB this is INDEX metadata stored beside the postings at
    *     build time (here derived in-query from the same keyword-sized
    *     contribution frame; ≤ |q| rows, broadcast).
    *  2. ub_doc = Σ UB(t) over the doc's matched terms ≥ the doc's
    *     true score (each contribution is ≤ its term max).
    *  3. Seed θ: exactly score the k docs with the LARGEST ub_doc
    *     (deterministic tiebreak); θ = the smallest of those k exact
    *     scores. Any doc with ub_doc < θ has score ≤ ub_doc < θ while
    *     ≥ k docs score ≥ θ — it can never displace the top-k.
    *  4. Exactly score only the survivors (ub_doc ≥ θ) and take the
    *     top-k.
    *
    * The pruned set never reaches the scoring regroup, so the fold
    * shuffle carries the survivor fraction only. Bit-identical to
    * `scores(...).orderBy(score DESC, doc_id).limit(k)` by
    * construction — held to the SAME oracle SQL as q_bm25_rank (the
    * physical-rewrite proof family: q_bloom_join, q_skew_join,
    * q_host_cap). θ stays a lazy 1-row broadcast (the avgdl shape):
    * an empty match set yields NULL θ, the filter drops all rows and
    * the output is empty — exactly the exhaustive result. */
  def topKMaxScore(docs: DataFrame, idCol: Column, textCol: Column,
                   kws: Seq[String], nDocs: Long, k: Int): DataFrame =
    maxScoreParts(docs, idCol, textCol, kws, nDocs, k)._3

  /** [[topKMaxScore]] with its pruning frames exposed for the spec
    * gate: (per-matched-doc upper bounds, survivor ids, top-k). */
  private[graft] def maxScoreParts(docs: DataFrame, idCol: Column,
                                   textCol: Column, kws: Seq[String],
                                   nDocs: Long, k: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    // dl map-side from the token array ([[docLens]] — the former
    // occurrence groupBy paid a full corpus exchange), tf/df one
    // keyword-filtered count shuffle sharing one Exchange ([[kwTf]]).
    // The contribution tree below is referenced THREE times (upper
    // bounds, the theta seed fold, the survivor fold); its copies are
    // now identical subtrees over the same tiny exchange, so
    // ReusedExchange collapses them where the former per-consumer
    // re-derivation produced a measured 36-scan plan
    // (plans/r16/q_bm25_maxscore_before.txt).
    val dls = docLens(docs, idCol, textCol)
    val stats = dls.agg(
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      .withColumn("nd", lit(nDocs.toDouble))
    val tf = kwTf(docs, idCol, textCol, kws)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = contributions(tf, dfreq, dls, stats)

    // per-term upper bounds (≤ |q| rows) and per-doc bound sums — the
    // candidate-generation pass touches only the keyword-sized tf
    // frame, never the doc-length join or the scoring regroup
    val ub = contrib.groupBy(col("term")).agg(max(col("ts")).as("ub"))
    val ubDoc = tf.join(broadcast(ub), "term")
      .groupBy(col("doc_id")).agg(sum(col("ub")).as("ub_doc"))
    val seeds = ubDoc
      .orderBy(col("ub_doc").desc, col("doc_id").asc).limit(k)
      .select(col("doc_id"))
    val theta = foldScores(
        contrib.join(broadcast(seeds), Seq("doc_id"), "left_semi"))
      .agg(min(col("score")).as("theta"))
    val survivors = ubDoc.crossJoin(broadcast(theta))
      .filter(col("ub_doc") >= col("theta"))
      .select(col("doc_id"))
    val topk = foldScores(
        contrib.join(broadcast(survivors), Seq("doc_id"), "left_semi"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(k)
    (ubDoc, survivors, topk)
  }
}
