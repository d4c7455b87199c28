package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding.floorRound6
import graft.functions.TextFunctions.tokens

/** Unigram language-model quality score: the mean corpus-probability of
  * a document's tokens — the cheap LM-based quality signal (a doc of
  * frequent, ordinary tokens scores high; rare-token noise and
  * gibberish score low). The trainable-model-free member of the quality
  * family beside `TextFunctions.qualityScore`'s rule signals.
  *
  * p(t) = cnt(t)/total is exact double division, and the per-doc mean
  * folds the probabilities in TERM-SORTED order (the q_bm25_rank trick)
  * so float accumulation is deterministic across engines and layouts —
  * hash-oracled as `q_lm_score`.
  *
  * Scale shape: unigram counts are one shuffle on term (map-side
  * partial counts); the count join back to occurrences is a SHUFFLE
  * join by design — the vocabulary of a 100 TB corpus is not
  * broadcast-size (Catalyst may still broadcast at small scale, which
  * is the right call there); the per-doc regroup is the second corpus
  * shuffle. Linear throughout — no n² term anywhere. */
object LmScore {

  def lmScore(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    scoreAgainst(docTerms(df, idCol, textCol),
      unigramProbs(df, idCol, textCol))

  /** The corpus-global unigram probability table (term, p) — the
    * driver-free half of [[lmScore]], exposed so a recurring-ingest
    * pipeline can PERSIST it and score later batches against it
    * (one `head()` for the total-token count; the table itself is
    * vocabulary-sized and stays distributed). */
  def unigramProbs(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    // vocabulary-sized checkpoint: the count table feeds BOTH the
    // total-tokens scalar job and the scoring join — without the
    // barrier each consumer re-tokenizes and re-shuffles the corpus
    // (the scoreKn bigram-table rule, one order down)
    val counts = Dedup.checkpointed(docTerms(df, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("cnt")))
    val total = counts.agg(sum("cnt")).head().getLong(0)
    counts.select(col("term"),
      (col("cnt").cast("double") / lit(total.toDouble)).as("p"))
  }

  /** Score against a STORED unigram-probability table (term, p) instead
    * of counts computed from `df` itself — the recurring-ingest form: a
    * new batch of documents is scored under the reference corpus'
    * statistics ([[graft.streaming.Streams.qualityBucketStream]]).
    * Terms unseen in the reference table contribute probability 0 (the
    * correct penalty for out-of-corpus noise). Identical to [[lmScore]]
    * when `termProbs` was derived from `df` itself. */
  def lmScoreWith(df: DataFrame, idCol: Column, textCol: Column,
      termProbs: DataFrame): DataFrame =
    scoreAgainst(docTerms(df, idCol, textCol), termProbs)

  private def docTerms(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    // spread past a single-row-group scan: tokenize+explode is the
    // CPU-bound stage fused onto it (sf10 soak finding)
    Spread.forKernel(df.select(idCol.as("doc_id"), textCol.as("_t")))
      .select(col("doc_id"), explode(tokens(col("_t"))).as("term"))

  // ---- bigram stupid-backoff --------------------------------------------

  /** Bigram LM quality score with stupid backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation") — the word-ORDER-
    * sensitive signal the unigram [[lmScore]] misses (a scrambled doc
    * keeps its unigram score but loses its bigram score; CCNet's real
    * filter is an n-gram KenLM):
    *
    *   S(w_0)           = cnt(w_0) / N
    *   S(w_i | w_{i-1}) = cnt(w_{i-1} w_i) / cnt(w_{i-1})  if seen
    *                    = α · cnt(w_i) / N                 otherwise
    *
    * α = 1/4 — an exact BINARY fraction, so the backoff scaling is one
    * bit-exact float multiply in any engine (0.4, the paper's value, is
    * not representable and would drift across engines). All
    * probabilities are single long/long double divisions and the
    * per-doc mean folds in (prev, cur)-sorted order (the term-sorted
    * fold rule), so the whole score is deterministic cross-engine —
    * hash-oracled as `q_lm_score2`.
    *
    * Scale shape: one map-side occurrence pass (prev comes from
    * `element_at` on the carried token array — no window shuffle), ONE
    * (prev, cur)-keyed count shuffle from which every model table
    * derives (cur-marginals of the checkpointed bigram table ARE the
    * term counts — the scoreKn rule; the former formulation re-tokenized
    * and re-shuffled the corpus once per table plus once for the total
    * scalar, five passes where two are fundamental), two shuffle joins
    * back (the vocab/bigram tables of a 100 TB corpus are not
    * broadcast-size), one doc regroup. Linear — no n² term. */
  def lmScore2(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val occ = bigramOccurrences(df, idCol, textCol)
    // the FULL (prev, cur) count table including the position-0 ''-prev
    // rows: bigram-vocabulary-sized, checkpointed because four consumers
    // derive from it (term probs, prev counts, bigram probs, the total
    // scalar job)
    val biAll = Dedup.checkpointed(
      occ.groupBy("prev", "cur").agg(count(lit(1)).as("_c")))
    // every token occurs as `cur` exactly once, so cur-marginals ARE the
    // term counts [[unigramProbs]] derives from the corpus
    val termCnt = biAll.groupBy(col("cur").as("term"))
      .agg(sum("_c").as("cnt"))
    val total = Option(termCnt.agg(sum("cnt")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val termProbs = termCnt.select(col("term"),
      (col("cnt").cast("double") / lit(total.toDouble)).as("p"))
    val biProbs = biAll.filter(col("prev") =!= "")
      .join(termCnt.select(col("term").as("prev"), col("cnt").as("_pc")),
        "prev")
      .select(col("prev"), col("cur"),
        (col("_c").cast("double") / col("_pc").cast("double")).as("pbi"))
    scoreBigrams(occ, termProbs, biProbs)
  }

  /** Score under STORED statistics — the recurring-ingest form of
    * [[lmScore2]]: new batches score under the reference corpus' tables
    * ([[unigramProbs]] + [[bigramProbs]], both persistable). Unseen
    * bigrams take the backoff path (on the training corpus itself every
    * occurrence's own bigram is counted, so backoff only ever fires
    * here); unseen terms contribute probability 0. */
  def lmScore2With(df: DataFrame, idCol: Column, textCol: Column,
      termProbs: DataFrame, biProbs: DataFrame): DataFrame =
    scoreBigrams(bigramOccurrences(df, idCol, textCol), termProbs, biProbs)

  /** The corpus bigram conditional-probability table
    * (prev, cur, pbi = cnt(prev cur)/cnt(prev)) — bigram-vocabulary-
    * sized, stays distributed; persist beside [[unigramProbs]] for
    * recurring-ingest scoring. */
  def bigramProbs(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    // ONE (prev, cur) count shuffle; the prev-denominators are
    // cur-marginals of the same table (every token occurs as `cur`
    // exactly once, so they ARE [[unigramProbs]]'s term counts) — the
    // former per-table corpus regroups re-tokenized the corpus twice
    val biAll = bigramOccurrences(df, idCol, textCol)
      .groupBy("prev", "cur").agg(count(lit(1)).as("_bc"))
    val termCnt = biAll.groupBy(col("cur").as("prev"))
      .agg(sum("_bc").as("_pc"))
    biAll.filter(col("prev") =!= "")
      .join(termCnt, "prev")
      .select(col("prev"), col("cur"),
        (col("_bc").cast("double") / col("_pc").cast("double")).as("pbi"))
  }

  /** (doc_id, prev, cur) per token position — prev is '' (a value the
    * empty-dropping tokenizer can never emit) at position 0. Map-side:
    * prev reads the carried token array, no per-doc window. */
  private def bigramOccurrences(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    Spread.forKernel(df.select(idCol.as("doc_id"), textCol.as("_t")))
      .select(col("doc_id"), tokens(col("_t")).as("_tk"))
      .select(col("doc_id"), col("_tk"),
        posexplode(col("_tk")).as(Seq("p", "cur")))
      .withColumn("prev",
        when(col("p") > 0, element_at(col("_tk"), col("p")))
          .otherwise(lit("")))
      .select(col("doc_id"), col("prev"), col("cur"))

  private def scoreBigrams(occ: DataFrame, termProbs: DataFrame,
      biProbs: DataFrame): DataFrame =
    occ.join(termProbs.withColumnRenamed("term", "cur"), Seq("cur"), "left")
      .withColumn("pu", coalesce(col("p"), lit(0.0))).drop("p")
      .join(biProbs, Seq("prev", "cur"), "left")
      .withColumn("ps",
        when(col("prev") === "", col("pu"))
          .when(col("pbi").isNotNull, col("pbi"))
          .otherwise(lit(0.25) * col("pu")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(
          struct(col("prev"), col("cur"), col("ps")))).as("arr"))
      .withColumn("lm_score2", floorRound6(
        aggregate(col("arr"), lit(0.0), (a, x) => a + x.getField("ps"))
          / col("n_tokens")))
      .select(col("doc_id"), col("n_tokens"), col("lm_score2"))

  private def scoreAgainst(terms: DataFrame,
      termProbs: DataFrame): DataFrame =
    terms.join(termProbs, Seq("term"), "left")
      .withColumn("p", coalesce(col("p"), lit(0.0)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(struct(col("term"), col("p"))))
          .as("arr"))
      .withColumn("lm_score", floorRound6(
        aggregate(col("arr"), lit(0.0), (a, x) => a + x.getField("p"))
          / col("n_tokens")))
      .select(col("doc_id"), col("n_tokens"), col("lm_score"))

  // ---- interpolated Kneser-Ney ------------------------------------------

  /** Bigram LM score with INTERPOLATED KNESER-NEY smoothing (Kneser &
    * Ney 1995; Chen & Goodman 1999's interpolated variant) — the
    * smoothing the CCNet filter's actual KenLM models ship (Heafield
    * 2011), upgrading [[lmScore2]]'s stupid backoff from a heuristic
    * discount to the absolute-discounting estimator:
    *
    *   P(w | v) = max(c(v,w) − D, 0)/c(v) + D·N1+(v·)/c(v) · Pcont(w)
    *   Pcont(w) = N1+(·w) / N1+(··)
    *
    * where c(v) = Σ_w c(v,w), N1+(v·)/N1+(·w) are distinct-continuation
    * counts, and N1+(··) is the bigram-type total. A doc-initial token
    * (prev = '') scores Pcont(w) — the lower-order KN distribution,
    * which models how NOVEL a word's contexts are rather than how
    * frequent the word is (the "San Francisco" effect: "Francisco" is
    * frequent but follows only "San", so its continuation probability
    * is tiny). D = 3/4 — an exact BINARY fraction (the 0.75 convention
    * is also Chen & Goodman's fitted value region), so the discount is
    * bit-exact cross-engine; every probability is a fixed tree of
    * long→double casts, divisions and one multiply-add, and the per-doc
    * mean folds in (prev, cur)-sorted order — hash-oracled as
    * `q_lm_score_kn`. With c(v) = Σ_w c(v,w) the estimator is exactly
    * normalized: Σ_w P(w|v) = 1 for every seen v (LmScoreSpec proves
    * it on the corpus).
    *
    * Scale shape: ALL model tables derive from the bigram count table —
    * one uniform (prev, cur) count shuffle, then two bounded regroups
    * of the bigram-TYPE table (vocabulary-sized, far smaller than the
    * corpus) for the prev/cur continuation stats; scoring is three
    * shuffle joins back onto occurrences (a 100 TB vocabulary is not
    * broadcast-size) and one doc regroup. Linear — no n² term. */
  def lmScoreKn(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val occ = bigramOccurrences(df, idCol, textCol)
    scoreKn(occ, knBigramCounts(occ), knPrevStats, knCurStats)
  }

  /** Score under STORED Kneser-Ney statistics — the recurring-ingest
    * form: new batches score under a reference corpus' persisted bigram
    * count table ([[knBigramCounts]]; the two continuation-stat tables
    * re-derive from it, vocabulary-sized work). Unseen bigrams keep
    * only the interpolation term (the max(·,0) clamp), unseen prev
    * backs all the way off to Pcont(cur), unseen cur contributes 0. */
  def lmScoreKnWith(df: DataFrame, idCol: Column, textCol: Column,
      biCounts: DataFrame): DataFrame =
    scoreKn(bigramOccurrences(df, idCol, textCol), biCounts,
      knPrevStats, knCurStats)

  /** The persistable KN model: the bigram count table
    * (prev, cur, _bc). Everything else derives from it. */
  def knBigramCounts(occ: DataFrame): DataFrame =
    occ.filter(col("prev") =!= "")
      .groupBy("prev", "cur").agg(count(lit(1)).as("_bc"))

  /** [[knBigramCounts]] straight from a document frame — the form a
    * recurring-ingest maintainer computes per batch
    * ([[graft.streaming.Streams.knStream]]): bigram counts are ADDITIVE
    * across batches (counts of a union = pair-wise sums), so per-batch
    * partials merge exactly. */
  def knBigramCountsOf(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    knBigramCounts(bigramOccurrences(df, idCol, textCol))

  /** (prev, _pc = Σ_w c(prev,w), _n1f = N1+(prev ·)) — one regroup of
    * the bigram-type table. */
  private def knPrevStats(bi: DataFrame): DataFrame =
    bi.groupBy("prev").agg(sum("_bc").as("_pc"), count(lit(1)).as("_n1f"))

  /** (cur, _n1r = N1+(· cur)). */
  private def knCurStats(bi: DataFrame): DataFrame =
    bi.groupBy("cur").agg(count(lit(1)).as("_n1r"))

  private def scoreKn(occ: DataFrame, biRaw: DataFrame,
      prevStatsOf: DataFrame => DataFrame,
      curStatsOf: DataFrame => DataFrame): DataFrame = {
    // FOUR consumers derive from the bigram count table (prev/cur
    // stats, the N1+(··) scalar, the scoring join) — checkpoint it so
    // the corpus is tokenized and count-shuffled once (the scoreKn3
    // rule, one order down)
    val bi = Dedup.checkpointed(biRaw)
    val prevStats = prevStatsOf(bi)
    val curStats = curStatsOf(bi)
    // N1+(··): bigram-type total — one driver scalar (the unigramProbs
    // head() rule), exact as a long sum of the type counts. sum() is
    // NULL over an empty bigram table (single-token-only corpus, or a
    // serve before any stream batch committed bigrams) — Pcont has no
    // support then, so every continuation probability is 0, matching
    // the oracle's NULL/0 instead of an NPE.
    val btypes = Option(prevStats.agg(sum("_n1f")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L).toDouble
    occ.join(curStats, Seq("cur"), "left")
      .withColumn("_pcont",
        if (btypes == 0.0) lit(0.0)
        else coalesce(col("_n1r"), lit(0L)).cast("double") / lit(btypes))
      .join(prevStats, Seq("prev"), "left")
      .join(bi, Seq("prev", "cur"), "left")
      .withColumn("ps",
        when(col("prev") === "", col("_pcont"))
          .when(col("_pc").isNull, col("_pcont"))
          .otherwise(
            greatest(coalesce(col("_bc"), lit(0L)).cast("double")
                - lit(0.75), lit(0.0)) / col("_pc").cast("double")
              + (lit(0.75) * col("_n1f").cast("double")
                  / col("_pc").cast("double")) * col("_pcont")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(
          struct(col("prev"), col("cur"), col("ps")))).as("arr"))
      .withColumn("lm_score_kn", floorRound6(
        aggregate(col("arr"), lit(0.0), (a, x) => a + x.getField("ps"))
          / col("n_tokens")))
      .select(col("doc_id"), col("n_tokens"), col("lm_score_kn"))
  }

  // ---- trigram MODIFIED Kneser-Ney ----------------------------------------

  /** Trigram LM score with MODIFIED Kneser-Ney smoothing — the actual
    * shipped KenLM configuration (Heafield 2011 trains modified KN;
    * Chen & Goodman 1999 §3 define it): order-specific discounts
    * D1/D2/D3+ estimated from the count-of-counts instead of the single
    * D = 3/4, one more order than [[lmScoreKn]]:
    *
    *   P(w|u,v) = (c(uvw) − D₃(c)) / c(uv·) + γ(uv) · P(w|v)
    *   P(w|v)   = (N1+(·vw) − D₂(N1+)) / N1+(·v·) + γ(v) · Pcont(w)
    *   Pcont(w) = N1+(·w) / N1+(··)
    *   γ(ctx)   = (D1·N1(ctx·) + D2·N2(ctx·) + D3+·N3+(ctx·)) / c(ctx·)
    *   Dk       = k − (k+1)·Y·n_{k+1}/n_k,  Y = n1/(n1 + 2·n2)
    *
    * per Chen & Goodman's closed form, with n_k the count-of-counts of
    * THAT order's table (raw trigram counts for D₃; continuation counts
    * for D₂ — the KenLM adjusted-counts convention: every lower-order
    * table derives from the trigram type table). Doc-initial positions
    * back down the orders: p=0 scores Pcont(w), p=1 scores P(w|v);
    * an unseen trigram context falls to P(w|v), an unseen bigram
    * context to Pcont(w). Σ_w P(w|u,v) = 1 for every seen context at
    * BOTH orders (LmScoreSpec re-derives it independently): each Dk ≤ k
    * by construction (clamped at 0), so the bucketed numerator never
    * goes negative and γ returns exactly the discounted mass.
    *
    * Cross-engine exactness: the discounts are fixed trees of exact
    * long→double casts and IEEE ops (division is exactly rounded), so
    * DuckDB replays them bit-equal; when any of n1..n3 is zero the
    * closed form is undefined (a saturated/replicated corpus has no
    * singletons) and the discounts fall back to the interpolated-KN
    * 3/4 — same CASE in the oracle. Per-doc mean folds in
    * (u, v, w)-sorted order — hash-oracled as `q_lm_score_kn3`.
    *
    * Scale shape: ALL model tables derive from the trigram count table
    * — ONE uniform (u, v, w) count shuffle over the corpus, then
    * vocabulary-sized regroups (context stats, continuation counts,
    * their stats); the count-of-count scalars are two bounded
    * aggregates (the unigramProbs head() rule); scoring is five
    * shuffle joins back onto occurrences (a 100 TB vocabulary is not
    * broadcast-size) and one doc regroup. Linear — no n² term. The
    * count table is ADDITIVE across batches →
    * [[graft.streaming.Streams.kn3Stream]] maintains it exactly-once. */
  def lmScoreKn3(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val occ = trigramOccurrences(df, idCol, textCol)
    scoreKn3(occ, kn3TrigramCounts(occ))
  }

  /** Score under STORED trigram counts — the recurring-ingest form:
    * batches score under a reference corpus' persisted trigram count
    * table ([[kn3TrigramCounts]]; every other model table re-derives
    * from it, vocabulary-sized work). */
  def lmScoreKn3With(df: DataFrame, idCol: Column, textCol: Column,
      triCounts: DataFrame): DataFrame =
    scoreKn3(trigramOccurrences(df, idCol, textCol), triCounts)

  /** The persistable modified-KN model: the trigram count table
    * (u, v, w, _tc). Everything else derives from it. */
  def kn3TrigramCounts(occ: DataFrame): DataFrame =
    occ.filter(col("u") =!= "")
      .groupBy("u", "v", "w").agg(count(lit(1)).as("_tc"))

  /** [[kn3TrigramCounts]] straight from a document frame — the
    * per-batch maintainer form (counts are additive across batches). */
  def kn3TrigramCountsOf(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    kn3TrigramCounts(trigramOccurrences(df, idCol, textCol))

  /** (doc_id, u, v, w) per token position — u/v are '' (a value the
    * empty-dropping tokenizer can never emit) at doc-initial positions:
    * p=0 → ('', ''), p=1 → ('', tok₀). Map-side from the carried token
    * array, no window. */
  private def trigramOccurrences(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    Spread.forKernel(df.select(idCol.as("doc_id"), textCol.as("_t")))
      .select(col("doc_id"), tokens(col("_t")).as("_tk"))
      .select(col("doc_id"), col("_tk"),
        posexplode(col("_tk")).as(Seq("p", "w")))
      .withColumn("v",
        when(col("p") > 0, element_at(col("_tk"), col("p")))
          .otherwise(lit("")))
      .withColumn("u",
        when(col("p") > 1, element_at(col("_tk"), col("p") - 1))
          .otherwise(lit("")))
      .select(col("doc_id"), col("u"), col("v"), col("w"))

  /** Chen & Goodman's closed-form modified discounts from one order's
    * count-of-counts, clamped at 0 (Dk ≤ k holds by construction);
    * 3/4 fallback when the form is undefined. */
  private[graft] def modKnDiscounts(n1: Long, n2: Long, n3: Long,
      n4: Long): (Double, Double, Double) =
    if (n1 > 0 && n2 > 0 && n3 > 0) {
      val y = n1.toDouble / (n1 + 2 * n2).toDouble
      (math.max(1.0 - 2.0 * y * n2.toDouble / n1.toDouble, 0.0),
        math.max(2.0 - 3.0 * y * n3.toDouble / n2.toDouble, 0.0),
        math.max(3.0 - 4.0 * y * n4.toDouble / n3.toDouble, 0.0))
    } else (0.75, 0.75, 0.75)

  private def scoreKn3(occ: DataFrame, triRaw: DataFrame): DataFrame = {
    // SEVEN consumers derive from the trigram count table (bc, ctx3,
    // ctx2, n1r, two count-of-count scalar jobs, the scoring join) —
    // checkpoint it so the corpus is tokenized and count-shuffled ONCE;
    // everything downstream is vocabulary-sized (measured 45 → 2.5 s at
    // sf0.1 before/after)
    val tri = Dedup.checkpointed(triRaw)
    // continuation-bigram table: N1+(·vw) = #distinct u preceding (v,w)
    // — one vocabulary-sized regroup of the trigram TYPE table
    val bc = Dedup.checkpointed(
      tri.groupBy("v", "w").agg(count(lit(1)).as("_bc2")))
    // per-context stats at both orders: total mass + the count-of-count
    // buckets γ needs
    val ctx3 = tri.groupBy("u", "v").agg(sum("_tc").as("_cv3"),
      count(when(col("_tc") === 1, 1)).as("_n1c"),
      count(when(col("_tc") === 2, 1)).as("_n2c"),
      count(when(col("_tc") >= 3, 1)).as("_n3pc"))
    val ctx2 = bc.groupBy("v").agg(sum("_bc2").as("_cv2"),
      count(when(col("_bc2") === 1, 1)).as("_m1c"),
      count(when(col("_bc2") === 2, 1)).as("_m2c"),
      count(when(col("_bc2") >= 3, 1)).as("_m3pc"))
    val n1rT = bc.groupBy("w").agg(count(lit(1)).as("_n1r"))
    // driver scalars (the unigramProbs head() rule): count-of-counts
    // for the two discount triples + the bigram-type total
    val tRow = tri.agg(
      count(when(col("_tc") === 1, 1)), count(when(col("_tc") === 2, 1)),
      count(when(col("_tc") === 3, 1)), count(when(col("_tc") === 4, 1)))
      .head()
    val (d31, d32, d33) = modKnDiscounts(tRow.getLong(0), tRow.getLong(1),
      tRow.getLong(2), tRow.getLong(3))
    val bRow = bc.agg(count(lit(1)),
      count(when(col("_bc2") === 1, 1)), count(when(col("_bc2") === 2, 1)),
      count(when(col("_bc2") === 3, 1)), count(when(col("_bc2") === 4, 1)))
      .head()
    val btypes = bRow.getLong(0).toDouble
    val (d21, d22, d23) = modKnDiscounts(bRow.getLong(1), bRow.getLong(2),
      bRow.getLong(3), bRow.getLong(4))
    def dSel(c: Column, d1: Double, d2: Double, d3: Double): Column =
      when(c === 1, lit(d1)).when(c === 2, lit(d2)).otherwise(lit(d3))
    def gamma(d1: Double, n1: Column, d2: Double, n2: Column,
        d3: Double, n3p: Column, cv: Column): Column =
      (lit(d1) * n1.cast("double") + lit(d2) * n2.cast("double")
        + lit(d3) * n3p.cast("double")) / cv.cast("double")
    occ.join(n1rT, Seq("w"), "left")
      .withColumn("_pcont",
        if (btypes == 0.0) lit(0.0)
        else coalesce(col("_n1r"), lit(0L)).cast("double") / lit(btypes))
      .join(ctx2, Seq("v"), "left")
      .join(bc, Seq("v", "w"), "left")
      .withColumn("_p2",
        when(col("_cv2").isNull, col("_pcont"))
          .otherwise(
            coalesce(col("_bc2").cast("double")
                - dSel(col("_bc2"), d21, d22, d23), lit(0.0))
              / col("_cv2").cast("double")
              + gamma(d21, col("_m1c"), d22, col("_m2c"), d23,
                  col("_m3pc"), col("_cv2")) * col("_pcont")))
      .join(ctx3, Seq("u", "v"), "left")
      .join(tri, Seq("u", "v", "w"), "left")
      .withColumn("ps",
        when(col("u") === "" && col("v") === "", col("_pcont"))
          .when(col("u") === "", col("_p2"))
          .when(col("_cv3").isNull, col("_p2"))
          .otherwise(
            coalesce(col("_tc").cast("double")
                - dSel(col("_tc"), d31, d32, d33), lit(0.0))
              / col("_cv3").cast("double")
              + gamma(d31, col("_n1c"), d32, col("_n2c"), d33,
                  col("_n3pc"), col("_cv3")) * col("_p2")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sort_array(collect_list(
          struct(col("u"), col("v"), col("w"), col("ps")))).as("arr"))
      .withColumn("lm_score_kn3", floorRound6(
        aggregate(col("arr"), lit(0.0), (a, x) => a + x.getField("ps"))
          / col("n_tokens")))
      .select(col("doc_id"), col("n_tokens"), col("lm_score_kn3"))
  }

  /** Collocation mining by LIFT — the association statistic phrase /
    * multi-word-expression extraction ranks candidate bigrams with.
    * Lift is PMI's inside-the-log ratio kept RATIONAL (the no-ln oracle
    * rule): lift(w1,w2) = P(w1,w2) / (P(w1)·P(w2)) evaluated as the
    * fixed operation tree ((c12·T)/B·T)/(c1·c2) over exact long→double
    * casts, so both engines produce identical IEEE doubles and the
    * ranking hash-matches unrounded (log would only monotonely rescale
    * the order anyway). `minCount` suppresses the rare-pair noise PMI
    * is notorious for.
    *
    * Scale shape: bigram counts are one uniform shuffle with map-side
    * partials (the q_bpe_pairs shape); unigram counts join back on the
    * word key (shuffle join by design — a 100 TB vocabulary is not
    * broadcast-size); the final top-k is orderBy+limit =
    * TakeOrderedAndProject (bounded buffers, no global sort), and the
    * rank window runs over the k survivors only.
    * Output: (w1, w2, pair_cnt, lift, rn), rn 1-based. */
  def collocations(df: DataFrame, idCol: Column, textCol: Column,
                   minCount: Int = 5, topK: Int = 100): DataFrame = {
    val occ = bigramOccurrences(df, idCol, textCol)
    // ONE corpus count shuffle (the lmScore2 rule): totals, unigram
    // counts and pair counts all derive vocabulary-sized from the
    // checkpointed (prev, cur) table — the former formulation
    // re-tokenized the corpus once per aggregate (three passes + the
    // scalar job)
    val biAll = Dedup.checkpointed(
      occ.groupBy("prev", "cur").agg(count(lit(1)).as("_c")))
    val tot = biAll.agg(
      coalesce(sum("_c"), lit(0L)).as("t"),
      coalesce(sum(when(col("prev") =!= "", col("_c"))), lit(0L)).as("b"))
      .head()
    val tT = tot.getLong(0).toDouble
    val tB = tot.getLong(1).toDouble
    val uc = biAll.groupBy(col("cur").as("w"))
      .agg(sum("_c").as("c"))
    val bc = biAll.filter(col("prev") =!= "")
      .select(col("prev").as("w1"), col("cur").as("w2"),
        col("_c").as("pair_cnt"))
      .filter(col("pair_cnt") >= minCount)
    val scored = bc
      .join(uc.select(col("w").as("w1"), col("c").as("_c1")), "w1")
      .join(uc.select(col("w").as("w2"), col("c").as("_c2")), "w2")
      .select(col("w1"), col("w2"), col("pair_cnt"),
        ((col("pair_cnt").cast("double") * lit(tT) / lit(tB) * lit(tT)) /
          (col("_c1").cast("double") * col("_c2").cast("double")))
          .as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
    scored.withColumn("rn", row_number().over(
      Window.orderBy(col("lift").desc, col("w1"), col("w2"))))
  }

  /** Out-of-vocabulary rate against the corpus' own top-`vocabSize`
    * unigram vocabulary — the vocabulary-coverage signal (tokenizer /
    * corpus fit; a doc of mostly tail tokens is noise or the wrong
    * domain). The vocabulary is a DETERMINISTIC top-k
    * (count desc, term asc full tiebreak), taken with orderBy+limit —
    * TakeOrderedAndProject's bounded buffers, never a global vocab sort
    * — and is broadcast-size BY CONSTRUCTION (k rows), so the membership
    * join is map-side at any corpus size. oov_rate = oov/n is one exact
    * int/int double division — hash-matches unrounded.
    * Output: (doc_id, n_tokens, oov_cnt, oov_rate). */
  def oovRate(df: DataFrame, idCol: Column, textCol: Column,
              vocabSize: Int = 50): DataFrame = {
    // ONE corpus tokenize + count shuffle (the lmScore2 rule): the
    // (doc, term) count table feeds both the vocab top-k side and the
    // per-doc scoring regroup through ONE reused exchange — the former
    // formulation re-tokenized the corpus per consumer (no checkpoint
    // needed: both consumers live in one query execution)
    val dtc = bigramOccurrences(df, idCol, textCol)
      .groupBy(col("doc_id"), col("cur").as("term"))
      .agg(count(lit(1)).as("_c"))
    val vocab = dtc.groupBy("term").agg(sum("_c").as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(vocabSize)
      .select(col("term"), lit(1).as("_in"))
    dtc.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(sum("_c").as("n_tokens"),
        coalesce(sum(when(col("_in").isNull, col("_c"))), lit(0L))
          .as("oov_cnt"))
      .select(col("doc_id"), col("n_tokens"), col("oov_cnt"),
        (col("oov_cnt").cast("double") / col("n_tokens").cast("double"))
          .as("oov_rate"))
  }

  /** CCNet-style per-language quality buckets (Wenzek et al. 2020): rank
    * each language's documents by LM quality and cut into head / middle
    * / tail terciles. CCNet ranks by perplexity ascending; [[lmScore]]
    * is the inverse-direction stand-in (higher = more ordinary text),
    * so head = highest score. Bucket boundaries are RANK-based
    * (`rnk*3 <= n` integer arithmetic over a deterministic
    * (score desc, doc_id) order), not interpolated percentiles — exact
    * and cross-engine hashable, oracled as `q_ppl_buckets`. Languages
    * with fewer than 3 docs fall toward tail — the conservative bucket
    * for a keep/discard quality split.
    *
    * Scale shape: one window shuffle on lang. Real corpora are ~90%
    * one language, so at 100 TB the production form is CCNet's own:
    * tercile THRESHOLDS from a per-language sample (driver-sized,
    * broadcast) and a map-side bucket assign — no per-lang sort. The
    * windowed form here is the exact-oracle variant; both emit the
    * same schema. */
  def perplexityBuckets(df: DataFrame, idCol: Column, textCol: Column,
      langCol: Column): DataFrame = {
    val byLang = Window.partitionBy("lang")
      .orderBy(col("lm_score").desc, col("doc_id"))
    scoredWithLang(df, idCol, textCol, langCol)
      .withColumn("rnk", row_number().over(byLang))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("bucket",
        when(col("rnk") * 3 <= col("n"), "head")
          .when(col("rnk") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("lm_score"), col("bucket"))
  }

  /** (doc_id, lang, lm_score) — the shared scoring join of the two
    * bucket forms. */
  private def scoredWithLang(df: DataFrame, idCol: Column, textCol: Column,
      langCol: Column): DataFrame = {
    val lang = df.select(idCol.as("doc_id"),
      coalesce(langCol, lit("und")).as("lang"))
    lmScore(df, idCol, textCol).join(lang, "doc_id")
  }

  /** The 100 TB form of [[perplexityBuckets]] — CCNet's own: tercile
    * THRESHOLD scores from a deterministic per-language hash sample,
    * broadcast into a map-side score compare. The corpus is NEVER
    * sorted per language (real corpora are ~90% one language, so the
    * exact form's window would sort most of 100 TB in one partition
    * set); the only window runs over the sample. Differences from the
    * exact form, both inherent to thresholding: (a) sampling error at
    * the cut, (b) documents TIED with a threshold score stay in the
    * same bucket where rank cuts split them. Languages absent from the
    * sample (or with an empty head cut) fall to tail — the conservative
    * bucket. Deterministic (md5 sample, rank-cut thresholds), so the
    * whole path is DuckDB-replayable: oracled as
    * `q_ppl_buckets_sampled`. */
  def perplexityBucketsSampled(df: DataFrame, idCol: Column,
      textCol: Column, langCol: Column, rate: Double): DataFrame = {
    val scored = scoredWithLang(df, idCol, textCol, langCol)
    assignBuckets(scored, tercileCuts(scored, rate))
  }

  /** Per-language tercile threshold scores (lang, head_min, mid_min)
    * from a deterministic md5 hash sample of a scored
    * (doc_id, lang, lm_score) table — the window runs over the SAMPLE
    * only. The table is language-count-sized: persist it and new
    * batches bucket with zero corpus-global work
    * ([[graft.streaming.Streams.qualityBucketStream]]). */
  def tercileCuts(scored: DataFrame, rate: Double): DataFrame = {
    val byLang = Window.partitionBy("lang")
      .orderBy(col("lm_score").desc, col("doc_id"))
    scored
      .filter(graft.functions.TextFunctions.tokenHash16(
        col("doc_id").cast("string")) < lit((rate * 65536).toLong))
      .withColumn("rnk", row_number().over(byLang))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .groupBy("lang").agg(
        min(when(col("rnk") * 3 <= col("n"), col("lm_score")))
          .as("head_min"),
        min(when(col("rnk") * 3 <= col("n") * 2, col("lm_score")))
          .as("mid_min"))
  }

  /** Map-side bucket assign of a scored table under broadcast
    * thresholds; unknown languages (no cuts row) fall to tail. */
  def assignBuckets(scored: DataFrame, cuts: DataFrame): DataFrame =
    scored.join(broadcast(cuts), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("lm_score"),
        when(col("lm_score") >= col("head_min"), "head")
          .when(col("lm_score") >= col("mid_min"), "middle")
          .otherwise("tail").as("bucket"))
}
