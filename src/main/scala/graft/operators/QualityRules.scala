package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", appendix A — the rule family every
  * web-scale curation pipeline applies before model-based scoring),
  * adapted to whitespace corpora: word-count bounds, mean-word-length
  * bounds, minimum stopword fraction, maximum repeated-n-gram fraction.
  *
  * Every rule is INTEGER arithmetic (cross-multiplied thresholds —
  * `n_chars >= minMeanLen * n_words`, `100 * n_stop >= minStopPct *
  * n_words`, `repPctMax * n_grams >= 100 * n_dup_grams`), so the flags
  * are exactly reproducible by any engine: no float ratio ever crosses
  * a threshold boundary. The shingle counts ride the native
  * [[graft.plans.HashedShingles]] kernel (whole-stage codegen; an
  * internal-only hash — a 64-bit collision would under-count dups by
  * one, the same exposure q_text_repetition already documents).
  *
  * Scale shape: entirely map-side over a [[Spread.forKernel]]-widened
  * scan — no shuffle at any corpus size; the filter is a scan-adjacent
  * projection a 1000-executor cluster runs embarrassingly parallel.
  */
object QualityRules {
  /** The tiny function-word list the stopword rule counts (Gopher uses
    * "must contain ≥2 of a small stop list"; the fraction form below
    * generalizes it to length-robust). */
  val stopWords: Seq[String] = Seq(
    "the", "a", "of", "to", "and", "in", "is", "it", "that", "for")

  /** Per-document rule flags (1/0 ints, not booleans — identical
    * physical value under both engines' parquet/pandas paths) plus the
    * integer counts each rule compares, and `keep` = AND of all flags.
    *
    * Defaults bind non-trivially on the synthetic corpus (word floor
    * catches the short tail, stopword floor the function-word-free
    * docs, repetition cap the template-heavy ones). */
  def gopherFlags(df: DataFrame, idCol: Column, textCol: Column,
                  minWords: Int = 30, maxWords: Int = 10000,
                  minMeanLen: Int = 3, maxMeanLen: Int = 10,
                  minStopPct: Int = 3, maxRepPct: Int = 5,
                  shingleN: Int = 3): DataFrame = {
    val staged = Spread.forKernel(
        df.select(idCol.as("doc_id"), textCol.as("_t")))
      .withColumn("_tk", tokens(col("_t")))
      .withColumn("_sh",
        graft.plans.HashedShingles.shingleHashes(col("_t"), shingleN, 8))
      .select(col("doc_id"),
        size(col("_tk")).cast("long").as("n_words"),
        aggregate(col("_tk"), lit(0L), (a, t) => a + length(t))
          .as("n_chars"),
        size(filter(col("_tk"), t => t.isInCollection(stopWords)))
          .cast("long").as("n_stop"),
        size(col("_sh")).cast("long").as("n_grams"),
        (size(col("_sh")) - size(array_distinct(col("_sh"))))
          .cast("long").as("n_dup_grams"))
    val f = Map(
      "flag_words" ->
        (col("n_words") >= minWords && col("n_words") <= maxWords),
      "flag_mean_len" ->
        (col("n_chars") >= lit(minMeanLen.toLong) * col("n_words") &&
          col("n_chars") <= lit(maxMeanLen.toLong) * col("n_words")),
      "flag_stop" ->
        (lit(100L) * col("n_stop") >= lit(minStopPct.toLong) * col("n_words")),
      "flag_rep" ->
        (lit(maxRepPct.toLong) * col("n_grams") >=
          lit(100L) * col("n_dup_grams")))
    f.foldLeft(staged) { case (d, (name, cond)) =>
        d.withColumn(name, cond.cast("int"))
      }
      .withColumn("keep",
        f.keys.toSeq.sorted.map(col).reduce(_ * _))
  }

  /** Gopher repetition-signal suite (Rae et al. 2021 appendix A1's
    * "repetitious text" measures — the graded companions to
    * [[gopherFlags]]'s binary repetition cap): per document,
    *  - `top_2gram_char_frac` / `top_3gram_char_frac`: characters inside
    *    the single most frequent word n-gram — occurrences × the gram's
    *    token chars — over the doc's total token chars;
    *  - `dup_5gram_char_frac`: characters inside ANY 5-gram occurring
    *    more than once, overlapping occurrences counted ONCE via
    *    token-position coverage (the removeDuplicateSpans coverage
    *    math, measured instead of excised).
    * The char base is TOKEN characters (whitespace excluded) on both
    * engines; every fraction is one exact int/int double division, so
    * the output hash-matches without rounding. Top-gram fractions are
    * UNCLAMPED (overlapping occurrences each count the full gram — the
    * Dolma/NeMo-Curator convention), so degenerate loop-text can score
    * above 1; the coverage-based dup_5gram fraction is always ≤ 1.
    *
    * Scale shape: every aggregate is grouped by the document, so the
    * whole measure is a pure per-document function — ONE
    * [[graft.plans.GopherRepStats]] kernel call per row (whole-stage
    * codegen), zero shuffles, scan-speed at any corpus size. The
    * explode over the kernel's 0/1-element array reproduces the
    * zero-token-document drop of the former join formulation (kept as
    * [[gopherRepetitionWindowed]], parity-asserted in SamplingSpec).
    * Fractions stay exact int/int divisions of the kernel's integer
    * products, so the hash contract is unchanged. */
  def gopherRepetition(df: DataFrame, idCol: Column,
                       textCol: Column): DataFrame =
    Spread.forKernel(df.select(idCol.as("doc_id"), textCol.as("_t")))
      .select(col("doc_id"),
        explode(graft.plans.GopherRepStats.repStats(col("_t"))).as("st"))
      .select(col("doc_id"),
        col("st.total_chars").as("n_token_chars"),
        (col("st.top2").cast("double") /
          col("st.total_chars").cast("double")).as("top_2gram_char_frac"),
        (col("st.top3").cast("double") /
          col("st.total_chars").cast("double")).as("top_3gram_char_frac"),
        (col("st.dup5").cast("double") /
          col("st.total_chars").cast("double")).as("dup_5gram_char_frac"))

  /** The former window/shuffle formulation of [[gopherRepetition]] —
    * one doc-partitioned lead-window pass per gram grain, a
    * (doc, n, hash) count shuffle, a doc regroup and a tokenizing join
    * back. Kept as the declarative reference the native kernel is
    * parity-tested against (the [[graft.plans.HashedShingles]]
    * contract pattern); not on any declared query path. */
  private[graft] def gopherRepetitionWindowed(df: DataFrame, idCol: Column,
                       textCol: Column): DataFrame = {
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
    def toksOf(d: DataFrame) = Spread.forKernel(
        d.select(idCol.as("doc_id"), textCol.as("_t")))
      .select(col("doc_id"), tokens(col("_t")).as("tk"))
    val ex = toksOf(df)
      .select(col("doc_id"), size(col("tk")).as("sz"),
        posexplode(col("tk")).as(Seq("p", "t")))
    // window expressions must be TOP-LEVEL projections (they can't nest
    // inside the filter/explode HOFs below) — one window pass, 4 leads
    val withLeads = ex.select(
      (Seq(col("doc_id"), col("sz"), col("p"), col("t")) ++
        (1 to 4).map(j => lead(col("t"), j).over(byPos).as(s"l$j"))): _*)
    def entry(n: Int) = {
      val parts = col("t") +: (1 until n).map(j => col(s"l$j"))
      struct(lit(n).as("n"),
        xxhash64(concat_ws(" ", parts: _*)).as("gh"),
        parts.map(length(_).cast("long")).reduce(_ + _).as("glen"))
    }
    // per position: one entry per gram grain, kept only where the gram
    // still FITS the doc (p is 0-based; an n-gram needs p <= sz - n).
    // explode-then-WHERE, not a filter() HOF inside the generator: the
    // lambda would run interpreted per position (the interpreted-HOF
    // trap), where Generate + Filter stay in whole-stage codegen.
    val grams = withLeads
      .select(col("doc_id"), col("p"), col("sz"),
        explode(array(entry(1), entry(2), entry(3), entry(5))).as("e"))
      .where(col("p") <= col("sz") - col("e.n"))
      .select(col("doc_id"), col("p"), col("e.n").as("n"),
        col("e.gh").as("gh"), col("e.glen").as("glen"))
    val perGram = grams.groupBy("doc_id", "n", "gh")
      .agg(count(lit(1)).as("c"), max(col("glen")).as("glen"),
        collect_list(when(col("n") === 5, col("p"))).as("ps"))
    // MOST FREQUENT gram (max count), ties broken by max glen — among
    // count-tied grams the emitted product c×glen is then fully
    // determined, so both engines agree without sharing a hash function.
    // (max over a struct is lexicographic on both Spark and DuckDB.)
    def topOf(n: Int) = {
      val t = max(when(col("n") === n, struct(col("c"), col("glen"))))
      t.getField("c") * t.getField("glen")
    }
    val perDoc = perGram.groupBy("doc_id").agg(
      // Σ over distinct tokens of count×len = total token chars
      sum(when(col("n") === 1, col("c") * col("glen"))).as("total_chars"),
      topOf(2).as("top2"),
      topOf(3).as("top3"),
      flatten(collect_list(when(col("n") === 5 && col("c") >= 2, col("ps"))))
        .as("starts"))
    toksOf(df).join(perDoc, Seq("doc_id"))
      .withColumn("dup5_chars",
        coalesce(aggregate(expr("sequence(0, size(tk) - 1)"), lit(0L),
          (acc, pp) => acc + when(
            exists(col("starts"), s => s <= pp && pp < s + lit(5)),
            length(element_at(col("tk"), pp + 1)).cast("long"))
            .otherwise(lit(0L))), lit(0L)))
      .select(col("doc_id"),
        col("total_chars").cast("long").as("n_token_chars"),
        coalesce(col("top2").cast("double") /
          col("total_chars").cast("double"), lit(0.0))
          .as("top_2gram_char_frac"),
        coalesce(col("top3").cast("double") /
          col("total_chars").cast("double"), lit(0.0))
          .as("top_3gram_char_frac"),
        (col("dup5_chars").cast("double") /
          col("total_chars").cast("double")).as("dup_5gram_char_frac"))
  }

  // ---- model-based quality classifier (fastText-style) ---------------

  /** Weight vector of a hashed linear quality classifier, derived from
    * labeled anchor-token lists (the fastText bag-of-hashed-words model
    * with a one-step centroid fit): each clean-anchor token adds +1 to
    * its feature-hash bucket, each junk-anchor token −1. The hash is the
    * [[graft.plans.FeatureHashEmbed]] bucket function (first 16 md5
    * bits mod `dim`), so the weights live in the SAME feature space the
    * scorer hashes documents into, and the derivation replays in SQL.
    * Driver-sized (a literal array) — the DCLM/FineWeb deployment shape,
    * where training is offline and the engine ships the weights. */
  def anchorWeights(dim: Int, clean: Seq[String],
      junk: Seq[String]): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(t: String): Int = {
      md.reset()
      val d = md.digest(
        t.toLowerCase.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % dim
    }
    val w = new Array[Double](dim)
    clean.foreach(t => w(bucket(t)) += 1.0)
    junk.foreach(t => w(bucket(t)) -= 1.0)
    w.toSeq
  }

  /** Classifier logit: w · φ(text), with φ the L2-normalized
    * feature-hash embedding (native kernel). Sigmoid is MONOTONE, so
    * p > 0.5 ⟺ logit > 0 — the classification threshold is the exact
    * rational 0, never a libm sigmoid (the no-transcendentals rule).
    * The dot is a left fold in bucket order seeded at 0.0 with a final
    * `+ 0.0` (canonicalizes a possible −0.0 from zero-feature ×
    * negative-weight products identically in both engines). Map-side
    * only — one codegen'd kernel pass plus a dim-bounded fold per row,
    * no shuffle, no state. */
  def classifierLogit(textCol: Column, dim: Int,
      weights: Seq[Double]): Column = {
    require(weights.length == dim, s"need $dim weights, got ${weights.length}")
    val emb = graft.functions.VectorFunctions.featureHashEmbeddingD(
      textCol, dim)
    aggregate(zip_with(emb, typedLit(weights), (x, w) => x * w),
      lit(0.0), (acc, v) => acc + v) + lit(0.0)
  }
}
