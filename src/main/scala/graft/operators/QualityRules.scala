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
}
