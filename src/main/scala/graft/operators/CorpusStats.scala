package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus/tokenizer diagnostics: lexical-diversity signals and the
  * vocabulary growth curve — the statistics a corpus release publishes
  * beside the curation funnel (vocabulary saturation tells you whether
  * more data still buys new types — the Heaps-law diagnostic; per-doc
  * diversity is a quality/gibberish signal complementary to the
  * repetition fractions in q_gopher_repetition).
  *
  * Everything is integer counts and single exact long/long double
  * divisions — hash-oracled with no float rule beyond fixed trees. */
object CorpusStats {

  /** Per-doc lexical diversity: type-token ratio and the Simpson
    * concentration index λ = Σ c_i² / n² (1/λ is the "effective
    * vocabulary size"; a one-word doc has λ = 1, maximally repetitive —
    * the RATIONAL stand-in for entropy, which needs log and is never
    * hash-matchable). Σ c_i² is an exact BIGINT, so both ratios are one
    * exact division each.
    *
    * Scale shape: one (doc, term) count shuffle + one per-doc regroup —
    * linear, the lm_score class.
    * Output: (doc_id, n_tokens, n_types, ttr, simpson). */
  def tokenDiversity(df: DataFrame, idCol: Column,
      textCol: Column): DataFrame =
    Spread.forKernel(df.select(idCol.as("doc_id"), textCol.as("_t")))
      .select(col("doc_id"), explode(tokens(col("_t"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("_sq"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        (col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        (col("_sq").cast("double")
          / (col("n_tokens") * col("n_tokens")).cast("double"))
          .as("simpson"))

  /** Vocabulary growth curve: cumulative distinct-TYPE count after each
    * doc-id decile of the corpus — the saturation diagnostic (new
    * types per decile ≈ 0 ⇒ the vocabulary has converged; Heaps' law
    * says it shouldn't on natural text). Types are word `n`-grams
    * (default 3): the unigram vocabulary of a template corpus saturates
    * in decile 1 and the curve degenerates to one row — the gram space
    * is where growth is observable (and what a tokenizer/dedup stage
    * actually consumes). Deciles cut the doc-ID RANGE (0..maxId), so
    * the curve is a pure function of the data, not of partitioning.
    *
    * Scale shape: grams via the native [[graft.plans.ShingleStrings]]
    * kernel — a scan projection (the former lead-window shingling paid
    * a posexplode + doc-partitioned window shuffle-and-sort for a pure
    * per-document function); each type's FIRST document is one
    * min-aggregate shuffle on the gram (map-side partials); the curve
    * itself is a 10-row frame.
    * Output: (decile 1..10, new_types, cum_types). */
  def vocabGrowth(df: DataFrame, idCol: Column, textCol: Column,
      n: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // driver scalar (the unigramProbs head() rule): the decile width.
    // max() is NULL on an empty frame (no deciles to cut — return the
    // empty curve) and the id may be int-typed — read via Number.
    val maxId = Option(df.agg(max(idCol.cast("long"))).head().get(0))
      .map(_.asInstanceOf[Long]) match {
      case Some(m) => m
      case None =>
        return Seq.empty[(Int, Long, Long)]
          .toDF("decile", "new_types", "cum_types")
    }
    val terms = Spread.forKernel(
        df.select(idCol.as("doc_id"), textCol.as("_t")))
      .select(col("doc_id"),
        explode(graft.plans.ShingleStrings.shingleStrings(col("_t"), n))
          .as("term"))
    val firstDoc = terms.groupBy("term").agg(min(col("doc_id")).as("fd"))
    // fd*10/(maxId+1) floored: the double quotient of two exact longs
    // sits ≥ 1/(maxId+1) below the next integer whenever the true
    // quotient is non-integral, far above ulp — floor() is exact and
    // equals the oracle's integer `//`
    val decile = least(lit(9L),
      floor(col("fd") * 10 / lit((maxId + 1).toDouble)).cast("long"))
      .cast("int") + 1
    firstDoc.groupBy(decile.as("decile"))
      .agg(count(lit(1)).as("new_types"))
      .withColumn("cum_types", sum(col("new_types")).over(
        Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
