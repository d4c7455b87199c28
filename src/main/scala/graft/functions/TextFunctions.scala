package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline extensions
  * (SURVEY.md §7.4): tokenization, language ID, quality scoring, document
  * fingerprinting. Everything is built from codegen'd `functions._`
  * primitives (no UDFs) so the whole pipeline stays inside whole-stage
  * codegen, and every formula is expressible 1:1 in the DuckDB oracle.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  /** Count of non-overlapping occurrences of literal `pat` in `text`. */
  def substrCount(text: Column, pat: String): Column =
    ((length(text) - length(replace(text, lit(pat), lit("")))) / pat.length)
      .cast("int")

  // --- language ID (n-gram / marker heuristic) -------------------------

  /** Marker sets per language; scores are summed substring counts. The
    * cascade prefers earlier languages on ties (deterministic). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " una "))

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => substrCount(text, m)).reduce(_ + _)

  /** CJK-codepoint count — the zh signal. */
  def cjkCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))

  /** Heuristic language ID over a padded, lowercased copy of the text.
    * zh wins on any CJK presence; otherwise highest marker score in
    * [[langMarkers]] order; all-zero → "und". */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = langMarkers.map { case (l, ms) => l -> langScore(padded, ms) }
    // `greatest` keeps the max as ONE node — a when(s > acc, s).otherwise(acc)
    // fold embeds the accumulator twice per step, which makes the expression
    // tree (and the generated code) grow exponentially in the language count.
    val best = greatest(scores.map(_._2): _*)
    val pick = scores.foldRight(lit("und")) { case ((l, s), el) =>
      when(s === best && s > 0, lit(l)).otherwise(el)
    }
    when(cjkCount(text) > 0, lit("zh")).otherwise(pick)
  }

  /** Staged language-ID: same result as [[langId]], 10× faster (measured).
    *
    * The single-expression form re-evaluates each marker score inside the
    * best/pick CASE branches — codegen's subexpression elimination skips
    * conditionally-executed branches, so the scores run ~6× each.
    * Materializing the score array in its OWN projection (CollapseProject
    * won't inline a non-cheap multi-referenced alias) makes each score
    * compute exactly once. */
  def withLangId(df: DataFrame, text: Column,
                 out: String = "pred_lang"): DataFrame = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scored = df.withColumn("_lid_sc",
      array(langMarkers.map { case (_, ms) => langScore(padded, ms) }: _*))
    val s = (i: Int) => element_at(col("_lid_sc"), i + 1)
    val best = greatest(langMarkers.indices.map(s): _*)
    val pick = langMarkers.map(_._1).zipWithIndex
      .foldRight(lit("und")) { case ((l, i), el) =>
        when(s(i) === best && s(i) > 0, lit(l)).otherwise(el)
      }
    scored
      .withColumn(out, when(cjkCount(text) > 0, lit("zh")).otherwise(pick))
      .drop("_lid_sc")
  }

  // --- quality scoring -------------------------------------------------

  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is")

  def stopwordCount(toks: Column): Column =
    size(filter(toks, t => array_contains(typedlit(stopwords), t)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))

  /** Composite quality score in [0,1], rounded to 4 — equal parts length,
    * low punctuation, stopword presence (fluency proxy), and mean token
    * length (gibberish proxy). Deterministic double math, same fold in
    * the oracle. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctRatio = punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val stopRatio = when(n > 0,
      stopwordCount(toks).cast("double") / n.cast("double")).otherwise(lit(0.0))
    val avgTokLen = when(n > 0,
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
        n.cast("double")).otherwise(lit(0.0))
    val score =
      lenScore * 0.25 + (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.25 +
        least(stopRatio * 5.0, lit(1.0)) * 0.25 +
        least(avgTokLen / 10.0, lit(1.0)) * 0.25
    // floor-based rounding: the 0.25-weights make exact x.xxxx5 values
    // common, where Spark's BigDecimal HALF_UP and DuckDB's multiply-round
    // disagree. floor(v*1e4+0.5) over the identical double is bit-stable.
    floor(score * 10000.0 + 0.5) / 10000.0
  }

  /** Staged [[qualityScore]]: tokenization materialized in its own
    * projection so the conditional ratio branches (excluded from codegen
    * subexpression elimination) don't re-tokenize — same staging win as
    * [[withLangId]]. Same result, spec-enforced. */
  def withQualityScore(df: DataFrame, text: Column,
                       out: String = "quality"): DataFrame =
    df.withColumn("_q_toks", tokens(text))
      .withColumn(out, {
        val toks = col("_q_toks")
        val n = size(toks)
        val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
        val punctRatio = punctCount(text).cast("double") /
          greatest(length(text).cast("double"), lit(1.0))
        val stopRatio = when(n > 0, stopwordCount(toks).cast("double") /
          n.cast("double")).otherwise(lit(0.0))
        val avgTokLen = when(n > 0,
          aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") /
            n.cast("double")).otherwise(lit(0.0))
        val score = lenScore * 0.25 +
          (lit(1.0) - least(punctRatio * 10.0, lit(1.0))) * 0.25 +
          least(stopRatio * 5.0, lit(1.0)) * 0.25 +
          least(avgTokLen / 10.0, lit(1.0)) * 0.25
        floor(score * 10000.0 + 0.5) / 10000.0
      })
      .drop("_q_toks")

  // --- token counting --------------------------------------------------

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: alnum runs (a stand-in for a real tokenizer's
    * pre-tokenization regex; the count is what budget pipelines need). */
  def tokenCountAlnum(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0)))

  // --- fingerprinting --------------------------------------------------

  /** First-16-bit integer of md5(t): first 4 hex digits → decimal. Portable —
    * the oracle spells the same value with strpos-based nibble arithmetic;
    * unlike murmur `hash()` this is engine-independent. */
  def tokenHash16(t: Column): Column =
    conv(substring(md5(t), 1, 4), 16, 10).cast("bigint")

  /** First-32-bit integer of md5(t) (8 hex digits) — the lower-collision
    * variant for set-intersection work where 16 bits would collide. */
  def tokenHash32(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("bigint")

  /** Rolling (polynomial) hash of the token stream, mod 1e9+7 — an
    * order-sensitive document fingerprint: same token sequence ⇒ same
    * fingerprint; any reorder/edit ⇒ different (w.h.p.). */
  def fingerprint(text: Column): Column =
    aggregate(
      graft.plans.HashedShingles.tokenHashes16(text),
      lit(0L),
      (acc, h) => (acc * 31 + h) % 1000000007L)
}
