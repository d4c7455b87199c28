package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Unigram-LM (SentencePiece-style) tokenizer — the third tokenizer
  * family beside BPE ([[BpeStats.trainMerges]]) and WordPiece
  * ([[BpeStats.wordpieceTokens]]), the scheme of the T5/Llama lineage
  * (Kudo 2018, "Subword Regularization"). Where BPE GROWS a vocabulary
  * bottom-up by merging, unigram-LM SHRINKS one top-down: seed a large
  * candidate set, segment the corpus under the current scores (Viterbi),
  * re-estimate each unit's score from its segmentation usage (the EM
  * step), prune the lowest-value units, repeat.
  *
  * Exact-arithmetic formulation (the engine's no-transcendentals rule —
  * the q_tfidf_top_terms N/df precedent): real SentencePiece maximizes
  * Σ log p(unit), a libm expression that can never hash-match across
  * engines. This implementation's Viterbi objective is the integer
  * lexicographic order (fewest units, then highest score sum, then the
  * shortest winning unit) — the log-likelihood argmax's behavior in the
  * regime where token count dominates, with every comparison exact and
  * the whole loop replayable as a DuckDB CTE chain. EM scores are plain
  * usage counts (expected counts under the 1-best segmentation — "hard
  * EM"), again integers.
  *
  * Scale shape (the [[BpeStats]] contract): the corpus is touched
  * exactly twice — once by the word-count shuffle at train time, once by
  * the per-document join at encode time. Everything between is sized by
  * the DISTINCT-word vocabulary: the Viterbi fold is one column
  * expression over the word table (`MaxWordChars` bounded steps), usage
  * re-estimation is a vocabulary-sized aggregation, and the trained
  * vocab is a driver-sized literal (the centroids/codebook collect
  * contract). Nothing is quadratic; nothing iterates over the corpus.
  */
object UnigramLm {

  /** Words longer than this are not segmented: excluded from training,
    * encoded as one UNK token (the WordPiece max_input_chars_per_word
    * convention). Also the unrolled length of the Viterbi fold. */
  val MaxWordChars = 16

  /** Longest candidate unit. Bounds the per-position Viterbi band and
    * the seed substring enumeration. */
  val MaxUnitChars = 4

  private val Unreachable = 999999

  /** Word-frequency table over segmentable words: one corpus shuffle,
    * map-side combine (the [[BpeStats.wordCounts]] recipe). */
  def wordCounts(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))
      .where(length(col("word")) <= MaxWordChars)

  /** Seed candidates: every substring of length 1..[[MaxUnitChars]] of
    * the distinct-word table, scored by frequency-weighted occurrence
    * count. Vocabulary-sized input, ≤ |word|×[[MaxUnitChars]] rows per
    * distinct word — never corpus-scale. */
  def substringCounts(words: DataFrame): DataFrame =
    words
      .select(col("word"), col("wcnt"),
        explode(sequence(lit(1), length(col("word")))).as("i"))
      .select(col("word"), col("wcnt"), col("i"),
        explode(sequence(lit(1), lit(MaxUnitChars))).as("l"))
      .where(col("i") + col("l") - 1 <= length(col("word")))
      .select(col("word").substr(col("i"), col("l")).as("unit"),
        col("wcnt"))
      .groupBy("unit").agg(sum("wcnt").as("score"))

  /** The Viterbi dp over one word as a single fold expression: dp index
    * i (1-based) holds the best segmentation of the length-(i−1) prefix
    * as (ntok, negssum, units). Candidates at each position are the ≤
    * [[MaxUnitChars]] vocab units ending there; the winner is
    * `array_min` over (ntok, negssum, l) structs — fewest units, then
    * highest score sum (negated for min), then shortest unit: a total
    * order, so both engines pick the identical path. Single characters
    * of every corpus word are always in the vocab (never pruned), so
    * every position is reachable. Vocab membership + score fetch is one
    * [[graft.plans.VocabScore]] hash lookup (NULL ⇔ absent) — O(1) per
    * candidate where the round-12 `array_contains`/`array_position`
    * pair scanned the vocab array linearly, the wrong shape at a real
    * 32k SentencePiece vocabulary. */
  private def viterbiDp(word: Column, units: Seq[String],
      scores: Seq[Long]): Column = {
    def unitScore(u: Column): Column =
      graft.plans.VocabScore.vocabScore(u, units, scores)
    val L = length(word)
    val emptyUnits = array().cast("array<string>")
    val init = array(struct(lit(0).as("ntok"), lit(0L).as("negssum"),
      emptyUnits.as("units")))
    aggregate(sequence(lit(1), lit(MaxWordChars)), init, (dp, k) => {
      val cands = filter(transform(sequence(lit(1), lit(MaxUnitChars)),
        l => {
          val u = word.substr(k - l + 1, l)
          val sc = unitScore(u)
          when(l <= k && k <= L && sc.isNotNull, {
            val prev = element_at(dp, k - l + 1)
            struct(
              (prev.getField("ntok") + 1).as("ntok"),
              (prev.getField("negssum") - sc).as("negssum"),
              l.as("l"))
          }).otherwise(lit(null))
        }), c => c.isNotNull)
      val best = array_min(cands)
      val bl = best.getField("l")
      val entry = when(k > L || best.isNull,
          struct(lit(Unreachable).as("ntok"), lit(0L).as("negssum"),
            emptyUnits.as("units")))
        .otherwise(struct(
          best.getField("ntok").as("ntok"),
          best.getField("negssum").as("negssum"),
          concat(element_at(dp, k - bl + 1).getField("units"),
            array(word.substr(k - bl + 1, bl))).as("units")))
      concat(dp, array(entry))
    })
  }

  /** [[viterbiDp]] without the `units` path arrays: dp entries carry only
    * (ntok, negssum), so each position appends a 2-field struct instead
    * of copying a growing string array — the ENCODE-path variant, where
    * only the token COUNT is consumed ([[unigramTokens]]). Identical
    * candidate comparison (the (ntok, negssum, l) total order — the
    * units field never participates in it), so ntok values match
    * [[viterbiDp]]'s exactly (walls in BASELINE.md's unigramscale row). */
  private def viterbiNtokDp(word: Column, units: Seq[String],
      scores: Seq[Long]): Column = {
    def unitScore(u: Column): Column =
      graft.plans.VocabScore.vocabScore(u, units, scores)
    val L = length(word)
    val init = array(struct(lit(0).as("ntok"), lit(0L).as("negssum")))
    aggregate(sequence(lit(1), lit(MaxWordChars)), init, (dp, k) => {
      val cands = filter(transform(sequence(lit(1), lit(MaxUnitChars)),
        l => {
          val u = word.substr(k - l + 1, l)
          val sc = unitScore(u)
          when(l <= k && k <= L && sc.isNotNull, {
            val prev = element_at(dp, k - l + 1)
            struct(
              (prev.getField("ntok") + 1).as("ntok"),
              (prev.getField("negssum") - sc).as("negssum"),
              l.as("l"))
          }).otherwise(lit(null))
        }), c => c.isNotNull)
      val best = array_min(cands)
      val entry = when(k > L || best.isNull,
          struct(lit(Unreachable).as("ntok"), lit(0L).as("negssum")))
        .otherwise(struct(
          best.getField("ntok").as("ntok"),
          best.getField("negssum").as("negssum")))
      concat(dp, array(entry))
    })
  }

  /** Segment the distinct-word table under a scored vocab: (word, wcnt,
    * units, ntok) — the Viterbi path's units with multiplicity. */
  def segmentWords(words: DataFrame, vocab: Seq[(String, Long)]): DataFrame = {
    val dp = viterbiDp(col("word"), vocab.map(_._1), vocab.map(_._2))
    words.select(col("word"), col("wcnt"),
      element_at(dp, length(col("word")) + 1).as("e"))
      .select(col("word"), col("wcnt"),
        col("e.units").as("units"), col("e.ntok").as("ntok"))
  }

  /** Per-unit usage under the 1-best segmentation (the hard-EM expected
    * count): Σ wcnt × path multiplicity. Vocabulary-sized. */
  def segmentedUsage(words: DataFrame,
      vocab: Seq[(String, Long)]): DataFrame =
    segmentWords(words, vocab)
      .select(explode(col("units")).as("unit"), col("wcnt"))
      .groupBy("unit").agg(sum("wcnt").as("usage"))

  /** Train: seed (all chars + top-`nMulti` multi-char substrings by
    * weighted occurrence), one Viterbi+usage round, prune the multi-char
    * set to `keepMulti` by (usage desc, unit) — characters are NEVER
    * pruned, guaranteeing coverage — re-score everything by usage (the
    * M step), then run `emRounds − 1` further segment-and-rescore
    * rounds over the pruned vocab and return it with its final usage.
    * The default `emRounds = 2` is the declared-key behavior (one
    * post-prune round, the shape the oracle CTE chain replays); real
    * SentencePiece runs a handful — each extra round is one more
    * vocabulary-sized job, nothing corpus-scale. Eager at call time
    * (vocabulary-sized jobs + driver-sized collects — the
    * [[BpeStats.trainMerges]] precedent); deterministic throughout, so
    * session caching cannot change results. */
  def trainUnigram(df: DataFrame, textCol: Column, nMulti: Int = 60,
      keepMulti: Int = 40, emRounds: Int = 2): Seq[(String, Long)] = {
    require(emRounds >= 2,
      s"emRounds must be >= 2 (seed round + post-prune round), got $emRounds")
    val words = wordCounts(df, textCol).persist()
    try {
      val subs = substringCounts(words).persist()
      val chars = subs.where(length(col("unit")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val multi = subs.where(length(col("unit")) >= 2)
        .orderBy(col("score").desc, col("unit")).limit(nMulti)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      subs.unpersist()
      val v1 = chars ++ multi
      val usage1 = segmentedUsage(words, v1)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val keptMulti = multi.map { case (u, _) => (u, usage1.getOrElse(u, 0L)) }
        .sortBy { case (u, c) => (-c, u) }.take(keepMulti)
      var vocab = chars.map { case (u, _) => (u, usage1.getOrElse(u, 0L)) } ++
        keptMulti
      var round = 1
      while (round < emRounds) {
        val usage = segmentedUsage(words, vocab)
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        vocab = vocab.map { case (u, _) => (u, usage.getOrElse(u, 0L)) }
        round += 1
      }
      vocab
    } finally words.unpersist()
  }

  /** Encode under a trained vocab: Viterbi token counts fold over the
    * DISTINCT word table only (zero extra corpus passes), then join
    * counts back per document — corpus × vocab hash join, nothing
    * quadratic (the [[BpeStats.bpeTokens]] contract). Words over
    * [[MaxWordChars]] count as one UNK token. Output: (doc_id,
    * n_ug_tokens, n_words). */
  def unigramTokens(df: DataFrame, idCol: Column, textCol: Column,
      vocab: Seq[(String, Long)]): DataFrame = {
    val dp = viterbiNtokDp(col("word"), vocab.map(_._1), vocab.map(_._2))
    val wordTok = df.select(explode(tokens(textCol)).as("word")).distinct()
      .select(col("word"),
        when(length(col("word")) > MaxWordChars, lit(1))
          .otherwise(
            element_at(dp, length(col("word")) + 1).getField("ntok"))
          .as("wtok"))
    df.select(idCol.as("doc_id"), explode(tokens(textCol)).as("word"))
      .join(wordTok, "word")
      .groupBy("doc_id")
      .agg(sum("wtok").as("n_ug_tokens"), count(lit(1)).as("n_words"))
  }
}
