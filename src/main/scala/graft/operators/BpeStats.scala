package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Tokenizer-training support: the distributed half of BPE training.
  *
  * Classic BPE (Sennrich et al. 2016) alternates (a) count adjacent
  * symbol pairs across the corpus, (b) merge the top pair. Step (a) is
  * the only corpus-scale stage, and the standard trick makes it
  * vocabulary-bounded: count WORDS once (one corpus-sized shuffle on a
  * whitespace pre-tokenization, map-side partial counts), then emit
  * each distinct word's adjacent character pairs weighted by its count.
  * After the word-count shuffle every later stage is sized by the
  * vocabulary (distinct words), not the corpus — at 100 TB the vocab is
  * millions of rows where the corpus is billions, and the pair
  * aggregation output is alphabet²-bounded. Top-k via
  * `orderBy(...).limit(k)` → TakeOrderedAndProject (k×partitions rows
  * move, no global sort).
  *
  * Iteration 1 counts character pairs (symbols = single characters);
  * later iterations would re-segment the vocab by the merge table — a
  * driver-sized broadcast, same shuffle shape per round.
  * `substring`/`length` are character-based in both Spark and DuckDB,
  * so multi-byte text (the corpus' Korean/Chinese docs) hashes
  * identically cross-engine — oracled as `q_bpe_pairs`.
  */
object BpeStats {

  /** Word-frequency table: one shuffle, map-side combine. */
  def wordCounts(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(tokens(textCol)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcnt"))

  /** Top-k adjacent character pairs, weighted by word frequency.
    * The pair stage runs over the distinct-word table only. */
  def bpePairCounts(df: DataFrame, textCol: Column, k: Int): DataFrame =
    wordCounts(df, textCol)
      .where(length(col("word")) >= 2)
      .select(
        explode(expr(
          "transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))"))
          .as("pair"),
        col("wcnt"))
      .groupBy("pair").agg(sum("wcnt").as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
}
