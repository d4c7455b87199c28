package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** T5-style span-corruption PLANNING (Raffel et al. 2020 §3.1.4): the
  * training-example constructor that turns a clean document into a
  * (input-with-sentinels, target-spans) pair — ~15% of tokens corrupted
  * in spans of length 3, each span replaced by one sentinel token in
  * the input and emitted after its sentinel in the target.
  *
  * The paper samples spans randomly; a DISTRIBUTED pipeline needs the
  * plan to be a pure function of (doc, position) so re-runs, retries
  * and the two sides of a shuffle agree — the q_sample_hash rule. The
  * deterministic plan: positions are cut into blocks of `blockLen`
  * (20); block `b` of doc `d` corrupts the `spanLen` (3) positions
  * starting at offset h = md5₁₆("sc|d|b") mod (blockLen − spanLen + 1)
  * — spans never cross a block boundary, the corruption rate is
  * exactly spanLen/blockLen = 15% on full blocks, and the final
  * partial block clips (a span starting past the last token vanishes).
  * md5-prefix hashing (TextFunctions.tokenHash16) is the portable
  * cross-engine choice; the oracle replays it with nibble arithmetic.
  *
  * Output per doc: n_tokens, n_spans, n_corrupt, and the resulting
  * example sizes n_input_tokens = n − n_corrupt + n_spans (one
  * sentinel per span) and n_target_tokens = n_corrupt + n_spans —
  * the numbers a packing/budget stage (q_pack_token_budget,
  * q_train_shards) consumes downstream.
  *
  * Scale shape: entirely map-side — one aggregate fold over the
  * per-doc block list (n/blockLen elements, interpreted-HOF but
  * vocabulary-of-blocks sized per row); no shuffle, no explode. Pair
  * with a scan spread on 1-row-group sources (the declared query
  * does). */
object SpanCorrupt {

  def stats(df: DataFrame, idCol: Column, textCol: Column,
      blockLen: Int = 20, spanLen: Int = 3): DataFrame = {
    val nn = col("_n").cast("long")
    val nBlocks = floor((nn - 1) / lit(blockLen)).cast("long") + 1
    val hMod = blockLen - spanLen + 1
    def h(b: Column): Column =
      graft.functions.TextFunctions.tokenHash16(
        concat(lit("sc|"), col("doc_id").cast("string"),
          lit("|"), b.cast("string"))) % hMod
    def corrupt(b: Column): Column =
      greatest(lit(0L), least(lit(spanLen.toLong),
        nn - (b * blockLen + h(b))))
    val folded = aggregate(
      sequence(lit(0L), nBlocks - 1),
      struct(lit(0L).as("nc"), lit(0L).as("ns")),
      (st, b) => {
        val c = corrupt(b)
        struct((st.getField("nc") + c).as("nc"),
          (st.getField("ns") + when(c > 0, 1L).otherwise(0L)).as("ns"))
      })
    df.select(idCol.as("doc_id"), size(tokens(textCol)).as("_n"))
      .withColumn("_f", when(col("_n") > 0, folded)
        .otherwise(struct(lit(0L).as("nc"), lit(0L).as("ns"))))
      .select(col("doc_id"),
        col("_n").cast("long").as("n_tokens"),
        col("_f.ns").as("n_spans"),
        col("_f.nc").as("n_corrupt"),
        (col("_n") - col("_f.nc") + col("_f.ns")).as("n_input_tokens"),
        (col("_f.nc") + col("_f.ns")).as("n_target_tokens"))
  }
}
