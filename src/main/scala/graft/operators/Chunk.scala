package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Document chunking: overlapping token windows — the shaping step that
  * turns raw documents into model-sized training/retrieval pieces
  * (context-window packing's upstream sibling; see
  * `q_pack_token_budget` for the downstream packing).
  *
  * Shape: tokenize once per doc (map-side), explode one row per window
  * start (starts = 0, stride, 2·stride, … < n_tokens), slice the token
  * array per window. No shuffle at all — the operator is a generator
  * over the scan, and at 100 TB output size is the only cost:
  * ~n/stride × chunkTokens tokens per doc (overlap factor
  * chunkTokens/stride). Deterministic, so fully oracle-checkable
  * (q_chunk_tokens).
  *
  * Windows at the tail are shorter than `chunkTokens` (the standard
  * sliding-window convention: every token appears in ≥1 chunk; the
  * final partial windows are kept, dedup/packing decides downstream).
  * Zero-token docs produce zero chunks. */
object Chunk {

  def chunkByTokens(df: DataFrame, idCol: Column, textCol: Column,
                    chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0,
      s"chunkTokens ($chunkTokens) and stride ($stride) must be positive")
    df.select(idCol.as("doc_id"), tokens(textCol).as("_tk"))
      .withColumn("_n", size(col("_tk")))
      .filter(col("_n") > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), col("_n") - 1, lit(stride)),
          s => slice(col("_tk"), s + 1, lit(chunkTokens))))
          .as(Seq("chunk_idx", "_chunk")))
      .select(col("doc_id"), col("chunk_idx"),
        array_join(col("_chunk"), " ").as("chunk_text"),
        size(col("_chunk")).as("n_tokens"))
  }
}
