package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenHash16

/** Dataset-shaping operators for training-data pipelines: deterministic
  * sampling and token-budget shard packing.
  *
  * Both are hash/window dataflow — reproducible on any cluster layout
  * (no `rand()`, no partition-order dependence), which is what makes a
  * 100 TB sample auditable: the same inputs always select the same rows.
  */
object Sampling {

  /** Deterministic uniform sample: keep rows whose md5-derived key hash
    * lands under `rate`·2^16. Map-side only — no shuffle, prunes at the
    * scan when the key is a stored column. */
  def hashSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame =
    df.filter(tokenHash16(keyCol.cast("string")) < lit((rate * 65536).toLong))

  /** Deterministic stratified sample: first `perStratum` rows per stratum
    * in md5-hash order (hash order ≈ uniform random order, but stable).
    * One shuffle on the stratum key; rank via row_number so the output is
    * exactly `perStratum` per stratum regardless of skew. */
  def stratifiedSample(df: DataFrame, stratumCols: Seq[String],
                       keyCol: Column, perStratum: Int): DataFrame = {
    val w = Window.partitionBy(stratumCols.map(col): _*)
      .orderBy(md5(keyCol.cast("string")).asc, keyCol.asc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perStratum)
      .drop("rn")
  }

  /** Deterministic train/val/test split: the md5-derived key hash mod 100
    * buckets rows into named splits by percentage ranges. Map-side only,
    * reproducible on any layout, and stable under corpus growth (a row's
    * split never changes when other rows are added — the property random
    * splits lack). */
  def assignSplit(df: DataFrame, keyCol: Column,
                  valPct: Int = 10, testPct: Int = 10): DataFrame = {
    val bucket = tokenHash16(keyCol.cast("string")) % 100
    df.withColumn("split",
      when(bucket < testPct, "test")
        .when(bucket < testPct + valPct, "val")
        .otherwise("train"))
  }

  /** Token-budget shard packing: within each `groupCol` stream (ordered by
    * `orderCol`), assign rows to consecutive bins so each bin holds about
    * `budget` tokens (a row that crosses the boundary opens the next bin).
    * The running sum and the bin id come from ONE window over ONE shuffle —
    * the standard way to cut a corpus into ~equal training shards without
    * a driver-side loop. */
  def packByTokenBudget(df: DataFrame, groupCol: Column, orderCol: Column,
                        tokenCountCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokenCountCol).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - tokenCountCol) / lit(budget)).cast("bigint"))
  }
}
