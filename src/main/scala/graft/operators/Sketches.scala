package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokenHash32

/** Mergeable sketches as custom Aggregators.
  *
  * KMV (k-minimum-values) distinct-count sketch: keep the k smallest
  * distinct md5-derived 32-bit hashes per group; estimate
  * `(k−1) · 2³² / kth_min` once k values are held, exact count below
  * that. Unlike HLL implementations, this sketch is DETERMINISTIC for a
  * given hash function — the estimate is a pure function of the input
  * set, so the DuckDB oracle reproduces it bit-for-bit — while keeping
  * the property that matters at 100 TB: states are tiny (≤ k longs) and
  * merge associatively, so map-side partial aggregation does almost all
  * of the work and the shuffle carries sketches, not keys.
  */
object Sketches {

  /** Session-independent aggregator (TypeTag encoders, top-level class) —
    * see TopK.TopKAgg for why anonymous implicits-based aggregators are a
    * serialization hazard. */
  private class KmvAgg(k: Int)
      extends Aggregator[(String, Long), Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Seq.empty
    // b stays sorted by construction: a full sketch rejects values ≥ its
    // max in O(1), so the O(k log k) re-sort only runs while the value
    // actually enters — not once per input row
    def reduce(b: Seq[Long], a: (String, Long)): Seq[Long] =
      if (b.length >= k && a._2 >= b.last) b
      else if (b.contains(a._2)) b
      else (b :+ a._2).sorted.take(k)
    def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
      (b1 ++ b2).distinct.sorted.take(k)
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Deterministic KMV distinct estimate per group.
    * Input df must expose `groupCol` and `hashCol` (long in [0, 2³²));
    * output: (groupCol, n_sketch, est). */
  def kmvDistinct(spark: SparkSession, df: DataFrame, groupCol: String,
                  hashCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val agg = new KmvAgg(k)
    df.select(col(groupCol).cast("string"), col(hashCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("mins"))
      .toDF(groupCol, "mins")
      .select(col(groupCol), size(col("mins")).as("n_sketch"),
        when(size(col("mins")) < k,
          size(col("mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble * 4294967296.0) /
            element_at(col("mins"), k))
          .as("est"))
  }

  /** Convenience: KMV estimate of distinct `keyCol` values per group,
    * hashing with the engine-portable md5-derived 32-bit hash. */
  def kmvDistinctOf(spark: SparkSession, df: DataFrame, groupCol: String,
                    keyCol: String, k: Int): DataFrame =
    kmvDistinct(spark,
      df.withColumn("_h", tokenHash32(col(keyCol).cast("string"))),
      groupCol, "_h", k)
}
