package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
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

  /** KMV set-operation estimates between every PAIR of groups (Beyer et
    * al., SIGMOD 2007): from two k-min sketches alone — never the raw
    * sets — estimate |A ∪ B|, |A ∩ B| and Jaccard. Merged sketch = the
    * k smallest of the union of the two sketches (a valid KMV of
    * A ∪ B); ρ = members of the merged sketch present in BOTH input
    * sketches; est_intersect = (ρ/L)·est_union with L = |merged| ≤ k.
    * Everything is integer/list arithmetic over the sketches plus one
    * fixed double op tree, so the estimates are deterministic and
    * hash-oracled — the sketch-ALGEBRA half of q_sketch_kmv (sketches
    * of 100 TB partitions merge on the driver; the raw sets never
    * co-locate). Sketches are group-count-sized (tiny); the pair join
    * is groups², intended for bounded group domains (event types,
    * languages, sources). Output: (g1, g2, n_common, est_union,
    * est_intersect, est_jaccard), g1 < g2. */
  def kmvSetOps(spark: SparkSession, df: DataFrame, groupCol: String,
                keyCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val agg = new KmvAgg(k)
    val sk = df
      .withColumn("_h", tokenHash32(col(keyCol).cast("string")))
      .select(col(groupCol).cast("string"), col("_h").cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("mins"))
      .toDF("g", "mins")
    val a = sk.select(col("g").as("g1"), col("mins").as("ma"))
    val b = sk.select(col("g").as("g2"), col("mins").as("mb"))
    a.join(b, col("g1") < col("g2"))
      .withColumn("merged", expr(
        s"slice(array_sort(array_distinct(concat(ma, mb))), 1, $k)"))
      .withColumn("ll", size(col("merged")))
      .withColumn("n_common", expr(
        "size(filter(merged, m -> array_contains(ma, m)" +
          " AND array_contains(mb, m)))"))
      .withColumn("est_union",
        when(col("ll") < k, col("ll").cast("double"))
          .otherwise(lit((k - 1).toDouble * 4294967296.0) /
            element_at(col("merged"), k)))
      .withColumn("est_intersect",
        col("n_common").cast("double") / col("ll").cast("double") *
          col("est_union"))
      .withColumn("est_jaccard",
        col("n_common").cast("double") / col("ll").cast("double"))
      .select(col("g1"), col("g2"), col("n_common").cast("long"),
        col("est_union"), col("est_intersect"), col("est_jaccard"))
  }

  /** (hash, id, value) — ordered by (hash, id) so the sample is a pure
    * function of the input SET. */
  private class QuantileSampleAgg(k: Int)
      extends Aggregator[(String, Long, Long, Double),
        Seq[(Long, Long, Double)], Seq[(Long, Long, Double)]] {
    private def trim(s: Seq[(Long, Long, Double)]) =
      s.sortBy(t => (t._1, t._2)).take(k)
    def zero: Seq[(Long, Long, Double)] = Seq.empty
    def reduce(b: Seq[(Long, Long, Double)], a: (String, Long, Long, Double))
        : Seq[(Long, Long, Double)] = {
      val rejected = b.length >= k && {
        val l = b.last
        a._2 > l._1 || (a._2 == l._1 && a._3 >= l._2)
      }
      if (rejected) b else trim(b :+ ((a._2, a._3, a._4)))
    }
    def merge(b1: Seq[(Long, Long, Double)], b2: Seq[(Long, Long, Double)])
        : Seq[(Long, Long, Double)] = trim(b1 ++ b2)
    def finish(r: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] = r
    def bufferEncoder: Encoder[Seq[(Long, Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Long, Double)]]()
    def outputEncoder: Encoder[Seq[(Long, Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Long, Double)]]()
  }

  /** Deterministic mergeable quantile sketch: the k rows with the
    * SMALLEST md5-derived hash of the id form an order-independent
    * uniform sample (the KMV idea applied to sampling — k-smallest-by-
    * hash is associative, so map-side partials do the work and the
    * shuffle carries ≤k triples per group per task); quantile q is the
    * sampled value at 1-based index ceil(q·m) of the value-sorted
    * sample. Exact below k rows, a pure function of the input set
    * always — so the DuckDB oracle reproduces it bit-for-bit, unlike
    * randomized reservoir or t-digest sketches.
    * Output: (groupCol, n_sample, p<q1>, p<q2>, ...). */
  def quantileSketch(spark: SparkSession, df: DataFrame, groupCol: String,
                     idCol: String, valueCol: String, k: Int,
                     qs: Seq[Double]): DataFrame = {
    import spark.implicits._
    val agg = new QuantileSampleAgg(k)
    val sampled = df
      .select(col(groupCol).cast("string"),
        tokenHash32(col(idCol).cast("string")),
        col(idCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("samp"))
      .toDF(groupCol, "samp")
      .withColumn("_vals",
        array_sort(transform(col("samp"), s => s.getField("_3"))))
    sampled.select(col(groupCol) +: size(col("_vals")).as("n_sample") +:
      qs.map { q =>
        element_at(col("_vals"),
          greatest(lit(1), ceil(lit(q) * size(col("_vals"))).cast("int")))
          .as(s"p${(q * 100).round}")
      }: _*)
  }

  /** Count-Min sketch grid (Cormode & Muthukrishnan 2005) — the additive
    * mergeable FREQUENCY counter beside KMV/HLL's distinct counters.
    *
    * d×w counters: counter(r, h_r(x)) += 1 per key occurrence; a point
    * estimate is the MIN of a key's d addressed counters. Collisions only
    * ADD, so est ≥ exact always, with P[est > exact + 2N/w] ≤ 2^−d. The
    * grid is plain relational algebra — one groupBy(row, bucket).count()
    * whose map-side partials do all the work: the shuffle carries ≤ d·w
    * rows per task and the finished grid is ≤ d·w rows TOTAL
    * (broadcast-sized) no matter the corpus — the structure that lets a
    * 100 TB stream keep approximate per-key counts in fixed memory.
    * All-integer arithmetic on the md5-derived [[tokenHash32]] ⇒ the
    * DuckDB oracle replays grid and estimates bit-for-bit (q_sketch_cms).
    * Output: (cms_row, cms_bucket, cms_cnt). */
  def cmsCounters(df: DataFrame, keyCol: Column, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"cms d=$d w=$w out of range")
    // counters are additive, so occurrences pre-aggregate per DISTINCT
    // key before any hashing — the d md5s run once per key, not once per
    // occurrence (6M → 108k digests on the sf0.1 documents tokens), and
    // the grid becomes a sum of counts. Bit-identical by associativity.
    df.select(keyCol.cast("string").as("_k"))
      .groupBy("_k").agg(count(lit(1)).as("_n"))
      .select(col("_k"), col("_n"),
        explode(sequence(lit(0), lit(d - 1))).as("cms_row"))
      .withColumn("cms_bucket",
        (tokenHash32(concat(col("cms_row").cast("string"), lit(":"),
          col("_k"))) % w).cast("int"))
      .groupBy("cms_row", "cms_bucket").agg(sum(col("_n")).as("cms_cnt"))
  }

  /** Point-estimate `probes`' keys against a [[cmsCounters]] grid: min of
    * the d addressed counters appended as `cms_est` (0 for a never-seen
    * key whose buckets are all absent). Grid side broadcast (≤ d·w rows);
    * every probe column passes through. */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyName: String,
                  d: Int, w: Int): DataFrame = {
    val probeCols = probes.columns.toSeq
    probes
      .withColumn("cms_row", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("cms_bucket",
        (tokenHash32(concat(col("cms_row").cast("string"), lit(":"),
          col(keyName).cast("string"))) % w).cast("int"))
      .join(broadcast(counters), Seq("cms_row", "cms_bucket"), "left")
      .groupBy(probeCols.map(col): _*)
      .agg(min(coalesce(col("cms_cnt"), lit(0L))).as("cms_est"))
  }

  /** HyperLogLog distinct estimate per group — the industry-standard
    * mergeable counter (Flajolet et al. 2007), beside KMV for the
    * oracle story.
    *
    * p=8 → m=256 registers. Hash is the same engine-portable md5-derived
    * 32-bit [[tokenHash32]] the KMV sketch uses: bucket = top p bits,
    * w = low (32-p) bits, rank = leading zeros of w (as a (32-p)-bit
    * word) + 1 = (32-p) + 1 − bitlength(w). The whole sketch is plain
    * relational algebra — two map-side-combinable aggregations (max-rank
    * per register, then one row per group) — so at 100 TB the shuffle
    * carries ≤ m rows per group per task and Catalyst keeps it in
    * whole-stage codegen; no custom aggregator buffer to serialize.
    *
    * Cross-engine parity: `est_raw = α_m·m²/Σ 2^(−M_j)` is EXACT double
    * arithmetic — every 2^(−rank) term is a binary fraction (multiple of
    * 2^(−25)), their sum is order-independent and exactly representable,
    * and α_m involves only literals and IEEE ops — so DuckDB reproduces
    * it bit-for-bit (q_sketch_hll). The small-range linear-counting
    * correction needs ln(), which is NOT cross-engine-stable (libm vs
    * JVM), so the corrected `est` column is excluded from the oracle and
    * its error bound asserted in SamplingSpec instead.
    * Output: (groupCol, n_zero, est_raw, est). */
  def hllDistinct(spark: SparkSession, df: DataFrame, groupCol: String,
                  keyCol: String, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
    val m = 1 << p
    val wBits = 32 - p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val h = tokenHash32(col(keyCol).cast("string"))
    // Column./ is true division (double) — bucket must be the integer
    // top-p-bits, so shift, don't divide
    val bucket = shiftright(h, wBits).cast("int").as("_bucket")
    val w = (h % lit(1L << wBits)).cast("long")
    // bitlength via the binary-string length (exact integer path — never
    // floor(log2(w)), whose float rounding misfires at powers of two)
    val rank = when(w === 0L, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w))).as("_rank")
    val registers = df
      .select(col(groupCol).cast("string").as(groupCol), bucket, rank)
      .groupBy(groupCol, "_bucket")
      .agg(max(col("_rank")).as("_m"))
    // absent registers hold rank 0: each contributes 2^0 = 1 to the
    // harmonic sum and one zero-register toward linear counting
    registers.groupBy(groupCol)
      .agg(
        (lit(m) - count(lit(1))).cast("long").as("n_zero"),
        (sum(expr("1.0D / shiftleft(CAST(1 AS BIGINT), _m)"))
          + (lit(m) - count(lit(1)))).as("_hsum"))
      .select(col(groupCol), col("n_zero"),
        (lit(alpha * m * m.toDouble) / col("_hsum")).as("est_raw"))
      .withColumn("est",
        when(col("est_raw") <= lit(2.5 * m) && col("n_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero")))
          .otherwise(col("est_raw")))
  }
}
