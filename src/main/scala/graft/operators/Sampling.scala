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

  /** Deterministic resampling to a target domain mix — the data-mixing
    * step of a pretraining pipeline ("40% web, 30% code, …") as a
    * downsample-only acceptance filter.
    *
    * The largest total satisfying every target proportion without
    * upsampling is T = min_d(n_d / p_d); each domain then keeps rows at
    * rate p_d·T / n_d (the binding domain keeps everything). Acceptance
    * is the md5-derived key hash under the rate threshold — map-side,
    * reproducible on any layout, and stable per row as other domains
    * grow. Domains absent from `targetWeights` are dropped (weights
    * need not sum to 1; proportions are relative).
    *
    * Scale shape: one count aggregate (shuffle carries one row per
    * domain), a driver-sized threshold map (#domains, same class as
    * IVF centroids), then a map-side filter the scan can push. The
    * thresholds are integer-exact against the SQL oracle: floor to a
    * 16-bit threshold, compare the integer hash (q_sample_mix). */
  def resampleToMix(df: DataFrame, domainCol: String, keyCol: Column,
                    targetWeights: Map[String, Double]): DataFrame =
    resampleToMix(df, domainCol, keyCol, targetWeights,
      countsByDomain(df, domainCol))

  /** One count pass per domain; NULL-domain rows are excluded (they can
    * never match a named target weight — the SQL oracle's NULL join
    * semantics — and `null.toString` would otherwise throw). */
  private def countsByDomain(df: DataFrame,
                             domainCol: String): Map[String, Long] =
    df.groupBy(domainCol).count().collect()
      .filterNot(_.isNullAt(0))
      .map(r => r.get(0).toString -> r.getLong(1)).toMap

  private def resampleToMix(df: DataFrame, domainCol: String, keyCol: Column,
                            targetWeights: Map[String, Double],
                            counts: Map[String, Long]): DataFrame = {
    require(targetWeights.nonEmpty && targetWeights.values.forall(_ > 0),
      "targetWeights must be non-empty with positive weights")
    val present = targetWeights.filter { case (d, _) =>
      counts.getOrElse(d, 0L) > 0L }
    val t = present.map { case (d, p) => counts(d) / p }.min
    val thresholds = present.map { case (d, p) =>
      d -> math.floor(p * t / counts(d) * 65536.0).toLong }
    val thrCol = thresholds.foldLeft(lit(-1L)) { case (acc, (d, thr)) =>
      when(col(domainCol) === d, lit(thr)).otherwise(acc) }
    df.filter(tokenHash16(keyCol.cast("string")) < thrCol)
  }

  /** Quality-weighted acceptance sampling: keep a row with probability
    * equal to its weight in [0,1] — "sample proportional to quality",
    * the curation acceptance step (DCLM-style pipelines). Acceptance is
    * the md5-derived key hash under floor(weight · 2^16) — map-side,
    * layout-independent, per-row stable as the corpus grows, and
    * integer-exact vs the oracle: the q_sample_mix threshold pattern
    * with a per-ROW rate instead of a per-domain one
    * (q_sample_weighted). Weights outside [0,1] clamp naturally: ≤ 0
    * keeps nothing (hash ≥ 0), ≥ 1 keeps everything (hash < 2^16). */
  def weightedSample(df: DataFrame, keyCol: Column,
                     weightCol: Column): DataFrame =
    df.filter(tokenHash16(keyCol.cast("string")) <
      floor(weightCol * lit(65536.0)).cast("long"))

  /** Temperature-scaled domain resampling — the multilingual "alpha
    * sampling" step (XLM-R style): target proportions ∝ n_d^α flatten
    * the natural domain distribution toward uniform, so low-resource
    * domains keep everything while high-resource ones downsample. α is
    * fixed at 0.5 (weights = √n_d) because sqrt is a correctly-rounded
    * IEEE op the oracle replays bit-for-bit, while a general pow(n, α)
    * is transcendental (the repo-wide no-log/pow rule). Delegates to
    * [[resampleToMix]] with the derived weights AND the already-
    * collected counts, so the corpus is scanned once; thresholds stay
    * integer-exact (q_sample_temperature). */
  def resampleTemperature(df: DataFrame, domainCol: String,
                          keyCol: Column): DataFrame = {
    val counts = countsByDomain(df, domainCol)
    val weights = counts.collect {
      case (d, n) if n > 0 => d -> math.sqrt(n.toDouble) }
    resampleToMix(df, domainCol, keyCol, weights, counts)
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

  /** Deterministic epoch shuffle — the training-data ORDERING step: a
    * reproducible global permutation of the corpus per (epoch, id),
    * independent of physical layout. Position = dense rank under
    * (md5("epoch:id"), id) — the hash randomizes the order per epoch,
    * the id tiebreak makes it total.
    *
    * Scale shape: one range-partitioned sort on a uniform 32-bit hash
    * (balanced by construction — no skew regardless of id distribution),
    * positions assigned by the [[graft.sources.Maintenance.withDenseIds]]
    * machinery (per-partition row_number + broadcast offsets; no global
    * single-partition window). Integer-exact, so the DuckDB oracle
    * replays the permutation bit-for-bit (q_shuffle_epoch). */
  def epochShuffle(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
                   idCol: Column, epoch: Int,
                   out: String = "pos"): DataFrame =
    graft.sources.Maintenance.withDenseIdsBy(spark,
        df.withColumn("_eh", graft.functions.TextFunctions.tokenHash32(
          concat(lit(s"$epoch:"), idCol.cast("string")))),
        Seq(col("_eh"), idCol), out)
      .drop("_eh")
}
