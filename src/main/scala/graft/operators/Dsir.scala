package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR-style importance weighting for pretraining-data selection
  * (Xie et al., NeurIPS 2023 — "Data Selection for Language Models via
  * Importance Resampling"): score every NON-target document by the
  * likelihood ratio of its hashed-unigram profile under the target vs
  * raw bucket distributions — the standard recipe for picking raw-web
  * documents that look like a curated target corpus.
  *
  * Spark-first shape (100 TB): ONE pass builds the per-doc
  * (bucket, count) profile (map-side-combined groupBy); the
  * bucket-marginal totals are a B-row aggregate COLLECTED to the
  * driver (B = 256 — the bounded-collect contract, same class as
  * centroids/codebooks); per-bucket scores return as a broadcast HASH
  * join; the weight is one more doc_id groupBy. Nothing quadratic, no
  * global window, no 1-row cross join. The profile lineage feeds two
  * jobs (marginals, weights), so [[importanceWeights]] CHECKPOINTS it
  * — the corpus is tokenized and profiled once per run.
  *
  * Cross-engine exactness: the paper scores with
  * Σ_b c_b·log(p̂_t(b)/p̂_r(b)); transcendentals never hash-match across
  * engines, so the score here is the add-one-smoothed probability
  * RATIO in fixed point instead of its log:
  * s_b = (FP·(ct_b+1)·(Cr+B)) div ((cr_b+1)·(Ct+B)), positive floored
  * integer division (Spark `div` == DuckDB `//` on positive operands),
  * FP = 10⁴. Per-doc weight = Σ_b c_b·s_b — pure BIGINT arithmetic,
  * hash-matchable; per-bucket it is a monotone transform of the same
  * smoothed ratio the paper uses. Bucketing is md5-derived
  * ([[TextFunctions.tokenHash16]] mod B) so the oracle recomputes the
  * assignment from scratch (the "md5 only where the oracle must replay
  * the hash" rule).
  *
  * The pieces are exposed separately because the marginal histogram is
  * ADDITIVE: [[graft.streaming.Streams.dsirStream]] maintains it
  * incrementally with the partial-partition lifecycle (per-batch
  * (bucket, ct, cr) rows, merge-on-read), and serving scores any
  * candidate corpus against the current marginals without touching the
  * corpora that produced them.
  */
object Dsir {

  /** Per-doc hashed n-gram profile: (doc_id, is_target, bucket, cnt).
    * One corpus pass, map-side-combined. `gram` = 1 hashes unigrams;
    * `gram` = 2 hashes adjacent-token bigrams (space-joined through the
    * same md5 hash) — the feature space the DSIR paper actually uses
    * (Xie et al. §3: hashed bigrams), which makes the weights
    * word-ORDER-sensitive where the unigram profile is not. Grams come
    * from the carried token array (posexplode + element_at — map-side,
    * no window). */
  def profile(df: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, buckets: Int = 256, gram: Int = 1): DataFrame = {
    val terms =
      if (gram <= 1)
        df.select(idCol.as("doc_id"), isTarget.as("is_target"),
          explode(TextFunctions.tokens(textCol)).as("term"))
      else
        df.select(idCol.as("doc_id"), isTarget.as("is_target"),
            TextFunctions.tokens(textCol).as("_tk"))
          .select(col("doc_id"), col("is_target"), col("_tk"),
            posexplode(col("_tk")).as(Seq("p", "cur")))
          .filter(col("p") >= gram - 1)
          .select(col("doc_id"), col("is_target"),
            concat_ws(" ", (gram - 1 to 1 by -1)
              .map(j => element_at(col("_tk"), col("p") - j + 1))
              :+ col("cur"): _*).as("term"))
    terms
      .withColumn("bucket",
        pmod(TextFunctions.tokenHash16(col("term")), lit(buckets)))
      .groupBy("doc_id", "is_target", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Bucket marginals of a profile: (bucket, ct, cr) — ≤ B rows.
    * Additive across corpora/batches: marginals of a union are the
    * bucket-wise sums of the parts' marginals. */
  def bucketMarginals(prof: DataFrame): DataFrame =
    prof.groupBy("bucket")
      .agg(sum(when(col("is_target"), col("cnt")).otherwise(0L)).as("ct"),
        sum(when(!col("is_target"), col("cnt")).otherwise(0L)).as("cr"))

  /** Fixed-point per-bucket scores from collected marginals. BigInt on
    * the driver: the numerator FP·(ct+1)·(Cr+B) exceeds LONG at large
    * corpora; the floored quotient is LONG-small again. */
  def bucketScores(marg: Seq[(Long, Long, Long)], buckets: Int,
      fixedPoint: Long): Seq[(Long, Long)] = {
    val ctTot = BigInt(marg.map(_._2).sum)
    val crTot = BigInt(marg.map(_._3).sum)
    val b = BigInt(buckets)
    marg.map { case (bk, ct, cr) =>
      (bk, ((BigInt(fixedPoint) * (BigInt(ct) + 1) * (crTot + b)) /
        ((BigInt(cr) + 1) * (ctTot + b))).toLong)
    }
  }

  /** Weight candidate docs against EXTERNAL marginals (the serving
    * shape — e.g. marginals maintained by a stream): every candidate
    * doc with ≥ 1 token gets (doc_id, dsir_weight, n_tokens). */
  def weightsAgainst(candidates: DataFrame, idCol: Column,
      textCol: Column, marginals: DataFrame, buckets: Int = 256,
      fixedPoint: Long = 10000L, gram: Int = 1): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val marg = marginals.select(col("bucket").cast("long"),
        col("ct").cast("long"), col("cr").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // densify to ALL B buckets: external marginals only carry buckets
    // the reference stream has SEEN, but the add-one-smoothed ratio is
    // defined at (ct, cr) = (0, 0) — a candidate token hashing into an
    // unseen bucket must score the prior ratio, not vanish from the
    // weight sum through the inner join
    val byBucket = marg.map(m => m._1 -> m).toMap
    val dense = (0L until buckets).map(b => byBucket.getOrElse(b, (b, 0L, 0L)))
    val scores = bucketScores(dense, buckets, fixedPoint)
    profile(candidates, idCol, textCol, lit(false), buckets, gram)
      .join(broadcast(scores.toDF("bucket", "s")), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("cnt") * col("s")).as("dsir_weight"),
        sum("cnt").as("n_tokens"))
  }

  /** (doc_id, dsir_weight, n_tokens) for every non-target document
    * with at least one token, marginals and weights from one corpus.
    * `isTarget` marks the rows whose distribution the weights should
    * favor. */
  def importanceWeights(df: DataFrame, idCol: Column, textCol: Column,
      isTarget: Column, buckets: Int = 256,
      fixedPoint: Long = 10000L, gram: Int = 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the profile feeds TWO jobs (the marginals collect, then the
    // weights groupBy) — checkpoint it so the corpus is tokenized and
    // profiled ONCE per run (reliable checkpoint when a dir is set —
    // the 100 TB option — else executor-local; the Dedup.checkpointed
    // seam; DsirSpec counts the corpus scans)
    val prof = Dedup.checkpointed(
      profile(df, idCol, textCol, isTarget, buckets, gram))
    // bucket marginals: ≤ B rows — driver-sized by construction
    val marg = bucketMarginals(prof)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val scores = bucketScores(marg, buckets, fixedPoint)
    prof.filter(!col("is_target"))
      .join(broadcast(scores.toDF("bucket", "s")), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("cnt") * col("s")).as("dsir_weight"),
        sum("cnt").as("n_tokens"))
  }
}
