package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the vector-compression tier between raw
  * floats and PQ: each dimension maps to one byte via a per-dimension
  * affine [min, max] → [0, 255] grid (8× smaller than FLOAT storage,
  * far better recall than PQ's 32×; what FAISS calls SQ8 and most
  * vector stores offer beside PQ).
  *
  * Unlike PQ (whose trained codebooks are only hash-oracle-able through
  * the seeded-sample trick), SQ8 is deterministic rational arithmetic
  * end to end — train is a per-dimension min/max aggregate, encode is
  * `floor((x − min)/scale)` with a 255 clamp, and the asymmetric query
  * distance reconstructs grid midpoints — so the whole
  * train → encode → search path is bit-exact against the DuckDB oracle
  * (`q_ann_sq8`), the strongest proof class in the repo.
  *
  * Scale shape: train is one posexplode + groupBy(dim) min/max —
  * map-side partial aggregation carries `dim` rows per task, and the
  * result (2×dim doubles) is driver-sized, the same class as IVF
  * centroids. Encode is map-side with the grid as literals. Search
  * scans codes only (8× less IO than the raw vectors) through
  * `TakeOrderedAndProject`, and composes with IVF cells exactly like
  * PQ. A zero-width dimension (max = min) encodes as 0 and
  * reconstructs exactly `min`.
  */
object Sq {

  /** Per-dimension quantization grid. `scales(d)` = (max−min)/255;
    * 0 for a constant dimension. */
  case class SqModel(mins: Array[Double], scales: Array[Double])

  /** One pass over the corpus: per-dimension min/max. */
  def trainSq(df: DataFrame, vecCol: Column): SqModel = {
    val rows = df
      .select(posexplode(vecCol.cast("array<double>")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("d")
      .collect()
    val mins = rows.map(_.getDouble(1))
    val scales = rows.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0)
    SqModel(mins, scales)
  }

  /** Map-side encode: codes(d) = clamp(floor((x_d − min_d)/scale_d)).
    * An x exactly at max floors to 255 only via the clamp (255·scale +
    * min can round past max); constant dims encode 0. */
  def encodeSq(df: DataFrame, vecCol: Column, model: SqModel,
               as: String = "codes"): DataFrame = {
    val minsC = typedlit(model.mins.toSeq)
    val scalesC = typedlit(model.scales.toSeq)
    df.withColumn(as,
      zip_with(vecCol.cast("array<double>"),
        zip_with(minsC, scalesC, (mn, sc) => struct(mn.as("mn"), sc.as("sc"))),
        (x, g) => when(g.getField("sc") === 0.0, lit(0))
          .otherwise(least(lit(255),
            floor((x - g.getField("mn")) / g.getField("sc")).cast("int")))))
  }

  /** Asymmetric distance: exact query vs reconstructed grid midpoints
    * (min_d + (code_d + 0.5)·scale_d; constant dims reconstruct min_d
    * exactly). Folded in dimension order — deterministic, so the oracle
    * replays it bit-for-bit. */
  private def sqDist(codesCol: Column, model: SqModel,
                     query: Seq[Double]): Column = {
    val qC = typedlit(query)
    val minsC = typedlit(model.mins.toSeq)
    val scalesC = typedlit(model.scales.toSeq)
    // constant dims (scale 0) reconstruct exactly min: (c+0.5)·0 = 0
    val recon = zip_with(codesCol,
      zip_with(minsC, scalesC, (mn, sc) => struct(mn.as("mn"), sc.as("sc"))),
      (c, g) => g.getField("mn") +
        (c.cast("double") + lit(0.5)) * g.getField("sc"))
    sqrt(aggregate(zip_with(qC, recon, (q, r) => (q - r) * (q - r)),
      lit(0.0), (a, v) => a + v))
  }

  /** Top-k over codes only (the 8×-smaller scan), `TakeOrderedAndProject`
    * like every top-k in the repo. */
  def sqTopK(df: DataFrame, codesCol: Column, model: SqModel,
             query: Seq[Double], k: Int,
             tieBreak: String = "vec_id"): DataFrame =
    df.withColumn("dist", round(sqDist(codesCol, model, query), 6))
      .orderBy(col("dist").asc, col(tieBreak).asc)
      .limit(k)

  /** SQ8 overfetch + exact re-rank — same recall-restoring refinement as
    * [[Pq.pqTopKRefined]]; exact L2 runs on k×overfetch rows only. */
  def sqTopKRefined(df: DataFrame, codesCol: Column, vecCol: Column,
                    model: SqModel, query: Seq[Double], k: Int,
                    overfetch: Int = 4,
                    tieBreak: String = "vec_id"): DataFrame = {
    val cand = df.withColumn("sqd", round(sqDist(codesCol, model, query), 6))
      .orderBy(col("sqd").asc, col(tieBreak).asc)
      .limit(k * overfetch)
    Knn.knnExact(cand, vecCol, query, k, preFilter = None,
      tieBreak = tieBreak).drop("sqd")
  }
}
