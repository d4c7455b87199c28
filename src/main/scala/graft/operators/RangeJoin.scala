package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join without an equi key: points matched
  * to intervals with `lo <= v <= hi`, via bucketization.
  *
  * The naive plan is a broadcast-nested-loop over |points| × |intervals|.
  * Bucketizing turns it into an EQUI join: each interval explodes into
  * the coarse buckets it covers, each point hashes to one bucket, the
  * bucket join bounds candidates to same-band pairs, and the exact
  * containment filter runs only on those. Each (point, interval) pair
  * meets at exactly one bucket (the point's), so no dedup is needed.
  * Pick `bucketWidth` near the typical interval width: cost is
  * Σ interval-width/w exploded rows vs candidate precision. */
object RangeJoin {

  def rangeJoin(points: DataFrame, pointVal: String,
                intervals: DataFrame, lo: String, hi: String,
                bucketWidth: Double): DataFrame = {
    val p = points.withColumn("_b",
      floor(col(pointVal) / bucketWidth).cast("long"))
    val i = intervals.withColumn("_b",
      explode(sequence(floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    p.join(i, Seq("_b"))
      .filter(col(pointVal) >= col(lo) && col(pointVal) <= col(hi))
      .drop("_b")
  }
}
