package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of several bucketed
  * dimensions into one sort key, so rows close in ANY of the dimensions
  * land close in the file order.
  *
  * Why it matters at 100 TB: parquet row-group min/max stats prune scans
  * only along the SORT order. Sorting by (a, b) prunes filters on `a`
  * and does nothing for filters on `b` alone; sorting by the z-value
  * gives every interleaved dimension partial locality, so a filter on
  * any of them skips most row groups (the Delta/Iceberg `ZORDER BY`
  * layout, Morton 1966).
  *
  * The operator works on caller-provided INTEGER bucket columns (ranks,
  * hash buckets, `width_bucket`-style bins — whatever the pipeline's
  * notion of locality is): pure bit arithmetic, codegen'd, shuffle-free;
  * the only cost is the final sort the caller was paying for a layout
  * write anyway. Deterministic ⇒ oracle-checkable (q_zorder).
  */
object ZOrder {

  /** Morton value of `dims` bucket columns, `bits` bits each (dims(0)
    * owns the least-significant interleave slot). Output fits a LONG —
    * requires dims.size × bits ≤ 63. Buckets outside [0, 2^bits) are
    * masked to their low bits (callers bucket first; the mask keeps the
    * key total rather than failing a 100 TB write on one stray row). */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits > 0 && dims.size * bits <= 63,
      s"need 0 < dims*bits <= 63, got ${dims.size} x $bits")
    val terms = for {
      b <- 0 until bits
      (d, i) <- dims.zipWithIndex
    } yield shiftleft(
      shiftright(d.cast("long"), b).bitwiseAND(lit(1L)),
      b * dims.size + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Sort by z-value and write — the layout pass. `fileRows` bounds rows
    * per file so min/max pruning has granularity to work with. */
  def writeZOrdered(df: DataFrame, dir: String, dims: Seq[Column],
                    bits: Int, fileRows: Int = 1 << 20): Unit =
    df.withColumn("_z", zValue(dims, bits))
      .orderBy(col("_z"))
      .drop("_z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", fileRows.toLong)
      .parquet(dir)
}
