package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row of the same key at
  * or before the left row's position — via the merge (union) formulation:
  *
  *   tag and union both sides → ONE shuffle on the key → sort within
  *   partitions by (time, id, tag) → carry the last non-null right payload
  *   forward → keep left rows.
  *
  * No join is ever materialized, so there is no |left|×|right| candidate
  * blowup and no skew amplification: cost is one shuffle + sort of
  * |left|+|right| rows — the shape that survives 100 TB (a windowed
  * equivalent of what time-series stores call merge-asof).
  */
object AsofJoin {

  /** For each left row, attach `payloadCols` of the latest right row with
    * the same `key` whose (ts, id) is before the left row's —
    * `inclusive=true` admits right rows at the exact same (ts, id);
    * `inclusive=false` is strictly-before (use for self-joins: a row never
    * matches itself). Payload columns come back as `asof_<name>`, NULL
    * when no earlier right row exists. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               leftId: String, rightId: String,
               payloadCols: Seq[String],
               inclusive: Boolean = true): DataFrame = {
    val (leftTag, rightTag) = if (inclusive) (1, 0) else (0, 1)
    // One struct carries ALL payload columns of a right row, so the asof_*
    // values always come from the SAME (latest) right row — per-column
    // last(ignoreNulls) would skip a NULL payload value back to an older
    // right row, diverging from merge-asof semantics (latest row's values,
    // nulls included). The struct itself is never null on right rows, so
    // last(ignoreNulls) selects rows, not values.
    val r = right.select(col(key).as("_k"), col(rightTs).as("_t"),
        col(rightId).as("_i"),
        struct(payloadCols.map(c => col(c).as(s"asof_$c")): _*).as("_p"))
      .withColumn("_tag", lit(rightTag))
    val l = left
      .withColumn("_k", col(key)).withColumn("_t", col(leftTs))
      .withColumn("_i", col(leftId)).withColumn("_tag", lit(leftTag))
    val merged = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_i").asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = merged
      .withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(carried) { (df, c) =>
        df.withColumn(s"asof_$c", col("_p").getField(s"asof_$c"))
      }
      .filter(col("_tag") === leftTag)
      .drop("_k", "_t", "_i", "_tag", "_p")
  }
}
