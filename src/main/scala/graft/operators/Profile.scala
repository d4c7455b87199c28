package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: per-column statistics in ONE pass over the table —
  * the first thing a pipeline runs against a new 100 TB drop (schema
  * sanity, null rates, cardinalities, ranges) and the input to
  * quality-gate decisions.
  *
  * Shape: a single global aggregate computes every metric for every
  * requested column (one scan, map-side partials), then the 1-row result
  * unpivots to one output row per column — the unpivot is over a
  * DRIVER-SIZED row, free. Values surface as strings so heterogeneous
  * column types share one output schema (the cast is deterministic and
  * oracle-matched).
  *
  * Scale note: `count(DISTINCT c)` for C columns compiles to an Expand —
  * C× the shuffled rows. Exact distincts are the oracle-checkable
  * choice; at 100 TB swap in the mergeable KMV sketch
  * ([[Sketches.kmvDistinct]]) per column — one pass, no Expand, same
  * output shape. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select(col("p.column"), col("p.n_rows"), col("p.n_nonnull"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
  }
}
