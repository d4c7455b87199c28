package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-step funnel (view → click → purchase …): per user, the
  * earliest occurrence of each step STRICTLY AFTER the chosen previous
  * step — the product-analytics conversion query where order matters (a
  * purchase logged before its click must not count as a conversion).
  *
  * Scale shape: ONE shuffle on the user key; each user's events fold
  * in-row over the collected (ts, type) list, so per-user state is
  * bounded by events-per-user (the sessionize assumption) and the step
  * count adds map-side array scans, not joins. The alternative —
  * one conditional-min aggregate + re-join PER STEP — costs 2·steps
  * shuffles on the same key; this form is step-count-independent. */
object Funnel {
  /** Output: (user, t_<step>… epoch-like longs, stage_reached ∈
    * [0, steps.length]). Step columns are named `t_<step>`. */
  def steps(events: DataFrame, userCol: Column, tsCol: Column,
            typeCol: Column, stepTypes: Seq[String]): DataFrame = {
    require(stepTypes.nonEmpty && stepTypes.distinct == stepTypes,
      s"stepTypes must be non-empty and distinct, got $stepTypes")
    val base = events
      .select(userCol.as("user_id"), tsCol.as("ts_us"),
        typeCol.as("event_type"))
      .groupBy("user_id")
      .agg(collect_list(struct(col("ts_us"), col("event_type"))).as("es"))
    // typed Column lambdas, never a SQL expr string: a step name with a
    // quote (or any SQL-significant character) is an ordinary string
    // literal here, not injectable text. Steps compute under positional
    // internal names and are aliased to the contract's `t_<step>` only in
    // the final select (`.as` takes the name verbatim — no parsing), so
    // arbitrary step names never pass through a column-name resolver.
    val withSteps = stepTypes.zipWithIndex.foldLeft(base) {
      case (df, (st, i)) =>
        val matches: Column => Column = x => {
          val m = x.getField("event_type") === lit(st)
          if (i == 0) m else m && x.getField("ts_us") > col(s"__t_${i - 1}")
        }
        df.withColumn(s"__t_$i", array_min(
          transform(filter(col("es"), matches), x => x.getField("ts_us"))))
    }
    withSteps.select(
      (col("user_id") +:
        stepTypes.indices.map(i =>
          col(s"__t_$i").as(s"t_${stepTypes(i)}")) :+
        stepTypes.indices.map(i =>
            when(col(s"__t_$i").isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("int").as("stage_reached")): _*)
  }
}
