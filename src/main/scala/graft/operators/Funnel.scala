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
    val withSteps = stepTypes.zipWithIndex.foldLeft(base) {
      case (df, (st, i)) =>
        val after =
          if (i == 0) "" else s" AND x.ts_us > t_${stepTypes(i - 1)}"
        df.withColumn(s"t_$st", expr(
          s"array_min(transform(filter(es, x -> x.event_type = '$st'" +
            s"$after), x -> x.ts_us))"))
    }
    withSteps.select(
      (col("user_id") +:
        stepTypes.map(st => col(s"t_$st")) :+
        stepTypes.map(st =>
            when(col(s"t_$st").isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("int").as("stage_reached")): _*)
  }
}
