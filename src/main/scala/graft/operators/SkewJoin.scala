package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation via salting.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) already
  * rescues sort-merge joins at runtime; these operators are for the cases
  * AQE can't reshape: hot-key *aggregations* (a single reducer owning one
  * giant group) and joins where the replication factor should be a
  * deliberate, tested choice. Salts are deterministic (murmur hash of the
  * row key-set, not `rand()`) so retried tasks and reruns produce
  * identical partitioning.
  */
object SkewJoin {

  /** Inner equi-join with the LEFT (large, skewed) side salted into
    * `salts` sub-keys and the RIGHT side replicated `salts`×. Each hot key
    * spreads over `salts` reducers; shuffle volume on the right grows
    * `salts`× — size it to the skew, not higher. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val l = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(salts)))
    val r = right.withColumnRenamed(key, "_rkey")
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, l(key) === r("_rkey") && l("_salt") === r("_salt"))
      .drop("_salt", "_rkey")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt) — so a
    * hot key's rows split across reducers — then final aggregate on the
    * key. Expressible for any algebraic aggregate; provided here for
    * count + sum, the common hot-key shapes. */
  def saltedCountSum(df: DataFrame, key: Column, valueCol: Column,
                     salts: Int): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(hash(valueCol, key), lit(salts)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(count(lit(1)).as("_pc"),
        sum(valueCol.cast("decimal(18,4)")).as("_ps"))
    partial.groupBy(col("k"))
      .agg(sum(col("_pc")).as("cnt"),
        sum(col("_ps")).cast("double").as("sum_value"))
  }
}
