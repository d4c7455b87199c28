package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted join/aggregation equivalence + distribution checks. */
class SkewJoinSpec extends SparkSuite {
  import spark.implicits._

  // skewed: 1000 rows on key 1, a handful elsewhere
  private def skewed = ((1L to 1000L).map(i => (1L, i)) ++
    Seq((2L, 2000L), (3L, 3000L), (3L, 3001L)))
    .toDF("k", "payload")

  private def dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold"), (4L, "unused"))
    .toDF("k", "label")

  test("saltedJoin equals the plain inner join") {
    val plain = skewed.join(dim, "k")
      .select("k", "payload", "label")
      .as[(Long, Long, String)].collect().sorted
    val salted = SkewJoin.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "payload", "label")
      .as[(Long, Long, String)].collect().sorted
    assert(salted === plain)
  }

  test("salt spreads the hot key across sub-keys") {
    val counts = skewed
      .withColumn("_salt", pmod(hash(col("k"), col("payload")), lit(8)))
      .filter(col("k") === 1)
      .groupBy("_salt").count().as[(Int, Long)].collect()
    assert(counts.length === 8) // every salt bucket hit
    assert(counts.map(_._2).max < 1000) // no bucket owns the whole key
  }

  test("saltedCountSum equals the direct aggregation") {
    val direct = skewed.groupBy(col("k"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("payload").cast("decimal(18,4)")).cast("double")
          .as("sum_value"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val salted = SkewJoin.saltedCountSum(skewed, col("k"), col("payload"), 8)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(salted === direct)
  }
}
