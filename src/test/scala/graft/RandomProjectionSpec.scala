package graft

import org.apache.spark.sql.functions._

import graft.operators.RandomProjection

/** JL ±1 projection gates: bit-parity with a driver-computed
  * reference (same signs, same fold order), and the distance
  * preservation the projection exists for — all deterministic (fixed
  * md5 signs, fixed corpus), no statistical flake. */
class RandomProjectionSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val (dIn, mOut) = (64, 8)

  private def corpus = Tables.embeddings(spark, dir)
    .select(col("vec_id"), col("embedding"))

  test("project matches the driver-computed reference fold exactly") {
    val sample = corpus.filter(col("vec_id") < 30)
    val got = RandomProjection.project(sample, col("vec_id"),
        col("embedding"), dIn, mOut)
      .as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val raw = sample.as[(Long, Array[Float])].collect()
    val expected = (for {
      (id, v) <- raw.toSeq
      j <- 0 until mOut
    } yield {
      var acc = RandomProjection.sign(j, 0) * v(0).toDouble
      (1 until dIn).foreach { i =>
        acc += RandomProjection.sign(j, i) * v(i).toDouble
      }
      (id, j) -> (math.floor(acc * 1e6 + 0.5) / 1e6)
    }).toMap
    assert(got === expected)
  }

  test("native kernel is bit-identical to the declarative ±chain " +
      "formulation on the full sf0.001 corpus") {
    val kernel = RandomProjection.project(corpus, col("vec_id"),
      col("embedding"), dIn, mOut)
    val chained = RandomProjection.projectChained(corpus, col("vec_id"),
      col("embedding"), dIn, mOut)
    assert(kernel.exceptAll(chained).isEmpty &&
      chained.exceptAll(kernel).isEmpty,
      "kernel and chained JL projections diverge")
  }

  test("degenerate inputs follow the documented project() contract: " +
      "NULL vector emits 0 rows, shorter-than-d vector fails loudly") {
    // NULL vector: the null-intolerant kernel expression yields a null
    // array, posexplode of which emits no rows (the chained reference
    // emitted m null-y rows — the contract pins the kernel's drop)
    val withNull = Seq((1L, Some(Array.fill(4)(1.0f))), (2L, None))
      .toDF("vec_id", "embedding").repartition(2)
    val projected = RandomProjection.project(withNull, col("vec_id"),
      col("embedding"), d = 4, m = 3)
    assert(projected.filter(col("id") === 2L).count() === 0,
      "NULL vector must emit 0 sketch rows")
    assert(projected.filter(col("id") === 1L).count() === 3,
      "non-null vector must emit m rows")
    // short vector: fails loudly instead of fabricating null sketch rows
    val short = Seq((3L, Array.fill(2)(1.0f)))
      .toDF("vec_id", "embedding").repartition(2)
    val ex = intercept[org.apache.spark.SparkException] {
      RandomProjection.project(short, col("vec_id"), col("embedding"),
        d = 4, m = 3).collect()
    }
    assert(ex.getMessage != null)
  }

  test("signs are balanced enough to be a projection, not a sum") {
    val pos = (for (j <- 0 until mOut; i <- 0 until dIn)
      yield RandomProjection.sign(j, i)).count(_ > 0)
    val total = mOut * dIn
    assert(pos > total / 4 && pos < 3 * total / 4,
      s"md5-parity signs wildly unbalanced: $pos/$total positive")
  }

  test("squared norms are preserved in expectation across the corpus " +
      "(mean of ||y||^2 / (m * ||x||^2) near 1 — the JL property)") {
    val y2 = RandomProjection.project(corpus, col("vec_id"),
        col("embedding"), dIn, mOut)
      .groupBy(col("id")).agg(sum(col("y") * col("y")).as("y2"))
    val x2 = corpus.select(col("vec_id").as("id"),
      aggregate(transform(col("embedding"), x =>
        x.cast("double") * x.cast("double")),
        lit(0.0), (a, b) => a + b).as("x2"))
    val ratios = y2.join(x2, "id")
      .select((col("y2") / (lit(mOut) * col("x2"))).as("r"))
      .as[Double].collect()
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.3,
      s"mean norm-preservation ratio $mean outside [0.7, 1.3]")
  }
}
