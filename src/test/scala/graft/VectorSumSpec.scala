package graft

import org.apache.spark.sql.functions._

import graft.plans.VectorSum.vectorSum

/** Edge semantics of the vector-sum typed aggregate (the k-means/IVF
  * centroid workhorse — partial buffers must behave under nulls, floats,
  * and misuse). */
class VectorSumSpec extends SparkSuite {
  import spark.implicits._

  test("sums double arrays elementwise per group") {
    val out = Seq((0, Seq(1.0, 2.0)), (0, Seq(0.5, -1.0)), (1, Seq(7.0, 8.0)))
      .toDF("g", "v")
      .groupBy("g").agg(vectorSum(col("v")).as("s"))
      .orderBy("g").as[(Int, Seq[Double])].collect()
    assert(out === Array((0, Seq(1.5, 1.0)), (1, Seq(7.0, 8.0))))
  }

  test("float input accumulates in double") {
    val out = Seq((0, Seq(1.5f, 2.5f)), (0, Seq(0.25f, 0.75f)))
      .toDF("g", "v")
      .groupBy("g").agg(vectorSum(col("v")).as("s"))
      .as[(Int, Seq[Double])].head()
    assert(out._2 === Seq(1.75, 3.25))
  }

  test("NULL rows are skipped; an all-NULL group sums to NULL") {
    val df = Seq(
      (0, Some(Seq(1.0, 1.0))), (0, None: Option[Seq[Double]]), (1, None))
      .toDF("g", "v")
      .groupBy("g").agg(vectorSum(col("v")).as("s")).orderBy("g")
    val rows = df.collect()
    assert(rows(0).getSeq[Double](1) === Seq(1.0, 1.0))
    assert(rows(1).isNullAt(1))
  }

  test("a row containing a NULL element is skipped entirely") {
    val out = Seq((0, Seq[java.lang.Double](1.0, null)),
        (0, Seq[java.lang.Double](2.0, 3.0)))
      .toDF("g", "v")
      .groupBy("g").agg(vectorSum(col("v")).as("s"))
      .as[(Int, Seq[Double])].head()
    assert(out._2 === Seq(2.0, 3.0))
  }

  test("dimension mismatch within a group throws") {
    intercept[org.apache.spark.SparkException] {
      Seq((0, Seq(1.0)), (0, Seq(1.0, 2.0))).toDF("g", "v")
        .groupBy("g").agg(vectorSum(col("v")).as("s")).collect()
    }
  }

  test("survives serialized partial buffers (many partitions)") {
    val out = spark.range(100).repartition(8)
      .select((col("id") % 4).as("g"),
        array(col("id").cast("double"), lit(1.0)).as("v"))
      .groupBy("g").agg(vectorSum(col("v")).as("s"))
      .orderBy("g").as[(Long, Seq[Double])].collect()
    // group g holds ids {g, g+4, ..., g+96}: sum = 25g + 4*(0+4+...+96)/4
    out.foreach { case (g, s) =>
      val ids = (0L until 100L).filter(_ % 4 == g)
      assert(s === Seq(ids.sum.toDouble, ids.size.toDouble))
    }
  }
}
