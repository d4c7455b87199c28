package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Knn}

/** kNN / ANN operator semantics (SURVEY.md §2.3: V2/V3/V5). */
class KnnSpec extends SparkSuite {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(0f, 0f), 0),
    (1L, Seq(1f, 0f), 0),
    (2L, Seq(0f, 2f), 1),
    (3L, Seq(3f, 0f), 1),
    (4L, Seq(0f, 4f), 0))
    .toDF("vec_id", "embedding", "label")

  test("knnExact: top-k by L2 with deterministic tiebreak") {
    val out = Knn.knnExact(vecs, col("embedding"), Seq(0.0, 0.0), k = 3)
    assert(out.select("vec_id").as[Long].collect() === Array(0L, 1L, 2L))
    val dists = out.select("dist").as[Double].collect()
    assert(dists === Array(0.0, 1.0, 2.0)) // exact L2, rounded to 6
  }

  test("knnExact: pre-filter restricts candidates before top-k") {
    val out = Knn.knnExact(vecs, col("embedding"), Seq(0.0, 0.0), k = 2,
      preFilter = Some(col("label") === 1))
    assert(out.select("vec_id").as[Long].collect() === Array(2L, 3L))
  }

  test("cosineTopK: descending similarity") {
    val out = Knn.cosineTopK(vecs.filter(col("vec_id") > 0),
      col("embedding"), Seq(1.0, 0.0), k = 2)
    // (1,0) and (3,0) are colinear with the query (cos=1), tie → vec_id asc
    assert(out.select("vec_id").as[Long].collect() === Array(1L, 3L))
    assert(out.select("cos_sim").as[Double].collect() === Array(1.0, 1.0))
  }

  test("vectorAt fetches a stored vector as a literal") {
    assert(Knn.vectorAt(vecs, col("vec_id"), 3L, col("embedding"))
      === Seq(3.0, 0.0))
  }

  test("overfetch: reference arithmetic k*5 if k*5 > 10 else 20") {
    assert(Knn.overfetch(1) === 20) // 5 ≤ 10
    assert(Knn.overfetch(2) === 20) // 10 ≤ 10
    assert(Knn.overfetch(3) === 15)
    assert(Knn.overfetch(5) === 25)
  }

  test("knnExact plan is TakeOrderedAndProject (no global sort)") {
    val plan = Knn.knnExact(vecs, col("embedding"), Seq(0.0, 0.0), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("knnJoin: per-query top-k matches the per-query exact kNN") {
    val queries = vecs.filter(col("vec_id") < 2)
    val joined = Knn.knnJoin(queries, col("vec_id"), col("embedding"),
      vecs, col("vec_id"), col("embedding"), k = 3)
      .orderBy("query_id", "rn")
      .select("query_id", "match_id").as[(Long, Long)].collect()
    // per query, must equal running knnExact individually
    Seq(0L, 1L).foreach { qid =>
      val q = Knn.vectorAt(vecs, col("vec_id"), qid, col("embedding"))
      val solo = Knn.knnExact(vecs, col("embedding"), q, k = 3)
        .select("vec_id").as[Long].collect()
      assert(joined.filter(_._1 == qid).map(_._2) === solo)
    }
  }

  // ---- IVF (Ann) ------------------------------------------------------

  private def clustered = Seq(
    (0L, Seq(0f, 0f), 0), (1L, Seq(0.1f, 0f), 0), (2L, Seq(0f, 0.2f), 0),
    (3L, Seq(10f, 10f), 1), (4L, Seq(10.1f, 10f), 1), (5L, Seq(10f, 10.2f), 1),
    (6L, Seq(-10f, 5f), 2), (7L, Seq(-10.1f, 5f), 2))
    .toDF("vec_id", "embedding", "cell")

  test("centroids: per-cell component means") {
    val c = Ann.centroids(clustered, col("cell"), col("embedding"))
      .orderBy("cell")
      .select(col("cell"), col("centroid").cast("array<double>"))
      .as[(Int, Seq[Double])].collect()
    assert(c.length === 3)
    val c0 = c(0)._2
    assert(math.abs(c0(0) - (0.0 + 0.1 + 0.0) / 3) < 1e-6)
    assert(math.abs(c0(1) - (0.0 + 0.0 + 0.2) / 3) < 1e-6)
  }

  test("ivfTopK with nProbe=1 equals exact kNN when query is in-cluster") {
    val cents = Ann.centroids(clustered, col("cell"), col("embedding"))
    val q = Seq(10.05, 10.05)
    val ivf = Ann.ivfTopK(clustered, col("cell"), col("embedding"),
      cents, q, k = 3, nProbe = 1)
    val exact = Knn.knnExact(clustered, col("embedding"), q, k = 3)
    assert(ivf.select("vec_id").as[Long].collect().sorted
      === exact.select("vec_id").as[Long].collect().sorted)
  }

  test("assignCells reassigns vectors to their nearest centroid") {
    val cents = Ann.centroids(clustered, col("cell"), col("embedding"))
    val assigned = Ann.assignCells(
      clustered.drop("cell"), col("vec_id"), col("embedding"), cents)
    // centroids came from the true clusters → assignment must recover them
    val got = assigned.select("vec_id", "cell").as[(Long, Int)]
      .collect().toMap
    val want = clustered.select("vec_id", "cell").as[(Long, Int)]
      .collect().toMap
    assert(got === want)
  }

  test("partitioned IVF index: probe filter prunes cell directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-").toString
    val cents = Ann.centroids(clustered, col("cell"), col("embedding"))
    Ann.writePartitioned(clustered, s"$dir/ivf")
    val idx = spark.read.parquet(s"$dir/ivf")
    val q = Seq(10.05, 10.05)
    val out = Ann.ivfTopK(idx, col("cell"), col("embedding"), cents, q,
      k = 3, nProbe = 1)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(cell"), p) // dir pruning
    assert(out.select("vec_id").as[Long].collect().sorted
      === Array(3L, 4L, 5L))
  }
}
