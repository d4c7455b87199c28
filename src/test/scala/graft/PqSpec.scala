package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, Pq}
import graft.operators.Pq.PqModel

/** Product-quantization semantics: lossless-codebook equivalence with
  * exact kNN, encode parity, Lloyd's distortion descent, IVF-PQ residual
  * composition, and the map-side-encode plan shape. */
class PqSpec extends SparkSuite {
  import spark.implicits._

  // dim 4, m=2 subspaces of 2; every subvector drawn from 4 distinct
  // values — a codebook holding exactly those values quantizes LOSSLESSLY,
  // so ADC must equal exact L2 and PQ top-k must equal Knn.knnExact.
  private val subvals: IndexedSeq[Seq[Double]] =
    IndexedSeq(Seq(0.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(2.0, 2.0))

  private val book: Seq[(Int, Seq[Double])] =
    subvals.zipWithIndex.map { case (v, j) => (j, v) }

  private val losslessModel = PqModel(m = 2, subDim = 2, ks = 4,
    books = Seq(book, book))

  private def baseRows(idOffset: Long, shift: Double) =
    (0 until 16).map { i =>
      val v = (subvals(i % 4) ++ subvals((i / 4) % 4)).map(_ + shift)
      (idOffset + i, v)
    }

  private def base = baseRows(0L, 0.0).toDF("vec_id", "embedding")

  private val query = Seq(0.2, 0.1, 0.9, 1.0)

  test("encode: lossless codebook assigns the defining code per subspace") {
    val out = Pq.encode(base, col("embedding"), losslessModel)
      .select(col("vec_id"), col("codes")).as[(Long, Seq[Int])]
      .collect().toMap
    (0 until 16).foreach { i =>
      assert(out(i.toLong) === Seq(i % 4, (i / 4) % 4), s"row $i")
    }
  }

  test("encodeHof bit-parity with the static encode") {
    val a = Pq.encode(base, col("embedding"), losslessModel)
      .select("vec_id", "codes").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    val b = Pq.encodeHof(base, col("embedding"), losslessModel)
      .select("vec_id", "codes").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
    assert(a.sortBy(_._1) === b.sortBy(_._1))
  }

  test("pqTopK with a lossless codebook equals exact kNN (dist and order)") {
    val encoded = Pq.encode(base, col("embedding"), losslessModel)
    val pq = Pq.pqTopK(encoded, col("codes"), losslessModel, query, k = 5)
      .select("vec_id", "dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Knn.knnExact(base, col("embedding"), query, k = 5)
      .select("vec_id", "dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pq === exact)
  }

  test("pqTopKRefined re-ranks ADC overfetch by true L2") {
    val encoded = Pq.encode(base, col("embedding"), losslessModel)
    val out = Pq.pqTopKRefined(encoded, col("codes"), col("embedding"),
      losslessModel, query, k = 3)
      .select("vec_id", "dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Knn.knnExact(base, col("embedding"), query, k = 3)
      .select("vec_id", "dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out === exact)
  }

  test("pqTopKRefinedFetch: ONE lazy plan (candidate subquery inside a " +
      "LeftSemi, no job at construction), output equals exact kNN") {
    val encoded = Pq.encode(base, col("embedding"), losslessModel)
      .select(col("vec_id"), col("codes"))
    // construction under a dedicated job group: a lazily-planned serve
    // must not run ANY Spark job before the caller's action (the old
    // eager form collected candidate ids at call time)
    spark.sparkContext.setJobGroup("pq-lazy-probe", "probe", false)
    val served = Pq.pqTopKRefinedFetch(encoded, col("codes"), base,
      "vec_id", col("embedding"), losslessModel, query, k = 3,
      overfetch = 4)
    val plan = served.queryExecution.optimizedPlan.toString
    spark.sparkContext.clearJobGroup()
    assert(spark.sparkContext.statusTracker
        .getJobIdsForGroup("pq-lazy-probe").isEmpty,
      "construction ran a Spark job — the serve is not lazy")
    // the candidate set is a SUBQUERY of the returned plan: a LeftSemi
    // join whose build side carries the bounded ADC sort-limit — not a
    // pre-collected id literal
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("GlobalLimit") || plan.contains("Limit"), plan)
    assert(!plan.contains(" IN ("), plan)
    val out = served.select("vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Knn.knnExact(base, col("embedding"), query, k = 3)
      .select("vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out === exact)
  }

  test("pqTopKRefinedFetch on an empty codes store returns an empty " +
      "result at action time (the lazy contract)") {
    val encoded = Pq.encode(base, col("embedding"), losslessModel)
      .select(col("vec_id"), col("codes")).filter(lit(false))
    val out = Pq.pqTopKRefinedFetch(encoded, col("codes"), base, "vec_id",
      col("embedding"), losslessModel, query, k = 3)
    assert(out.count() === 0L)
  }

  test("ivfPqTopKRefinedFetch is lazily planned with the same LeftSemi " +
      "candidate subquery") {
    val rows = baseRows(0L, 0.0).map { case (id, v) => (id, v, 0) } ++
      baseRows(100L, 10.0).map { case (id, v) => (id, v, 1) }
    val df = rows.toDF("vec_id", "embedding", "cell")
    val cents = Seq((0, Seq(0.0, 0.0, 0.0, 0.0)),
      (1, Seq(10.0, 10.0, 10.0, 10.0))).toDF("cell", "centroid")
    val encoded = Pq.encodeResidual(df, col("embedding"), cents,
      losslessModel)
    val all = df.select(col("vec_id"), col("embedding"))
    spark.sparkContext.setJobGroup("ivfpq-lazy-probe", "probe", false)
    val served = Pq.ivfPqTopKRefinedFetch(encoded, col("codes"), cents,
      all, "vec_id", col("embedding"), losslessModel, query, k = 3,
      nProbe = 2, overfetch = 4)
    val plan = served.queryExecution.optimizedPlan.toString
    spark.sparkContext.clearJobGroup()
    assert(spark.sparkContext.statusTracker
        .getJobIdsForGroup("ivfpq-lazy-probe").isEmpty,
      "construction ran a Spark job — the serve is not lazy")
    assert(plan.contains("LeftSemi"), plan)
    val out = served.select("vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Knn.knnExact(all, col("embedding"), query, k = 3)
      .select("vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(out === exact)
  }

  test("trainCodebooks: Lloyd's iterations do not increase distortion") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    def distortion(model: PqModel): Double = {
      val enc = Pq.encode(emb, col("embedding"), model)
      // reconstruct from codes and measure mean squared error map-side
      val recon = (0 until model.m).map { s =>
        val bookLit = typedlit(model.books(s).map(_._2))
        element_at(bookLit, element_at(col("codes"), s + 1) + 1)
      }.reduce(concat(_, _))
      enc.select(avg(pow(graft.plans.NativeFunctions.l2Native(
          col("embedding").cast("array<double>"), recon), 2)).as("mse"))
        .head().getDouble(0)
    }
    val m0 = Pq.trainCodebooks(emb, col("vec_id"), col("embedding"),
      m = 8, ks = 8, iters = 0)
    val m3 = Pq.trainCodebooks(emb, col("vec_id"), col("embedding"),
      m = 8, ks = 8, iters = 3)
    assert(distortion(m3) <= distortion(m0) + 1e-9)
    assert(m3.books.length === 8 && m3.books.forall(_.length === 8))
    assert(m3.books.forall(_.forall(_._2.length === 8)))
  }

  test("trained PQ + refine reaches full recall on the sf0.001 corpus") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Knn.vectorAt(emb, col("vec_id"), 0L, col("embedding"))
    val model = Pq.trainCodebooks(emb, col("vec_id"), col("embedding"),
      m = 8, ks = 16, iters = 3)
    val encoded = Pq.encode(emb, col("embedding"), model)
    val exact = Knn.knnExact(emb, col("embedding"), q, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val adcOnly = Pq.pqTopK(encoded, col("codes"), model, q, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val refined = Pq.pqTopKRefined(encoded, col("codes"), col("embedding"),
      model, q, k = 10, overfetch = 8)
      .select("vec_id").as[Long].collect().toSet
    val adcRecall = (adcOnly & exact).size / 10.0
    val refRecall = (refined & exact).size / 10.0
    assert(refRecall >= adcRecall) // refine can only help
    assert(refRecall >= 0.8, s"refined recall $refRecall")
  }

  test("IVF-PQ: lossless residual codebook + full probes equals exact kNN") {
    // two far-apart cells, same residual structure inside each
    val rows = baseRows(0L, 0.0).map { case (id, v) => (id, v, 0) } ++
      baseRows(100L, 10.0).map { case (id, v) => (id, v, 1) }
    val df = rows.toDF("vec_id", "embedding", "cell")
    val cents = Seq((0, Seq(0.0, 0.0, 0.0, 0.0)),
      (1, Seq(10.0, 10.0, 10.0, 10.0))).toDF("cell", "centroid")
    val encoded = Pq.encodeResidual(df, col("embedding"), cents, losslessModel)
    assert(!encoded.columns.contains("_resid"))
    val all = df.select(col("vec_id"), col("embedding"))
    val q2 = Seq(9.8, 10.1, 10.9, 12.0) // nearest cell 1
    val pq = Pq.ivfPqTopK(encoded, col("codes"), cents, losslessModel,
      q2, k = 5, nProbe = 2)
      .select("vec_id", "dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Knn.knnExact(all, col("embedding"), q2, k = 5)
      .select("vec_id", "dist").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pq === exact)
    // nProbe=1 restricts the scan to the nearest cell only
    val probed = Pq.ivfPqTopK(encoded, col("codes"), cents, losslessModel,
      q2, k = 5, nProbe = 1).select("vec_id").as[Long].collect()
    assert(probed.forall(_ >= 100L))
  }

  test("trainResidual quantizes residuals, not raw vectors") {
    val rows = baseRows(0L, 0.0).map { case (id, v) => (id, v, 0) } ++
      baseRows(100L, 10.0).map { case (id, v) => (id, v, 1) }
    val df = rows.toDF("vec_id", "embedding", "cell")
    val cents = Seq((0, Seq(0.0, 0.0, 0.0, 0.0)),
      (1, Seq(10.0, 10.0, 10.0, 10.0))).toDF("cell", "centroid")
    val model = Pq.trainResidual(df, col("vec_id"), col("embedding"), cents,
      m = 2, ks = 4, iters = 4)
    // both cells share residual structure: one ks=4 codebook per subspace
    // suffices, so quantization must be (near-)lossless after training
    val encoded = Pq.encodeResidual(df, col("embedding"), cents, model)
    val q2 = Seq(0.2, 0.1, 0.9, 1.0)
    val pq = Pq.ivfPqTopK(encoded, col("codes"), cents, model, q2,
      k = 5, nProbe = 2).select("vec_id").as[Long].collect().toSet
    val exact = Knn.knnExact(df.select(col("vec_id"), col("embedding")),
      col("embedding"), q2, k = 5).select("vec_id").as[Long].collect().toSet
    assert((pq & exact).size >= 4, s"residual recall ${(pq & exact).size}/5")
  }

  test("encode is map-side: no Exchange in the plan") {
    val plan = Pq.encode(base, col("embedding"), losslessModel)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("pqTopK plan is TakeOrderedAndProject over the codes scan") {
    val encoded = Pq.encode(base, col("embedding"), losslessModel)
    val plan = Pq.pqTopK(encoded, col("codes"), losslessModel, query, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("SQ8: codes in range, constant dim encodes 0, distortion <= scale/2") {
    import graft.operators.Sq
    val df = (0 until 100).map(i =>
      (i.toLong, Seq(i.toDouble, 5.0, -i * 2.0))).toDF("vec_id", "embedding")
    val m = Sq.trainSq(df, col("embedding"))
    assert(m.mins.toSeq === Seq(0.0, 5.0, -198.0))
    assert(m.scales(1) === 0.0) // constant dim
    val enc = Sq.encodeSq(df, col("embedding"), m)
    val codes = enc.select("codes").as[Seq[Int]].collect()
    assert(codes.flatten.forall(c => c >= 0 && c <= 255))
    assert(codes.forall(_(1) == 0), "constant dim must encode 0")
    // midpoint reconstruction error is at most half a grid cell per dim
    codes.zipWithIndex.foreach { case (cs, i) =>
      val orig = Seq(i.toDouble, 5.0, -i * 2.0)
      cs.indices.foreach { d =>
        val recon = m.mins(d) + (cs(d) + 0.5) * m.scales(d)
        assert(math.abs(recon - orig(d)) <= m.scales(d) / 2 + 1e-12,
          s"row $i dim $d: |$recon - ${orig(d)}| > ${m.scales(d) / 2}")
      }
    }
  }

  test("SQ8 beats PQ recall at its finer grid; refine reaches full recall (sf0.001)") {
    import graft.operators.Sq
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Knn.vectorAt(emb, col("vec_id"), 0L, col("embedding"))
    val model = Sq.trainSq(emb, col("embedding"))
    val encoded = Sq.encodeSq(emb, col("embedding"), model)
    val exact = Knn.knnExact(emb, col("embedding"), q, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val sqOnly = Sq.sqTopK(encoded, col("codes"), model, q, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val refined = Sq.sqTopKRefined(encoded, col("codes"), col("embedding"),
        model, q, k = 10, overfetch = 4)
      .select("vec_id").as[Long].collect().toSet
    // 8-bit per-dim grid: codes-only search should already be near-exact
    assert((sqOnly & exact).size / 10.0 >= 0.9,
      s"SQ8 codes-only recall ${(sqOnly & exact).size / 10.0}")
    assert((refined & exact).size / 10.0 === 1.0,
      s"SQ8 refined recall ${(refined & exact).size / 10.0}")
  }
}
