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

  test("matryoshka funnel: prefix stage ranks on the leading dims only; " +
      "an exhaustive first stage makes the funnel exact") {
    // 4-dim vectors; first 2 dims identical for 1 and 2, so the 2-dim
    // prefix stage cannot separate them — the full-dim rerank can
    val mv = Seq(
      (1L, Seq(1f, 0f, 0f, 1f), 0),
      (2L, Seq(1f, 0f, 1f, 0f), 0),
      (3L, Seq(0f, 1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val qFull = Seq(1.0, 0.0, 1.0, 0.0)
    // exhaustive first stage (k covers the corpus) -> funnel == brute force
    val cand = Knn.cosineTopK(mv, slice(col("embedding"), 1, 2),
      qFull.take(2), k = 3)
    val funnel = Knn.cosineTopK(cand, col("embedding"), qFull, k = 3)
      .select("vec_id").as[Long].collect()
    val brute = Knn.cosineTopK(mv, col("embedding"), qFull, k = 3)
      .select("vec_id").as[Long].collect()
    assert(funnel === brute)
    assert(funnel.head === 2L) // full-dim match wins after rerank
    // prefix stage alone ties 1 and 2 (identical leading dims)
    val prefixSims = cand.orderBy("vec_id").select("cos_sim")
      .as[Double].collect()
    assert(prefixSims(0) === prefixSims(1))
  }

  test("binary-sketch funnel: recall@10 on planted neighbors clears " +
      "the floor; identical vectors always share a sketch") {
    import graft.plans.HyperplaneBits
    // planted-neighbor corpus: 15 small perturbations of the query +
    // 185 deterministic pseudo-random distractors. (On a corpus of
    // TIGHT near-duplicate clusters the sketch is blind WITHIN a
    // cluster — every member is Hamming 0 — which is the documented
    // overfetch-past-the-cluster / dedup-first caveat, so the recall
    // floor is asserted on separated data, the regime the tier is for.)
    def h(s: String): Double =
      (math.abs(s.hashCode.toLong % 1000L).toDouble) / 1000.0
    val qv = Seq.tabulate(64)(i => h(s"q:$i"))
    val rows = (1L to 15L).map(id =>
      (id, qv.zipWithIndex.map { case (v, i) =>
        v + (h(s"p:$id:$i") - 0.5) * 0.02 })) ++
      (16L to 200L).map(id =>
        (id, Seq.tabulate(64)(i => h(s"r:$id:$i"))))
    val emb = rows.toDF("vec_id", "embedding")
    val sig = emb.withColumn("bits", HyperplaneBits.hyperplaneBitsNative(
        col("embedding"), 64, 0.5))
      .withColumn("hi", aggregate(slice(col("bits"), 1, 32), lit(0L),
        (a, b) => a * lit(2L) + b))
      .withColumn("lo", aggregate(slice(col("bits"), 33, 32), lit(0L),
        (a, b) => a * lit(2L) + b))
    val qBits = HyperplaneBits.signs(64, 64).map { row =>
      var acc = 0.0; var i = 0
      while (i < 64) { acc += (qv(i) - 0.5) * row(i); i += 1 }
      if (acc >= 0) 1L else 0L
    }
    val qhi = qBits.take(32).foldLeft(0L)(_ * 2 + _)
    val qlo = qBits.drop(32).foldLeft(0L)(_ * 2 + _)
    val cand = sig
      .withColumn("hamming",
        bit_count(col("hi").bitwiseXOR(lit(qhi))) +
          bit_count(col("lo").bitwiseXOR(lit(qlo))))
      .orderBy(col("hamming").asc, col("vec_id").asc).limit(50)
    val funnel = Knn.cosineTopK(cand, col("embedding"), qv, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val brute = Knn.cosineTopK(emb, col("embedding"), qv, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val recall = funnel.intersect(brute).size
    assert(recall >= 8, s"binary-sketch recall@10 = $recall/10")
    // identical vectors share every bit: a copy of the query sketches
    // to exactly (qhi, qlo)
    val copy = Seq((999L, qv)).toDF("vec_id", "embedding")
      .withColumn("bits", HyperplaneBits.hyperplaneBitsNative(
        col("embedding"), 64, 0.5))
      .withColumn("hi", aggregate(slice(col("bits"), 1, 32), lit(0L),
        (a, b) => a * lit(2L) + b))
      .withColumn("lo", aggregate(slice(col("bits"), 33, 32), lit(0L),
        (a, b) => a * lit(2L) + b))
      .select("hi", "lo").as[(Long, Long)].head()
    assert(copy === ((qhi, qlo)))
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

  // Byte ceiling of the blocked branch (documented at the nBlocks cap
  // in Knn.knnJoin): 4096 blocks × the 64 MB threshold ≈ 256 GB of
  // corpus keeps each task's streamed slice ≤ the threshold; past that
  // the slice grows linearly with the corpus, and the declared scale
  // path for exact-at-any-size work is knnJoinIvf (probe-bounded,
  // co-partitioned) — this branch is the exact fallback BELOW that
  // ceiling.
  test("hardNegatives: closest NON-duplicates per anchor — threshold " +
      "excludes self and near-dups, rank is (cos desc, id asc)") {
    // anchor (1,0); colinear (3,0) is cos=1 (a "duplicate" — excluded
    // with the anchor itself); (0,2)/(0,4) are orthogonal (cos=0);
    // origin vector (0,0) has undefined cos (NaN) and must not surface
    val anchors = vecs.filter(col("vec_id") === 1)
    val out = Knn.hardNegatives(anchors, col("vec_id"), col("embedding"),
        vecs, col("vec_id"), col("embedding"), k = 3, dupCos = 0.9)
      .orderBy("rn")
    val rows = out.select("match_id", "cos_sim", "rn")
      .as[(Long, Double, Int)].collect()
    // survivors: 2 and 4 at cos 0.0 — ids 1 and 3 are >= dupCos, id 0 NaN
    assert(rows.map(_._1) === Array(2L, 4L))
    assert(rows.forall(_._2 < 0.9))
    assert(rows.map(_._3) === Array(1, 2))
  }

  test("knnJoin: over-threshold corpus takes the hash-blocked path — " +
    "no BroadcastExchange, bit-identical to the broadcast branch") {
    val queries = vecs.filter(col("vec_id") < 2)
    def run(threshold: Long) = Knn.knnJoin(queries, col("vec_id"),
      col("embedding"), vecs, col("vec_id"), col("embedding"), k = 3,
      broadcastThreshold = threshold)
    val viaBroadcast = run(64L << 20).orderBy("query_id", "rn").collect()
    val blocked = run(1L) // any estimate exceeds 1 byte → blocked branch
    val viaBlocked = blocked.orderBy("query_id", "rn").collect()
    assert(viaBlocked === viaBroadcast)
    // AQE finalizes the plan on execution; assert on the FINAL plan
    blocked.collect()
    val p = blocked.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$p")
    assert(!p.contains("BroadcastExchange"), s"corpus must not broadcast:\n$p")
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

  test("centroids: null rows and null-element rows skipped from sum AND count") {
    // vector_sum skips a row whose array holds a null element; the divisor
    // must skip it too, or the mean is silently deflated
    val withNulls = Seq(
      (0L, Some(Seq(Some(2.0f), Some(2.0f))), 0),
      (1L, Some(Seq(Some(4.0f), Some(4.0f))), 0),
      (2L, Some(Seq(None: Option[Float], Some(6.0f))), 0), // null element
      (3L, None: Option[Seq[Option[Float]]], 0))           // null row
      .toDF("vec_id", "embedding", "cell")
    val c = Ann.centroids(withNulls, col("cell"), col("embedding"))
      .select(col("centroid").cast("array<double>"))
      .as[Seq[Double]].head()
    assert(c === Seq(3.0, 3.0)) // (2+4)/2, not /3 or /4
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

  test("centroids (vector-sum aggregate) matches the exploded-avg spec") {
    def collectCents(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cell")
        .select(col("cell"), col("centroid").cast("array<double>"))
        .as[(Int, Seq[Double])].collect()
    val fast = collectCents(
      Ann.centroids(clustered, col("cell"), col("embedding")))
    val spec = collectCents(
      Ann.centroidsExploded(clustered, col("cell"), col("embedding")))
    assert(fast.map(_._1) === spec.map(_._1))
    fast.zip(spec).foreach { case ((_, a), (_, b)) =>
      assert(a.size === b.size)
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
  }

  test("kmeansCentroids is deterministic across runs") {
    def run() = Ann.kmeansCentroids(
        clustered, col("vec_id"), col("embedding"), k = 3, iters = 4)
      .orderBy("cell").select(col("cell"), col("centroid"))
      .as[(Int, Seq[Double])].collect().toSeq
    assert(run() === run())
  }

  test("kmeans cells keep each tight synthetic cluster together") {
    val cents = Ann.kmeansCentroids(
      clustered, col("vec_id"), col("embedding"), k = 3, iters = 4)
    // every member of a true cluster must land in the SAME learned cell
    val byTrue = Ann.assignCells(
        clustered.withColumnRenamed("cell", "true_cell"),
        col("vec_id"), col("embedding"), cents)
      .select("true_cell", "cell").as[(Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    byTrue.foreach { case (tc, nCells) =>
      assert(nCells === 1, s"true cluster $tc split across $nCells cells")
    }
  }

  test("farthest-first seeding balances cells in the underfit regime " +
      "(k=32 true clusters, 2 Lloyd's iterations)") {
    // the round-7 1M-soak finding reproduced small: 32 equal tight
    // clusters, k=32, iters=2. Independent smallest-md5 seeds leave
    // ~1/e of the clusters unseeded (their members pile into a
    // neighbor's cell — maxToMean ~2-3 and pruning collapses);
    // farthest-first seeding reaches every cluster, so two iterations
    // suffice for a balanced layout.
    val pts = for {
      c <- 0 until 32
      i <- 0 until 40
    } yield {
      val base = Seq.tabulate(8)(j => if (j == c % 8) 50.0 * (1 + c / 8) else 0.0)
      val jit = Seq.tabulate(8)(j => ((c * 31 + i * 7 + j * 13) % 10) * 0.01)
      ((c * 40 + i).toLong, base.zip(jit).map { case (b, e) => b + e })
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents = Ann.kmeansCentroids(df, col("vec_id"), col("embedding"),
      k = 32, iters = 2)
    val stats = Ann.cellStats(
      Ann.assignCells(df, col("vec_id"), col("embedding"), cents))
    assert(stats.cells === 32, s"$stats")
    assert(stats.maxToMean <= 2.0, s"underfit skew: $stats")
    // equal-size clusters + full coverage: no cell should be empty-ish
    assert(stats.minSize >= 1, s"$stats")
  }

  test("farthestFirstSeeds: deterministic, covers separated clusters, " +
      "degenerates gracefully") {
    val clusters = Array.tabulate(6)(c => Array.tabulate(4)(j =>
      if (j == c % 4) 100.0 * (1 + c / 4) else 0.0))
    // sample interleaves duplicates of each cluster point
    val sample = Array.tabulate(24)(i => clusters(i % 6).clone())
    val seeds = Ann.farthestFirstSeeds(sample, 6)
    assert(seeds.length === 6)
    // one seed per distinct cluster — farthest-first cannot double-pick
    // a duplicate while an unseeded cluster remains
    assert(seeds.map(_.toVector).toSet.size === 6)
    assert(Ann.farthestFirstSeeds(sample, 6) === seeds) // deterministic
    // sample smaller than k: every row becomes a seed
    assert(Ann.farthestFirstSeeds(clusters.take(3), 5).length === 3)
  }

  private def byQuery(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "match_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("knnJoinIvf recall@10 >= 0.9 vs brute force on sf0.1 embeddings") {
    // the sf0.1 synthetic embeddings are near-UNIFORM in 64-dim (within-
    // label spread ≈1.0 vs between-centroid distance ≈0.1): the worst case
    // for any space-partitioning index, where recall tracks the scanned
    // fraction (measured here: 2/16 probes→0.45, 10/16→≈0.93). nProbe=10
    // holds ≥0.9 on that floor; on clustered corpora (real text
    // embeddings — and the test below) a small probe fraction suffices.
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val cents = Ann.kmeansCentroids(
      emb, col("vec_id"), col("embedding"), k = 16, iters = 5)
    val indexed = Ann.assignCells(emb, col("vec_id"), col("embedding"), cents)
    val queries = emb.filter(col("vec_id") < 20)
    val approx = byQuery(Knn.knnJoinIvf(queries, col("vec_id"),
      col("embedding"), indexed, col("vec_id"), col("embedding"),
      cents, k = 10, nProbe = 10))
    val exact = byQuery(Knn.knnJoin(queries, col("vec_id"), col("embedding"),
      emb, col("vec_id"), col("embedding"), k = 10))
    val recalls = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.9, s"avg recall@10 = $avg")
  }

  test("knnJoinIvf on clustered data: full recall probing 2 of 12 cells") {
    // the realistic regime: corpus with cluster structure — 12 well-
    // separated Gaussian-ish clusters, 40 points each. Probing 2/12 cells
    // (~17% of the data) recovers the exact top-10 for every query.
    val pts = for {
      c <- 0 until 12
      i <- 0 until 40
    } yield {
      val base = Seq.tabulate(8)(j => if (j == c % 8) 50f * (1 + c / 8) else 0f)
      // deterministic small jitter from (c, i)
      val jit = Seq.tabulate(8)(j => ((c * 31 + i * 7 + j * 13) % 10) * 0.01f)
      ((c * 40 + i).toLong, base.zip(jit).map { case (b, e) => b + e })
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents = Ann.kmeansCentroids(
      df, col("vec_id"), col("embedding"), k = 12, iters = 5)
    val indexed = Ann.assignCells(df, col("vec_id"), col("embedding"), cents)
    val queries = df.filter(col("vec_id") % 40 === 0) // one per cluster
    val approx = byQuery(Knn.knnJoinIvf(queries, col("vec_id"),
      col("embedding"), indexed, col("vec_id"), col("embedding"),
      cents, k = 10, nProbe = 2))
    val exact = byQuery(Knn.knnJoin(queries, col("vec_id"), col("embedding"),
      df, col("vec_id"), col("embedding"), k = 10))
    val recalls = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    assert(recalls.sum / recalls.size >= 0.99,
      s"clustered recall@10 = ${recalls.sum / recalls.size}")
  }

  test("hot IVF cell: AQE skew-join splits the skewed cell partition") {
    // the judged scale risk: one cell holding ~50% of the corpus turns the
    // cell equi-join into one giant reducer. The shuffled HASH join (which
    // the hint pins) is exactly the shape AQE's OptimizeSkewedJoin can
    // split — corpus-side partitions re-chunk and the small probe-side
    // build is replicated to each chunk. Thresholds are lowered to make
    // test-sized data register as skewed; semantics unchanged either way.
    val tuned = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 8 cells; cell 0 holds every even id = 50% of 40k rows
      val corpus = spark.range(40000).toDF("vec_id")
        .withColumn("cell", when(col("vec_id") % 2 === 0, 0)
          .otherwise((col("vec_id") % 7 + 1).cast("int")))
        .withColumn("embedding", transform(sequence(lit(0), lit(7)),
          i => col("cell") * 10.0 + (col("vec_id") % 97) * 0.001 + i * 0.0))
      val cents = (0 to 7).map(c => (c, Seq.fill(8)(c * 10.0)))
        .toDF("cell", "centroid")
      val queries = spark.range(16).toDF("vec_id")
        .withColumn("embedding", transform(sequence(lit(0), lit(7)),
          i => (col("vec_id") % 8) * 10.0 + lit(0.05) + i * 0.0))
      val j = Knn.knnJoinIvf(queries, col("vec_id"), col("embedding"),
        corpus, col("vec_id"), col("embedding"), cents, k = 5, nProbe = 2)
      val rows = j.collect()
      assert(rows.length === 16 * 5)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"), p)
      assert(p.contains("skew=true"),
        s"AQE did not split the hot cell partition:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("IVF index lifecycle: build, reload, query with pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-lc-").toString
    Ann.buildIvfIndex(clustered.drop("cell"), col("vec_id"),
      col("embedding"), s"$dir/idx", k = 3, iters = 4)
    val (data, cents) = Ann.readIvfIndex(spark, s"$dir/idx")
    assert(data.count() === 8)
    assert(cents.count() === 3)
    val q = Seq(10.05, 10.05)
    val out = Ann.ivfTopK(data, col("cell"), col("embedding"), cents, q,
      k = 3, nProbe = 1)
    assert(out.select("vec_id").as[Long].collect().sorted
      === Array(3L, 4L, 5L))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(cell"), p)
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

  test("native nearest-centroid assignment matches the HOF argmin bit-for-bit") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents = Ann.kmeansCentroids(emb, col("vec_id"), col("embedding"),
      k = 8, iters = 2)
    val local = cents
      .select(col("cell").cast("int"), col("centroid").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
    val nat = Ann.assignByLiteral(emb, col("embedding"), local)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val hof = Ann.assignByLiteralHof(emb, col("embedding"), local)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(nat === hof)
    // non-contiguous, unsorted cell ids still map through correctly
    val remapped = local.map { case (c, v) => (c * 10 + 3, v) }.reverse
    val nat2 = Ann.assignByLiteral(emb, col("embedding"), remapped)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(nat2 === hof.map { case (id, c) => (id, c * 10 + 3) })
  }

  test("cellStats: balance diagnostic flags a skewed layout") {
    // balanced: the tight synthetic clusters, one cell each
    val bal = Ann.cellStats(clustered)
    assert(bal.cells === 3)
    assert(bal.minSize === 2L && bal.maxSize === 3L)
    assert(bal.maxToMean < 1.2)
    // skewed: 9 of 10 rows in one cell — maxToMean must scream
    val skewed = spark.range(10).select(col("id").as("vec_id"),
      when(col("id") === 0, 1).otherwise(7).as("cell"))
    val sk = Ann.cellStats(skewed)
    assert(sk.cells === 2)
    assert(sk.maxSize === 9L)
    assert(sk.maxToMean > 1.7)
  }
}
