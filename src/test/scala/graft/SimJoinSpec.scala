package graft

import org.apache.spark.sql.functions._

import graft.operators.SimJoin

/** TF-IDF cosine all-pairs join: agreement with a driver-side
  * brute-force cosine, df-valve semantics + audit, layout independence. */
class SimJoinSpec extends SparkSuite {
  import spark.implicits._

  // near-dup pair (a,b) share most shingles; c is lexically disjoint;
  // every doc shares the "common filler words here" run to exercise df
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),
    (3L, "one two three four five six seven eight")
  ).toDF("doc_id", "text")

  test("finds the near-dup pair, not the disjoint doc") {
    val out = SimJoin.tfidfCosinePairs(docs, col("doc_id"), col("text"),
        nDocs = 3, minCos = 0.3, maxDf = 10)
      .select("id1", "id2", "cos").as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(out.head._3 > 0.5 && out.head._3 < 1.0)
  }

  test("cos agrees with driver-side brute force on the shared space") {
    // replicate: 3-gram shingles, tf counts, df over 3 docs, w = tf*N/df
    def shingles(t: String): Seq[String] =
      t.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSeq
    val all = docs.as[(Long, String)].collect().toMap
    val sh = all.view.mapValues(shingles).toMap
    val df = sh.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def vec(id: Long): Map[String, Double] =
      sh(id).groupBy(identity).map { case (t, o) =>
        t -> o.size.toDouble * 3.0 / df(t) }
    def cos(i: Long, j: Long): Double = {
      val (a, b) = (vec(i), vec(j))
      val dot = a.keySet.intersect(b.keySet).toSeq.sorted
        .foldLeft(0.0)((s, t) => s + a(t) * b(t))
      def nrm(v: Map[String, Double]) =
        math.sqrt(v.toSeq.sortBy(_._1).foldLeft(0.0)((s, p) => s + p._2 * p._2))
      dot / (nrm(a) * nrm(b))
    }
    val expected = math.floor(cos(1L, 2L) * 1e6 + 0.5) / 1e6
    val got = SimJoin.tfidfCosinePairs(docs, col("doc_id"), col("text"),
        nDocs = 3, minCos = 0.3, maxDf = 10)
      .select("cos").as[Double].head()
    assert(got === expected)
  }

  test("df valve drops hot terms from the space and audits them") {
    // make one shingle hot: the same 3-token run in every doc
    val hot = Seq(
      (1L, "common filler words alpha beta gamma"),
      (2L, "common filler words alpha beta delta"),
      (3L, "common filler words one two three"),
      (4L, "common filler words four five six")
    ).toDF("doc_id", "text")
    val pruned = SimJoin.prunedTerms(hot, col("doc_id"), col("text"),
        maxDf = 3)
      .select("term", "df").as[(String, Long)].collect().toMap
    assert(pruned.keySet === Set("common filler words"))
    assert(pruned("common filler words") === 4L)
    // with the hot shingle valved out, the disjoint tails keep 3↔4 and
    // 1↔2 apart: only genuinely-overlapping pairs survive
    val pairs = SimJoin.tfidfCosinePairs(hot, col("doc_id"), col("text"),
        nDocs = 4, minCos = 0.2, maxDf = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("hot surviving term: skewGuard salts the pair self-join; AQE " +
      "alone cannot split it") {
    // The one straggler the df valve does NOT remove: a term under
    // maxDf that still dominates the corpus puts every pair product for
    // that term on ONE shuffle key of the self-join. AQE cannot help
    // here — the pair join fuses into the upstream h-distributed stage
    // (no ENSURE_REQUIREMENTS shuffle children, the only shape
    // OptimizeSkewedJoin rewrites) — so the guard salts explicitly.
    val tuned = Seq(
      // disable broadcast so the pair join takes the shuffled path it
      // would take at corpus scale (test-sized sides always broadcast)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // every doc opens with the SAME 3-token shingle (df = 1500, kept
      // by maxDf = 2000) then a unique tail (df = 1 shingles join
      // nothing) — one hot join key carrying C(1500, 2) pair products
      val hotDocs = spark.range(1500).select(col("id").as("doc_id"),
        concat(lit("alpha beta gamma tail"), col("id")).as("text"))
      val sim = SimJoin.tfidfCosinePairs(hotDocs, col("doc_id"),
        col("text"), nDocs = 1500L, minCos = 0.0, maxDf = 2000,
        skewGuard = true, skewSalts = 8)
      sim.queryExecution.executedPlan.execute().foreach(_ => ())
      val p = sim.queryExecution.executedPlan.toString
      // the pair join must key on (h, salt) — the hot term's products
      // spread across 8 sub-keys instead of one reducer
      assert(p.contains("_salt"),
        s"skewGuard did not salt the pair join:\n$p")
      assert(sim.count() === 1500L * 1499L / 2)
      // guarded and unguarded agree — salting is physical only
      val unguarded = SimJoin.tfidfCosinePairs(hotDocs, col("doc_id"),
        col("text"), nDocs = 1500L, minCos = 0.0, maxDf = 2000)
      assert(sim.exceptAll(unguarded).count() === 0)
      assert(unguarded.exceptAll(sim).count() === 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("result is layout-independent") {
    val base = SimJoin.tfidfCosinePairs(docs, col("doc_id"), col("text"),
        nDocs = 3, minCos = 0.3, maxDf = 10)
      .select("id1", "id2", "cos").as[(Long, Long, Double)].collect().sorted
    val shuffled = SimJoin.tfidfCosinePairs(docs.repartition(7),
        col("doc_id"), col("text"), nDocs = 3, minCos = 0.3, maxDf = 10)
      .select("id1", "id2", "cos").as[(Long, Long, Double)].collect().sorted
    assert(shuffled === base)
  }
}
