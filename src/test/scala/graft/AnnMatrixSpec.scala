package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnMatrix

/** Unified ANN tier gates: one harness, one corpus (sf0.1 near-uniform
  * embeddings — the adversarial case), every tier at its declared query
  * budget. A recall regression in ANY tier fails the build here, where
  * the per-tier specs (GraphAnnSpec / KnnSpec / PqSpec) each gate only
  * their own machinery. Floors sit under the measured values in
  * BASELINE.md's round-6 table (graph/sq8 1.00, ivf 0.59, ivf-pq 0.25;
  * round 7 adds the pq fetch-refine serving tier at 0.53) with slack
  * for corpus regeneration, not for regressions. */
class AnnMatrixSpec extends SparkSuite {
  import spark.implicits._

  test("every ANN tier clears its recall floor at the declared budget") {
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val rows = AnnMatrix.run(emb, col("vec_id"), col("embedding"),
      queryIds = 0L until 10L)
    val byTier = rows.map(r => r.tier -> r).toMap
    info(AnnMatrix.render(rows, emb.count()))
    assert(byTier("exact").recall === 1.0)
    val floors = Map("graph" -> 0.95, "sq8" -> 0.95,
      "ivf" -> 0.45, "ivf-pq-adc" -> 0.15, "ivf-pq" -> 0.30,
      "pq" -> 0.40)
    floors.foreach { case (tier, floor) =>
      assert(byTier(tier).recall >= floor,
        f"$tier recall ${byTier(tier).recall}%.2f under floor $floor")
    }
    // cost sanity: the IVF tiers actually prune (probed rows well under
    // the corpus), and both ivf-pq rows read codes, not vectors
    assert(byTier("ivf").rowsScanned < 0.5 * byTier("exact").rowsScanned)
    assert(byTier("ivf-pq-adc").bytesPerRow < 16)
    assert(byTier("ivf-pq").bytesPerRow < 16)
    // STRUCTURAL (same build, same probed cells — not a cross-tier
    // tuning gate): the exact refine reranks a SUPERSET of the ADC
    // top-k, so the refined serving shape can never recall less than
    // ADC-only ranking
    assert(byTier("ivf-pq").recall >= byTier("ivf-pq-adc").recall)
    // the pq serving tier reads codes (m bytes/row), never vectors. Its
    // recall is gated by its own absolute floor above — NOT against the
    // ivf-pq tier: the two are independently tuned (exact-refine
    // overfetch vs probed-cell ADC) and the inequality can flip under
    // corpus regeneration, making a cross-tier gate a latent flake
    // rather than a regression signal on either tier (ADVICE round 7).
    assert(byTier("pq").bytesPerRow < 16)
  }

  test("recommendBudgets sweeps a usable recall/cost frontier and " +
      "pickBudgets returns the cheapest budget meeting the target") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val n = emb.count()
    val frontier = AnnMatrix.recommendBudgets(emb, col("vec_id"),
      col("embedding"), queryIds = 0L until 8L,
      nProbes = Seq(1, 2, 4, 8), efs = Seq(16, 64),
      overfetches = Seq(2, 16))
    info(AnnMatrix.renderFrontier(frontier, n))
    val ivf = frontier.filter(_.tier == "ivf").sortBy(_.budget)
    val graph = frontier.filter(_.tier == "graph").sortBy(_.budget)
    assert(ivf.map(_.budget) === Seq(1, 2, 4, 8))
    assert(graph.map(_.budget) === Seq(16, 64))
    // pq's knob: exact refine over ADC candidates — a wider overfetch
    // refines a SUPERSET of candidates, so recall is monotone in it
    val pq = frontier.filter(_.tier == "pq").sortBy(_.budget)
    assert(pq.map(_.budget) === Seq(2, 16))
    assert(pq.last.recall >= pq.head.recall)
    assert(pq.map(_.rowsScanned) === pq.map(_.rowsScanned).sorted)
    // cost is monotone in the knob: more probes / wider beam never
    // evaluates fewer rows
    assert(ivf.map(_.rowsScanned) === ivf.map(_.rowsScanned).sorted)
    assert(graph.map(_.rowsScanned) === graph.map(_.rowsScanned).sorted)
    // nProbe == ivfK probes EVERY cell — structurally exact, so the
    // frontier's right edge must read recall 1.0 (and ~the whole corpus)
    assert(ivf.last.recall === 1.0)
    assert(ivf.last.rowsScanned === n.toDouble)
    // recall is monotone-ish: the widest budget is never worse than the
    // narrowest (IVF: superset of probed cells; graph: wider beam)
    assert(ivf.last.recall >= ivf.head.recall)
    assert(graph.last.recall >= graph.head.recall)
    val picks = AnnMatrix.pickBudgets(frontier, targetRecall = 1.0)
    // ivf has a recall-1.0 row, so its pick must meet the target at the
    // LOWEST cost among qualifying rows
    val qualifying = ivf.filter(_.recall >= 1.0)
    assert(picks("ivf").rowsScanned === qualifying.map(_.rowsScanned).min)
    // the graph pick is always actionable: either meets target or is the
    // best-recall row in the sweep
    assert(picks("graph").recall === graph.map(_.recall).max ||
      picks("graph").recall >= 1.0)
  }

  test("autoServeBudgets picks measured knobs meeting the target and " +
      "sweeps only the two serving tiers") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val sb = AnnMatrix.autoServeBudgets(emb, col("vec_id"),
      col("embedding"), queryIds = 0L until 8L, targetRecall = 0.9,
      nProbes = Seq(1, 2, 4, 8), overfetches = Seq(2, 8, 16))
    info(AnnMatrix.renderFrontier(sb.frontier, emb.count()))
    // no graph rows: the serving sweep must not pay a graph build
    assert(sb.frontier.forall(r => r.tier == "ivf" || r.tier == "pq"))
    // picks are from the swept grids
    assert(Seq(1, 2, 4, 8).contains(sb.nProbe))
    assert(Seq(2, 8, 16).contains(sb.pqOverfetch))
    // pickBudgets contract: the pick either meets the target or is the
    // sweep's best-recall row (always actionable)
    val pqRows = sb.frontier.filter(_.tier == "pq")
    val picked = pqRows.find(_.budget == sb.pqOverfetch).get
    assert(picked.recall >= 0.9 ||
      picked.recall === pqRows.map(_.recall).max)
    // determinism: the same sweep returns the same picks
    val sb2 = AnnMatrix.autoServeBudgets(emb, col("vec_id"),
      col("embedding"), queryIds = 0L until 8L, targetRecall = 0.9,
      nProbes = Seq(1, 2, 4, 8), overfetches = Seq(2, 8, 16))
    assert((sb2.nProbe, sb2.pqOverfetch) === (sb.nProbe, sb.pqOverfetch))
    // the RAISED round-8 gate: the picked overfetch, plumbed through
    // the actual fetch-refine serving path, delivers the target recall
    // on this corpus (the 1M soak proves the same at scale: 0.90 at
    // the picked 256)
    import graft.operators.{Knn, Pq}
    val model = Pq.trainCodebooks(emb, col("vec_id"), col("embedding"),
      m = 8, ks = 16, iters = 2)
    val codes = Pq.encode(emb, col("embedding"), model)
      .select(col("vec_id"), col("codes"))
    val recalls = (0L until 8L).map { qid =>
      val q = Knn.vectorAt(emb, col("vec_id"), qid, col("embedding"))
      val exact = Knn.knnExact(emb, col("embedding"), q, 10)
        .select("vec_id").as[Long].collect().toSet
      val served = Pq.pqTopKRefinedFetch(codes, col("codes"), emb,
          "vec_id", col("embedding"), model, q, 10,
          overfetch = sb.pqOverfetch)
        .select("vec_id").as[Long].collect().toSet
      (served & exact).size / 10.0
    }
    val avgRecall = recalls.sum / recalls.size
    assert(avgRecall >= 0.85,
      f"serve at picked overfetch ${sb.pqOverfetch}: recall $avgRecall%.2f")
  }

  test("recommendBudgets hash-sampling keeps query ids and still sweeps " +
      "the full knob grid") {
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val frontier = AnnMatrix.recommendBudgets(emb, col("vec_id"),
      col("embedding"), queryIds = 0L until 4L, nProbes = Seq(2, 8),
      efs = Seq(32), sampleOneIn = 4)
    info(AnnMatrix.renderFrontier(frontier, emb.count() / 4))
    assert(frontier.length === 3)
    // the sample is ~1/4 of the corpus, so the exhaustive right edge
    // scans ~n/4 — proof the sweep ran on the sample, not the corpus
    val full = frontier.filter(r => r.tier == "ivf" && r.budget == 8).head
    assert(full.rowsScanned < emb.count() / 2.0)
    assert(full.recall === 1.0) // query ids survived the sample filter
  }
}
