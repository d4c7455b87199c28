package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnMatrix

/** Unified ANN tier gates: one harness, one corpus (sf0.1 near-uniform
  * embeddings — the adversarial case), every tier at its declared query
  * budget. A recall regression in ANY tier fails the build here, where
  * the per-tier specs (GraphAnnSpec / KnnSpec / PqSpec) each gate only
  * their own machinery. Floors sit under the measured values in
  * BASELINE.md's round-6 table (graph/sq8 1.00, ivf 0.59, ivf-pq 0.25)
  * with slack for corpus regeneration, not for regressions. */
class AnnMatrixSpec extends SparkSuite {

  test("every ANN tier clears its recall floor at the declared budget") {
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val rows = AnnMatrix.run(emb, col("vec_id"), col("embedding"),
      queryIds = 0L until 10L)
    val byTier = rows.map(r => r.tier -> r).toMap
    info(AnnMatrix.render(rows, emb.count()))
    assert(byTier("exact").recall === 1.0)
    val floors = Map("graph" -> 0.95, "sq8" -> 0.95,
      "ivf" -> 0.45, "ivf-pq" -> 0.15)
    floors.foreach { case (tier, floor) =>
      assert(byTier(tier).recall >= floor,
        f"$tier recall ${byTier(tier).recall}%.2f under floor $floor")
    }
    // cost sanity: the IVF tiers actually prune (probed rows well under
    // the corpus), and ivf-pq reads codes, not vectors
    assert(byTier("ivf").rowsScanned < 0.5 * byTier("exact").rowsScanned)
    assert(byTier("ivf-pq").bytesPerRow < 16)
  }
}
