package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** PageRank semantics: mass conservation without dangling nodes, hub
  * dominance, fold determinism (SURVEY §7.4 link-graph authority). */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  // star-plus-cycle: every node also links to hub 0, and 0..3 form a
  // cycle — no dangling nodes, hub 0 has in-degree 4 vs 1 elsewhere
  private def nodes = Seq(0L, 1L, 2L, 3L).toDF("node")
  private def edges = Seq(
    (0L, 1L, 1), (1L, 2L, 1), (2L, 3L, 1), (3L, 0L, 1),
    (0L, 0L, 2), (1L, 0L, 2), (2L, 0L, 2), (3L, 0L, 2))
    .toDF("src", "dst", "ord")

  private def run() = PageRank.pageRank(nodes, col("node"),
      edges, col("src"), col("dst"), col("ord"), iters = 8)
    .orderBy("node")
    .as[(Long, Double)].collect().toSeq

  test("pageRank: mass conserved (no dangling nodes) and the in-degree " +
      "hub dominates every spoke") {
    val pr = run()
    assert(math.abs(pr.map(_._2).sum - 1.0) < 1e-12)
    val hub = pr.find(_._1 == 0L).get._2
    pr.filter(_._1 != 0L).foreach { case (n, r) =>
      assert(hub > r, s"hub 0 ($hub) must outrank node $n ($r)")
    }
  }

  test("pageRank: deterministic across runs (sorted contribution folds)") {
    assert(run() === run())
  }

  test("pageRank: guards reject bad iteration/damping arguments") {
    intercept[IllegalArgumentException] {
      PageRank.pageRank(nodes, col("node"), edges, col("src"),
        col("dst"), col("ord"), iters = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.pageRank(nodes, col("node"), edges, col("src"),
        col("dst"), col("ord"), iters = 1, damping = 1.0)
    }
  }
}
