package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphAlgos

/** Triangle census semantics (degree-oriented node-iterator). */
class GraphAlgosSpec extends SparkSuite {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    GraphAlgos.triangleStats(edges.toDF("s", "t"), col("s"), col("t"))
      .as[(Long, Long, Double)].head()

  test("K4: 4 triangles, 12 wedges, transitivity 1.0") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(stats(k4) === ((4L, 12L, 1.0)))
  }

  test("star graph: wedges but no triangles -> cc 0.0") {
    val star = (1L to 5L).map(i => (0L, i))
    assert(stats(star) === ((0L, 10L, 0.0)))
  }

  test("self-loops, parallel and reversed edges collapse before counting") {
    val messy = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 2L), (2L, 0L),
      (2L, 2L))
    // one clean triangle {0,1,2}: 3 wedges, 1 triangle, cc = 1.0
    assert(stats(messy) === ((1L, 3L, 1.0)))
  }

  test("two triangles sharing an edge") {
    // {0,1,2} and {1,2,3}: deg = (2,3,3,2), wedges = 1+3+3+1 = 8
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))
    assert(stats(g) === ((2L, 8L, 0.75)))
  }

  private def lpa(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  iters: Int): Map[Long, Long] =
    GraphAlgos.labelPropagation(nodes.toDF("n"), col("n"),
        edges.toDF("s", "t"), col("s"), col("t"), iters)
      .as[(Long, Long)].collect().toMap

  test("labelPropagation: two disjoint triangles converge to their " +
      "min labels; an isolated node keeps its own") {
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L, 99L)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L))
    assert(lpa(nodes, edges, 4) ===
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
        10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("labelPropagation: synchronous min-tie-break rounds are exactly " +
      "the hand-computed sequence on a path (incl. the documented " +
      "period-2 oscillation on bipartite structure)") {
    val nodes = Seq(0L, 1L, 2L)
    val edges = Seq((0L, 1L), (1L, 2L))
    // l1 = (1, 0, 1): ends adopt the middle's label, middle tie-breaks
    // to min(0, 2) = 0; l2 = (0, 1, 0); the pair then oscillates
    assert(lpa(nodes, edges, 1) === Map(0L -> 1L, 1L -> 0L, 2L -> 1L))
    assert(lpa(nodes, edges, 2) === Map(0L -> 0L, 1L -> 1L, 2L -> 0L))
    assert(lpa(nodes, edges, 4) === Map(0L -> 0L, 1L -> 1L, 2L -> 0L))
  }

  test("labelPropagation: parallel/reversed/self edges collapse before " +
      "neighbor-label counting") {
    // collapsed, node 0 sees {5, 3} once each -> tie -> min label 3;
    // counted with multiplicity the doubled 0-5 edge would win
    val nodes = Seq(0L, 3L, 5L)
    val edges = Seq((0L, 5L), (5L, 0L), (0L, 5L), (0L, 3L), (0L, 0L))
    assert(lpa(nodes, edges, 1)(0L) === 3L)
  }
}
