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
}
