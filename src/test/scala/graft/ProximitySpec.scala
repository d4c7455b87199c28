package graft

import org.apache.spark.sql.functions._

import graft.operators.Proximity

/** Minimal query-term span semantics: the sweep finds the tightest
  * window, later occurrences tighten it, docs missing a term drop. */
class ProximitySpec extends SparkSuite {
  import spark.implicits._

  private val terms = Seq("join", "filter", "window", "scan")

  test("minSpan: adjacent terms span |q|; spread terms span the gap; " +
      "a later occurrence tightens the window") {
    val docs = Seq(
      (1L, "x join filter scan window y"),          // adjacent → 4
      (2L, "scan a join b filter window"),          // whole doc → 6
      (3L, "join x filter scan y join window"),     // [filter..window] → 5
      (4L, "join filter window nope"))              // missing scan → drop
      .toDF("doc_id", "text")
    val got = Proximity.minSpan(docs, col("doc_id"), col("text"), terms)
      .orderBy("doc_id")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got === Seq((1L, 4, 4L), (2L, 6, 4L), (3L, 5, 5L)))
  }

  test("minSpan plans one window pass over the filtered positions — " +
      "no self-join") {
    val docs = Seq((1L, "join filter window scan")).toDF("doc_id", "text")
    val plan = Proximity.minSpan(docs, col("doc_id"), col("text"), terms)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      s"unexpected join:\n$plan")
    assert(plan.contains("Window"), s"expected a window pass:\n$plan")
  }
}
