package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Ordered-funnel semantics (q_funnel_steps): each step must be
  * STRICTLY after the previous one — out-of-order conversions don't
  * count (SURVEY §7.4 round 10). */
class FunnelSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, String)]) =
    Funnel.steps(rows.toDF("u", "t", "e"), col("u"), col("t"), col("e"),
        Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().toSeq

  test("funnel: strict step order — a purchase BEFORE the click does " +
      "not convert; the earliest qualifying step wins") {
    val got = run(Seq(
      // full ordered conversion; the LATER click (40) must not replace
      // the earliest qualifying one (20)
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 40L, "click"),
      (1L, 30L, "purchase"),
      // purchase precedes the click → stage 2 only
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
      // click precedes the view → stage 1 only
      (3L, 20L, "view"), (3L, 10L, "click"),
      // no view at all → stage 0, later steps can't fire
      (4L, 10L, "click"), (4L, 20L, "purchase")))
    assert(got === Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3),
      (2L, Some(10L), Some(30L), None, 2),
      (3L, Some(20L), None, None, 1),
      (4L, None, None, None, 0)))
  }

  test("funnel: SQL-significant characters in step names are ordinary " +
      "data, not injectable text") {
    val rows = Seq(
      (1L, 10L, "o'brien's view"), (1L, 20L, "a; drop --"),
      (2L, 20L, "a; drop --")) // step 2 without step 1 → stage 0
      .toDF("u", "t", "e")
    val out = Funnel.steps(rows, col("u"), col("t"), col("e"),
      Seq("o'brien's view", "a; drop --"))
    assert(out.columns.toSeq ===
      Seq("user_id", "t_o'brien's view", "t_a; drop --", "stage_reached"))
    val got = out.orderBy("user_id")
      .as[(Long, Option[Long], Option[Long], Int)].collect().toSeq
    assert(got === Seq(
      (1L, Some(10L), Some(20L), 2),
      (2L, None, None, 0)))
  }

  test("funnel: guards reject empty or duplicated step lists") {
    val df = Seq((1L, 1L, "view")).toDF("u", "t", "e")
    intercept[IllegalArgumentException] {
      Funnel.steps(df, col("u"), col("t"), col("e"), Seq())
    }
    intercept[IllegalArgumentException] {
      Funnel.steps(df, col("u"), col("t"), col("e"), Seq("a", "a"))
    }
  }
}
