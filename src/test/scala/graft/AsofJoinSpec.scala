package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** As-of join semantics vs a brute-force per-row reference. */
class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  // trades (left) as-of quotes (right) — the canonical example
  private def quotes = Seq(
    (1L, 10L, 100L, 1.0), (1L, 20L, 101L, 1.1), (1L, 30L, 102L, 1.2),
    (2L, 15L, 200L, 9.0))
    .toDF("sym", "qts", "qid", "price")

  private def trades = Seq(
    (1L, 5L, 1000L),   // before any quote → null
    (1L, 20L, 1001L),  // exactly at quote 101
    (1L, 25L, 1002L),  // between 101 and 102
    (2L, 99L, 2000L),  // after the only quote
    (3L, 50L, 3000L))  // no quotes for sym 3 → null
    .toDF("sym", "tts", "tid")

  test("inclusive as-of picks the latest quote at-or-before each trade") {
    val out = AsofJoin.asofJoin(trades, quotes, key = "sym",
        leftTs = "tts", rightTs = "qts", leftId = "tid", rightId = "qid",
        payloadCols = Seq("price"), inclusive = true)
      .select(col("tid"), col("asof_price"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out === Map(
      1000L -> None, 1001L -> Some(1.1), 1002L -> Some(1.1),
      2000L -> Some(9.0), 3000L -> None))
  }

  test("NULL payload on the latest right row is carried, not skipped back") {
    // quote 102 (latest for sym 1 at tts 40) has price NULL and venue "X":
    // merge-asof semantics = take the LATEST row's values, nulls included —
    // asof_price must be NULL, and asof_venue must come from the SAME row
    // (a per-column last(ignoreNulls) would mix rows: price from 101,
    // venue from 102)
    val q = Seq(
      (1L, 10L, 100L, Some(1.0), "V"), (1L, 20L, 101L, Some(1.1), "W"),
      (1L, 30L, 102L, None: Option[Double], "X"))
      .toDF("sym", "qts", "qid", "price", "venue")
    val t = Seq((1L, 40L, 1000L)).toDF("sym", "tts", "tid")
    val out = AsofJoin.asofJoin(t, q, key = "sym",
        leftTs = "tts", rightTs = "qts", leftId = "tid", rightId = "qid",
        payloadCols = Seq("price", "venue"), inclusive = true)
      .select("tid", "asof_price", "asof_venue").collect().head
    assert(out.isNullAt(1), "NULL price of the latest quote must be kept")
    assert(out.getString(2) === "X")
  }

  test("range join equals the cross-join filter on random data") {
    import graft.operators.RangeJoin
    val r = new scala.util.Random(11)
    val pts = (1 to 150).map(i => (i.toLong, r.nextDouble() * 400 - 200))
      .toDF("pid", "v")
    val ivs = (1 to 60).map { i =>
      val lo = r.nextDouble() * 400 - 220
      (i.toLong, lo, lo + r.nextDouble() * 90)
    }.toDF("iid", "lo", "hi")
    Seq(15.0, 50.0, 300.0).foreach { w => // width smaller/near/larger than bands
      val fast = RangeJoin.rangeJoin(pts, "v", ivs, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted
      val naive = pts.crossJoin(ivs)
        .filter(col("v") >= col("lo") && col("v") <= col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().sorted
      assert(fast === naive, s"width $w")
    }
  }

  test("as-of matches a brute-force reference on generated data") {
    val r = new scala.util.Random(7)
    val qs = (1 to 200).map(i =>
      (r.nextInt(5).toLong, r.nextInt(1000).toLong, i.toLong, r.nextDouble()))
    val ts = (1 to 100).map(i =>
      (r.nextInt(6).toLong, r.nextInt(1000).toLong, (1000 + i).toLong))
    val out = AsofJoin.asofJoin(
        ts.toDF("sym", "tts", "tid"), qs.toDF("sym", "qts", "qid", "price"),
        "sym", "tts", "qts", "tid", "qid", Seq("qid"), inclusive = true)
      .select(col("tid"), col("asof_qid")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    ts.foreach { case (sym, tts, tid) =>
      // brute force: max (qts, qid) at-or-before (tts, tid-position);
      // ids are disjoint ranges so (qts < tts) || (qts == tts) suffices
      val want = qs.filter(q => q._1 == sym && q._2 <= tts)
        .sortBy(q => (q._2, q._3)).lastOption.map(_._3)
      assert(out(tid) === want, s"trade $tid")
    }
  }
}
