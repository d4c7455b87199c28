package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

/** Structured Streaming semantics, driven through MemoryStream micro-batches
  * so watermark advancement and state cleanup are exercised for real. */
class StreamsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  /** Run a streaming query over `batches` fed one micro-batch at a time into
    * a memory sink; returns the sink table rows. */
  private def runBatches[T: org.apache.spark.sql.Encoder](
      batches: Seq[Seq[T]],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      mode: OutputMode): Array[org.apache.spark.sql.Row] = {
    val input = MemoryStream[T](spark)
    val name = s"sink_${System.nanoTime()}"
    val q = build(input.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
  }

  test("windowed stats: append emits a window only after watermark passes") {
    // batch 1: events in [0h,1h); batch 2: an event at 2h pushes the
    // watermark (2h - 10min) past the first window's end → it finalizes
    val rows = runBatches[(Timestamp, String, Double)](
      Seq(
        Seq((ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(40), "view", 3.0)),
        Seq((ts(125), "click", 9.0))),
      df => Streams.windowedEventStats(
        df.toDF("ts", "event_type", "value")),
      OutputMode.Append())
    val byType = rows.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet
    assert(byType === Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
    // the 2h event's window is still open — not emitted
    assert(rows.forall(_.getAs[Timestamp]("window_start").getTime < 3600000L))
  }

  test("windowed stats: late event beyond the watermark is dropped") {
    val rows = runBatches[(Timestamp, String, Double)](
      Seq(
        Seq((ts(5), "click", 1.0)),
        Seq((ts(125), "click", 1.0)), // watermark → 1h55 — window [0,1h) closes
        Seq((ts(10), "click", 100.0)), // late by nearly 2h → dropped
        Seq((ts(250), "click", 1.0))), // push watermark past [2h,3h)
      df => Streams.windowedEventStats(df.toDF("ts", "event_type", "value")),
      OutputMode.Append())
    val first = rows.filter(_.getAs[Timestamp]("window_start").getTime == 0L)
    assert(first.length === 1)
    assert(first.head.getAs[Long]("n") === 1L) // late row did NOT count
  }

  test("session_window: gap-based sessions close at watermark") {
    val rows = runBatches[(Timestamp, Long)](
      Seq(
        // user 1: events at 0,10,20min (one session), then 70min (new session)
        Seq((ts(0), 1L), (ts(10), 1L), (ts(20), 1L), (ts(70), 1L)),
        // advance watermark far enough to close everything open
        Seq((ts(300), 2L)),
        Seq((ts(600), 2L))),
      df => Streams.sessionWindows(df.toDF("ts", "user_id")),
      OutputMode.Append())
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
      .map(r => (r.getAs[Timestamp]("session_start").getTime / 60000,
        r.getAs[Long]("n_events"))).sortBy(_._1)
    assert(u1 === Array((0L, 3L), (70L, 1L)))
  }

  test("dedupStream drops repeated content within the watermark") {
    val rows = runBatches[(Timestamp, Long, String)](
      Seq(
        Seq((ts(1), 1L, "same text"), (ts(2), 2L, "same text"),
          (ts(3), 3L, "other text")),
        Seq((ts(4), 4L, "same text"))), // still within horizon → dropped
      df => Streams.dedupStream(df.toDF("ts", "doc_id", "text")),
      OutputMode.Append())
    val texts = rows.map(_.getAs[String]("text")).sorted
    assert(texts === Array("other text", "same text"))
  }

  test("custom sessionizer: closed sessions emitted, open session held") {
    val rows = runBatches[Streams.Event](
      Seq(
        // note: start at 1min, not 0 — an event timestamped exactly at the
        // initial watermark (0) is dropped as late by the state operator
        Seq(Streams.Event(1L, ts(1)), Streams.Event(1L, ts(10))),
        // 31-min gap → new session; old one closes on the NEXT batch's
        // watermark advance (event-time timeout)
        Seq(Streams.Event(1L, ts(41))),
        Seq(Streams.Event(2L, ts(300))),
        Seq(Streams.Event(2L, ts(600)))),
      df => {
        val ds = df.as[Streams.Event]
        Streams.sessionizeCustom(spark, ds).toDF()
      },
      OutputMode.Append())
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
      .map(r => (r.getAs[Long]("start_sec") / 60, r.getAs[Long]("end_sec") / 60,
        r.getAs[Long]("n_events"))).sortBy(_._1)
    assert(u1.contains((1L, 10L, 2L))) // first session: 2 events, 1..10min
  }

  test("enrichWithDim: stream-static broadcast join, left outer") {
    val dim = Seq((1L, "alpha"), (2L, "beta")).toDF("user_id", "segment")
    val rows = runBatches[(Timestamp, Long)](
      Seq(Seq((ts(1), 1L), (ts(2), 2L), (ts(3), 3L))),
      df => Streams.enrichWithDim(df.toDF("ts", "user_id"), dim, "user_id"),
      OutputMode.Append())
    val m = rows.map(r => r.getAs[Long]("user_id") ->
      Option(r.getAs[String]("segment"))).toMap
    assert(m === Map(1L -> Some("alpha"), 2L -> Some("beta"), 3L -> None))
  }

  test("clickAttribution: interval join matches clicks within the horizon") {
    val imp = MemoryStream[(Long, Long, Timestamp)](spark)
    val clk = MemoryStream[(Long, Long, Timestamp)](spark)
    val name = s"attr_${System.nanoTime()}"
    val q = Streams.clickAttribution(
        imp.toDF().toDF("imp_user", "imp_id", "imp_ts"),
        clk.toDF().toDF("click_user", "click_id", "click_ts"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      imp.addData(Seq((1L, 100L, ts(5)), (2L, 200L, ts(6))))
      clk.addData(Seq(
        (1L, 900L, ts(8)),   // 3 min after imp 100 → attributed
        (1L, 901L, ts(40)),  // 35 min after → outside horizon
        (3L, 902L, ts(7)))) // no impression
      q.processAllAvailable()
      // advance both watermarks so state can be dropped (no new output)
      imp.addData(Seq((9L, 999L, ts(120))))
      clk.addData(Seq((9L, 998L, ts(121))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name)
      .select("imp_id", "click_id").as[(Long, Long)].collect().toSet
    assert(got === Set((100L, 900L), (999L, 998L)))
  }

  test("nearDedupStream: repeats within the horizon dropped, state expires") {
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val name = s"neardup_${System.nanoTime()}"
    val q = Streams.nearDedupStream(spark,
        input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // start at ts(60): an event time of exactly 0 collides with the
      // INITIAL watermark (0) and is dropped by the late-row filter
      input.addData(Seq(
        (1L, "alpha beta gamma delta", ts(60)),
        (2L, "alpha beta gamma delta", ts(61)),   // exact near-dup of 1
        (3L, "completely different words here", ts(62))))
      q.processAllAvailable()
      // within horizon: another copy of doc 1's text is dropped
      input.addData(Seq((4L, "alpha beta gamma delta", ts(65))))
      q.processAllAvailable()
      // push watermark far past the horizon → bucket state expires
      input.addData(Seq((5L, "unrelated filler content now", ts(560))))
      q.processAllAvailable()
      // the same text is novel again once state expired
      input.addData(Seq((6L, "alpha beta gamma delta", ts(570))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).select("doc_id").as[Long].collect().toSet
    assert(got.contains(1L) && got.contains(3L) && got.contains(5L))
    assert(!got.contains(2L) && !got.contains(4L), s"dups kept: $got")
    assert(got.contains(6L), s"state did not expire: $got")
  }

  test("existsWithin: stream-stream semi join emits each match once") {
    val imp = MemoryStream[(Long, Long, Timestamp)](spark)
    val clk = MemoryStream[(Long, Long, Timestamp)](spark)
    val name = s"semi_${System.nanoTime()}"
    val q = Streams.existsWithin(
        imp.toDF().toDF("imp_user", "imp_id", "imp_ts"),
        clk.toDF().toDF("click_user", "click_id", "click_ts"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      imp.addData(Seq((1L, 100L, ts(5)), (2L, 200L, ts(6))))
      clk.addData(Seq(
        (1L, 900L, ts(8)),  // matches imp 100
        (1L, 901L, ts(9)),  // second match — must NOT duplicate imp 100
        (3L, 902L, ts(7)))) // no impression
      q.processAllAvailable()
      // advance watermarks: semi-join output is emitted once the left
      // row's state is finalized
      imp.addData(Seq((9L, 999L, ts(120))))
      clk.addData(Seq((9L, 998L, ts(121))))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).select("imp_id").as[Long].collect().toSeq
    assert(got.count(_ == 100L) === 1, s"semi join duplicated rows: $got")
    assert(!got.contains(200L)) // un-clicked impression 200 not emitted
  }

  test("RocksDB state store provider runs a stateful query end-to-end") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    Streams.useRocksDbStateStore(spark)
    try {
      val rows = runBatches[(Timestamp, String, Double)](
        Seq(Seq((ts(5), "click", 1.0), (ts(10), "click", 2.0)),
          Seq((ts(130), "view", 1.0))), // watermark past first window
        df => Streams.windowedEventStats(df.toDF("ts", "event_type", "value")),
        OutputMode.Append())
      val m = rows.map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
      assert(m("click") === ((2L, 3.0)))
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("upsertStream: foreachBatch merge replaces keys and appends new") {
    val base = Files.createTempDirectory("graft-upsert-").toString
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.upsertStream(spark,
      input.toDF().toDF("doc_id", "text"), s"$base/idx", s"$base/chk")
    try {
      input.addData(Seq((1L, "v1"), (2L, "v1")))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$base/idx").count() === 2)
      input.addData(Seq((2L, "v2"), (3L, "v1"))) // update 2, insert 3
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$base/idx")
      .as[(Long, String)].collect().sorted
    assert(out === Array((1L, "v1"), (2L, "v2"), (3L, "v1")))
  }

  test("PQ codes store maintenance: encode-in-stream composes with the " +
      "keyed upsert (insert, replace, tombstone)") {
    // the round-7 persisted codes-only serving store, maintained by the
    // generic keyed upsert: codes are a MAP-SIDE deterministic function
    // of the vector under frozen codebooks, so Pq.encode composes
    // directly onto the streaming source and the streamed store must
    // equal a from-scratch batch encode of the surviving corpus
    import graft.operators.Pq
    val base = Files.createTempDirectory("graft-codes-upsert-").toString
    def vec(i: Long): Seq[Double] =
      Seq.tabulate(8)(j => ((i * 31 + j * 7) % 10).toDouble)
    val train = (0L until 64L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding")
    val model = Pq.trainCodebooks(train, col("vec_id"), col("embedding"),
      m = 2, ks = 4, iters = 2)
    val input = MemoryStream[(Long, Seq[Double], Boolean)](spark)
    val src = input.toDF().toDF("vec_id", "embedding", "del")
    val q = Streams.upsertStream(spark,
      Pq.encode(src, col("embedding"), model)
        .select(col("vec_id"), col("codes"), col("del")),
      s"$base/codes", s"$base/chk", key = "vec_id",
      deleteCol = Some("del"))
    try {
      input.addData(Seq((1L, vec(1), false), (2L, vec(2), false)))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$base/codes").count() === 2)
      // replace 2 with a DIFFERENT vector, insert 3, tombstone 1
      input.addData(Seq((2L, vec(20), false), (3L, vec(3), false),
        (1L, vec(1), true)))
      q.processAllAvailable()
    } finally q.stop()
    val stored = spark.read.parquet(s"$base/codes")
      .select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    val expected = Pq.encode(
        Seq((2L, vec(20)), (3L, vec(3))).toDF("vec_id", "embedding"),
        col("embedding"), model)
      .select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    assert(stored === expected)
  }

  test("upsertStreamBucketed: only touched bucket dirs are rewritten") {
    val base = Files.createTempDirectory("graft-bupsert-").toString
    val idx = s"$base/idx"
    // (file name -> mtime) per bucket dir — rewritten files get fresh
    // random part- names, so map equality catches any rewrite
    def snapshot(): Map[String, Map[String, Long]] = {
      val d = new java.io.File(idx)
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(b => b.getName -> b.listFiles().filter(_.isFile)
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.upsertStreamBucketed(spark,
      input.toDF().toDF("doc_id", "text"), idx, s"$base/chk", nBuckets = 4)
    try {
      input.addData((0L to 15L).map(i => (i, "v1")))
      q.processAllAvailable()
      val before = snapshot()
      assert(before.size > 1, s"want several bucket dirs, got $before")
      input.addData(Seq((2L, "v2"))) // touches exactly one bucket
      q.processAllAvailable()
      val after = snapshot()
      val touchedBucket = Seq(2L).toDF("doc_id")
        .select(pmod(hash(col("doc_id")), lit(4))).as[Int].head()
      before.foreach { case (dir, files) =>
        if (dir == s"bucket=$touchedBucket")
          assert(after(dir) !== files, s"touched $dir was not rewritten")
        else
          assert(after(dir) === files, s"untouched $dir was rewritten")
      }
    } finally q.stop()
    val out = spark.read.parquet(idx).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.length === 16)
    assert(out(2) === ((2L, "v2")))
    assert(out.filter(_._1 != 2L).forall(_._2 == "v1"))
  }

  test("upsertStreamBucketed: recovers a bucket left aside by a dead swap") {
    val base = Files.createTempDirectory("graft-bupsert-crash-").toString
    val idx = s"$base/idx"
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.upsertStreamBucketed(spark,
      input.toDF().toDF("doc_id", "text"), idx, s"$base/chk", nBuckets = 4)
    try {
      input.addData((0L to 7L).map(i => (i, "v1")))
      q.processAllAvailable()
      // simulate a crash between the two swap renames: the bucket of key 2
      // sits at the hidden aside path, not at bucket=<b>
      val b = Seq(2L).toDF("doc_id")
        .select(pmod(hash(col("doc_id")), lit(4))).as[Int].head()
      val dir = new java.io.File(s"$idx/bucket=$b")
      val aside = new java.io.File(s"$idx/.bucket_${b}_old")
      assert(dir.renameTo(aside))
      input.addData(Seq((2L, "v2"))) // touches exactly the crashed bucket
      q.processAllAvailable()
    } finally q.stop()
    // the aside copy was restored before the merge: no rows lost
    val out = spark.read.parquet(idx).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.length === 8)
    assert(out(2) === ((2L, "v2")))
  }

  test("upsertStreamBucketed: restores an aside bucket the batch does NOT touch") {
    // a swap that died on bucket B must be repaired even when no later
    // batch ever touches B again — recovery scans ALL aside dirs
    val base = Files.createTempDirectory("graft-bupsert-orphan-").toString
    val idx = s"$base/idx"
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.upsertStreamBucketed(spark,
      input.toDF().toDF("doc_id", "text"), idx, s"$base/chk", nBuckets = 4)
    try {
      input.addData((0L to 7L).map(i => (i, "v1")))
      q.processAllAvailable()
      val bCrash = Seq(2L).toDF("doc_id")
        .select(pmod(hash(col("doc_id")), lit(4))).as[Int].head()
      val bOther = (0L to 7L).map(b => Seq(b).toDF("doc_id")
        .select(pmod(hash(col("doc_id")), lit(4))).as[Int].head())
        .zip(0L to 7L).find(_._1 != bCrash).get._2 // a key in a different bucket
      assert(new java.io.File(s"$idx/bucket=$bCrash")
        .renameTo(new java.io.File(s"$idx/.bucket_${bCrash}_old")))
      input.addData(Seq((bOther, "v2"))) // touches a DIFFERENT bucket
      q.processAllAvailable()
    } finally q.stop()
    // the orphaned bucket's rows are visible again: nothing lost
    val out = spark.read.parquet(idx).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.length === 8)
    assert(out.map(_._1) === (0L to 7L).toArray)
  }

  test("upsertStreamBucketed: tombstone deletes its key; only that bucket " +
      "rewritten; deleting an absent key is replay-safe") {
    val base = Files.createTempDirectory("graft-bdel-").toString
    val idx = s"$base/idx"
    def snapshot(): Map[String, Map[String, Long]] = {
      val d = new java.io.File(idx)
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(b => b.getName -> b.listFiles().filter(_.isFile)
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    val input = MemoryStream[(Long, String, Boolean)](spark)
    val q = Streams.upsertStreamBucketed(spark,
      input.toDF().toDF("doc_id", "text", "op_delete"), idx, s"$base/chk",
      nBuckets = 4, deleteCol = Some("op_delete"))
    try {
      input.addData((0L to 15L).map(i => (i, "v1", false)))
      q.processAllAvailable()
      val before = snapshot()
      val bDel = Seq(3L).toDF("doc_id")
        .select(pmod(hash(col("doc_id")), lit(4))).as[Int].head()
      input.addData(Seq((3L, "ignored", true))) // tombstone for key 3
      q.processAllAvailable()
      val after = snapshot()
      before.foreach { case (dir, files) =>
        if (dir == s"bucket=$bDel")
          assert(after(dir) !== files, s"touched $dir was not rewritten")
        else assert(after(dir) === files, s"untouched $dir was rewritten")
      }
      // the delete-col never reaches storage
      assert(!spark.read.parquet(idx).columns.contains("op_delete"))
      // deleting an id that is (now) absent: a no-op rewrite, no error —
      // the crash-replay shape, where the tombstone batch re-runs
      input.addData(Seq((3L, "ignored", true)))
      q.processAllAvailable()
      // mixed batch: delete one key, upsert another in the same trigger
      input.addData(Seq((7L, "", true), (2L, "v2", false)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(idx).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1) === (0L to 15L).filterNot(i => i == 3L || i == 7L))
    assert(out.find(_._1 == 2L).get._2 === "v2")
  }

  test("ivfUpsertStream: tombstone finds its cell via the key lookup and " +
      "removes the id; delete-only batch reports drift 0") {
    import graft.operators.Ann
    val base = Files.createTempDirectory("graft-ivf-del-").toString
    val idx = s"$base/idx"
    val corpus = (0 until 20).map { i =>
      val ctr = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Seq(ctr + (i % 5) * 0.01, ctr))
    }.toDF("vec_id", "embedding")
    Ann.buildIvfIndex(corpus, col("vec_id"), col("embedding"), idx,
      k = 2, iters = 4)
    def cellSnapshot(): Map[String, Map[String, Long]] = {
      val d = new java.io.File(s"$idx/data")
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(b => b.getName -> b.listFiles().filter(_.isFile)
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    val drifts = scala.collection.mutable.ArrayBuffer.empty[Double]
    // tombstones carry a NULL vector — only the id matters
    val input = MemoryStream[(Long, Option[Seq[Double]], Boolean)](spark)
    val q = Streams.ivfUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding", "op_delete"), idx,
      s"$base/chk", deleteCol = Some("op_delete"),
      onBatch = (_, d, _) => drifts.synchronized { drifts += d })
    try {
      val before = cellSnapshot()
      // id 4 lives in the ctr=0 cell: its tombstone must rewrite exactly
      // that cell (found via the (id, cell) lookup — the tombstone has no
      // vector to assign from)
      input.addData(Seq((4L, None, true)))
      q.processAllAvailable()
      val after = cellSnapshot()
      val changed = before.keys.filter(k => after(k) != before(k)).toSeq
      assert(changed.length === 1, s"exactly one cell rewritten: $changed")
      assert(drifts.toSeq === Seq(0.0), s"delete-only drift: $drifts")
      // mixed batch: delete in one cell, upsert into the other
      input.addData(Seq((5L, None, true), (100L, Some(Seq(0.3, 0.0)), false)))
      q.processAllAvailable()
    } finally q.stop()
    val (data, cents) = Ann.readIvfIndex(spark, idx)
    val ids = data.select("vec_id").as[Long].collect().toSet
    assert(!ids.contains(4L) && !ids.contains(5L) && ids.contains(100L))
    assert(data.count() === 19) // 20 - 2 deleted + 1 added
    // deleted ids are unreachable through search; the new id is reachable
    val hit = Ann.ivfTopK(data, col("cell"), col("embedding"), cents,
      Seq(0.3, 0.0), k = 1, nProbe = 2)
    assert(hit.select("vec_id").as[Long].head() === 100L)
  }

  test("graphUpsertStream: tombstone delete rebuilds only its shard; " +
      "untouched shards byte-identical; search never returns the deleted id") {
    import graft.operators.GraphAnn
    val dir = Files.createTempDirectory("graft-graph-del-").toString
    val idx = s"$dir/idx"
    def shardOf(id: Long): Int = Seq(id).toDF("id")
      .select(pmod(hash(col("id")), lit(4)).cast("int")).head().getInt(0)
    def snapshot(except: Int): Map[String, Map[String, Long]] = {
      val d = new java.io.File(idx)
      d.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("shard=") && f.getName != s"shard=$except")
        .map(s => s.getName -> s.listFiles().filter(_.isFile)
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    var metrics = Vector.empty[(Long, Long, Seq[Int])]
    val input = MemoryStream[(Long, Option[Seq[Double]], Boolean)](spark)
    val q = Streams.graphUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding", "op_delete"), idx, s"$dir/chk",
      numShards = 4, m = 4, efConstruction = 16,
      deleteCol = Some("op_delete"),
      onBatch = (b, n, r) => metrics :+= ((b, n, r)))
    try {
      input.addData((0L until 32L).map(i => (i, Some(Seq(i.toDouble, 0.0)), false)))
      q.processAllAvailable()
      // delete id 5: its shard takes the rebuild path, every other
      // shard's files survive byte-untouched
      val sDel = shardOf(5L)
      val before = snapshot(except = sDel)
      input.addData(Seq((5L, None, true)))
      q.processAllAvailable()
      assert(snapshot(except = sDel) === before,
        "a single-shard delete must not rewrite other shards")
      assert(metrics.last._2 === 0L && metrics.last._3 === Seq(sDel))
      val g = GraphAnn.readGraphIndex(spark, idx)
      assert(g.count() === 31)
      assert(g.filter(col("id") === 5L).count() === 0)
      // no surviving node's adjacency references the deleted id — the
      // rebuild is over the surviving set, not edge surgery
      assert(g.filter(array_contains(col("neighbors"), 5L)).count() === 0)
      // exhaustive beam == exact kNN over the survivors
      assert(GraphAnn.graphTopK(g, Seq(5.2, 0.0), k = 3, ef = 64)
        .select("vec_id").as[Long].collect() === Array(6L, 4L, 7L))
      // the deleted-then-reinserted lifecycle: id 5 comes back
      input.addData(Seq((5L, Some(Seq(5.0, 0.0)), false)))
      q.processAllAvailable()
      assert(GraphAnn.readGraphIndex(spark, idx).count() === 32)
      assert(GraphAnn.graphTopK(GraphAnn.readGraphIndex(spark, idx),
        Seq(5.2, 0.0), k = 1, ef = 64)
        .select("vec_id").as[Long].head() === 5L)
    } finally q.stop()
  }

  test("nearDedupStreamLsh catches a near-dup pair SimHash bucketing misses") {
    val base = "the quick brown fox jumps over the lazy dog near the old " +
      "stone bridge while evening light fades slowly across the quiet " +
      "river valley"
    val near = base + (" jab" * 14) // high shingle Jaccard, SimHash far off
    val other = "completely unrelated content about database engines and " +
      "distributed query processing at scale"
    // PRECONDITION 1: SimHash-16 distance exceeds nearDedupStream's
    // maxHamming=3 — the SimHash path cannot see this pair
    val sims = Seq((1L, base), (2L, near)).toDF("doc_id", "text")
      .select(col("doc_id"), graft.operators.Dedup.simhash16(col("text")))
      .as[(Long, Long)].collect().toMap
    val hamming = java.lang.Long.bitCount(sims(1L) ^ sims(2L))
    assert(hamming > 3, s"precondition: hamming $hamming must exceed 3")
    // PRECONDITION 2: batch MinHash-LSH emits the candidate pair
    val batchPairs = graft.operators.Dedup.lshCandidatePairs(
        Seq((1L, base), (2L, near), (3L, other)).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSet
    assert(batchPairs === Set((1L, 2L)))
    // STREAMING: the banded state must drop doc 2 and keep 1 and 3
    val dir = Files.createTempDirectory("graft-lsh-stream-").toString
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = Streams.nearDedupStreamLsh(spark,
      input.toDF().toDF("doc_id", "text", "ts"),
      s"$dir/out", s"$dir/state", s"$dir/chk")
    try {
      input.addData(Seq((1L, base, ts(1))))
      q.processAllAvailable()
      input.addData(Seq((2L, near, ts(2)), (3L, other, ts(2))))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 3L))
    // CONTRAST: the SimHash stream keeps all three (documents the gap
    // MinHash banding closes)
    val simKept = runBatches[(Long, String, Timestamp)](
      Seq(Seq((1L, base, ts(1))), Seq((2L, near, ts(2)), (3L, other, ts(2)))),
      df => Streams.nearDedupStream(spark,
        df.toDF("doc_id", "text", "ts")).toDF(),
      OutputMode.Append())
    assert(simKept.map(_.getAs[Long]("doc_id")).sorted === Array(1L, 2L, 3L))
  }

  test("nearDedupStreamLsh: chains close greedily and horizon prunes state") {
    // A~B and B~C but A and C share nothing: B dropped, C still dropped
    // (B marked state), and after the horizon passes the cluster's keys
    // expire so a re-arrival of the same content passes again
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val b = a + (" jab" * 10)
    val c = b + (" wiz" * 10)
    // precondition: banding links A~B and B~C
    val chainPairs = graft.operators.Dedup.lshCandidatePairs(
        Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSet
    assert(chainPairs.contains((1L, 2L)) && chainPairs.contains((2L, 3L)),
      s"precondition: $chainPairs")
    val dir = Files.createTempDirectory("graft-lsh-chain-").toString
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = Streams.nearDedupStreamLsh(spark,
      input.toDF().toDF("doc_id", "text", "ts"),
      s"$dir/out", s"$dir/state", s"$dir/chk", horizonMs = 5L * 60 * 1000)
    try {
      input.addData(Seq((1L, a, ts(1))))
      q.processAllAvailable()
      input.addData(Seq((2L, b, ts(2))))
      q.processAllAvailable()
      input.addData(Seq((3L, c, ts(3)))) // near B only; B was dropped
      q.processAllAvailable()
      // 20 min later: horizon (5 min) expired every stored key
      input.addData(Seq((4L, b, ts(23))))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 4L))
  }

  test("renameOrThrow: a false-returning rename throws and leaves source") {
    // HDFS/object-store renames report failure by RETURNING FALSE, not by
    // throwing — an unchecked rename inside a swap would fall through to
    // the aside delete and silently lose the bucket
    val dir = Files.createTempDirectory("graft-rename-").toString
    val real = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val src = new org.apache.hadoop.fs.Path(s"$dir/src")
    real.mkdirs(src)
    val failing = new org.apache.hadoop.fs.FilterFileSystem(real) {
      override def rename(a: org.apache.hadoop.fs.Path,
          b: org.apache.hadoop.fs.Path): Boolean = false
    }
    val ex = intercept[java.io.IOException] {
      Streams.renameOrThrow(failing, src, new org.apache.hadoop.fs.Path(s"$dir/dst"))
    }
    assert(ex.getMessage.contains("rename failed"))
    assert(real.exists(src)) // source untouched — recovery can restore it
    // and the happy path still moves the dir
    Streams.renameOrThrow(real, src, new org.apache.hadoop.fs.Path(s"$dir/dst"))
    assert(!real.exists(src) &&
      real.exists(new org.apache.hadoop.fs.Path(s"$dir/dst")))
  }

  test("nearDedupStreamLsh: replayed batch rewrites identical state (no dup rows)") {
    // Simulates the crash-replay window: state ALREADY contains the
    // batch's band keys (swap committed, checkpoint didn't), then the
    // batch re-runs. The union with prior must dropDuplicates on the
    // full key or every replay doubles the hot buckets' state rows.
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val dir = Files.createTempDirectory("graft-lsh-replay-").toString
    // pre-seed the state dir with EXACTLY the keys this batch will write,
    // using the same minhash/banding/bucketing pipeline as the stream
    val seeded = Seq((1L, text, ts(1))).toDF("doc_id", "text", "ts")
      .select(col("doc_id"), col("ts"),
        graft.operators.Dedup.minhashFromHashes(
          graft.plans.HashedShingles.shingleHashes(col("text"), 3, 4), 8).as("sig"))
      .select(col("doc_id"), col("ts"),
        posexplode(graft.operators.Dedup.bandKeys(col("sig"), 4, 2))
          .as(Seq("band_idx", "band_key")))
      .withColumn("bucket", pmod(hash(col("band_idx"), col("band_key")), lit(16)))
    seeded.write.partitionBy("bucket").parquet(s"$dir/state")
    val before = spark.read.parquet(s"$dir/state").count()
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = Streams.nearDedupStreamLsh(spark,
      input.toDF().toDF("doc_id", "text", "ts"),
      s"$dir/out", s"$dir/state", s"$dir/chk")
    try {
      input.addData(Seq((1L, text, ts(1)))) // the "replayed" batch
      q.processAllAvailable()
    } finally q.stop()
    val state = spark.read.parquet(s"$dir/state")
    assert(state.count() === before) // identical state, not doubled
    assert(state.count() ===
      state.dropDuplicates("band_idx", "band_key", "doc_id", "ts").count())
    // the replayed doc is judged against its OWN state rows (equal
    // (ts, id) is not "earlier") — it must still be emitted, not dropped
    assert(spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect() === Array(1L))
  }

  test("nearDedupStreamHamming: persisted block state EQUALS the batch " +
      "relation; kept set matches the greedy pairwise replay") {
    import graft.operators.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60)
    val rows = docs.as[(Long, String)].collect()
    val dir = Files.createTempDirectory("graft-ham-parity-").toString
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = Streams.nearDedupStreamHamming(spark,
      input.toDF().toDF("doc_id", "text", "ts"),
      s"$dir/out", s"$dir/state", s"$dir/chk",
      horizonMs = 365L * 24 * 60 * 60 * 1000) // nothing expires
    try {
      rows.grouped(20).zipWithIndex.foreach { case (batch, i) =>
        input.addData(batch.map { case (id, text) => (id, text, ts(i + 1)) })
        q.processAllAvailable()
      }
    } finally q.stop()
    // state relation == the batch fingerprintBlockRows relation
    val streamed = spark.read.parquet(s"$dir/state")
      .select(col("doc_id"), col("fp"), col("bi"), col("bv"))
      .as[(Long, Long, Int, Long)].collect().sorted
    val batchRel = Dedup.fingerprintBlockRows(
        docs.select(col("doc_id"),
          Dedup.simhash16(col("text")).as("fp")),
        col("doc_id"), col("fp"), bits = 16, maxHamming = 2)
      .select(col("id"), col("fp"), col("bi"), col("bv"))
      .as[(Long, Long, Int, Long)].collect().sorted
    assert(streamed.length === batchRel.length)
    assert(streamed === batchRel)
    // kept set == greedy pairwise replay over (ts, id) order: a doc
    // drops iff ANY prior doc (kept or dropped) is within Hamming 2;
    // all docs mark state. Batch order here: 20-doc waves at ts 1,2,3,
    // ids ascending within a wave (collect order is doc_id order).
    val fps = docs.select(col("doc_id"),
        Dedup.simhash16(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    // within a wave every doc shares one ts, so the stream's (ts, id)
    // order is wave order then doc_id order — replay exactly that
    val ordered = rows.grouped(20).flatMap(_.map(_._1).sorted).toSeq
    val seen = scala.collection.mutable.ListBuffer[Long]()
    val expectKept = ordered.filter { id =>
      val dup = seen.exists(f =>
        java.lang.Long.bitCount(f ^ fps(id)) <= 2)
      seen += fps(id)
      !dup
    }.toSet
    val kept = spark.read.parquet(s"$dir/out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === expectKept)
  }

  test("nearDedupStreamLsh: full-replay persisted band state EQUALS the " +
      "batch band-table relation, and serves identical pairs") {
    // the cmsStream/bloomStream equivalence pattern for the LSH family:
    // stream the whole corpus through in micro-batches (horizon wide
    // enough that nothing expires), then the persisted band state must
    // reproduce the EXACT relation Dedup.writeBandTable persists —
    // every row, every field (sorted full-row equality; physical
    // parquet bytes aren't comparable across writers because task file
    // naming and tie-row order differ, the relation is the contract).
    import graft.operators.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(60)
    val rows = docs.as[(Long, String)].collect()
    val dir = Files.createTempDirectory("graft-lsh-parity-").toString
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = Streams.nearDedupStreamLsh(spark,
      input.toDF().toDF("doc_id", "text", "ts"),
      s"$dir/out", s"$dir/state", s"$dir/chk",
      horizonMs = 365L * 24 * 60 * 60 * 1000) // nothing expires
    try {
      rows.grouped(20).zipWithIndex.foreach { case (batch, i) =>
        input.addData(batch.map { case (id, text) => (id, text, ts(i + 1)) })
        q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/state")
      .select(col("doc_id").as("id"), col("band_idx"), col("band_key"))
      .as[(Long, Int, String)].collect().sorted
    val batchRel = Dedup.bandRows(docs, col("doc_id"), col("text"))
      .as[(Long, Int, String)].collect().sorted
    assert(streamed.length === batchRel.length)
    assert(streamed === batchRel)
    // and the stream-built state SERVES like the batch-built table: a
    // band table written from the streamed relation generates the same
    // candidate pairs as the one-shot batch operator
    val tbl = s"lsh_parity_${System.nanoTime()}"
    spark.read.parquet(s"$dir/state")
      .select(col("doc_id").as("id"), col("band_idx"), col("band_key"))
      .write.bucketBy(32, "band_idx", "band_key")
      .sortBy("band_idx", "band_key").saveAsTable(tbl)
    try {
      val viaStream = Dedup.lshPairsFromBandTable(spark, tbl)
        .as[(Long, Long)].collect().sorted.toSeq
      val viaBatch = Dedup.lshCandidatePairs(docs, col("doc_id"), col("text"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(viaStream === viaBatch)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("chunkStream: watermarked dedup drops re-delivery, replay overwrites its own partition") {
    val dir = Files.createTempDirectory("graft-chunk-stream-").toString
    // pre-seed batch 0's output partition as if a crashed run committed
    // its output but not the checkpoint — the replaying batch must
    // OVERWRITE the partition (dynamic overwrite), not append beside it
    Seq((99L, 0L, "stale", 1L, "deadbeef"))
      .toDF("doc_id", "chunk_idx", "chunk_text", "n_tokens", "digest")
      .write.parquet(s"$dir/out/batch_id=0")
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = Streams.chunkStream(spark,
      input.toDF().toDF("doc_id", "text", "ts"),
      s"$dir/out", s"$dir/chk", chunkTokens = 4, stride = 2)
    try {
      input.addData(Seq((1L, "a b c d e f", ts(1)), (2L, "g h i", ts(1))))
      q.processAllAvailable()
      // doc 1 re-delivered with the same (id, ts): the watermarked
      // streaming dedup must drop it — only doc 3 chunks this batch
      input.addData(Seq((1L, "a b c d e f", ts(1)), (3L, "j k", ts(2))))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$dir/out")
    // stale pre-seeded row gone; re-delivered doc chunked exactly once
    assert(!out.select("doc_id").as[Long].collect().contains(99L))
    val byDoc = out.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    // 6 tokens @ (4, stride 2) → starts 0,2,4; 3 tokens → 0,2; 2 → 0
    assert(byDoc === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // window content + digest survive the sink
    val c1 = out.filter(col("doc_id") === 1 && col("chunk_idx") === 0)
      .select("chunk_text", "n_tokens").as[(String, Long)].head()
    assert(c1 === (("a b c d", 4L)))
    assert(out.filter(col("digest") =!= md5(col("chunk_text"))).count() === 0)
  }

  test("qualityBucketStream: streamed buckets over a full corpus replay " +
      "equal the batch sampled form bit-for-bit") {
    import graft.operators.LmScore
    val dir = Files.createTempDirectory("graft-qbucket-stream-").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Streams.writeQualityStats(spark, docs, s"$dir/stats")
    val rows = docs.select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect()
    val input = MemoryStream[(Long, String, String, Timestamp)](spark)
    val q = Streams.qualityBucketStream(spark,
      input.toDF().toDF("doc_id", "text", "lang", "ts"),
      s"$dir/stats", s"$dir/out", s"$dir/chk")
    try {
      input.addData(rows.take(250).map(r => (r._1, r._2, r._3, ts(1))).toSeq)
      q.processAllAvailable()
      input.addData(rows.drop(250).map(r => (r._1, r._2, r._3, ts(2))).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/out")
      .select("doc_id", "lang", "lm_score", "bucket")
      .orderBy("doc_id")
      .as[(Long, String, Double, String)].collect().toSeq
    val batch = LmScore.perplexityBucketsSampled(docs, col("doc_id"),
        col("text"), col("lang"), rate = 0.25)
      .orderBy("doc_id")
      .as[(Long, String, Double, String)].collect().toSeq
    assert(streamed.length === batch.length)
    assert(streamed === batch)
  }

  test("shardStream: batch-scoped shards, exactly-once coverage, " +
      "replay overwrites its own wave partition") {
    val dir = Files.createTempDirectory("graft-shard-stream-").toString
    // pre-seed batch 0's partition as a crashed run's committed output —
    // the replaying batch must overwrite it, not append beside it
    Seq((99999L, 0L, "stale", 1L, 1L))
      .toDF("doc_id", "pos", "text", "n_tokens", "cum_tokens")
      .write.parquet(s"$dir/out/batch_id=0/split=train/shard=0")
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = Streams.shardStream(spark,
      input.toDF().toDF("doc_id", "text", "ts"),
      s"$dir/out", s"$dir/chk", budgetTokens = 50L)
    try {
      input.addData((1L to 20L).map(i =>
        (i, s"tok$i " * (i % 5 + 1).toInt, ts(1))))
      q.processAllAvailable()
      input.addData((21L to 30L).map(i => (i, s"tok$i", ts(2))))
      q.processAllAvailable()
    } finally q.stop()
    val store = spark.read.parquet(s"$dir/out")
    assert(!store.select("doc_id").as[Long].collect().contains(99999L))
    assert(store.count() === 30L)
    assert(store.select("doc_id").distinct().count() === 30L)
    // shard ids scoped per (batch, split): each starts at 0
    store.groupBy("batch_id", "split").agg(min("shard"))
      .as[(Long, String, Long)].collect()
      .foreach { case (b, s, m) => assert(m === 0L, s"$b/$s min shard $m") }
  }

  test("cmsStream: partials per batch, merge == batch sketch, replay + compaction safe") {
    import graft.operators.Sketches
    val dir = Files.createTempDirectory("graft-cms-stream-").toString
    // pre-seed batch 0's partition as if a crashed run committed output
    // but not the checkpoint — the replaying batch must OVERWRITE it
    // (dynamic overwrite), or the counter double-counts
    Seq((0, 5, 999L)).toDF("cms_row", "cms_bucket", "cms_cnt")
      .write.parquet(s"$dir/grid/batch_id=0")
    val input = MemoryStream[String](spark)
    val q = Streams.cmsStream(spark, input.toDF().toDF("term"),
      s"$dir/grid", s"$dir/chk", keyCol = "term", d = 2, w = 16)
    try {
      input.addData("a", "b", "a"); q.processAllAvailable()
      input.addData("b", "c"); q.processAllAvailable()
    } finally q.stop()
    // two live partials + none of the stale pre-seed
    val partials = spark.read.parquet(s"$dir/grid")
    assert(partials.select("batch_id").distinct().count() === 2)
    assert(partials.filter(col("cms_cnt") === 999L).count() === 0)
    // merged grid is BIT-EQUAL to the batch sketch of the full stream
    val expected = Sketches.cmsCounters(
        Seq("a", "b", "a", "b", "c").toDF("term"), col("term"), 2, 16)
      .as[(Int, Int, Long)].collect().toSet
    val merged = Streams.readCmsGrid(spark, s"$dir/grid")
      .as[(Int, Int, Long)].collect().toSet
    assert(merged === expected)
    // compaction folds to ONE baseline partition, grid unchanged
    Streams.compactCms(spark, s"$dir/grid")
    val after = spark.read.parquet(s"$dir/grid")
    assert(after.select("batch_id").distinct().as[Long].collect().toSeq
      === Seq(-1L))
    assert(Streams.readCmsGrid(spark, s"$dir/grid")
      .as[(Int, Int, Long)].collect().toSet === expected)
    // estimates off the streamed grid match the batch path end-to-end
    val probes = Seq(("a", 2L), ("b", 2L), ("c", 1L))
      .toDF("term", "exact_cnt")
    val est = Sketches.cmsEstimate(
        Streams.readCmsGrid(spark, s"$dir/grid"), probes, "term", 2, 16)
      .as[(String, Long, Long)].collect()
    est.foreach { case (k, ex, e) => assert(e >= ex, s"$k under-counted") }
  }

  test("lineCountStream: streamed line counts == batch counts after " +
      "replay; scrub against streamed counts == one-shot dedupLines") {
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("graft-lines-stream-").toString
    // pre-seed batch 0's partition as a crashed run's garbage — the
    // replay must overwrite it or the boilerplate threshold misfires
    Seq((12345L, 999L)).toDF("h", "nd")
      .write.parquet(s"$dir/counts/batch_id=0")
    val docsAll = Seq(
      (1L, "banner\nunique one\nfooter"),
      (2L, "banner\nunique two\nfooter"),
      (3L, "banner\nfooter"),
      (4L, "solo line\nsolo line\nmine"))
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.lineCountStream(spark,
      input.toDF().toDF("doc_id", "text"), s"$dir/counts", s"$dir/chk")
    try {
      input.addData(docsAll.take(2): _*); q.processAllAvailable()
      input.addData(docsAll.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val corpus = docsAll.toDF("doc_id", "text")
    // streamed (h, nd) table is BIT-EQUAL to the batch count table
    val expected = Dedup.lineDocCounts(
        Dedup.docLines(corpus, col("doc_id"), col("text")))
      .as[(Long, Long)].collect().toSet
    val streamed = Streams.readLineCounts(spark, s"$dir/counts")
      .as[(Long, Long)].collect().toSet
    assert(streamed === expected)
    // scrubbing the corpus against the streamed counts reproduces the
    // one-shot operator exactly
    val oneShot = Dedup.dedupLines(corpus, col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    val viaCounts = Dedup.dedupLinesAgainstCounts(corpus, col("doc_id"),
        col("text"), Streams.readLineCounts(spark, s"$dir/counts"))
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(viaCounts === oneShot)
    // compaction folds to one baseline partition, counts unchanged
    Streams.compactLineCounts(spark, s"$dir/counts")
    assert(spark.read.parquet(s"$dir/counts")
      .select("batch_id").distinct().as[Long].collect().toSeq === Seq(-1L))
    assert(Streams.readLineCounts(spark, s"$dir/counts")
      .as[(Long, Long)].collect().toSet === expected)
  }

  test("percolateStream: streamed matches over the full prefix equal " +
      "the batch operator; replay overwrites its own output") {
    import graft.operators.Percolate
    val dir = Files.createTempDirectory("graft-perc-stream-").toString
    // pre-seed batch 0's output as crashed-run garbage — replay must
    // overwrite it or phantom matches survive
    Seq((999L, 999L)).toDF("doc_id", "query_id")
      .write.parquet(s"$dir/out/batch_id=0")
    val queries = Seq((1L, "alpha", 2), (1L, "beta", 2), (2L, "gamma", 1))
      .toDF("query_id", "term", "n_terms")
    val docs = Seq(
      (1L, "alpha beta and more"),      // matches q1
      (2L, "alpha only here"),          // partial -> no match
      (3L, "gamma ray burst"),          // matches q2
      (4L, "ALPHA Beta gamma"))         // matches q1 AND q2 (ci tokens)
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.percolateStream(spark,
      input.toDF().toDF("doc_id", "text"), queries,
      s"$dir/out", s"$dir/chk")
    try {
      input.addData(docs.take(2): _*); q.processAllAvailable()
      input.addData(docs.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/out")
      .select("doc_id", "query_id").as[(Long, Long)].collect().toSet
    val batch = Percolate.matches(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"), queries)
      .as[(Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed === Set((1L, 1L), (3L, 2L), (4L, 1L), (4L, 2L)))
  }

  test("dayCountStream: streamed histogram == batch counts after replay; " +
      "decay-at-read matches the batch formula for any now") {
    val dir = Files.createTempDirectory("graft-decay-stream-").toString
    // pre-seed batch 0's partition as a crashed run's garbage — the
    // replay must overwrite it or every decayed count inflates
    Seq(("view", 7L, 999L)).toDF("event_type", "day", "n")
      .write.parquet(s"$dir/counts/batch_id=0")
    val ev = Seq(
      ("view", ts(1)), ("view", ts(1)), ("click", ts(1)),
      ("view", ts(1 + 1440)), ("click", ts(1 + 2880)),
      ("view", ts(1 + 2880)), ("view", ts(1 + 2880)))
    val input = MemoryStream[(String, Timestamp)](spark)
    val q = Streams.dayCountStream(spark,
      input.toDF().toDF("event_type", "ts"), s"$dir/counts", s"$dir/chk")
    try {
      input.addData(ev.take(3): _*); q.processAllAvailable()
      input.addData(ev.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val corpus = ev.toDF("event_type", "ts")
    val expected = corpus
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    val streamed = Streams.readDayCounts(spark, s"$dir/counts")
      .as[(String, Long, Long)].collect().toSet
    assert(streamed === expected)
    // decay at read: equal to the same arithmetic over the batch
    // histogram, for a `now` PAST the last event (state unchanged)
    val nowDay = 5L
    val viaStream = Streams.decayedFromDayCounts(
        Streams.readDayCounts(spark, s"$dir/counts"), nowDay)
      .as[(String, Double, Long)].collect().toSet
    val viaBatch = Streams.decayedFromDayCounts(
        expected.toSeq.toDF("event_type", "day", "n"), nowDay)
      .as[(String, Double, Long)].collect().toSet
    assert(viaStream === viaBatch)
    // hand-check one cell: views at days 0 (2x), 1, 2 (2x) from now=5
    // -> (2/32 + 1/16 + 2/8) = 0.375
    assert(viaStream.find(_._1 == "view").get._2 === 0.375)
    // compaction folds to one baseline partition, counts unchanged
    Streams.compactDayCounts(spark, s"$dir/counts")
    assert(Streams.readDayCounts(spark, s"$dir/counts")
      .as[(String, Long, Long)].collect().toSet === expected)
  }

  test("decayedFromDayCounts: a stored day PAST the caller's nowDay " +
      "clamps to age 0 (weight 1) instead of wrapping the shift mod 64") {
    // day 7 > nowDay 5: unclamped age_d = -2 would shift by 52 > 50;
    // with shift wrap this silently produced garbage weights
    val counts = Seq(("view", 7L, 3L), ("view", 5L, 1L))
      .toDF("event_type", "day", "n")
    val got = Streams.decayedFromDayCounts(counts, nowDay = 5L)
      .as[(String, Double, Long)].collect().toSeq
    assert(got === Seq(("view", 4.0, 4L))) // both at weight 1
  }

  test("bloomStream: streamed bits == batch bits, replay safe, compaction preserves") {
    import graft.operators.BloomJoin
    val dir = Files.createTempDirectory("graft-bloom-stream-").toString
    val mBits = 1 << 10
    // pre-seed batch 0 with an all-ones word (a crashed run's garbage):
    // replay must overwrite it or every membership test passes
    Seq((0, -1L)).toDF("word", "bits")
      .write.parquet(s"$dir/bits/batch_id=0")
    val input = MemoryStream[Long](spark)
    val q = Streams.bloomStream(spark, input.toDF().toDF("doc_id"),
      s"$dir/bits", s"$dir/chk", mBits = mBits, kHash = 4)
    try {
      input.addData(1L to 50L: _*); q.processAllAvailable()
      input.addData(51L to 80L: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = Streams.readBloomBits(spark, s"$dir/bits", mBits)
    val batch = BloomJoin.buildBits((1L to 80L).toDF("doc_id"),
      col("doc_id"), mBits, 4)
    assert(streamed.toSeq === batch.toSeq)
    // no false negatives over every key the stream ever saw
    val misses = (1L to 80L).toDF("doc_id")
      .filter(!BloomJoin.membershipTest(col("doc_id"), streamed, mBits, 4))
      .count()
    assert(misses === 0L)
    // compaction folds to one baseline partition, bits unchanged
    Streams.compactBloom(spark, s"$dir/bits")
    assert(spark.read.parquet(s"$dir/bits")
      .select("batch_id").distinct().as[Long].collect().toSeq === Seq(-1L))
    assert(Streams.readBloomBits(spark, s"$dir/bits", mBits).toSeq
      === batch.toSeq)
  }

  test("ivfUpsertStream: touched cells rewritten, drift triggers retrain") {
    import graft.operators.Ann
    val base = Files.createTempDirectory("graft-ivf-stream-").toString
    val idx = s"$base/idx"
    // 3 tight clusters at 0, 10, -10 on the first axis
    val corpus = (0 until 30).map { i =>
      val c = i % 3
      val ctr = Seq(0.0, 10.0, -10.0)(c)
      (i.toLong, Seq(ctr + (i % 5) * 0.01, ctr))
    }.toDF("vec_id", "embedding")
    Ann.buildIvfIndex(corpus, col("vec_id"), col("embedding"), idx,
      k = 3, iters = 4)
    def cellSnapshot(): Map[String, Map[String, Long]] = {
      val d = new java.io.File(s"$idx/data")
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(b => b.getName -> b.listFiles().filter(_.isFile)
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    val before = cellSnapshot()
    assert(before.size === 3, s"want 3 cell dirs, got ${before.keys}")
    val drifts = scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean)]
    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = Streams.ivfUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idx, s"$base/chk",
      driftThreshold = 5.0,
      onBatch = (_, d, r) => drifts.synchronized { drifts += ((d, r)) })
    try {
      // batch 1: vectors inside cluster 1's neighborhood — low drift,
      // only that cell's dir rewritten
      input.addData(Seq((100L, Seq(10.02, 10.0)), (101L, Seq(9.98, 10.0))))
      q.processAllAvailable()
      val after1 = cellSnapshot()
      val changed = before.keys.filter(k => after1(k) != before(k)).toSeq
      assert(changed.length === 1, s"exactly one cell rewritten: $changed")
      assert(drifts.toSeq.map(_._2) === Seq(false))
      assert(drifts.head._1 < 1.0, s"in-cluster drift ${drifts.head._1}")
      // batch 2: vectors FAR from every centroid — drift > threshold,
      // retrain must fire and some centroid must move to the new mass
      input.addData(Seq((200L, Seq(100.0, 100.0)), (201L, Seq(100.5, 100.0)),
        (202L, Seq(99.5, 100.0))))
      q.processAllAvailable()
      assert(drifts.toSeq.map(_._2) === Seq(false, true),
        s"drift log: $drifts")
    } finally q.stop()
    // post-retrain invariants: all rows present, a centroid sits near the
    // new cluster, and assignments are consistent with the new centroids
    val (data, cents) = Ann.readIvfIndex(spark, idx)
    assert(data.count() === 35)
    val centVals = cents.select(col("centroid").cast("array<double>"))
      .as[Seq[Double]].collect()
    assert(centVals.exists(c => math.abs(c.head - 100.0) < 5.0),
      s"no centroid near the drifted mass: ${centVals.map(_.head).toSeq}")
    // upserted keys are queryable through the maintained index
    val hit = Ann.ivfTopK(data, col("cell"), col("embedding"), cents,
      Seq(100.0, 100.0), k = 3, nProbe = 1)
    assert(hit.select("vec_id").as[Long].collect().toSet === Set(200L, 201L, 202L))
  }

  test("ivfUpsertStream: re-ingest that MOVES cells leaves no stale copy") {
    import graft.operators.Ann
    val base = Files.createTempDirectory("graft-ivf-move-").toString
    val idx = s"$base/idx"
    val corpus = (0 until 20).map { i =>
      val ctr = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Seq(ctr + (i % 5) * 0.01, ctr))
    }.toDF("vec_id", "embedding")
    Ann.buildIvfIndex(corpus, col("vec_id"), col("embedding"), idx,
      k = 2, iters = 4)
    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = Streams.ivfUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idx, s"$base/chk")
    try {
      // ingest near cluster 0 …
      input.addData(Seq((100L, Seq(0.05, 0.0))))
      q.processAllAvailable()
      // … then RE-ingest the same key near cluster 1: its cell moves,
      // so the old cell's directory must also be rewritten to drop the
      // stale copy (cell is a function of the VALUE)
      input.addData(Seq((100L, Seq(10.05, 10.0))))
      q.processAllAvailable()
    } finally q.stop()
    val (data, cents) = Ann.readIvfIndex(spark, idx)
    val copies = data.filter(col("vec_id") === 100L)
      .select(col("cell").cast("int"), col("embedding").cast("array<double>"))
      .collect()
    assert(copies.length === 1, s"stale duplicate rows: ${copies.toSeq}")
    assert(copies.head.getSeq[Double](1).head > 9.0, "kept the NEW vector")
    assert(data.count() === 21)
    // the surviving copy is queryable in its new cell only
    val hit = Ann.ivfTopK(data, col("cell"), col("embedding"), cents,
      Seq(10.05, 10.0), k = 1, nProbe = 1)
    assert(hit.select("vec_id").as[Long].head() === 100L)
  }

  test("ivfUpsertStream with PQ enrich: streamed index carries residual codes") {
    import graft.operators.{Ann, Pq}
    val base = Files.createTempDirectory("graft-ivfpq-stream-").toString
    val idx = s"$base/idx"
    val corpus = (0 until 30).map { i =>
      val c = i % 3
      val ctr = Seq(0.0, 10.0, -10.0)(c)
      (i.toLong, Seq(ctr + (i % 5) * 0.01, ctr))
    }.toDF("vec_id", "embedding")
    val cents = Ann.kmeansCentroids(corpus, col("vec_id"), col("embedding"),
      k = 3, iters = 4)
    val model = Pq.trainResidual(
      Ann.assignCells(corpus, col("vec_id"), col("embedding"), cents),
      col("vec_id"), col("embedding"), cents, m = 2, ks = 4, iters = 2)
    def enc(b: org.apache.spark.sql.DataFrame,
            c: org.apache.spark.sql.DataFrame) =
      Pq.encodeResidual(b, col("embedding"), c, model)
    // initial index WITH codes (the persisted IVF-PQ layout)
    Ann.writePartitioned(
      enc(Ann.assignCells(corpus, col("vec_id"), col("embedding"), cents),
        cents), s"$idx/data")
    cents.coalesce(1).write.mode("overwrite").parquet(s"$idx/centroids")

    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = Streams.ivfUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idx, s"$base/chk",
      driftThreshold = 5.0, enrich = enc)
    try {
      input.addData(Seq((100L, Seq(10.02, 10.0)), (101L, Seq(9.98, 10.0))))
      q.processAllAvailable()
      val (data1, cents1) = Ann.readIvfIndex(spark, idx)
      assert(data1.count() === 32)
      assert(data1.filter(col("codes").isNull).count() === 0,
        "every stored row carries codes")
      // streamed rows' codes equal the batch-side encode of the same rows
      val expect = enc(Ann.assignCells(
          Seq((100L, Seq(10.02, 10.0)), (101L, Seq(9.98, 10.0)))
            .toDF("vec_id", "embedding"),
          col("vec_id"), col("embedding"), cents1), cents1)
        .select(col("vec_id"), col("codes")).collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
      val got = data1.filter(col("vec_id") >= 100L)
        .select(col("vec_id"), col("codes")).collect()
        .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
      assert(got === expect)
      // drift past the threshold → retrain re-enriches EVERY row against
      // the new centroids
      input.addData(Seq((200L, Seq(100.0, 100.0)), (201L, Seq(100.5, 100.0)),
        (202L, Seq(99.5, 100.0))))
      q.processAllAvailable()
    } finally q.stop()
    val (data2, cents2) = Ann.readIvfIndex(spark, idx)
    assert(data2.count() === 35)
    assert(data2.filter(col("codes").isNull).count() === 0)
    val reExpected = enc(Ann.assignCells(data2.drop("cell").drop("codes"),
        col("vec_id"), col("embedding"), cents2), cents2)
      .select(col("vec_id"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val reGot = data2.select(col("vec_id"), col("codes")).collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(reGot === reExpected, "post-retrain codes consistent with new centroids")
  }

  test("graphUpsertStream: incremental insert, untouched shards untouched, replacement rebuilds") {
    import graft.operators.GraphAnn
    val dir = Files.createTempDirectory("graft-graph-stream-").toString
    val idx = s"$dir/idx"
    def shardOf(id: Long): Int = Seq(id).toDF("id")
      .select(pmod(hash(col("id")), lit(4)).cast("int")).head().getInt(0)
    def snapshot(except: Int): Map[String, Map[String, Long]] = {
      val d = new java.io.File(idx)
      d.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("shard=") && f.getName != s"shard=$except")
        .map(s => s.getName -> s.listFiles().filter(_.isFile)
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    var metrics = Vector.empty[(Long, Long, Seq[Int])]
    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = Streams.graphUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idx, s"$dir/chk",
      numShards = 4, m = 4, efConstruction = 16,
      onBatch = (b, n, r) => metrics :+= ((b, n, r)))
    try {
      input.addData((0L until 32L).map(i => (i, Seq(i.toDouble, 0.0))))
      q.processAllAvailable()
      val g1 = GraphAnn.readGraphIndex(spark, idx)
      assert(g1.count() === 32)
      // exhaustive beam (ef >= shard size) == exact kNN: machinery proof
      assert(GraphAnn.graphTopK(g1, Seq(5.2, 0.0), k = 3, ef = 64)
        .select("vec_id").as[Long].collect() === Array(5L, 6L, 4L))
      assert(metrics.last._2 === 32L && metrics.last._3.isEmpty)
      // batch 2: ONE new id — every other shard's files must survive
      // byte-untouched (names + mtimes), and no rebuild is reported
      val sNew = shardOf(100L)
      val before = snapshot(except = sNew)
      input.addData(Seq((100L, Seq(100.0, 0.0))))
      q.processAllAvailable()
      assert(snapshot(except = sNew) === before,
        "a single-shard insert must not rewrite other shards")
      assert(metrics.last._2 === 1L && metrics.last._3.isEmpty)
      // batch 3: REPLACE id 5 — its shard takes the deterministic
      // rebuild path, exactly one stored copy, search sees the new vector
      input.addData(Seq((5L, Seq(1000.0, 0.0))))
      q.processAllAvailable()
      assert(metrics.last._3 === Seq(shardOf(5L)))
      val g3 = GraphAnn.readGraphIndex(spark, idx)
      val five = g3.filter(col("id") === 5L)
        .select("vec").as[Seq[Double]].collect()
      assert(five.length === 1 && five.head.head === 1000.0)
      assert(GraphAnn.graphTopK(g3, Seq(5.2, 0.0), k = 3, ef = 64)
        .select("vec_id").as[Long].collect() === Array(6L, 4L, 7L))
    } finally q.stop()
  }

  test("dsirStream: streamed marginals equal the batch marginals of the " +
      "union; serving weights equal the one-shot operator; replay " +
      "overwrites its own partition; compaction preserves totals") {
    import graft.operators.Dsir
    val dir = Files.createTempDirectory("graft-dsir-stream-").toString
    val stats = s"$dir/stats"
    // pre-seed batch 0's partial as if a crashed run committed output
    // but not the checkpoint — the replaying batch must OVERWRITE it
    Seq((0L, 999999L, 999999L))
      .toDF("bucket", "ct", "cr")
      .write.parquet(s"$stats/batch_id=0")
    val b1 = Seq((1L, "alpha beta gamma alpha", true),
      (10L, "alpha beta zeta", false))
    val b2 = Seq((2L, "beta gamma gamma", true),
      (11L, "zeta eta theta", false))
    val b3 = Seq((3L, "alpha gamma", true),
      (12L, "alpha beta gamma", false))
    val union = (b1 ++ b2 ++ b3)
      .toDF("doc_id", "text", "is_target")
    val input = MemoryStream[(Long, String, Boolean)](spark)
    val q = Streams.dsirStream(spark,
      input.toDF().toDF("doc_id", "text", "is_target"), stats, s"$dir/chk")
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    def margMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.select(col("bucket").cast("long"), col("ct"), col("cr"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    val streamed = margMap(Streams.readDsirMarginals(spark, stats))
    val batch = margMap(Dsir.bucketMarginals(Dsir.profile(union,
      col("doc_id"), col("text"), col("is_target"))))
    assert(streamed === batch,
      "merge-on-read marginals must equal the union's batch marginals " +
        "(and the pre-seeded stale partial must have been overwritten)")
    // serving: weights against the STREAMED marginals == the one-shot
    // operator over the union (same candidates, same histogram)
    val raw = union.filter(!col("is_target"))
    val viaStream = Dsir.weightsAgainst(raw, col("doc_id"), col("text"),
        Streams.readDsirMarginals(spark, stats))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val oneShot = Dsir.importanceWeights(union, col("doc_id"),
        col("text"), col("is_target"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(viaStream === oneShot)
    // compaction (stream stopped): one baseline partition, same totals
    Streams.compactDsir(spark, stats)
    assert(margMap(Streams.readDsirMarginals(spark, stats)) === batch)
    assert(spark.read.parquet(stats).select("batch_id").distinct()
      .as[Long].collect() === Array(-1L))
  }

  test("knStream: streamed bigram counts equal the union's; scoring " +
      "under them equals the one-shot Kneser-Ney; replay overwrites " +
      "its own partition; compaction preserves totals") {
    import graft.operators.LmScore
    val dir = Files.createTempDirectory("graft-kn-stream-").toString
    val stats = s"$dir/stats"
    // pre-seed batch 0's partial as if a crashed run committed output
    // but not the checkpoint — the replaying batch must OVERWRITE it
    Seq(("stale", "pair", 999999L)).toDF("prev", "cur", "_bc")
      .write.parquet(s"$stats/batch_id=0")
    val b1 = Seq((1L, "the quick brown fox jumps over the lazy dog"))
    val b2 = Seq((2L, "the quick dog sleeps over the brown fox"))
    val b3 = Seq((3L, "a quick brown dog jumps a fence"))
    val union = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.knStream(spark,
      input.toDF().toDF("doc_id", "text"), stats, s"$dir/chk")
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    def cntMap(df: org.apache.spark.sql.DataFrame)
        : Map[(String, String), Long] =
      df.as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val streamed = cntMap(Streams.readKnBigrams(spark, stats))
    val batch = cntMap(LmScore.knBigramCountsOf(union,
      col("doc_id"), col("text")))
    assert(streamed === batch,
      "merge-on-read counts must equal the union's (and the stale " +
        "pre-seeded partial must have been overwritten)")
    // serving: KN scores under the STREAMED counts == the one-shot
    // self-scored operator over the union (all model tables re-derive
    // from the count table, so equality is exact)
    val viaStream = LmScore.lmScoreKnWith(union, col("doc_id"),
        col("text"), Streams.readKnBigrams(spark, stats))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val oneShot = LmScore.lmScoreKn(union, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(viaStream === oneShot)
    // compaction (stream stopped): one baseline partition, same totals
    Streams.compactKn(spark, stats)
    assert(cntMap(Streams.readKnBigrams(spark, stats)) === batch)
    assert(spark.read.parquet(stats).select("batch_id").distinct()
      .as[Long].collect() === Array(-1L))
  }

  test("kn3Stream: streamed trigram counts equal the union's; modified-" +
      "KN scoring under them (discounts re-derived at read) equals the " +
      "one-shot operator; compaction preserves totals") {
    import graft.operators.LmScore
    val dir = Files.createTempDirectory("graft-kn3-stream-").toString
    val stats = s"$dir/stats"
    val b1 = Seq((1L, "the quick brown fox jumps over the lazy dog"))
    val b2 = Seq((2L, "the quick dog sleeps over the brown fox"))
    val b3 = Seq((3L, "a quick brown dog jumps a fence"))
    val union = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.kn3Stream(spark,
      input.toDF().toDF("doc_id", "text"), stats, s"$dir/chk")
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    def cntMap(df: org.apache.spark.sql.DataFrame)
        : Map[(String, String, String), Long] =
      df.as[(String, String, String, Long)].collect()
        .map(r => (r._1, r._2, r._3) -> r._4).toMap
    val streamed = cntMap(Streams.readKn3Trigrams(spark, stats))
    val batch = cntMap(LmScore.kn3TrigramCountsOf(union,
      col("doc_id"), col("text")))
    assert(streamed === batch)
    val viaStream = LmScore.lmScoreKn3With(union, col("doc_id"),
        col("text"), Streams.readKn3Trigrams(spark, stats))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val oneShot = LmScore.lmScoreKn3(union, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(viaStream === oneShot)
    Streams.compactKn3(spark, stats)
    assert(cntMap(Streams.readKn3Trigrams(spark, stats)) === batch)
  }

  test("bm25Stream: streamed df/length/count statistics equal the " +
      "union's; serving under them equals batch scoring; replay " +
      "overwrites its own partition; compaction preserves; empty " +
      "state serves no scores") {
    import graft.operators.Bm25
    val dir = Files.createTempDirectory("graft-bm25-stream-").toString
    val stats = s"$dir/stats"
    val kws = Seq("quick", "brown", "fence")
    // serve-before-first-commit: empty statistics, empty scores —
    // not a schema-inference error
    val (dfreq0, stats0) = Streams.readBm25Stats(spark, stats)
    assert(dfreq0.count() === 0L && stats0.count() === 0L)
    // pre-seed batch 0's partial as if a crashed run committed output
    // but not the checkpoint — the replaying batch must OVERWRITE it
    Seq(("stale", 999999L, 0L, 0L)).toDF("term", "_df", "_dl", "_n")
      .write.parquet(s"$stats/batch_id=0")
    val b1 = Seq((1L, "the quick brown fox jumps over the lazy dog"))
    val b2 = Seq((2L, "the quick dog sleeps over the brown fox"))
    val b3 = Seq((3L, "a quick brown dog jumps a fence"))
    val union = (b1 ++ b2 ++ b3).toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)](spark)
    val q = Streams.bm25Stream(spark,
      input.toDF().toDF("doc_id", "text"), stats, s"$dir/chk")
    try {
      Seq(b1, b2, b3).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    def statMap(dir: String): Map[String, (Long, Long, Long)] =
      spark.read.parquet(dir).groupBy("term")
        .agg(sum(col("_df")).as("_df"), sum(col("_dl")).as("_dl"),
          sum(col("_n")).as("_n"))
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val batchStats = Bm25.statsPartial(union, col("doc_id"), col("text"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(statMap(stats) === batchStats,
      "merged partials must equal the union's statistics (and the " +
        "stale pre-seeded partial must have been overwritten)")
    // serving candidates under the STREAMED statistics == the batch
    // operator over the union
    val (dfreq, st) = Streams.readBm25Stats(spark, stats)
    val viaStream = Bm25.scoresWith(union, col("doc_id"), col("text"),
        kws, dfreq, st)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val oneShot = Bm25.scores(union, col("doc_id"), col("text"), kws,
        union.count())
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(viaStream === oneShot)
    // compaction (stream stopped): one baseline partition, same totals
    Streams.compactBm25(spark, stats)
    assert(statMap(stats) === batchStats)
    assert(spark.read.parquet(stats).select("batch_id").distinct()
      .as[Long].collect() === Array(-1L))
  }

  test("readKnBigrams/readDsirMarginals: serve BEFORE the first stream " +
      "commit returns the additive zero element, not a parquet " +
      "schema-inference crash") {
    import graft.operators.{Dsir, LmScore}
    val dir = Files.createTempDirectory("graft-precommit-").toString
    // missing dir AND existing-but-uncommitted dir (checkpoint files
    // only, no batch_id= partition) both count as "nothing committed"
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/kn2"))
    for (stats <- Seq(s"$dir/kn", s"$dir/kn2")) {
      val bi = Streams.readKnBigrams(spark, stats)
      assert(bi.columns.toSeq === Seq("prev", "cur", "_bc"))
      assert(bi.count() === 0L)
      // full serve path: every token backs off to Pcont = 0
      val scored = LmScore.lmScoreKnWith(
          Seq((1L, "a b")).toDF("doc_id", "text"),
          col("doc_id"), col("text"), bi)
        .select("lm_score_kn").as[Double].collect()
      assert(scored.toSeq === Seq(0.0))
    }
    val marg = Streams.readDsirMarginals(spark, s"$dir/dsir")
    assert(marg.columns.toSeq === Seq("bucket", "ct", "cr"))
    assert(marg.count() === 0L)
    // weightsAgainst under the zero histogram: every bucket scores the
    // smoothed prior ratio — defined, not a crash
    val w = Dsir.weightsAgainst(Seq((1L, "a b")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), marg)
    assert(w.count() === 1L)
  }

  test("graphUpsertStream: size-triggered shard split — extendible " +
      "children partition the parent exactly, untouched shards stay " +
      "byte-identical, and routing finds split leaves") {
    // Round-13 verdict item 5: the graph tier's growth lifecycle. A
    // touched shard over maxShardRows splits into two extendible-hash
    // children (rows rehashed at the doubled modulus), publication
    // swaps exactly the parent dir + its new sibling, and subsequent
    // upserts route to the LEAF dirs (a replacement of a child-resident
    // id rebuilds that child only). Serving needs no coordination — it
    // fans out over whatever shard=* dirs exist.
    import graft.operators.GraphAnn
    val dir = Files.createTempDirectory("graft-graph-split-").toString
    val idx = s"$dir/idx"
    val mods = spark.range(0, 4000)
      .select(col("id"), pmod(hash(col("id")), lit(4)).cast("int"),
        pmod(hash(col("id")), lit(8)).cast("int"))
      .as[(Long, Int, Int)].collect()
    val m4 = mods.map(r => r._1 -> r._2).toMap
    val m8 = mods.map(r => r._1 -> r._3).toMap
    // every dir NOT in shard t's split family (names ≡ t mod 4) must
    // survive all batches byte-identical (names + mtimes)
    def snapshot(tFamily: Int): Map[String, Map[String, Long]] = {
      val d = new java.io.File(idx)
      d.listFiles().filter { f =>
        f.isDirectory && f.getName.startsWith("shard=") &&
          f.getName.stripPrefix("shard=").toInt % 4 != tFamily
      }.map(s => s.getName -> s.listFiles().filter(_.isFile)
        .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    var splitLog = Vector.empty[(Int, Int)]
    var metrics = Vector.empty[(Long, Long, Seq[Int])]
    val base = (0L until 32L)
    // cap = the fullest base shard's row count, so batch 1 splits
    // nothing and ONE more row into that shard trips the trigger
    val t = base.groupBy(m4).view.mapValues(_.size).maxBy(_._2)._1
    val cap = base.count(i => m4(i) == t).toLong
    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = Streams.graphUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idx, s"$dir/chk",
      numShards = 4, m = 4, efConstruction = 16,
      onBatch = (b, n, r) => metrics :+= ((b, n, r)),
      maxShardRows = cap,
      onSplit = (_, s) => splitLog ++= s)
    try {
      input.addData(base.map(i => (i, Seq(i.toDouble, 0.0))))
      q.processAllAvailable()
      assert(splitLog.isEmpty, s"no shard is over $cap rows yet")
      val others = snapshot(tFamily = t)
      val adds2 = (100L until 4000L).filter(i => m4(i) == t).take(2)
      input.addData(adds2.map(i => (i, Seq(i.toDouble, 0.0))))
      q.processAllAvailable()
      assert(splitLog === Vector((t, t + 4)),
        "the oversized shard must split into its depth-1 children")
      // exact node set preserved; children partition the parent's rows
      // at the doubled modulus
      val g2 = GraphAnn.readGraphIndex(spark, idx)
      assert(g2.select("id").as[Long].collect().sorted ===
        (base ++ adds2).toArray.sorted)
      val byShard = g2.select("shard", "id").as[(Int, Long)].collect()
        .groupMap(_._1)(_._2)
      assert(byShard(t).forall(i => m8(i) == t))
      assert(byShard(t + 4).forall(i => m8(i) == t + 4))
      // search still exact after the split (ef ≥ corpus ⇒ exhaustive)
      assert(GraphAnn.graphTopK(g2, Seq(5.2, 0.0), k = 3, ef = 256)
        .select("vec_id").as[Long].collect() === Array(5L, 6L, 4L))
      // replacement of a SIBLING-resident id: routing must find the
      // split leaf — exactly that child rebuilds
      val repl = byShard(t + 4).min
      input.addData(Seq((repl, Seq(2000.0, 0.0))))
      q.processAllAvailable()
      assert(metrics.last._3 === Seq(t + 4),
        "the replacement must rebuild the split leaf, not the parent name")
      // deeper split: push child t (depth 1) over the limit — its
      // sibling at the doubled modulus is t + 8
      val nT = byShard(t).length
      val adds4 = (100L until 4000L)
        .filter(i => m8(i) == t && !adds2.contains(i))
        .take(cap.toInt + 1 - nT)
      input.addData(adds4.map(i => (i, Seq(i.toDouble, 0.0))))
      q.processAllAvailable()
      assert(splitLog.take(2) === Vector((t, t + 4), (t, t + 8)),
        s"expected a depth-2 split of child $t, saw $splitLog")
      val g4 = GraphAnn.readGraphIndex(spark, idx)
      assert(g4.select("id").as[Long].collect().sorted ===
        (base ++ adds2 ++ adds4).toArray.sorted)
      assert(GraphAnn.graphTopK(g4, Seq(2000.0, 0.0), k = 1, ef = 256)
        .select("vec_id").as[Long].collect() === Array(repl))
      assert(snapshot(tFamily = t) === others,
        "shards outside the split family must stay byte-identical")
      // resident serving composes with splits: the session lineage
      // cache re-plans on the changed dir set (new sibling dirs appear
      // in the fingerprint list) and serves the split index identically
      // to the shuffle path
      val viaResident = GraphAnn.graphTopKResident(spark, idx,
        Seq(5.2, 0.0), k = 3, ef = 256).as[(Long, Double)].collect()
      val viaShuffle = GraphAnn.graphTopK(g4, Seq(5.2, 0.0), k = 3,
        ef = 256).as[(Long, Double)].collect()
      assert(viaResident === viaShuffle,
        "resident serve must re-plan over the post-split dir set")
    } finally q.stop()
  }

  test("graphUpsertStream: size-triggered sibling MERGE after a bulk " +
      "delete — the split reversed: depth cascades back down, node set " +
      "preserved, untouched shards byte-identical, routing collapses") {
    // Round-14 verdict item 7: the graph tier's SHRINK lifecycle. After
    // a heavy delete pass, same-depth sibling leaves whose combined
    // rows fit under minShardRows rebuild as one parent; merged parents
    // re-candidate in the same batch, so the extendible tree cascades
    // back toward the base layout.
    import graft.operators.GraphAnn
    val dir = Files.createTempDirectory("graft-graph-merge-").toString
    val idx = s"$dir/idx"
    val mods = spark.range(0, 4000)
      .select(col("id"), pmod(hash(col("id")), lit(4)).cast("int"),
        pmod(hash(col("id")), lit(8)).cast("int"))
      .as[(Long, Int, Int)].collect()
    val m4 = mods.map(r => r._1 -> r._2).toMap
    val m8 = mods.map(r => r._1 -> r._3).toMap
    def snapshot(tFamily: Int): Map[String, Map[String, Long]] = {
      val d = new java.io.File(idx)
      d.listFiles().filter { f =>
        f.isDirectory && f.getName.startsWith("shard=") &&
          f.getName.stripPrefix("shard=").toInt % 4 != tFamily
      }.map(s => s.getName -> s.listFiles().filter(_.isFile)
        .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    var splitLog = Vector.empty[(Int, Int)]
    var mergeLog = Vector.empty[(Int, Int)]
    var metrics = Vector.empty[(Long, Long, Seq[Int])]
    val base = (0L until 32L)
    val t = base.groupBy(m4).view.mapValues(_.size).maxBy(_._2)._1
    val cap = base.count(i => m4(i) == t).toLong
    val input = MemoryStream[(Long, Seq[Double], Boolean)](spark)
    val q = Streams.graphUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding", "del"), idx, s"$dir/chk",
      numShards = 4, m = 4, efConstruction = 16,
      onBatch = (b, n, r) => metrics :+= ((b, n, r)),
      deleteCol = Some("del"),
      maxShardRows = cap,
      onSplit = (_, s) => splitLog ++= s,
      // hysteresis: merge only when the pair fits back in ONE pre-split
      // shard — a freshly split pair (cap+adds rows) never re-merges
      minShardRows = cap,
      onMerge = (_, s) => mergeLog ++= s)
    try {
      // grow to depth 2 exactly as the split test does
      input.addData(base.map(i => (i, Seq(i.toDouble, 0.0), false)))
      q.processAllAvailable()
      val adds2 = (100L until 4000L).filter(i => m4(i) == t).take(2)
      input.addData(adds2.map(i => (i, Seq(i.toDouble, 0.0), false)))
      q.processAllAvailable()
      assert(splitLog === Vector((t, t + 4)))
      assert(mergeLog.isEmpty,
        "a freshly split pair is over minShardRows — no merge yet")
      val nT = GraphAnn.readGraphIndex(spark, idx)
        .filter(col("shard") === t).count().toInt
      val adds4 = (100L until 4000L)
        .filter(i => m8(i) == t && !adds2.contains(i))
        .take(cap.toInt + 1 - nT)
      input.addData(adds4.map(i => (i, Seq(i.toDouble, 0.0), false)))
      q.processAllAvailable()
      assert(splitLog === Vector((t, t + 4), (t, t + 8)))
      val others = snapshot(tFamily = t)
      // BULK DELETE every added row: family t shrinks back to its base
      // rows → (t, t+8) merges at depth 2, then the merged t
      // re-candidates and (t, t+4) merges at depth 1 — one batch
      input.addData((adds2 ++ adds4).map(i => (i, null, true)))
      q.processAllAvailable()
      assert(mergeLog === Vector((t, t + 8), (t, t + 4)),
        s"expected the cascade back to depth 0, saw $mergeLog")
      assert(!new java.io.File(s"$idx/shard=${t + 4}").exists)
      assert(!new java.io.File(s"$idx/shard=${t + 8}").exists)
      // node set preserved exactly: the base rows survive, nothing
      // vanished or duplicated
      val g = GraphAnn.readGraphIndex(spark, idx)
      assert(g.select("id").as[Long].collect().sorted === base.toArray)
      // no hidden merge debris
      assert(new java.io.File(idx).listFiles()
        .forall(f => !f.getName.contains("merge")))
      // untouched families never read, rewritten, or moved
      assert(snapshot(tFamily = t) === others,
        "shards outside the merge family must stay byte-identical")
      // search still exact over the merged layout
      assert(GraphAnn.graphTopK(g, Seq(5.2, 0.0), k = 3, ef = 256)
        .select("vec_id").as[Long].collect() === Array(5L, 6L, 4L))
      // routing collapsed with the depth: replacing an id whose OLD
      // leaf was the absorbed sibling must rebuild the base shard t
      val replId = base.find(i => m8(i) == t + 4).get
      input.addData(Seq((replId, Seq(3000.0, 0.0), false)))
      q.processAllAvailable()
      assert(metrics.last._3 === Seq(t),
        "post-merge routing must land on the depth-0 parent")
      // resident serving re-plans over the merged dir set
      val viaResident = GraphAnn.graphTopKResident(spark, idx,
        Seq(3000.0, 0.0), k = 1, ef = 256).as[(Long, Double)].collect()
      assert(viaResident.map(_._1) === Array(replId))
    } finally q.stop()
  }

  test("graphUpsertStream: merge crash recovery — every crash window " +
      "rolls back to the intact children or forward to the merged " +
      "parent; rows never vanish or duplicate") {
    // recoverShardMerges decides each window from dir existence:
    // pending + live parent dir → roll back (restore any hidden high
    // sibling, drop the pending); pending + parent dir missing → both
    // children are hidden — roll forward (commit the merged parent);
    // leftover drops with no pending → post-commit cleanup.
    import graft.operators.GraphAnn
    val dir = Files.createTempDirectory("graft-graph-mergecrash-").toString
    val idx = s"$dir/idx"
    def ids: Array[Long] = GraphAnn.readGraphIndex(spark, idx)
      .select("id").as[Long].collect().sorted
    def dirOf(s: Int) = new java.io.File(s"$idx/shard=$s")
    val input = MemoryStream[(Long, Seq[Double])](spark)
    // split-armed so a real split state exists to rewind from
    var splitLog = Vector.empty[(Int, Int)]
    val base = (0L until 64L)
    val q = Streams.graphUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idx, s"$dir/chk",
      numShards = 4, m = 4, efConstruction = 16,
      maxShardRows = 8, onSplit = (_, s) => splitLog ++= s)
    try {
      input.addData(base.map(i => (i, Seq(i.toDouble, 0.0))))
      q.processAllAvailable()
      assert(splitLog.nonEmpty, "the cap-8 build must split something")
      val (p, sib) = splitLog.head
      // window adds must NOT route into p's family, or the end-of-batch
      // split pass could split the (fat) merged parent and confuse the
      // window assertions
      val safe = spark.range(1990, 3000)
        .select(col("id"), pmod(hash(col("id")), lit(4)).cast("int"))
        .as[(Long, Int)].collect()
        .filter(_._2 != p % 4).map(_._1)
      val all0 = ids
      // --- window A: pending parent exists, both children live (crash
      // before any child was hidden) → roll back: pending dropped
      val pend = new java.io.File(s"$idx/.shard_${p}_mergepending")
      copyDir(dirOf(p), pend)
      input.addData(Seq((safe(0), Seq(2000.0, 0.0))))
      q.processAllAvailable()
      assert(!pend.exists, "window A: the pending parent must be dropped")
      assert(dirOf(p).exists && dirOf(sib).exists,
        "window A: both children stay live")
      assert(ids === (all0 :+ safe(0)).sorted)
      // --- window B: pending + hidden high sibling, parent (low child)
      // still live → roll back: sibling restored, pending dropped
      val all1 = ids
      copyDir(dirOf(p), pend)
      assert(dirOf(sib).renameTo(
        new java.io.File(s"$idx/.shard_${sib}_mergedrop")))
      input.addData(Seq((safe(1), Seq(2001.0, 0.0))))
      q.processAllAvailable()
      assert(!pend.exists, "window B: the pending parent must be dropped")
      assert(dirOf(sib).exists, "window B: the sibling must be restored")
      assert(ids === (all1 :+ safe(1)).sorted,
        "window B: no rows lost, none duplicated")
      // --- window C: pending exists, BOTH children hidden (crash after
      // the low child went aside, before the commit rename) → roll
      // FORWARD: merged parent committed, drops deleted. Build the real
      // merged-parent content by unioning the two children's rows.
      val all2 = ids
      val mergedRows = spark.read.parquet(idx)
        .filter(col("shard").isin(p, sib))
        .select(col("id"), col("vec")).as[(Long, Seq[Double])].collect()
      val rebuilt = GraphAnn.buildShard(p,
        mergedRows.map(r => (r._1, r._2.toArray)), m = 4,
        efConstruction = 16, maxLevel = 3).toSeq
      val tmpParent = s"$dir/fresh"
      rebuilt.toDF().drop("shard").coalesce(1).write.mode("overwrite")
        .parquet(s"$tmpParent/shard=$p")
      assert(new java.io.File(s"$tmpParent/shard=$p").renameTo(pend))
      assert(dirOf(sib).renameTo(
        new java.io.File(s"$idx/.shard_${sib}_mergedrop")))
      assert(dirOf(p).renameTo(
        new java.io.File(s"$idx/.shard_${p}_mergedrop")))
      input.addData(Seq((safe(2), Seq(2002.0, 0.0))))
      q.processAllAvailable()
      assert(dirOf(p).exists, "window C: the merged parent must commit")
      assert(!dirOf(sib).exists, "window C: the sibling stays absorbed")
      assert(new java.io.File(idx).listFiles()
        .forall(f => !f.getName.contains("merge")),
        "window C: all merge debris cleaned")
      assert(ids === (all2 :+ safe(2)).sorted,
        "window C: no rows lost, none duplicated")
    } finally q.stop()
  }

  test("graphUpsertStream: split crash recovery — every crash window " +
      "rolls back to the intact parent or forward to both children; " +
      "rows never vanish or duplicate") {
    // The split moves rows ACROSS dirs, so the generic aside swap can't
    // protect it alone (a crash after the parent was replaced by
    // child-n-only content but before the sibling landed would drop the
    // sibling half). recoverShardSplits decides each window from dir
    // existence: pending+parent+no-aside → roll back (split never began
    // its swap); pending+aside+no-parent → roll back via the aside;
    // pending+aside+parent → roll forward (promote sibling, drop aside).
    import graft.operators.GraphAnn
    val dir = Files.createTempDirectory("graft-graph-splitcrash-").toString
    val idx = s"$dir/idx"
    def ids: Array[Long] = GraphAnn.readGraphIndex(spark, idx)
      .select("id").as[Long].collect().sorted
    def dirOf(s: Int) = new java.io.File(s"$idx/shard=$s")
    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = Streams.graphUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idx, s"$dir/chk",
      numShards = 4, m = 4, efConstruction = 16)
    try {
      val base = (0L until 32L)
      input.addData(base.map(i => (i, Seq(i.toDouble, 0.0))))
      q.processAllAvailable()
      val all0 = ids
      assert(all0.length === 32)
      val p = 1 // any base shard; content of the simulated dirs is real
      // --- window A: pending sibling exists, parent dir intact, no
      // aside (crash after parking the sibling, before the swap began)
      // → roll back: pending deleted, parent untouched
      val pend = new java.io.File(s"$idx/.shard_${p + 4}_pending")
      assert(dirOf(p).exists)
      copyDir(dirOf(p), pend) // arbitrary real content — recovery drops it
      input.addData(Seq((1000L, Seq(1000.0, 0.0))))
      q.processAllAvailable()
      assert(!pend.exists, "window A: pending sibling must be dropped")
      assert(!dirOf(p + 4).exists, "window A: no sibling may be promoted")
      assert(ids === (all0 :+ 1000L).sorted, "window A: no rows lost")
      // --- window B: pending + aside, parent dir MISSING (crash after
      // the parent went aside, before the child committed) → roll back:
      // pending deleted, parent restored from the aside
      val pBytes = dirOf(p).listFiles().filter(_.isFile).map(_.getName).toSet
      copyDir(dirOf(p), pend)
      assert(dirOf(p).renameTo(new java.io.File(s"$idx/.shard_${p}_old")))
      input.addData(Seq((1001L, Seq(1001.0, 0.0))))
      q.processAllAvailable()
      assert(!pend.exists, "window B: pending sibling must be dropped")
      assert(dirOf(p).exists, "window B: parent must be restored")
      assert(ids === (all0 ++ Seq(1000L, 1001L)).sorted,
        "window B: no rows lost")
      assert(pBytes.subsetOf(
        dirOf(p).listFiles().filter(_.isFile).map(_.getName).toSet),
        "window B: the restored parent carries its original files")
      // --- window C: pending + aside + parent dir (crash after the
      // child committed, before the sibling promoted) → roll FORWARD:
      // sibling promoted, aside dropped. Simulate on a REAL split state:
      // run a real split, then rewind its last two steps.
      // The first stream must be STOPPED and the second gets its OWN
      // source — two live streams on one MemoryStream both consume
      // every batch and race their swaps on the same index dir.
      q.stop()
      var splitLog = Vector.empty[(Int, Int)]
      val input2 = MemoryStream[(Long, Seq[Double])](spark)
      val q2 = Streams.graphUpsertStream(spark,
        input2.toDF().toDF("vec_id", "embedding"), idx, s"$dir/chk2",
        numShards = 4, m = 4, efConstruction = 16,
        maxShardRows = 1, // everything touched is oversized
        onSplit = (_, s) => splitLog ++= s)
      try {
        input2.addData(Seq((1002L, Seq(1002.0, 0.0))))
        q2.processAllAvailable()
        assert(splitLog.nonEmpty, "the cap-1 stream must split")
        val (n, sib) = splitLog.head
        val allAfterSplit = ids
        // rewind: sibling back to pending, fake the old-parent aside
        assert(dirOf(sib).renameTo(
          new java.io.File(s"$idx/.shard_${sib}_pending")))
        copyDir(dirOf(n), new java.io.File(s"$idx/.shard_${n}_old"))
        input2.addData(Seq((1003L, Seq(1003.0, 0.0))))
        q2.processAllAvailable()
        assert(dirOf(sib).exists, "window C: sibling must be promoted")
        assert(!new java.io.File(s"$idx/.shard_${sib}_pending").exists)
        assert(!new java.io.File(s"$idx/.shard_${n}_old").exists,
          "window C: the old-parent aside must be dropped, not restored")
        assert(ids === (allAfterSplit :+ 1003L).sorted,
          "window C: no rows lost, none duplicated")
      } finally q2.stop()
    } finally q.stop()
  }

  private def copyDir(src: java.io.File, dst: java.io.File): Unit = {
    dst.mkdirs()
    src.listFiles().filter(_.isFile).foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(dst, f.getName).toPath)
    }
  }

  test("graphUpsertStream x shard-group serving: grouped serves track " +
      "every upsert batch; untouched shards stay byte-identical") {
    // Round-12 verdict item 8: graphUpsertStream (incremental insert +
    // touched-shard swap) and shardsPerTask grouped serving both exist —
    // prove they COMPOSE. The grouped resident path plans from the
    // session shardRdd cache and the executor ResidentCache, both keyed
    // by file-listing fingerprints; an upsert batch swaps only its
    // touched shard dirs, so a correct composition must (a) re-plan and
    // reload EXACTLY the swapped shards on the next grouped query and
    // (b) leave every untouched shard's files byte-identical on disk.
    import graft.operators.GraphAnn
    val dir = Files.createTempDirectory("graft-graph-grouped-up-").toString
    val idx = s"$dir/idx"
    def shardOf(id: Long): Int = Seq(id).toDF("id")
      .select(pmod(hash(col("id")), lit(8)).cast("int")).head().getInt(0)
    def snapshot(except: Int): Map[String, Map[String, Long]] = {
      val d = new java.io.File(idx)
      d.listFiles().filter(f => f.isDirectory &&
          f.getName.startsWith("shard=") && f.getName != s"shard=$except")
        .map(s => s.getName -> s.listFiles().filter(_.isFile)
          .map(f => f.getName -> f.lastModified()).toMap).toMap
    }
    val query = Seq(5.2, 0.0)
    // ef >= corpus size ⇒ the beam is exhaustive per shard and the
    // k-merge is exact kNN — the serve oracle is brute force
    def grouped(g: Int): Array[(Long, Double)] =
      GraphAnn.graphTopKResident(spark, idx, query, k = 3, ef = 128,
        shardsPerTask = g).as[(Long, Double)].collect()
    val input = MemoryStream[(Long, Seq[Double])](spark)
    val q = Streams.graphUpsertStream(spark,
      input.toDF().toDF("vec_id", "embedding"), idx, s"$dir/chk",
      numShards = 8, m = 4, efConstruction = 16)
    try {
      input.addData((0L until 64L).map(i => (i, Seq(i.toDouble, 0.0))))
      q.processAllAvailable()
      val g1 = grouped(4)
      assert(g1.map(_._1) === Array(5L, 6L, 4L))
      assert(g1 === grouped(1), "grouped != per-shard after initial build")
      // batch 2: ONE new id nearest the query — incremental-insert path.
      // The grouped serve must see the swap (fingerprint re-plan + the
      // touched shard's reload) while every other shard dir is untouched.
      val sNew = shardOf(100L)
      val before = snapshot(except = sNew)
      input.addData(Seq((100L, Seq(5.1, 0.0))))
      q.processAllAvailable()
      assert(snapshot(except = sNew) === before,
        "a single-shard insert must not rewrite other shards")
      val g2 = grouped(4)
      assert(g2.map(_._1) === Array(100L, 5L, 6L),
        "grouped serve must reflect the incremental insert")
      assert(g2 === grouped(1), "grouped != per-shard after insert")
      // batch 3: REPLACE the closest id far away — the rebuild path; the
      // grouped serve must drop it from the neighborhood.
      input.addData(Seq((100L, Seq(1000.0, 0.0))))
      q.processAllAvailable()
      val g3 = grouped(4)
      assert(g3.map(_._1) === Array(5L, 6L, 4L),
        "grouped serve must reflect the replacement rebuild")
      assert(g3 === grouped(1), "grouped != per-shard after replacement")
    } finally q.stop()
  }

  test("e2e ingest: chunk -> digest dedup -> graph index; a full replay " +
      "rebuilds byte-identical index state") {
    // The production chain the individual lifecycles compose into:
    // doc stream → chunkStream (chunk store, replay-idempotent) →
    // digest dedup → embed → graphUpsertStream (shard-swapped HNSW).
    import graft.operators.GraphAnn
    import graft.sources.HrPipeline.featureHashEmbedding
    val base = Files.createTempDirectory("graft-e2e-ingest-").toString
    val chunkDir = s"$base/chunks"; val idx = s"$base/idx"
    // stage A: chunk the doc stream. Docs 1 and 2 share an identical
    // leading chunk; doc 1 is re-delivered (crash-replay at the source)
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val qa = Streams.chunkStream(spark,
      input.toDF().toDF("doc_id", "text", "ts"),
      chunkDir, s"$base/chkA", chunkTokens = 4, stride = 4)
    try {
      input.addData(Seq((1L, "a b c d e f g h", ts(1)),
        (2L, "a b c d x y z w", ts(1))))
      qa.processAllAvailable()
      input.addData(Seq((1L, "a b c d e f g h", ts(1)), // re-delivery
        (3L, "p q r s", ts(2))))
      qa.processAllAvailable()
    } finally qa.stop()
    // stage B: file-stream the chunk store, dedup on content digest,
    // embed, upsert into the graph index
    def runIndex(chk: String): Unit = {
      val schema = spark.read.parquet(chunkDir).schema
      val src = spark.readStream.schema(schema).parquet(chunkDir)
        .dropDuplicates("digest")
        .select(expr("xxhash64(digest)").as("vec_id"),
          featureHashEmbedding(col("chunk_text"), 8).as("embedding"))
      val qb = Streams.graphUpsertStream(spark, src, idx, chk,
        numShards = 4, m = 4, efConstruction = 16)
      try qb.processAllAvailable() finally qb.stop()
    }
    runIndex(s"$base/chkB1")
    val g1 = GraphAnn.readGraphIndex(spark, idx)
    // 4 distinct chunks: the shared "a b c d" indexed exactly ONCE, the
    // re-delivered doc 1 not indexed twice
    assert(g1.count() === 4)
    def state(): Seq[(Int, Long, Seq[Double], Seq[Long], Seq[Seq[Long]])] =
      GraphAnn.readGraphIndex(spark, idx)
        .select(col("shard"), col("id"), col("vec"), col("neighbors"),
          col("layers"))
        .as[(Int, Long, Seq[Double], Seq[Long], Seq[Seq[Long]])]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val s1 = state()
    // searching the index finds the chunk whose embedding we query
    val probe = spark.read.parquet(chunkDir)
      .filter(col("chunk_text") === "p q r s")
      .select(featureHashEmbedding(col("chunk_text"), 8))
      .as[Seq[Double]].head()
    val hit = GraphAnn.graphTopK(g1, probe, k = 1, ef = 16)
      .select("vec_id").as[Long].head()
    val want = spark.read.parquet(chunkDir)
      .filter(col("chunk_text") === "p q r s")
      .select(expr("xxhash64(digest)")).as[Long].head()
    assert(hit === want)
    // mid-chain crash replay, worst case: a FRESH checkpoint replays the
    // ENTIRE chunk store into the live index. Every row is a
    // replacement, so every touched shard takes the deterministic
    // rebuild path — state must come back byte-identical.
    runIndex(s"$base/chkB2")
    assert(state() === s1, "replayed ingest must rebuild identical state")
  }

  test("digest-table maintenance: streamed digest state equals the batch " +
      "table through insert, update, and tombstone waves") {
    // the snapshot-diff lifecycle composed with streaming ingest: the
    // digest is a map-side deterministic function of the content columns
    // (Maintenance.digestColumn), so it rides the generic keyed upsert —
    // and the streamed state must equal a from-scratch writeDigestTable
    // over the surviving corpus, or a later snapshotDiffAgainstDigestTable
    // would misclassify rows the stream maintained.
    import graft.sources.Maintenance
    val base = Files.createTempDirectory("graft-digest-stream-").toString
    val input = MemoryStream[(Long, String, String, Boolean)](spark)
    val digested = input.toDF()
      .toDF("doc_id", "text", "lang", "del")
      .select(col("doc_id"),
        Maintenance.digestColumn(Seq("text", "lang")).as("digest"),
        col("del"))
    val q = Streams.upsertStreamBucketed(spark, digested,
      s"$base/state", s"$base/chk", nBuckets = 4,
      deleteCol = Some("del"))
    try {
      input.addData(Seq((1L, "a", "en", false), (2L, "b", "en", false),
        (3L, "c", "ko", false)))
      q.processAllAvailable()
      input.addData(Seq((2L, "B", "en", false),   // update
        (4L, "d", "en", false),                   // insert
        (3L, "", "", true)))                      // tombstone
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$base/state")
      .select("doc_id", "digest").as[(Long, Long)].collect().sorted
    // the surviving corpus, digested from scratch by the batch writer
    spark.sql("DROP TABLE IF EXISTS digest_parity")
    val survivors = Seq((1L, "a", "en"), (2L, "B", "en"), (4L, "d", "en"))
      .toDF("doc_id", "text", "lang")
    Maintenance.writeDigestTable(survivors, "doc_id", Seq("text", "lang"),
      "digest_parity", buckets = 4)
    val batch = spark.table("digest_parity")
      .as[(Long, Long)].collect().sorted
    assert(streamed === batch,
      "streamed digest state diverged from the batch digest table")
    spark.sql("DROP TABLE IF EXISTS digest_parity")
  }

  test("incrementalCollection: file stream builds an embedded collection") {
    val base = Files.createTempDirectory("graft-stream-").toString
    val src = s"$base/src"; val idx = s"$base/idx"; val chk = s"$base/chk"
    Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text").write.parquet(src)
    val q = Streams.incrementalCollection(spark, src, idx, chk, embedDim = 8)
    q.awaitTermination()
    val out = spark.read.parquet(idx)
    assert(out.count() === 2)
    assert(out.select(size(col("embedding"))).as[Int].head() === 8)
    // second increment: a new file appears → only the new rows append
    Seq((3L, "eta theta iota")).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val q2 = Streams.incrementalCollection(spark, src, idx, chk, embedDim = 8)
    q2.awaitTermination()
    assert(spark.read.parquet(idx).count() === 3)
    assert(spark.read.parquet(idx).select("doc_id").as[Long].collect().sorted
      === Array(1L, 2L, 3L))
  }
}
