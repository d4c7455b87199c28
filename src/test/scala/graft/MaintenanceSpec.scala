package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Maintenance

class MaintenanceSpec extends SparkSuite {
  import spark.implicits._

  test("compact: many small files become few, rows and content preserved") {
    val dir = Files.createTempDirectory("graft-compact-").toString + "/t"
    val df = (1L to 1000L).map(i => (i, s"row$i")).toDF("id", "payload")
    df.repartition(50).write.parquet(dir) // 50 tiny files
    val before = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 40)
    val n = Maintenance.compact(spark, dir, targetFileRows = 500)
    assert(n === 2)
    val after = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after === 2)
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000)
    assert(back.agg(sum(col("id"))).as[Long].head() === 500500L)
  }

  test("observedWrite: metrics computed during the write, no second pass") {
    val dir = Files.createTempDirectory("graft-obs-").toString + "/t"
    val df = Seq((1L, "a"), (2L, null), (3L, "c")).toDF("id", "name")
    val m = Maintenance.observedWrite(df, dir,
      "rows" -> count(lit(1)),
      "null_names" -> sum(when(col("name").isNull, 1L).otherwise(0L)))
    assert(m("rows") === 3L)
    assert(m("null_names") === 1L)
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("withDenseIds: contiguous 0..n-1 labels in key order, both variants") {
    val df = Seq(("c", 1), ("a", 2), ("b", 3), ("d", 4)).toDF("k", "v")
    val zip = Maintenance.withDenseIds(spark, df, col("k"))
      .select("k", "label_id").as[(String, Long)].collect().sortBy(_._2)
    assert(zip === Array(("a", 0L), ("b", 1L), ("c", 2L), ("d", 3L)))
    val win = Maintenance.withDenseIdsWindow(df, col("k"))
      .select("k", "label_id").as[(String, Long)].collect().sortBy(_._2)
    assert(win === zip)
    // dense + contiguous on a larger frame across partitions
    val big = (1L to 5000L).map(i => (5000L - i, i)).toDF("k", "v")
      .repartition(13)
    val ids = Maintenance.withDenseIds(spark, big, col("k"))
      .select("label_id").as[Long].collect().sorted
    assert(ids === (0L until 5000L).toArray)
    // labels follow key order globally, not just per partition
    val pairs = Maintenance.withDenseIds(spark, big, col("k"))
      .select("k", "label_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(pairs.map(_._2) === (0L until 5000L).toArray)
  }

  test("withDenseIds plans DataFrame-native: no object round trip, per-partition window") {
    val df = (1L to 200L).map(i => (i, s"t$i")).toDF("k", "v").repartition(7)
    val out = Maintenance.withDenseIds(spark, df, col("k"))
    val p = out.queryExecution.executedPlan.toString
    // the old rdd.zipWithIndex exited Tungsten via DeserializeToObject/
    // SerializeFromObject pairs — THAT is the round trip being banned.
    // (The eager localCheckpoint legitimately shows as an InternalRow
    // `Scan ExistingRDD` — stored rows, no per-row object re-encoding.)
    assert(!p.contains("DeserializeToObject") && !p.contains("SerializeFromObject")
        && !p.contains("ZipWithIndex"),
      s"object round-trip in plan:\n$p")
    // the window partitions by _pid — never a global single-partition sort
    assert(p.contains("Window"), p)
    assert(p.contains("windowspecdefinition(_pid"), p)
  }

  test("withGroupedCumSum equals the single-window cumulative sum") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 200L).map(i => (i, if (i % 10 == 0) "b" else "a",
      i % 7 + 1)).toDF("k", "g", "v").repartition(8)
    val got = Maintenance.withGroupedCumSum(spark, df, col("g"), col("k"),
        col("v"), "cum")
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum", sum("v").over(
        Window.partitionBy("g").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("writeTrainingShards: every doc exactly once, shard budgets hold, " +
      "files ordered by position, manifest matches the store") {
    val dir = Files.createTempDirectory("graft-shards-").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val manifest = Maintenance.writeTrainingShards(spark, docs,
      s"$dir/shards", col("doc_id"), col("text"), epoch = 0,
      budgetTokens = 500L)
    val store = spark.read.parquet(s"$dir/shards")
    // exactly-once coverage
    assert(store.count() === docs.count())
    assert(store.select("doc_id").distinct().count() === docs.count())
    // a doc crossing the boundary belongs to the bin it STARTS in — a
    // bin's total can exceed the budget by at most that one doc's
    // tokens (sum ≤ B + n_last), never by two docs'
    val worst = store.agg(max("n_tokens")).head().getLong(0)
    val overMax = store.groupBy("split", "shard")
      .agg(sum("n_tokens").as("t")).agg(max("t")).head().getLong(0)
    assert(overMax <= 500 + worst, s"shard exceeds budget+1doc: $overMax")
    // shards numbered from 0, consecutively, per split
    store.select("split", "shard").distinct()
      .as[(String, Long)].collect().groupBy(_._1).foreach {
        case (s, rows) =>
          val ids = rows.map(_._2).sorted
          assert(ids.head === 0L && ids === (0L until ids.length).toArray,
            s"$s shards not consecutive: ${ids.mkString(",")}")
      }
    // manifest agrees with the store
    val m = manifest.as[(String, Long, Long, Long)].collect().toSet
    val s2 = store.groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(m === s2)
    // each shard directory's rows come out in epoch order (one sorted
    // file set per shard)
    val trainShard0 = spark.read
      .parquet(s"$dir/shards/split=train/shard=0")
      .select("pos").as[Long].collect()
    assert(trainShard0.toSeq === trainShard0.sorted.toSeq)
  }

  test("writeMultimodalShards: byte-budget packing — exactly-once " +
      "coverage, shard byte totals <= budget + one payload, ordered " +
      "files, manifest matches") {
    val dir = Files.createTempDirectory("graft-byteshards-").toString
    val media = graft.operators.Multimodal.attachPayload(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val manifest = Maintenance.writeMultimodalShards(spark, media,
      s"$dir/shards", col("doc_id"), col("payload"), epoch = 0,
      budgetBytes = 4000L)
    val store = spark.read.parquet(s"$dir/shards")
    assert(store.count() === media.count())
    assert(store.select("doc_id").distinct().count() === media.count())
    // an item crossing the boundary belongs to the shard it STARTS in:
    // a shard's byte total exceeds the budget by at most one payload
    val worst = store.agg(max("n_bytes")).head().getLong(0)
    val overMax = store.groupBy("split", "shard")
      .agg(sum("n_bytes").as("t")).agg(max("t")).head().getLong(0)
    assert(overMax <= 4000L + worst, s"shard exceeds budget+1item: $overMax")
    // manifest agrees with the store
    val m = manifest.as[(String, Long, Long, Long)].collect().toSet
    val s2 = store.groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("n_bytes"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(m === s2)
    // each shard directory's rows come out in epoch order
    val trainShard0 = spark.read
      .parquet(s"$dir/shards/split=train/shard=0")
      .select("pos").as[Long].collect()
    assert(trainShard0.toSeq === trainShard0.sorted.toSeq)
  }

  test("appendTrainingShards: waves open fresh consecutive shards, old " +
      "files untouched, staging dir cleaned, store covers both waves") {
    val dir = Files.createTempDirectory("graft-shard-waves-").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val w1 = docs.filter(col("doc_id") < 250)
    val w2 = docs.filter(col("doc_id") >= 250)
    val m1 = Maintenance.appendTrainingShards(spark, w1, s"$dir/st", "w1",
      col("doc_id"), col("text"), budgetTokens = 500L)
    val m1Rows = m1.as[(String, Long, Long, Long)].collect().toSet
    val files1 = spark.read.parquet(s"$dir/st")
      .select(input_file_name()).distinct().as[String].collect().toSet
    Maintenance.appendTrainingShards(spark, w2, s"$dir/st", "w2",
      col("doc_id"), col("text"), budgetTokens = 500L)
    val store = spark.read.parquet(s"$dir/st")
    assert(store.count() === docs.count())
    assert(store.select("doc_id").distinct().count() === docs.count())
    // wave 1's physical files are still present and untouched
    val files2 = store.select(input_file_name()).distinct()
      .as[String].collect().toSet
    assert(files1.subsetOf(files2))
    // shard ids stay consecutive from 0 per split ACROSS waves
    store.select("split", "shard").distinct()
      .as[(String, Long)].collect().groupBy(_._1).foreach {
        case (s, rows) =>
          val ids = rows.map(_._2).sorted
          assert(ids === (0L until ids.length).toArray,
            s"$s shards not consecutive across waves: ${ids.mkString(",")}")
      }
    assert(!new java.io.File(s"$dir/st__wave_w1").exists())
    assert(!new java.io.File(s"$dir/st__wave_w2").exists())
    // REPLAY of a committed wave (same durable wave id) is an idempotent
    // no-op: nothing re-appends, and the returned manifest equals the
    // original — the crash-replay contract of the one-rename commit
    val replay = Maintenance.appendTrainingShards(spark, w1, s"$dir/st",
      "w1", col("doc_id"), col("text"), budgetTokens = 500L)
    assert(replay.as[(String, Long, Long, Long)].collect().toSet === m1Rows)
    assert(spark.read.parquet(s"$dir/st").count() === docs.count())
  }

  test("snapshotDiff classifies added/removed/changed; unchanged excluded") {
    val v1 = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "ko"),
      (4L, "d", "en")).toDF("id", "text", "lang")
    val v2 = Seq((1L, "a", "en"),        // unchanged
      (2L, "B", "en"),                   // changed (text)
      (3L, "c", "en"),                   // changed (lang)
      (5L, "e", "en")).toDF("id", "text", "lang") // added; 4 removed
    val out = Maintenance.snapshotDiff(v1, v2, "id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    val all = Maintenance.snapshotDiff(v1, v2, "id", Seq("text", "lang"),
      includeUnchanged = true).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) === "unchanged" && all.size === 5)
  }

  test("snapshotDiff digest: null, 'null', and empty are all distinct; " +
    "field boundaries don't shift") {
    val v1 = Seq((1L, null.asInstanceOf[String], "x"), (2L, "ab", "c"),
      (3L, "", "x")).toDF("id", "text", "lang")
    // null→"null" and ""→null flips must both read as changed, and
    // ("ab","c")→("a","bc") must not collide across the field boundary
    val v2 = Seq((1L, "null", "x"), (2L, "a", "bc"), (3L, null, "x"))
      .toDF("id", "text", "lang")
    val out = Maintenance.snapshotDiff(v1, v2, "id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "changed", 2L -> "changed", 3L -> "changed"))
  }

  test("snapshotDiff plan: the join shuffles digests, not payloads") {
    val v1 = (0L until 100L).map(i => (i, "t" * 100, "en"))
      .toDF("id", "text", "lang")
    val v2 = v1.filter(col("id") % 7 =!= 0)
    val df = Maintenance.snapshotDiff(v1, v2, "id", Seq("text", "lang"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // every exchange input is the (id, digest) projection — the text
    // payload never reaches a shuffle
    val shuffledText = p.linesIterator
      .dropWhile(l => !l.contains("Exchange")).mkString("\n")
    assert(!shuffledText.contains("text#"),
      s"payload column crossed an exchange:\n$p")
  }
}
