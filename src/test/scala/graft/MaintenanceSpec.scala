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
}
