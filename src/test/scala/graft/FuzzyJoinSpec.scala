package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Blocked edit-distance join semantics (SURVEY §7.4 round 10). */
class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  private def rows = Seq(
    (1L, "blk1", "johnson"),
    (2L, "blk1", "jonson"),    // deletion: dist 1 to johnson
    (3L, "blk1", "johnsen"),   // substitution: dist 1 to johnson
    (4L, "blk1", "peterson"),  // far from all
    (5L, "blk2", "johnson"))   // dist 0 twin — but in ANOTHER block
    .toDF("id", "blk", "name")

  test("editDistancePairs: within-block pairs at <= maxDist; " +
      "cross-block twins never pair; banded kernel output is exact") {
    val got = FuzzyJoin.editDistancePairs(rows, col("id"), col("name"),
        Seq("blk"), maxDist = 1)
      .orderBy("id1", "id2").as[(Long, Long, Int)].collect().toSeq
    // (2,3) jonson/johnsen is dist 2 — outside the band
    assert(got === Seq((1L, 2L, 1), (1L, 3L, 1)))
  }

  test("editDistancePairs: the maxBlock valve excludes oversized blocks " +
      "and the audit surfaces exactly those") {
    val gated = FuzzyJoin.editDistancePairs(rows, col("id"), col("name"),
        Seq("blk"), maxDist = 1, maxBlock = 3)
      .as[(Long, Long, Int)].collect()
    assert(gated.isEmpty) // blk1 (4 rows) valved; blk2 has no pairs
    val audit = FuzzyJoin.oversizedBlocks(
        rows.select(col("id"), col("blk"), col("name")), Seq("blk"), 3)
      .as[(String, Long)].collect().toSeq
    assert(audit === Seq(("blk1", 4L)))
  }

  test("valve gate broadcasts the OVERSIZED complement (anti), never the " +
      "kept side: bounded at any distinct-block cardinality") {
    // A million-block corpus: 1M singleton blocks (the kept side — would
    // be a corpus-linear broadcast under the old semi-join polarity), one
    // hot block of 600 > maxBlock=512 (the gate side — bounded by
    // corpus/maxBlock regardless of scale), one small near-dup block.
    val wide = spark.range(1000000L)
      .selectExpr("id", "concat('b', id) AS blk", "'x' AS name")
    val hot = spark.range(2000000L, 2000600L)
      .selectExpr("id", "'hot' AS blk", "concat('name', id) AS name")
    val keep = Seq((3000001L, "keep", "smith"), (3000002L, "keep", "smyth"))
      .toDF("id", "blk", "name")
    val corpus = wide.union(hot).union(keep)
    val pairs = FuzzyJoin.editDistancePairs(corpus, col("id"), col("name"),
      Seq("blk"), maxDist = 1, maxBlock = 512)
    val p = pairs.queryExecution.executedPlan.toString
    // polarity: the only broadcast in the gate is a LeftAnti build of the
    // oversized frame; no broadcast LeftSemi of the kept blocks exists
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("LeftSemi"), p)
    // the gate side is exactly the audit frame: 1 row out of 1,000,002
    // distinct blocks — the broadcast stays bounded however many blocks
    // the corpus has
    assert(FuzzyJoin.oversizedBlocks(
      corpus.select(col("id"), col("blk"), col("name")),
      Seq("blk"), 512).count() === 1L)
    // output identical to the old polarity: hot excluded, keep scored
    val got = pairs.as[(Long, Long, Int)].collect().toSeq
    assert(got === Seq((3000001L, 3000002L, 1)))
  }
}
