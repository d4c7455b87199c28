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
}
