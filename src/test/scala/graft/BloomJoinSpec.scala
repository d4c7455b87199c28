package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom-filter join pruning: no-false-negative contract, semi-join
  * equivalence, pruning effectiveness, layout independence. */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  private val mBits = 1 << 12
  private val kHash = 4

  // fact: keys 1..2000; build: every 20th key (100 keys) → 95% of fact
  // rows have no match and should mostly fail the bloom test
  private def fact = (1L to 2000L).map(i => (i, s"p$i")).toDF("k", "payload")
  private def build = (1L to 2000L by 20L).toDF("bk")

  test("no false negatives: every build key passes its own filter") {
    val bits = BloomJoin.buildBits(build, col("bk"), mBits, kHash)
    val misses = build
      .filter(!BloomJoin.membershipTest(col("bk"), bits, mBits, kHash))
      .count()
    assert(misses === 0L)
  }

  test("semiJoinPruned is bit-identical to the plain semi join") {
    val plain = fact.join(build, col("k") === col("bk"), "left_semi")
      .select("k", "payload").as[(Long, String)].collect().sorted
    val pruned = BloomJoin.semiJoinPruned(fact, col("k"), build, col("bk"),
        mBits, kHash)
      .select("k", "payload").as[(Long, String)].collect().sorted
    assert(pruned === plain)
    assert(plain.length === 100)
  }

  test("the bloom stage actually prunes: false-positive rate is small") {
    val bits = BloomJoin.buildBits(build, col("bk"), mBits, kHash)
    val survivors = fact
      .filter(BloomJoin.membershipTest(col("k"), bits, mBits, kHash))
      .count()
    // 100 true matches; m=4096, k=4, n=100 → fp ≈ (1−e^(−400/4096))^4
    // ≈ 7.6e-5, so survivors should sit at ~100, far under the 1900
    // non-matching rows a broken filter would let through
    assert(survivors >= 100L, s"$survivors < 100 — lost true matches")
    assert(survivors <= 150L, s"$survivors survivors — filter not pruning")
  }

  test("mismatched key types fail loudly instead of silently dropping rows") {
    // xxhash64 is type-sensitive: int 5 and bigint 5 hash to different
    // positions, so an int-vs-bigint key pair would make every probe a
    // bloom false negative — a silently near-empty semi join. The
    // operator must reject the call instead.
    val intBuild = build.select(col("bk").cast("int").as("bk"))
    val e = intercept[IllegalArgumentException] {
      BloomJoin.semiJoinPruned(fact, col("k"), intBuild, col("bk"),
        mBits, kHash)
    }
    assert(e.getMessage.contains("type"))
  }

  test("bits are a pure function of the key set (layout-independent)") {
    val bits = BloomJoin.buildBits(build, col("bk"), mBits, kHash)
    val bits2 = BloomJoin.buildBits(build.repartition(13), col("bk"),
      mBits, kHash)
    assert(bits.toSeq === bits2.toSeq)
  }
}
