package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the runtime-filter pattern (Spark's
  * InjectRuntimeFilter, Trino's dynamic filtering) made explicit and
  * deterministic.
  *
  * A semi join whose build side is too big to ship as an in-list but
  * whose BLOOM FILTER is tiny (m bits regardless of key count) can prune
  * the fact side MAP-SIDE before the shuffle: rows failing the bloom test
  * provably have no match (no false negatives), rows passing go through
  * the exact semi join that removes the false positives. The result is
  * bit-identical to the plain semi join by construction — the bloom stage
  * is a pure physical rewrite (the q_skew_join proof pattern) — while the
  * shuffle carries only `|match| + fp·|fact|` rows instead of `|fact|`
  * (fp ≈ (1 − e^(−k·n/m))^k; m=2^16, k=4 holds fp < 1% up to n ≈ 6k
  * keys, and m scales to 2^27 bits = 16 MB for ~10M keys at 100 TB).
  *
  * Bits are set by k seeded `xxhash64` positions — deterministic and
  * layout-independent, so the filter is a pure function of the build
  * key SET (of its exact Spark type: build and fact keys must share a
  * type, or the hashes disagree). Unlike every oracle-matched hash in
  * this repo, the bits never cross engines — the oracle is the PLAIN
  * semi join — so the engine-portable md5 (hex-string materialization +
  * conv parse per row, measured 2.1 s over 600k fact rows at sf0.1) is
  * wasted cost here; xxhash64 is codegen'd straight over the raw value
  * (~0.2 s same scan). The bitmap aggregates as OR over ≤ m/64 words
  * (map-side partials; the shuffle carries words, not keys) and ships
  * into the fact-side plan as a LITERAL array of longs — the same
  * driver-sized-literal class as IVF centroids and PQ codebooks.
  */
object BloomJoin {

  private def bitPos(j: Int, key: Column, mBits: Int): Column =
    pmod(xxhash64(lit(j), key), lit(mBits.toLong)).cast("int")

  private val powers: Column =
    typedlit((0 until 64).map(i => 1L << i))

  /** The bitmap as a RELATION of non-zero words (word, bits) — the
    * OR-aggregate groups on ≤ m/64 words so map-side partials do all of
    * the work. The distributable form: [[buildBits]] collects it, the
    * streaming maintenance path persists per-batch partials of it
    * (words OR-merge exactly as CMS counters add). */
  def buildWords(build: DataFrame, keyCol: Column,
                 mBits: Int, kHash: Int): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits=$mBits not a multiple of 64")
    require(kHash >= 1, s"kHash=$kHash < 1")
    build
      .select(explode(array(
        (0 until kHash).map(j => bitPos(j, keyCol, mBits)): _*)).as("p"))
      .select(shiftright(col("p"), 6).as("word"),
        element_at(powers, (col("p") % 64).cast("int") + 1).as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
  }

  /** Assemble collected (word, bits) rows into the mBits/64-long bitmap;
    * a word index outside the bitmap means the rows were written with a
    * DIFFERENT mBits — fail loudly instead of corrupting the filter. */
  private[graft] def wordsToBits(words: Array[(Int, Long)],
                                 mBits: Int): Array[Long] = {
    val arr = new Array[Long](mBits / 64)
    words.foreach { case (w, b) =>
      require(w >= 0 && w < arr.length,
        s"word index $w outside mBits=$mBits/64 — bits built with a different mBits?")
      arr(w) = b
    }
    arr
  }

  /** Build the m-bit bloom bitmap over `build`'s keys as an array of
    * m/64 longs (one driver-sized collect of [[buildWords]]). */
  def buildBits(build: DataFrame, keyCol: Column,
                mBits: Int, kHash: Int): Array[Long] =
    wordsToBits(buildWords(build, keyCol, mBits, kHash)
      .collect().map(r => (r.getInt(0), r.getLong(1))), mBits)

  /** Membership-test column: true iff all k of `key`'s bit positions are
    * set in `bits`. False ⇒ the key is provably absent from the build
    * set; true ⇒ present OR a false positive. Pure codegen'd arithmetic
    * over two array literals — no UDF, stays in whole-stage codegen. */
  def membershipTest(key: Column, bits: Array[Long],
                     mBits: Int, kHash: Int): Column = {
    val bitsLit = typedlit(bits.toSeq)
    (0 until kHash).map { j =>
      val p = bitPos(j, key, mBits)
      element_at(bitsLit, shiftright(p, 6) + 1)
        .bitwiseAND(element_at(powers, (p % 64).cast("int") + 1)) =!= 0L
    }.reduce(_ && _)
  }

  /** Bloom-pruned exact LEFT SEMI join: map-side bloom prune of the fact
    * side, then the exact semi join over survivors. Bit-identical to
    * `fact SEMI JOIN build` (bloom has no false negatives). */
  def semiJoinPruned(fact: DataFrame, factKey: Column,
                     build: DataFrame, buildKey: Column,
                     mBits: Int = 1 << 16, kHash: Int = 4): DataFrame = {
    // xxhash64 is type-sensitive (int 5 and bigint 5 hash differently):
    // mismatched key types would turn every probe into a bloom false
    // negative — a silently near-empty result the exact semi join can't
    // recover. Fail loudly instead.
    val factType = fact.select(factKey).schema.head.dataType
    val buildType = build.select(buildKey).schema.head.dataType
    require(factType == buildType,
      s"semiJoinPruned key types must match (xxhash64 is type-sensitive): " +
        s"fact=$factType vs build=$buildType — cast both to one type first")
    val bits = buildBits(build, buildKey, mBits, kHash)
    // no distinct(): left-semi semantics ignore build-side duplicates,
    // and a pre-dedup would add a full build-side shuffle to the exact
    // operator whose point is cutting shuffle volume
    fact.filter(membershipTest(factKey, bits, mBits, kHash))
      .join(build.select(buildKey.as("_bloom_bk")),
        factKey === col("_bloom_bk"), "left_semi")
  }
}
