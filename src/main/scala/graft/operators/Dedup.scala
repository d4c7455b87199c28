package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, tokenHash16}
import graft.functions.VectorFunctions.cosine
import graft.functions.Rounding.floorRound6

/** Deduplication operators for large-scale training-data pipelines:
  * exact (content-digest groupBy), MinHash+LSH banding, SimHash, n-gram
  * Jaccard, and embedding-cosine near-dup.
  *
  * Everything is hash-partitioned dataflow — no driver-side candidate sets:
  *  - exact dedup: one shuffle on the digest (uniform, skew-free);
  *  - MinHash LSH: shingle → signature map-side, then ONE shuffle of
  *    (band_idx, band_hash) exploded rows; candidate pairs come from a
  *    bucket self-join, so cost is Σ bucket² not n²;
  *  - Jaccard / cosine near-dup: blocked self-joins — the block key
  *    (metadata or LSH bucket) bounds the quadratic term.
  *
  * All hashes are md5-derived (engine-portable, deterministic) — never
  * JVM `hashCode` or murmur `hash()`, so the DuckDB oracle reproduces
  * signatures bit-for-bit.
  */
object Dedup {

  // ---- exact ----------------------------------------------------------

  /** Canonical row per distinct content: (digest, keep_id = min id, count). */
  def exactDedup(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(md5(textCol).as("h"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("dup_cnt"))

  // ---- MinHash + LSH --------------------------------------------------

  /** Word n-gram shingles of the lowercased token stream; texts shorter
    * than `n` tokens collapse to a single whole-text shingle. */
  def wordShingles(textCol: Column, n: Int = 3): Column = {
    val toks = tokens(textCol)
    val grams = transform(
      sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    when(size(toks) >= n, grams).otherwise(array(array_join(toks, " ")))
  }

  /** MinHash signature: per salt s_j, the minimum md5("s<j>|" ++ shingle)
    * over the shingle set (string min ≡ min over a random permutation). */
  def minhashSignature(shingles: Column, numHashes: Int = 8): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(shingles, s => md5(concat(lit(s"s$j|"), s))))
    }: _*)

  /** LSH band digests: `bands` groups of `rowsPerBand` signature entries,
    * each digested to one bucket key. Docs sharing ANY band bucket are
    * candidate pairs. */
  def bandHashes(sig: Column, bands: Int = 4, rowsPerBand: Int = 2): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r => element_at(sig, b * rowsPerBand + r + 1)): _*))
    }: _*)

  /** MinHash-LSH candidate pairs (id1 < id2, distinct). */
  def lshCandidatePairs(df: DataFrame, idCol: Column, textCol: Column,
                        n: Int = 3, numHashes: Int = 8,
                        bands: Int = 4): DataFrame = {
    val rPerBand = numHashes / bands
    val sig = df.select(idCol.as("id"),
      minhashSignature(wordShingles(textCol, n), numHashes).as("sig"))
    val banded = sig.select(col("id"),
        posexplode(bandHashes(col("sig"), bands, rPerBand))
          .as(Seq("band_idx", "band_hash")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  // ---- SimHash --------------------------------------------------------

  /** 16-bit SimHash over the token stream (frequency-weighted: repeated
    * tokens vote repeatedly). Bit b is 1 iff Σ_tokens (bit_b(h16) ? +1 : -1)
    * is > 0 — near-identical token multisets get near-identical prints
    * (Hamming distance ≈ edit volume). */
  def simhash16(textCol: Column): Column = {
    val hashes = transform(tokens(textCol), tokenHash16(_))
    // bit_b(h) = floor(h / 2^b) % 2 in doubles: h < 2^16 and 2^b are dyadic,
    // so the quotient is exactly representable — portable to engines
    // without column-valued shift operators.
    val bits = transform(sequence(lit(0), lit(15)), b => {
      val p = pow(lit(2.0), b.cast("double"))
      val bitSum = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(floor(h.cast("double") / p).cast("bigint") % 2 === 1, 1L)
          .otherwise(-1L))
      when(bitSum > 0, p).otherwise(lit(0.0))
    })
    aggregate(bits, lit(0.0), (acc, v) => acc + v).cast("bigint")
  }

  // ---- n-gram Jaccard -------------------------------------------------

  /** Blocked pairwise Jaccard over distinct word n-gram shingle sets.
    * `blockCols` bounds the self-join (metadata blocking; swap in LSH
    * buckets for content blocking at scale). */
  def jaccardPairs(df: DataFrame, idCol: Column, textCol: Column,
                   blockCols: Seq[String], n: Int = 3,
                   threshold: Double = 0.2): DataFrame = {
    val sh = df.select(idCol.as("id") +: blockCols.map(col) :+
      array_distinct(wordShingles(textCol, n)).as("sh"): _*)
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    sh.as("a").join(sh.as("b"), cond)
      .withColumn("inter",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double"))
      .withColumn("uni",
        (size(col("a.sh")) + size(col("b.sh"))).cast("double") - col("inter"))
      .withColumn("jaccard", floorRound6(col("inter") / col("uni")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("jaccard"))
  }

  // ---- embedding-cosine near-dup -------------------------------------

  /** Blocked pairwise cosine near-dup: pairs within the same `blockCol`
    * value (cluster/IVF cell) whose cosine ≥ threshold. The block key is
    * what makes this linear-ish instead of n² at scale. */
  def cosineNearDupPairs(df: DataFrame, idCol: Column, vecCol: Column,
                         blockCol: Column, threshold: Double): DataFrame = {
    val v = df.select(idCol.as("id"), blockCol.as("blk"), vecCol.as("v"))
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cos", floorRound6(cosine(col("a.v"), col("b.v"))))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("cos"))
  }
}
