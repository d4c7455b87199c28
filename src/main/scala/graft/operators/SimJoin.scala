package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding.floorRound6

/** All-pairs document similarity join: cosine over TF-IDF-weighted word
  * n-gram shingles via an inverted index — the sparse-LEXICAL-vector
  * member of the near-dup family (MinHash ≈ Jaccard on shingle SETS,
  * hyperplane LSH ≈ cosine on dense embeddings; this scores cosine on
  * weighted shingle COUNTS, the classic AllPairs/PPJoin problem).
  *
  * The vector space is the HASHED shingle space — 32-bit md5-derived
  * hashes from the native [[graft.plans.HashedShingles]] kernel, the
  * q_ngram_jaccard feature-hashing precedent: the inverted-index
  * self-join and every fold key become 8-byte longs instead of ~25-byte
  * shingle strings (measured 3.6 → 2.2 s at sf0.1), and the DuckDB
  * oracle replays the identical hash with nibble arithmetic. A 32-bit
  * collision merges two shingles into one feature — standard feature
  * hashing, replicated exactly by the oracle.
  *
  * Everything else is chosen for cross-engine bit parity
  * (q_tfidf_simjoin): idf is the RATIONAL N/df (no log — transcendental
  * libm results differ between engines, the repo-wide rule); norms and
  * dots fold in HASH-SORTED order (the q_bm25_rank trick) because a
  * plain float SUM's accumulation order is nondeterministic — sort ties
  * on the value itself, which is fold-order-irrelevant among equal
  * values; cos = dot/(‖a‖·‖b‖) uses only correctly-rounded IEEE ops
  * (sqrt, *, /) and lands in [[floorRound6]].
  *
  * Scale shape: the inverted-index self-join generates Σ_t df(t)²
  * candidate products, so the df valve (`maxDf`) bounds per-term work
  * exactly like the dedup family's maxBucket/maxBlock valves — a term in
  * more than `maxDf` docs is a stopword-by-construction carrying ~zero
  * idf weight, and [[prunedTerms]] audits what the valve dropped so a
  * cap is always an audited decision. df=1 terms join nothing and are
  * skipped on the pair side (they still count toward norms). The rest is
  * linear: tf one shuffle on (doc, hash), norms one on doc, dots one on
  * (id1, id2).
  */
object SimJoin {

  private def hashedTerms(docs: DataFrame, idCol: Column, textCol: Column,
                          shingleN: Int): DataFrame =
    // spread past a single-row-group scan — the shingle pipeline is the
    // CPU-bound stage fused onto it (sf10 soak finding)
    Spread.forKernel(docs.select(idCol.as("id"), textCol.as("_t")))
      .select(col("id"),
        explode(
          graft.plans.HashedShingles.shingleHashes(col("_t"), shingleN, 8))
          .as("h"))

  /** Pairs (id1 < id2) with TF-IDF cosine ≥ `minCos` over the df-valved
    * hashed-shingle space. `nDocs` is the corpus size (the caller
    * usually has it; passing it in keeps this a single-pass dataflow).
    * Output: (id1, id2, cos).
    *
    * Straggler control is two-tier. The df valve is the primary bound:
    * a surviving term contributes ≤ C(maxDf, 2) pair products, so at
    * the default-small maxDf no single term can straggle. When a caller
    * raises maxDf into the thousands, one surviving hot term CAN put
    * C(df, 2) products on one shuffle key — and AQE's skew split cannot
    * help here: the pair self-join reuses the upstream tf⋈df join's
    * hash distribution on `h`, so the joins fuse into one stage and the
    * pair join's children are never ENSURE_REQUIREMENTS shuffle stages
    * (the only shape OptimizeSkewedJoin rewrites; an explicit
    * repartition doesn't qualify either — REPARTITION_BY_COL origins
    * are excluded. Verified empirically in SimJoinSpec). `skewGuard`
    * therefore applies the repo's explicit [[SkewJoin]] salting to the
    * pair join: the left occurrence splits each term's rows across
    * `skewSalts` sub-keys map-side, the right occurrence replicates
    * `skewSalts`×, so the hot term's quadratic product spreads over
    * `skewSalts` reducers deterministically — identical output
    * (parity-asserted), bounded straggler (soak-measured). */
  def tfidfCosinePairs(docs: DataFrame, idCol: Column, textCol: Column,
                       nDocs: Long, minCos: Double, maxDf: Long,
                       shingleN: Int = 3, skewGuard: Boolean = false,
                       skewSalts: Int = 8): DataFrame = {
    require(maxDf >= 2, s"maxDf=$maxDf leaves no pairable terms")
    val tf = hashedTerms(docs, idCol, textCol, shingleN)
      .groupBy("id", "h").agg(count(lit(1)).as("tf"))
    // df straight off tf — one row per (id, h) already, so this is
    // count(*), not count(distinct): ONE shingle pass over the corpus
    // and the hash shuffle carries the aggregated tf rows, not raw
    // occurrences
    val keep = tf.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val w = tf.join(keep, "h")
      .select(col("id"), col("h"), col("df"),
        (col("tf").cast("double") * lit(nDocs.toDouble) /
          col("df").cast("double")).as("w"))
    val norms = w.groupBy("id")
      .agg(sort_array(collect_list(struct(col("h"), col("w")))).as("arr"))
      .select(col("id"),
        sqrt(aggregate(col("arr"), lit(0.0),
          (a, x) => a + x.getField("w") * x.getField("w"))).as("norm"))
    val wp = w.filter(col("df") >= 2).select("h", "id", "w")
    val prods = if (!skewGuard)
      wp.as("a").join(wp.as("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          col("a.h").as("h"), (col("a.w") * col("b.w")).as("prod"))
    else {
      // salted self-join: a-side rows carry salt = hash(id) mod S
      // (map-side split), b-side replicated once per salt — each (a, b)
      // pair matches on exactly one (h, salt) key, so the result is
      // identical and the hot key's products spread across S reducers
      val a = wp.withColumn("_salt",
        pmod(xxhash64(col("id")), lit(skewSalts)))
      val b = wp.withColumn("_salt",
        explode(sequence(lit(0L), lit(skewSalts - 1L))))
      a.as("a").join(b.as("b"),
          col("a.h") === col("b.h") && col("a._salt") === col("b._salt") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          col("a.h").as("h"), (col("a.w") * col("b.w")).as("prod"))
    }
    val dots = prods.groupBy("id1", "id2")
      .agg(sort_array(collect_list(struct(col("h"), col("prod"))))
        .as("arr"))
      .select(col("id1"), col("id2"),
        aggregate(col("arr"), lit(0.0),
          (a, x) => a + x.getField("prod")).as("dot"))
    dots
      .join(norms.select(col("id").as("id1"), col("norm").as("n1")), "id1")
      .join(norms.select(col("id").as("id2"), col("norm").as("n2")), "id2")
      .withColumn("cos", floorRound6(col("dot") / (col("n1") * col("n2"))))
      .filter(col("cos") >= lit(minCos))
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** Audit view for the df valve: the SHINGLE STRINGS the capped join
    * excluded from the vector space (df > maxDf), with their document
    * frequency — run alongside a capped join so the drop is an audited
    * decision. Strings, not hashes: the audit is for human review, and
    * hash collisions at worst split one audited row in two. */
  def prunedTerms(docs: DataFrame, idCol: Column, textCol: Column,
                  maxDf: Long, shingleN: Int = 3): DataFrame =
    docs.select(idCol.as("id"),
        explode(Dedup.wordShingles(textCol, shingleN)).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
}
