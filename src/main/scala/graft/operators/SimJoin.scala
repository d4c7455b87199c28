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
  * Everything is chosen for cross-engine bit parity (q_tfidf_simjoin):
  * idf is the RATIONAL N/df (no log — transcendental libm results differ
  * between engines, the repo-wide rule); norms and dots fold in
  * TERM-SORTED order (the q_bm25_rank trick) because a plain float SUM's
  * accumulation order is nondeterministic; cos = dot/(‖a‖·‖b‖) uses only
  * correctly-rounded IEEE ops (sqrt, *, /) and lands in [[floorRound6]].
  *
  * Scale shape: the inverted-index self-join generates Σ_t df(t)²
  * candidate products, so the df valve (`maxDf`) bounds per-term work
  * exactly like the dedup family's maxBucket/maxBlock valves — a term in
  * more than `maxDf` docs is a stopword-by-construction carrying ~zero
  * idf weight, and [[prunedTerms]] audits what the valve dropped so a
  * cap is always an audited decision. df=1 terms join nothing and are
  * skipped on the pair side (they still count toward norms). The rest is
  * linear: tf one shuffle on (doc, term), norms one on doc, dots one on
  * (id1, id2).
  */
object SimJoin {

  private def shingleTerms(docs: DataFrame, idCol: Column, textCol: Column,
                           shingleN: Int): DataFrame =
    docs.select(idCol.as("id"),
      explode(Dedup.wordShingles(textCol, shingleN)).as("term"))

  /** Pairs (id1 < id2) with TF-IDF cosine ≥ `minCos` over the df-valved
    * shingle space. `nDocs` is the corpus size (the caller usually has
    * it; passing it in keeps this a single-pass dataflow).
    * Output: (id1, id2, cos). */
  def tfidfCosinePairs(docs: DataFrame, idCol: Column, textCol: Column,
                       nDocs: Long, minCos: Double, maxDf: Long,
                       shingleN: Int = 3): DataFrame = {
    require(maxDf >= 2, s"maxDf=$maxDf leaves no pairable terms")
    val terms = shingleTerms(docs, idCol, textCol, shingleN)
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    // df straight off tf — one row per (id, term) already, so this is
    // count(*), not count(distinct): ONE shingle pass over the corpus
    // and the term shuffle carries the aggregated tf rows, not raw
    // occurrences
    val keep = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val w = tf.join(keep, "term")
      .select(col("id"), col("term"), col("df"),
        (col("tf").cast("double") * lit(nDocs.toDouble) /
          col("df").cast("double")).as("w"))
    val norms = w.groupBy("id")
      .agg(sort_array(collect_list(struct(col("term"), col("w")))).as("arr"))
      .select(col("id"),
        sqrt(aggregate(col("arr"), lit(0.0),
          (a, x) => a + x.getField("w") * x.getField("w"))).as("norm"))
    val wp = w.filter(col("df") >= 2).select("term", "id", "w")
    val prods = wp.as("a").join(wp.as("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.term").as("term"), (col("a.w") * col("b.w")).as("prod"))
    val dots = prods.groupBy("id1", "id2")
      .agg(sort_array(collect_list(struct(col("term"), col("prod"))))
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

  /** Audit view for the df valve: the terms `tfidfCosinePairs` excluded
    * from the vector space (df > maxDf), with their document frequency —
    * run alongside a capped join so the drop is an audited decision. */
  def prunedTerms(docs: DataFrame, idCol: Column, textCol: Column,
                  maxDf: Long, shingleN: Int = 3): DataFrame =
    shingleTerms(docs, idCol, textCol, shingleN)
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
}
