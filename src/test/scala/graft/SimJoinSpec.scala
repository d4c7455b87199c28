package graft

import org.apache.spark.sql.functions._

import graft.operators.SimJoin

/** TF-IDF cosine all-pairs join: agreement with a driver-side
  * brute-force cosine, df-valve semantics + audit, layout independence. */
class SimJoinSpec extends SparkSuite {
  import spark.implicits._

  // near-dup pair (a,b) share most shingles; c is lexically disjoint;
  // every doc shares the "common filler words here" run to exercise df
  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),
    (3L, "one two three four five six seven eight")
  ).toDF("doc_id", "text")

  test("finds the near-dup pair, not the disjoint doc") {
    val out = SimJoin.tfidfCosinePairs(docs, col("doc_id"), col("text"),
        nDocs = 3, minCos = 0.3, maxDf = 10)
      .select("id1", "id2", "cos").as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(out.head._3 > 0.5 && out.head._3 < 1.0)
  }

  test("cos agrees with driver-side brute force on the shared space") {
    // replicate: 3-gram shingles, tf counts, df over 3 docs, w = tf*N/df
    def shingles(t: String): Seq[String] =
      t.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSeq
    val all = docs.as[(Long, String)].collect().toMap
    val sh = all.view.mapValues(shingles).toMap
    val df = sh.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    def vec(id: Long): Map[String, Double] =
      sh(id).groupBy(identity).map { case (t, o) =>
        t -> o.size.toDouble * 3.0 / df(t) }
    def cos(i: Long, j: Long): Double = {
      val (a, b) = (vec(i), vec(j))
      val dot = a.keySet.intersect(b.keySet).toSeq.sorted
        .foldLeft(0.0)((s, t) => s + a(t) * b(t))
      def nrm(v: Map[String, Double]) =
        math.sqrt(v.toSeq.sortBy(_._1).foldLeft(0.0)((s, p) => s + p._2 * p._2))
      dot / (nrm(a) * nrm(b))
    }
    val expected = math.floor(cos(1L, 2L) * 1e6 + 0.5) / 1e6
    val got = SimJoin.tfidfCosinePairs(docs, col("doc_id"), col("text"),
        nDocs = 3, minCos = 0.3, maxDf = 10)
      .select("cos").as[Double].head()
    assert(got === expected)
  }

  test("df valve drops hot terms from the space and audits them") {
    // make one shingle hot: the same 3-token run in every doc
    val hot = Seq(
      (1L, "common filler words alpha beta gamma"),
      (2L, "common filler words alpha beta delta"),
      (3L, "common filler words one two three"),
      (4L, "common filler words four five six")
    ).toDF("doc_id", "text")
    val pruned = SimJoin.prunedTerms(hot, col("doc_id"), col("text"),
        maxDf = 3)
      .select("term", "df").as[(String, Long)].collect().toMap
    assert(pruned.keySet === Set("common filler words"))
    assert(pruned("common filler words") === 4L)
    // with the hot shingle valved out, the disjoint tails keep 3↔4 and
    // 1↔2 apart: only genuinely-overlapping pairs survive
    val pairs = SimJoin.tfidfCosinePairs(hot, col("doc_id"), col("text"),
        nDocs = 4, minCos = 0.2, maxDf = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("result is layout-independent") {
    val base = SimJoin.tfidfCosinePairs(docs, col("doc_id"), col("text"),
        nDocs = 3, minCos = 0.3, maxDf = 10)
      .select("id1", "id2", "cos").as[(Long, Long, Double)].collect().sorted
    val shuffled = SimJoin.tfidfCosinePairs(docs.repartition(7),
        col("doc_id"), col("text"), nDocs = 3, minCos = 0.3, maxDf = 10)
      .select("id1", "id2", "cos").as[(Long, Long, Double)].collect().sorted
    assert(shuffled === base)
  }
}
