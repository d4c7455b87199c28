package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance weighting ([[graft.operators.Dsir]]): semantic
  * direction (target-like raw docs outrank target-unlike ones), exact
  * determinism of the fixed-point arithmetic, and the plan contract
  * (broadcast HASH join for the score table — never a nested loop; no
  * global window). */
class DsirSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    // target corpus: "alpha beta gamma" language
    (1L, "alpha beta gamma alpha beta", true),
    (2L, "beta gamma alpha gamma", true),
    (3L, "alpha alpha beta gamma beta", true),
    // raw docs: A speaks the target language, B does not
    (10L, "alpha beta gamma beta alpha", false),
    (11L, "zeta eta theta iota kappa", false),
    // raw doc with a 50/50 mix sits between
    (12L, "alpha beta zeta eta", false)
  ).toDF("doc_id", "text", "is_en")

  test("target-like raw docs outweigh target-unlike ones; mixed sits " +
      "between; weights are exactly reproducible") {
    val w = Dsir.importanceWeights(docs, col("doc_id"), col("text"),
        col("is_en"))
      .select("doc_id", "dsir_weight").as[(Long, Long)].collect().toMap
    assert(w.keySet === Set(10L, 11L, 12L), "only non-target docs scored")
    assert(w(10L) > w(12L) && w(12L) > w(11L),
      s"expected target-like > mixed > unlike, got $w")
    // integer fixed-point arithmetic: a re-run is bit-identical
    val again = Dsir.importanceWeights(docs, col("doc_id"), col("text"),
        col("is_en"))
      .select("doc_id", "dsir_weight").as[(Long, Long)].collect().toMap
    assert(again === w)
  }

  test("hashed-bigram features (gram = 2) are word-ORDER-sensitive: a " +
      "scrambled twin of a target-like doc scores strictly lower, " +
      "while the unigram profile cannot tell them apart") {
    val natural = "alpha beta gamma alpha beta gamma alpha beta"
    val scrambled = "beta alpha gamma beta alpha alpha gamma beta"
    val docs = (
      (1L to 5L).map(i => (i, natural, true)) ++
      Seq((10L, natural, false), (11L, scrambled, false))
    ).toDF("doc_id", "text", "is_en")
    val bi = Dsir.importanceWeights(docs, col("doc_id"), col("text"),
        col("is_en"), gram = 2)
      .select("doc_id", "dsir_weight").as[(Long, Long)].collect().toMap
    assert(bi(10L) > bi(11L),
      s"bigram weights must prefer the order-preserving twin, got $bi")
    val uni = Dsir.importanceWeights(docs, col("doc_id"), col("text"),
        col("is_en"))
      .select("doc_id", "dsir_weight").as[(Long, Long)].collect().toMap
    // same token multiset ⇒ identical unigram profile ⇒ identical weight
    assert(uni(10L) === uni(11L))
  }

  test("the corpus is profiled ONCE per run: the checkpointed profile " +
      "feeds both the marginals collect and the weights job") {
    val acc = spark.sparkContext.longAccumulator("corpus-scans")
    val tick = udf { (s: String) => acc.add(1); s }
    val ticking = docs.select(col("doc_id"), tick(col("text")).as("text"),
      col("is_en"))
    val w = Dsir.importanceWeights(ticking, col("doc_id"), col("text"),
      col("is_en"))
    w.collect() // second consumer of the profile lineage
    assert(acc.value === docs.count(),
      s"corpus rows scanned ${acc.value} times for ${docs.count()} rows — " +
        "the profile lineage must be checkpointed, not re-derived per job")
  }

  test("plan: score join is a broadcast HASH join — no nested loop, " +
      "no cartesian, no global window") {
    val df = Dsir.importanceWeights(docs.repartition(2), col("doc_id"),
      col("text"), col("is_en"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }
}
