package graft

import org.apache.spark.sql.functions._

import graft.operators.Percolate

/** Percolation: broadcast fast path vs the registry-scale shuffled form
  * (VERDICT r10 item 8) — rows parity at a generated 100k-rule registry,
  * valve + audit semantics. */
class PercolateSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, dir)

  /** Deterministic id-derived registry over the corpus vocabulary:
    * rule i = 2–3 terms picked by arithmetic on i (no RNG — the
    * ScaleGen determinism rule). Uses REAL corpus tokens so a useful
    * fraction of rules actually match. */
  private def registry(nRules: Int): org.apache.spark.sql.DataFrame = {
    val vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text")))
        .as("t"))
      .distinct().orderBy("t").as[String].collect()
    val v = vocab.length
    val rows = (0 until nRules).flatMap { i =>
      val n = 2 + (i % 2)
      // prime multipliers so the index walk covers the WHOLE vocabulary
      // for any vocab size (i * 31 collapsed mod the shaped corpus's
      // v = 31 vocab — every rule drew from 3 terms)
      val ts = (0 until n).map(j => vocab(((i * 7919 + j * 104729) % v + v) % v))
        .distinct
      ts.map(t => (i.toLong, t, ts.length))
    }
    rows.toDF("query_id", "term", "n_terms")
  }

  /** Distributed parity signature: the 100k-rule match set is tens of
    * millions of (rule, doc) pairs — a driver `collect().toSet` per side
    * cost ~250 s of boxing/Set-building per test (the r13 suite-wall
    * regression); (count, Σ pair-hash) compares the same multiset with
    * the work staying in executors. xxhash64 sums ride DECIMAL(38,0)
    * (the ANSI LONG-overflow rule). */
  private def matchSig(df: org.apache.spark.sql.DataFrame): (Long, BigDecimal) = {
    val r = df.agg(count(lit(1)),
      // sum() over zero rows is NULL — coalesce so an empty match set
      // reports as (0, 0) and fails the count assertion with its real
      // message instead of an NPE here (round-13 ADVICE #1)
      coalesce(sum(xxhash64(col("query_id"), col("doc_id"))
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")))
      .head()
    (r.getLong(0), BigDecimal(r.getDecimal(1)))
  }

  // shared across both 100k-rule tests: the registry build and the
  // broadcast-form reference signature each cost tens of seconds — one
  // evaluation serves both parities
  private lazy val reg100k = registry(100000)
  private lazy val broadcastSig100k = matchSig(
    Percolate.matches(docs, col("doc_id"), col("text"), reg100k))

  test("matchesShuffled == matches (broadcast) at a 100k-rule registry") {
    val viaShuffle = matchSig(
      Percolate.matchesShuffled(docs, col("doc_id"), col("text"), reg100k))
    assert(viaShuffle === broadcastSig100k)
    assert(broadcastSig100k._1 > 0, "registry should produce some matches")
  }

  test("matchesHybrid == matches (broadcast) at a 100k-rule registry " +
      "with a valve that genuinely splits the legs") {
    val reg = reg100k
    // the shaped corpus has ~31 distinct terms with dfs 25–415 (median
    // 391 of 500 docs): maxDf = 390 routes roughly half the rules to
    // the broadcast leg and half through the shuffled leg — both legs
    // must carry real traffic for this parity to mean anything
    val maxDf = 390L
    val hot = Percolate.unservableRules(docs, col("doc_id"), col("text"),
      reg, maxDf).count()
    assert(hot > 0 && hot < 100000,
      s"valve must split the registry, got $hot hot rules")
    val viaHybrid = matchSig(Percolate.matchesHybrid(docs, col("doc_id"),
      col("text"), reg, maxDf = maxDf))
    assert(viaHybrid === broadcastSig100k)
    assert(broadcastSig100k._1 > 0, "registry should produce some matches")
  }

  test("term-selectivity valve: an all-hot-term rule is excluded AND " +
      "audited; served rules stay exact; absent terms never match") {
    // 'the' appears in ~every doc; 'zzz_absent_zzz' in none
    val reg = Seq(
      (1L, "employee", 1),                  // servable: a real corpus term
      (2L, "the", 1),                       // all-stopword rule
      (3L, "zzz_absent_zzz", 2), (3L, "employee", 2)) // absent term
      .toDF("query_id", "term", "n_terms")
    val maxDf = 100L
    val got = Percolate.matchesShuffled(docs, col("doc_id"), col("text"),
      reg, maxDf = maxDf).as[(Long, Long)].collect().toSeq
    val want = Percolate.matches(docs, col("doc_id"), col("text"),
        reg.filter(col("query_id") =!= 2L))
      .as[(Long, Long)].collect().toSeq
    assert(got.sorted === want.sorted)
    assert(got.forall(_._2 != 3L), "a rule with an absent term never matches")
    // the cap is an AUDITED decision: the dropped rule surfaces with its
    // routing df
    val audited = Percolate.unservableRules(docs, col("doc_id"),
      col("text"), reg, maxDf).as[(Long, String, Long)].collect()
    assert(audited.map(_._1).toSeq === Seq(2L))
    assert(audited.head._3 > maxDf)
  }
}
