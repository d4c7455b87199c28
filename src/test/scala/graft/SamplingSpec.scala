package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.featureHashEmbeddingD
import graft.operators.Sampling

/** Sampling / packing operator semantics + feature-hash embedding laws. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = (1L to 200L)
    .map(i => (i, s"lang${i % 4}", s"src${i % 3}", "tok " * (i % 30).toInt))
    .toDF("doc_id", "lang", "source", "text")

  test("leakage-safe split co-assigns every near-dup pair; naive leaks") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q_split_leakage_safe")(spark, dir)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val naive = SparkEntry.queries("q_split_assign")(spark, dir)
      .as[(Long, String)].collect().toMap
    val pairs = graft.operators.Dedup.lshCandidatePairs(
        Tables.documents(spark, dir), col("doc_id"), col("text"))
      .select("id1", "id2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    // every candidate pair lands in ONE split under the safe assignment
    pairs.foreach { case (a, b) =>
      assert(out(a) === out(b), s"pair ($a,$b) straddles splits")
    }
    // ...and the naive doc_id-keyed split demonstrably leaks on this
    // corpus (at least one near-dup pair straddles train/test|val)
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "fixture corpus has no leaking pair — test is vacuous")
    // singletons (docs in no pair) keep the naive assignment: the
    // component label falls back to the doc's own id
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    out.keys.filterNot(paired).foreach { id =>
      assert(out(id) === naive(id), s"singleton $id moved")
    }
  }

  test("quality classifier: planted junk doc scores below planted clean " +
      "doc and below the threshold") {
    import graft.operators.QualityRules
    val clean = Seq("query", "join", "filter", "window", "scan", "hash")
    val junk = Seq("spam", "click", "free", "casino")
    val w = QualityRules.anchorWeights(64, clean, junk)
    val docs = Seq(
      (1L, "query join filter window scan hash"),   // all clean anchors
      (2L, "spam click free casino spam click"))    // all junk anchors
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        QualityRules.classifierLogit(col("text"), 64, w).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) > 0, s"clean doc should score positive: ${got(1L)}")
    assert(got(2L) < 0, s"junk doc should score negative: ${got(2L)}")
    assert(got(2L) < got(1L))
  }

  test("gopherFlags: each rule binds on its crafted violator") {
    import graft.operators.QualityRules
    // distinct words keep trigrams unique (the rep rule must not fire
    // on the passing doc); lengths sized to the mean-word-length band
    val good = (1 to 40).map(i => s"word$i").mkString(" ") +
      " the a of to and in"
    val rows = Seq(
      (1L, good),                                   // passes all
      (2L, "short doc the a"),                      // fails words floor
      (3L, ("xxxx " * 50) + "the a"),               // repeated 3-grams
      (4L, (1 to 60).map(i => s"qq$i").mkString(" ")), // no stopwords
      (5L, ("w" * 15 + " ") * 50 + "the a the a"))  // mean len too high
      .toDF("doc_id", "text")
    val f = QualityRules.gopherFlags(rows, col("doc_id"), col("text"))
      .select("doc_id", "flag_words", "flag_mean_len", "flag_stop",
        "flag_rep", "keep")
      .as[(Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap
    assert(f(1L)._6 === 1, s"doc 1 should pass: ${f(1L)}")
    assert(f(2L)._2 === 0 && f(2L)._6 === 0)
    assert(f(3L)._5 === 0 && f(3L)._6 === 0)
    assert(f(4L)._4 === 0 && f(4L)._6 === 0)
    assert(f(5L)._3 === 0 && f(5L)._6 === 0)
  }

  test("gopherRepetition: hand-computed fractions — overlapping top-gram " +
      "repeats can exceed 1 (unclamped, the Dolma convention); " +
      "duplicated-5-gram coverage counts each position once") {
    import graft.operators.QualityRules
    val d = Seq(
      (1L, "a b a b a"),           // top2 "a b"×2·2=4/5; top3 "a b a"×2·3=6/5
      (2L, "c c c c c c"),         // 5-gram ×2 covers ALL 6 positions → 1.0
      (3L, "ab cd"))               // no 3-grams → top3 = 0
      .toDF("doc_id", "text")
    val got = QualityRules.gopherRepetition(d, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 5L, 0.8, 1.2, 0.0),
      (2L, 6L, 10.0 / 6.0, 2.0, 1.0),
      (3L, 4L, 1.0, 0.0, 0.0)))
  }

  test("gopherRepetition: native kernel is bit-identical to the windowed " +
      "declarative formulation on the sf0.001 corpus (incl. zero-token " +
      "and short-doc edges)") {
    import graft.operators.QualityRules
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      // edge rows the shaped corpus lacks: zero tokens (dropped by both
      // forms), whitespace-only, single-token, and a 4-token doc (no
      // 5-grams)
      .unionByName(Seq((100001L, ""), (100002L, "  \t "), (100003L, "one"),
        (100004L, "a b a b")).toDF("doc_id", "text"))
    val kernel = QualityRules.gopherRepetition(base, col("doc_id"),
      col("text"))
    val windowed = QualityRules.gopherRepetitionWindowed(base, col("doc_id"),
      col("text"))
    assert(kernel.exceptAll(windowed).isEmpty &&
      windowed.exceptAll(kernel).isEmpty,
      "kernel and windowed forms diverge")
    // the plan is shuffle-free past the kernel spread: no exchange other
    // than the forKernel round-robin, no join, no window
    val plan = kernel.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"kernel plan regained a window/join:\n$plan")
  }

  test("gopherRepetition: top-gram is the MOST FREQUENT gram (not the " +
      "max count×chars product); count ties break to the longer gram") {
    import graft.operators.QualityRules
    val d = Seq(
      // "x y"×3 (6 chars) is most frequent; "longword1 longword2"×1 has
      // the larger product (18) and must NOT win (the Gopher/Dolma rule)
      (1L, "x y x y x y longword1 longword2"),
      // "aa b" and "ccc d" both ×2 — tie breaks to max glen (ccc d → 8)
      (2L, "aa b aa b ccc d ccc d"))
      .toDF("doc_id", "text")
    val got = QualityRules.gopherRepetition(d, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .select("doc_id", "n_token_chars", "top_2gram_char_frac")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 24L, 6.0 / 24.0),
      (2L, 14L, 8.0 / 14.0)))
  }

  test("hashSample is deterministic and roughly proportional") {
    val a = Sampling.hashSample(docs, col("doc_id"), 0.25)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.hashSample(docs, col("doc_id"), 0.25)
      .select("doc_id").as[Long].collect().sorted
    assert(a === b)
    assert(a.length > 20 && a.length < 80) // ~50 expected of 200
    // monotone: a higher rate strictly contains a lower rate
    val wide = Sampling.hashSample(docs, col("doc_id"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a.forall(wide.contains))
  }

  test("stratifiedSample returns exactly k rows per stratum, stable") {
    val s1 = Sampling.stratifiedSample(docs, Seq("lang"), col("doc_id"), 10)
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts.values.toSet === Set(10L))
    val s2 = Sampling.stratifiedSample(docs, Seq("lang"), col("doc_id"), 10)
    assert(s1.select("doc_id").as[Long].collect().sorted
      === s2.select("doc_id").as[Long].collect().sorted)
  }

  test("packByTokenBudget: bins are contiguous and respect the budget") {
    val packed = Sampling.packByTokenBudget(
      docs.withColumn("n_tokens", lit(7)),
      col("source"), col("doc_id"), col("n_tokens"), budget = 20L)
    val rows = packed.select("source", "doc_id", "cum_tokens", "bin")
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1)
    rows.values.foreach { grp =>
      val sorted = grp.sortBy(_._2)
      // running sum advances by 7 per row within the group
      assert(sorted.zipWithIndex.forall { case ((_, _, cum, _), i) =>
        cum === 7L * (i + 1) })
      // bin ids are non-decreasing, start at 0, and each bin's pre-row
      // token count is under budget
      assert(sorted.head._4 === 0L)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => b._4 >= a._4; case _ => true })
      assert(sorted.forall { case (_, _, cum, bin) => (cum - 7) / 20 === bin })
    }
  }

  test("native FeatureHashEmbed is bit-identical to the HOF formulation") {
    import graft.functions.VectorFunctions.featureHashEmbeddingHof
    val texts = Seq("the quick brown fox", "직원 유형. 프로필: 개발자",
      "  MIXED case   Tabs\tand\nnewlines  ", "x", "")
      .toDF("text")
    val rows = texts.select(
      featureHashEmbeddingD(col("text"), 16).as("native"),
      featureHashEmbeddingHof(col("text"), 16).as("hof"))
      .as[(Seq[Double], Seq[Double])].collect()
    rows.foreach { case (n, h) =>
      assert(n.length === h.length)
      n.zip(h).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a)
          === java.lang.Double.doubleToLongBits(b))
      }
    }
    // null text → null embedding in both
    val nulls = Seq(null.asInstanceOf[String]).toDF("text").select(
      featureHashEmbeddingD(col("text"), 8).as("n"),
      featureHashEmbeddingHof(col("text"), 8).as("h")).collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("assignSplit: stable under corpus growth, near-target proportions") {
    val small = Sampling.assignSplit(docs.limit(100), col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = Sampling.assignSplit(docs, col("doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // adding rows never reassigns existing rows
    small.foreach { case (id, sp) => assert(full(id) === sp) }
    val frac = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(frac("train") > 120 && frac("test") > 5 && frac("val") > 5)
  }

  test("upsertByKey: updates replace, new ids append, others untouched") {
    import graft.sources.HrPipeline
    val existing = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "v")
    val updates = Seq(("b", 20), ("d", 40)).toDF("id", "v")
    val out = HrPipeline.upsertByKey(existing, updates)
      .as[(String, Int)].collect().sorted
    assert(out === Array(("a", 1), ("b", 20), ("c", 3), ("d", 40)))
  }

  test("KMV sketch: exact below k, close + deterministic above k") {
    import graft.operators.Sketches
    // group "small": 30 distinct keys (< k=64) → exact; "big": 5000 distinct
    val rows = ((1 to 30).map(i => ("small", i.toLong)) ++
      (1 to 5000).map(i => ("big", 100000L + i))).toDF("g", "key")
    val out = Sketches.kmvDistinctOf(spark, rows, "g", "key", k = 64)
      .as[(String, Int, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("small") === ((30, 30.0)))
    val (nSketch, est) = out("big")
    assert(nSketch === 64)
    assert(math.abs(est - 5000) / 5000.0 < 0.30) // k=64 → ~12% stderr
    // deterministic under different partitioning (merge path exercised)
    val out2 = Sketches.kmvDistinctOf(spark, rows.repartition(13), "g",
      "key", k = 64).as[(String, Int, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out2("big") === est)
  }

  test("KMV set ops: sketch-only union/intersect/Jaccard track the " +
      "exact overlap; disjoint sets report zero intersection") {
    import graft.operators.Sketches
    // a = 1..3000, b = 2001..5000 (overlap 1000 of union 5000 → J=0.2);
    // c disjoint from both
    val rows = ((1 to 3000).map(i => ("a", i.toLong)) ++
      (2001 to 5000).map(i => ("b", i.toLong)) ++
      (1 to 500).map(i => ("c", 900000L + i))).toDF("g", "key")
    val out = Sketches.kmvSetOps(spark, rows, "g", "key", k = 64)
      .as[(String, String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = out(("a", "b"))
    assert(math.abs(ab._4 - 5000) / 5000.0 < 0.35, s"union est ${ab._4}")
    assert(math.abs(ab._5 - 1000) / 1000.0 < 0.60, s"intersect ${ab._5}")
    assert(math.abs(ab._6 - 0.2) < 0.12, s"jaccard ${ab._6}")
    // c shares nothing: every pair with c must estimate zero overlap
    assert(out(("a", "c"))._3 === 0L && out(("a", "c"))._5 === 0.0)
    assert(out(("b", "c"))._5 === 0.0)
    // deterministic under repartitioning (merge path exercised)
    val again = Sketches.kmvSetOps(spark, rows.repartition(13), "g",
      "key", k = 64).as[(String, String, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r._5).toMap
    assert(again(("a", "b")) === ab._5)
  }

  test("resampleToMix: binding domain whole, rates ~ target, growth shrinks subsets") {
    val rows = ((1 to 300).map(i => (i.toLong, "a")) ++
      (301 to 400).map(i => (i.toLong, "b"))).toDF("id", "dom")
    val mix = Map("a" -> 0.5, "b" -> 0.5)
    val out = Sampling.resampleToMix(rows, "dom", col("id"), mix)
    val by = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    // b is binding (100/0.5 < 300/0.5): keeps every row; a keeps ~1/3
    assert(by("b") === 100L)
    assert(math.abs(by("a") - 100L) < 25L)
    // a domain with no target weight is dropped entirely
    val withC = rows.unionByName(Seq((999L, "c")).toDF("id", "dom"))
    assert(!Sampling.resampleToMix(withC, "dom", col("id"), mix)
      .select("dom").as[String].collect().contains("c"))
    // growing a NON-binding domain only lowers its threshold: the kept
    // set shrinks to a SUBSET (per-row decisions stable, the audit
    // property hash acceptance buys)
    val aKept = out.filter(col("dom") === "a").select("id")
      .as[Long].collect().toSet
    val grown = rows.unionByName(
      (401 to 700).map(i => (i.toLong, "a")).toDF("id", "dom"))
    val aKept2 = Sampling.resampleToMix(grown, "dom", col("id"), mix)
      .filter(col("dom") === "a").filter(col("id") <= 300)
      .select("id").as[Long].collect().toSet
    assert(aKept2.subsetOf(aKept))
  }

  test("HLL sketch: error-bounded vs exact, partitioning-independent") {
    import graft.operators.Sketches
    // three cardinality regimes: linear-counting range (100), the
    // crossover (~640 = 2.5m), and raw-HLL range (20000)
    val rows = ((1 to 100).map(i => ("small", i.toLong)) ++
      (1 to 640).map(i => ("mid", 10000L + i)) ++
      (1 to 20000).map(i => ("big", 1000000L + i))).toDF("g", "key")
    val full = Sketches.hllDistinct(spark, rows, "g", "key", p = 8)
      .select("g", "est_raw", "est").as[(String, Double, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val out = full.view.mapValues(_._2).toMap
    // p=8 → stderr ≈ 1.04/√256 = 6.5%; assert 3σ (deterministic hash, so
    // a pass is stable — this bounds the implementation, not luck)
    assert(math.abs(out("small") - 100) / 100.0 < 0.20)
    assert(math.abs(out("mid") - 640) / 640.0 < 0.20)
    assert(math.abs(out("big") - 20000) / 20000.0 < 0.20)
    // linear counting engages below 2.5m (raw HLL is badly biased there —
    // the correction must actually replace it) and stays within ~2σ of
    // its own stderr at n=100
    assert(full("small")._1 !== full("small")._2)
    assert(math.abs(out("small") - 100) / 100.0 < 0.15)
    // deterministic under different partitioning (map-side merge path)
    val out2 = Sketches.hllDistinct(spark, rows.repartition(13), "g",
        "key", p = 8)
      .select("g", "est").as[(String, Double)].collect().toMap
    assert(out2 === out)
  }

  test("weightedSample: rate tracks the weight, clamps at 0 and 1, stable") {
    val rows = (1L to 4000L).map { i =>
      (i, (i % 4) match {
        case 0 => 0.0   // never kept
        case 1 => 0.25
        case 2 => 0.75
        case 3 => 1.0   // always kept
      })
    }.toDF("id", "wt")
    val kept = Sampling.weightedSample(rows, col("id"), col("wt"))
      .groupBy("wt").count().as[(Double, Long)].collect().toMap
    assert(!kept.contains(0.0))
    assert(kept(1.0) === 1000L)
    assert(math.abs(kept(0.25) - 250L) < 60L)
    assert(math.abs(kept(0.75) - 750L) < 60L)
    // per-row decisions are a pure function of (id, weight): growing the
    // corpus cannot flip any existing row
    val keptIds = Sampling.weightedSample(rows, col("id"), col("wt"))
      .select("id").as[Long].collect().toSet
    val grown = rows.unionByName(
      (4001L to 5000L).map((_, 0.5)).toDF("id", "wt"))
    val keptIds2 = Sampling.weightedSample(grown, col("id"), col("wt"))
      .filter(col("id") <= 4000L).select("id").as[Long].collect().toSet
    assert(keptIds2 === keptIds)
  }

  test("resampleTemperature: flattens toward uniform, binding domain whole") {
    // a: 400 rows, b: 100 → weights 20:10, T = min(√n) via n/w = 10;
    // keep rates: b = 10·10/100 = 1.0 (everything), a = 20·10/400 = 0.5
    val rows = ((1 to 400).map(i => (i.toLong, "a")) ++
      (401 to 500).map(i => (i.toLong, "b"))).toDF("id", "dom")
    val by = Sampling.resampleTemperature(rows, "dom", col("id"))
      .groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(by("b") === 100L)
    assert(math.abs(by("a") - 200L) < 40L)
    // output ratio 2:1 sits between natural 4:1 and uniform 1:1 — the
    // flattening alpha-sampling buys
    assert(by("a") > by("b") && by("a") < 4 * by("b"))
  }

  test("epochShuffle: a permutation per epoch, epochs independent, layout-stable") {
    val ids = (1L to 500L).toDF("id")
    val e0 = Sampling.epochShuffle(spark, ids, col("id"), epoch = 0)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    // positions are exactly 0..n-1 (a permutation, no gaps or dups)
    assert(e0.values.toSeq.sorted === (0L until 500L))
    // a different epoch yields a genuinely different order
    val e1 = Sampling.epochShuffle(spark, ids, col("id"), epoch = 1)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(e0 !== e1)
    // and the permutation is a function of (epoch, id) only — physical
    // layout can't change it
    val e0b = Sampling.epochShuffle(spark, ids.repartition(17), col("id"),
      epoch = 0).select("id", "pos").as[(Long, Long)].collect().toMap
    assert(e0b === e0)
  }

  test("CMS sketch: overestimate-only, error-bounded, partitioning-independent") {
    import graft.operators.Sketches
    // zipf-ish stream: key i occurs ceil(2000/i) times, i = 1..200
    // (N ≈ 11,800 occurrences, top keys dominate — the heavy-hitter case)
    val occurrences = (1 to 200).flatMap(i =>
      Seq.fill(math.ceil(2000.0 / i).toInt)(s"k$i"))
    val rows = occurrences.toDF("key")
    val d = 4; val w = 256
    val grid = Sketches.cmsCounters(rows, col("key"), d, w)
    // grid never exceeds d·w rows and total counts are preserved per row
    val cells = grid.collect()
    assert(cells.length <= d * w)
    val perRow = grid.groupBy("cms_row").agg(sum("cms_cnt").as("n"))
      .select("n").as[Long].collect()
    assert(perRow.forall(_ === occurrences.length.toLong))
    val exact = rows.groupBy("key").agg(count(lit(1)).as("exact_cnt"))
    val est = Sketches.cmsEstimate(grid, exact, "key", d, w)
      .select(col("key"), col("exact_cnt"), col("cms_est"))
      .as[(String, Long, Long)].collect()
    // CMS can only over-count (collisions add, never subtract), and the
    // standard bound holds with room: est ≤ exact + 2N/w for every key
    // (deterministic hash → a pass is stable, not luck)
    val n = occurrences.length
    est.foreach { case (k, ex, e) =>
      assert(e >= ex, s"$k under-counted: $e < $ex")
      assert(e - ex <= 2L * n / w, s"$k error ${e - ex} > ${2L * n / w}")
    }
    // a never-seen key estimates via whatever shares its buckets — still
    // an overestimate of its true count 0; and partitioning cannot
    // change anything (counters are additive)
    val grid2 = Sketches.cmsCounters(rows.repartition(13), col("key"), d, w)
    assert(grid2.collect().toSet === cells.toSet)
  }

  test("quantileSketch: exact below k, partitioning-independent above") {
    import graft.operators.Sketches
    // small group (< k): the sample IS the group → exact quartiles
    val small = (1L to 10L).map(i => ("s", i, i.toDouble)).toDF("g", "id", "v")
    val exact = Sketches.quantileSketch(spark, small, "g", "id", "v",
        k = 64, qs = Seq(0.25, 0.5, 0.75))
      .select("p25", "p50", "p75").as[(Double, Double, Double)].head()
    // ceil-indexing on the sorted 10 values: idx 3, 5, 8
    assert(exact === ((3.0, 5.0, 8.0)))
    // big group: same result regardless of partitioning (merge path)
    val big = (1L to 5000L).map(i => ("b", i, i.toDouble)).toDF("g", "id", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.quantileSketch(spark, df, "g", "id", "v", k = 64,
          qs = Seq(0.5)).select("p50").as[Double].head()
    val p = run(big)
    assert(run(big.repartition(13)) === p)
    // the hash sample is uniform-ish: median estimate within 25%
    assert(math.abs(p - 2500.0) / 2500.0 < 0.25)
  }

  test("featureHashEmbeddingD: unit norm, deterministic, dim-sized") {
    val out = docs.filter(length(col("text")) > 0)
      .select(featureHashEmbeddingD(col("text"), 8).as("e"))
      .as[Seq[Double]].collect()
    out.foreach { e =>
      assert(e.length === 8)
      val n = math.sqrt(e.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
    // empty text → zero vector, not NaN
    val z = Seq("").toDF("text")
      .select(featureHashEmbeddingD(col("text"), 8).as("e"))
      .as[Seq[Double]].head()
    assert(z === Seq.fill(8)(0.0))
  }
}
