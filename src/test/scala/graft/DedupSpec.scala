package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup family semantics (SURVEY.md §7.4 extensions). */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "s0"),
    (2L, "the quick brown fox jumps over the lazy dog", "en", "s0"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat", "en", "s0"), // near dup of 1
    (4L, "completely different content about spark engines", "en", "s0"),
    (5L, "the quick brown fox jumps over the lazy dog", "en", "s1")) // dup, other block
    .toDF("doc_id", "text", "lang", "source")

  test("native HashedShingles is bit-identical to the HOF hash pipelines") {
    import graft.functions.TextFunctions.{tokens, tokenHash16, tokenHash32}
    val texts = Seq("the quick brown fox jumps", "직원 유형 프로필 개발자 데이터",
      "two words", "one", "", "  padded   whitespace\ttabs ")
      .toDF("t")
    // token mode (n=1, no collapse)
    val tok = texts.select(
      graft.plans.HashedShingles.tokenHashes16(col("t")).as("native"),
      transform(tokens(col("t")), tokenHash16(_)).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    tok.foreach { case (n, h) => assert(n === h) }
    // shingle mode (n=3, collapse), 16- and 32-bit prefixes
    val sh16 = texts.select(
      graft.plans.HashedShingles.shingleHashes(col("t"), 3, 4).as("native"),
      transform(Dedup.wordShingles(col("t"), 3), tokenHash16(_)).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    sh16.foreach { case (n, h) => assert(n === h) }
    val sh32 = texts.select(
      graft.plans.HashedShingles.shingleHashes(col("t"), 3, 8).as("native"),
      transform(Dedup.wordShingles(col("t"), 3), tokenHash32(_)).as("hof"))
      .as[(Seq[Long], Seq[Long])].collect()
    sh32.foreach { case (n, h) => assert(n === h) }
  }

  test("native SimHash16 is bit-identical to the HOF formulation") {
    val out = docs.select(Dedup.simhash16(col("text")).as("native"),
      Dedup.simhash16Hof(col("text")).as("hof"))
      .as[(Long, Long)].collect()
    out.foreach { case (n, h) => assert(n === h) }
    // empty text → 0 in both
    val z = Seq("").toDF("text").select(Dedup.simhash16(col("text")),
      Dedup.simhash16Hof(col("text"))).as[(Long, Long)].head()
    assert(z === ((0L, 0L)))
  }

  test("exactDedup groups identical content under min-id representative") {
    val out = Dedup.exactDedup(docs, col("doc_id"), col("text"))
      .orderBy("keep_id").select("keep_id", "dup_cnt")
      .as[(Long, Long)].collect()
    assert(out === Array((1L, 3L), (3L, 1L), (4L, 1L)))
  }

  test("clusterRepresentatives: keep-best survivorship; singletons " +
      "represent themselves; quality ties break to the smaller id") {
    val d = Seq(
      (1L, "aa"), (2L, "bbbb"), (3L, "cc"),      // cluster {1,2,3} → rep 2
      (4L, "dd"),                                 // singleton
      (5L, "ee"), (6L, "ff")                      // cluster {5,6}, tie → 5
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
    val got = Dedup.clusterRepresentatives(d, col("doc_id"),
        length(col("text")), pairs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 2L, 0), (2L, 1L, 2L, 1), (3L, 1L, 2L, 0),
      (4L, 4L, 4L, 1),
      (5L, 5L, 5L, 1), (6L, 5L, 5L, 0)))
  }

  test("removeDuplicateSpans: shared n-token runs drop from every doc; " +
      "unique text survives verbatim; short docs pass through") {
    val d = Seq(
      (1L, "u1 u2 a b c d e u3"),   // a b c d (shared with 2) covers 2..5
      (2L, "a b c d x y z w"),      // a b c d covers 0..3
      (3L, "all unique tokens here"),
      (4L, "tiny")                  // shorter than n → no shingles
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(d, col("doc_id"), col("text"),
        n = 4)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // only "a b c d" repeats: doc1 covered positions 2..5, doc2 0..3
    assert(got === Seq(
      (1L, "u1 u2 e u3", 4L, 4L),
      (2L, "x y z w", 4L, 4L),
      (3L, "all unique tokens here", 4L, 0L),
      (4L, "tiny", 1L, 0L)))
  }

  test("spanShingles: native kernel is bit-identical to the lead-window " +
      "formulation on the sf0.001 corpus (incl. short and empty docs)") {
    import graft.functions.TextFunctions.tokens
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((100001L, ""), (100002L, "nine eight seven six " +
        "five four three two one"), (100003L, "just three tokens"))
        .toDF("doc_id", "text"))
    val kernel = graft.operators.Spread.forKernel(
        base.select(col("doc_id"), col("text").as("_t")))
      .select(col("doc_id"),
        explode(graft.plans.SpanShingleHashes.spanHashes(col("_t"), 10))
          .as("s"))
      .select(col("doc_id"), col("s.start").as("start"), col("s.h").as("h"))
    val toks = base.select(col("doc_id"), tokens(col("text")).as("tk"))
    val windowed = Dedup.spanShinglesWindowed(toks, 10)
    assert(kernel.exceptAll(windowed).isEmpty &&
      windowed.exceptAll(kernel).isEmpty,
      "kernel and windowed span shingles diverge")
  }

  test("dedupLines: cross-doc boilerplate lines removed from every doc; " +
      "a within-doc repeat survives; a fully-boilerplate doc empties") {
    val d = Seq(
      (1L, "banner\nunique one\nfooter"),
      (2L, "banner\nunique two\nfooter"),
      (3L, "banner\nfooter"),            // every line shared → empty doc
      (4L, "solo line\nsolo line\nmine") // repeats in ONE doc only → kept
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLines(d, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "unique one", 1L, 2L),
      (2L, "unique two", 1L, 2L),
      (3L, "", 0L, 2L),
      (4L, "solo line\nsolo line\nmine", 3L, 0L)))
  }

  test("removeContaminatedSpans: benchmark-shared spans excised (incl. " +
      "span at doc boundary), fully-contaminated doc empties, " +
      "self-duplicates within the corpus survive") {
    val corpus = Seq(
      (1L, "u1 u2 a b c d e u3"),   // "a b c d"(2..5) + "b c d e"(3..6)
      (2L, "a b c d x y z w"),      // span at START boundary: covers 0..3
      (3L, "x y a b c d"),          // span at END boundary: covers 2..5
      (4L, "a b c d e f g h"),      // overlapping spans cover everything
      (5L, "rep rep2 rep3 rep4 pad"),// corpus-internal dup — NOT removed
      (6L, "rep rep2 rep3 rep4 tail"),
      (7L, "tiny")                  // shorter than n → untouched
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "held a b c d e f g h out")
    ).toDF("doc_id", "text")
    val got = Dedup.removeContaminatedSpans(corpus, col("doc_id"),
        col("text"), bench, col("doc_id"), col("text"), n = 4)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "u1 u2 u3", 3L, 5L),
      (2L, "x y z w", 4L, 4L),
      (3L, "x y", 2L, 4L),
      (4L, "", 0L, 8L),             // every position covered → empty doc
      (5L, "rep rep2 rep3 rep4 pad", 5L, 0L),
      (6L, "rep rep2 rep3 rep4 tail", 5L, 0L),
      (7L, "tiny", 1L, 0L)))
  }

  test("curation funnel: stage counts are monotone non-increasing and " +
      "stage 0 covers the whole corpus") {
    val rows = SparkEntry.queries("q_curation_funnel")(spark,
        "/root/testdata/sf0.001")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(rows.map(_._2) === Seq("raw", "lang_quality", "exact_dedup",
      "near_dedup", "quality_head_middle"))
    assert(rows.head._3 ===
      Tables.documents(spark, "/root/testdata/sf0.001").count())
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"$a -> $b not monotone")
    }
  }

  test("release funnel: stage docs are monotone past the cleanse, every " +
      "stage survives, and the pack row is consistent with the train row") {
    val rows = SparkEntry.queries("q_release_funnel")(spark,
        "/root/testdata/sf0.001")
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._2) === Seq("raw", "c4_cleanse", "lang_quality",
      "exact_dedup", "near_dedup", "decontaminate", "dsir_select",
      "train_split", "pack_shards"))
    assert(rows.head._3 ===
      Tables.documents(spark, "/root/testdata/sf0.001").count())
    // monotone non-increasing doc/token counts stage to stage
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 <= a._3 && b._4 <= a._4, s"$a -> $b not monotone")
    }
    // no stage collapses the release to zero (the composition must be
    // non-vacuous — a threshold change that empties a stage should fail
    // here, not silently hash-match an empty release)
    rows.foreach(r => assert(r._3 > 0, s"stage ${r._2} kept 0 docs"))
    val train = rows(7); val pack = rows(8)
    assert(pack._3 === train._3 && pack._4 === train._4,
      "packing must cover exactly the train docs")
    // every shard holds ≥ 1 doc and the count is within the budget
    // packing bound: ceil(tokens/budget) shards minimum, one per doc max
    val minShards = (pack._4 + 999L) / 1000L
    assert(pack._5 >= minShards && pack._5 <= pack._3,
      s"n_shards ${pack._5} outside [$minShards, ${pack._3}]")
  }

  test("wordShingles: n-grams of the token stream; short text collapses") {
    val sh = one("a b c d").select(Dedup.wordShingles(col("t"), 3).as("s"))
      .as[Seq[String]].head()
    assert(sh === Seq("a b c", "b c d"))
    val short = one("a b").select(Dedup.wordShingles(col("t"), 3).as("s"))
      .as[Seq[String]].head()
    assert(short === Seq("a b"))
  }

  private def one(t: String) = Seq(t).toDF("t")

  test("LSH candidate pairs find exact and near duplicates") {
    val pairs = Dedup.lshCandidatePairs(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical → identical signatures
    assert(pairs.contains((1L, 5L)))
    assert(pairs.contains((2L, 5L)))
    assert(!pairs.contains((1L, 4L))) // unrelated content shares no band
  }

  test("LSH maxBucket valve: hot buckets emit no pairs, are surfaced " +
      "by the oversized audit, and a wide cap equals unvalved") {
    // 10 exact copies = one hot bucket per band; plus one small pair
    val hot = (1L to 10L).map(i => (i, "the quick brown fox jumps " +
      "over the lazy dog"))
    val cold = Seq((100L, "totally different prose about spark engines"),
      (101L, "totally different prose about spark engines"))
    val corpus = (hot ++ cold).toDF("doc_id", "text")
    val unvalved = Dedup.lshCandidatePairs(corpus, col("doc_id"),
      col("text")).as[(Long, Long)].collect().toSet
    assert(unvalved.size === 45 + 1) // C(10,2) hot pairs + the cold pair
    val valved = Dedup.lshCandidatePairs(corpus, col("doc_id"),
      col("text"), maxBucket = 5).as[(Long, Long)].collect().toSet
    assert(valved === Set((100L, 101L)),
      "hot-bucket pairs must be excluded under the cap")
    // the cap is an AUDITED decision: the dropped buckets surface
    val audited = Dedup.lshOversizedBuckets(corpus, col("doc_id"),
      col("text"), maxBucket = 5).as[(Long, Long, Long)].collect()
    assert(audited.nonEmpty && audited.forall(_._3 === 10L))
    // a cap above every bucket is a no-op
    val wide = Dedup.lshCandidatePairs(corpus, col("doc_id"),
      col("text"), maxBucket = 64).as[(Long, Long)].collect().toSet
    assert(wide === unvalved)
  }

  test("lshPairsAgainstBandTable flags batch-vs-stored AND intra-batch " +
      "near-dups") {
    spark.sql("DROP TABLE IF EXISTS dedup_band_inc")
    val whDir = new java.io.File("spark-warehouse/dedup_band_inc")
    if (whDir.exists()) {
      java.nio.file.Files.walk(whDir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    Dedup.writeBandTable(docs, col("doc_id"), col("text"),
      "dedup_band_inc", buckets = 2)
    // doc 100 duplicates stored doc 1; docs 200 and 201 duplicate EACH
    // OTHER but nothing stored — the wave must flag both kinds, or the
    // intra-batch dup slips through and poisons future waves
    val batch = Seq(
      (100L, docs.filter(col("doc_id") === 1).select("text").as[String].head()),
      (200L, "zeta eta theta iota kappa entirely novel content here"),
      (201L, "zeta eta theta iota kappa entirely novel content here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.lshPairsAgainstBandTable(spark, "dedup_band_inc",
        batch, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 100L)), s"batch-vs-stored pair missing: $pairs")
    assert(pairs.contains((200L, 201L)), s"intra-batch pair missing: $pairs")
  }

  test("simhash: identical texts identical, near-dups within small Hamming") {
    val h = docs.select(col("doc_id"), Dedup.simhash16(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) === h(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(3L)) <= 6)            // one-token edit
    assert(ham(h(1L), h(4L)) > ham(h(1L), h(3L))) // unrelated is farther
  }

  test("minhashJaccardEst: exact dups estimate 1.0; estimates are " +
      "m/8 quantized and bounded") {
    val out = Dedup.minhashJaccardEst(docs, col("doc_id"), col("text"))
      .select("id1", "id2", "est_jaccard").as[(Long, Long, Double)]
      .collect()
    assert(out.nonEmpty)
    val m = out.map(p => (p._1, p._2) -> p._3).toMap
    // 1, 2, 5 are exact duplicates: every signature slot agrees
    assert(m((1L, 2L)) === 1.0 && m((1L, 5L)) === 1.0 && m((2L, 5L)) === 1.0)
    out.foreach { case (_, _, e) =>
      assert(e >= 0.0 && e <= 1.0 && (e * 8).isWhole)
    }
  }

  test("containmentPairs: a short doc quoted inside a long one scores " +
      "overlap 1.0 where Jaccard is tiny; df valve audited") {
    val quote = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val cdocs = Seq(
      (1L, quote),                     // the short doc
      (2L, s"$filler $quote"),         // long doc containing the quote
      (3L, "totally unrelated content here now"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(cdocs, col("doc_id"), col("text"),
        n = 3, maxDf = 64, threshold = 0.8)
      .select("id1", "id2", "overlap").as[(Long, Long, Double)]
      .collect().toSet
    // doc 1 has 4 shingles, all inside doc 2 -> overlap 1.0; Jaccard
    // would be 4 / (4 + 62 - 4) ~= 0.065 — below any useful threshold
    assert(out === Set((1L, 2L, 1.0)))
    val jac = Dedup.jaccardPairs(cdocs.withColumn("b", lit("x")),
      col("doc_id"), col("text"), blockCols = Seq("b"), n = 3,
      threshold = 0.8)
    assert(jac.count() === 0L) // same pair, invisible to Jaccard at 0.8
    // valve: with maxDf = 1 every shared shingle is "hot" -> no pairs,
    // and the audit surfaces exactly the shared shingles
    val valved = Dedup.containmentPairs(cdocs, col("doc_id"), col("text"),
      n = 3, maxDf = 1, threshold = 0.8)
    assert(valved.count() === 0L)
    val audit = Dedup.containmentOversizedShingles(cdocs, col("doc_id"),
      col("text"), n = 3, maxDf = 1)
    assert(audit.count() === 4L) // the 4 quote shingles shared by 1 and 2
  }

  test("containmentPairs: count-bound prune never drops a true survivor " +
      "when part of the overlap rides VALVED shingles") {
    // "hot hot hot" is a shingle shared by 5 docs -> valved at maxDf=4;
    // docs 1 and 2 overlap on it PLUS unvalved shingles. The candidate
    // stage only sees the unvalved overlap, so a prune ignoring the
    // valved slack would drop the pair; the exact score counts the
    // valved shingle too.
    val quote = "alpha beta gamma delta epsilon"
    val cdocs = Seq(
      (1L, s"hot hot hot $quote"),
      (2L, s"hot hot hot $quote tail1 tail2"),
      (3L, "hot hot hot pad31 pad32 pad33 pad34 pad35 pad36"),
      (4L, "hot hot hot pad41 pad42 pad43 pad44 pad45 pad46"),
      (5L, "hot hot hot pad51 pad52 pad53 pad54 pad55 pad56"))
      .toDF("doc_id", "text")
    // threshold 0.9: the unvalved overlap alone is 5/6 ~= 0.83 — a
    // prune that ignored the valved slack would drop the pair here
    val got = Dedup.containmentPairs(cdocs, col("doc_id"), col("text"),
        n = 3, maxDf = 4, threshold = 0.9)
      .select("id1", "id2", "overlap").as[(Long, Long, Double)]
      .collect().toSet
    // brute-force expectation over FULL shingle sets (incl. valved):
    // doc1 has 6 distinct shingles, all contained in doc2 -> overlap 1.0
    assert(got === Set((1L, 2L, 1.0)))
  }

  test("hammingPairs: pigeonhole blocking finds EXACTLY the brute-force " +
      "pairs within maxHamming") {
    // prints chosen to hit every block layout case: agree-on-block-0 only,
    // agree-on-last-block only, distance exactly maxHamming, distance
    // maxHamming+1 (must be absent even though a block agrees)
    val fps = Seq(
      1L -> 0x0000L, 2L -> 0x0001L, 3L -> 0x0003L, 4L -> 0x0007L,
      5L -> 0xFFFFL, 6L -> 0xFFFEL, 7L -> 0x0FF0L, 8L -> 0x8000L,
      9L -> 0x8001L, 10L -> 0x00C0L)
    val df = fps.toDF("id", "fp")
    val got = Dedup.hammingPairs(df, col("id"), col("fp"),
        bits = 16, maxHamming = 2)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)]
      .collect().toSet
    val want = (for {
      (i, fi) <- fps; (j, fj) <- fps if i < j
      h = java.lang.Long.bitCount(fi ^ fj) if h <= 2
    } yield (i, j, h)).toSet
    assert(got === want)
    // sanity: the fixture really exercises both inclusion and exclusion
    assert(want.contains((1L, 2L, 1)) && want.contains((3L, 4L, 1)))
    assert(!want.exists(p => p._1 == 1L && p._2 == 4L)) // distance 3
  }

  test("hammingPairs maxBucket drops hot buckets auditable, keeps the rest") {
    // ids 1-5 share fp=0 (every block bucket has 5 members); 6-7 are a
    // distance-1 pair in otherwise-cold buckets
    val df = (Seq.tabulate(5)(i => (i + 1L, 0L)) ++
      Seq(6L -> 0x5550L, 7L -> 0x5551L)).toDF("id", "fp")
    val capped = Dedup.hammingPairs(df, col("id"), col("fp"),
        bits = 16, maxHamming = 2, maxBucket = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped === Set((6L, 7L)))
    val audit = Dedup.hammingOversizedBuckets(df, col("id"), col("fp"),
        bits = 16, maxHamming = 2, maxBucket = 4)
      .select("bi", "bv", "n").as[(Int, Long, Long)].collect().toSet
    assert(audit === Set((0, 0L, 5L), (1, 0L, 5L), (2, 0L, 5L)))
    // uncapped finds the hot-bucket pairs too
    val full = Dedup.hammingPairs(df, col("id"), col("fp"),
        bits = 16, maxHamming = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(full === Set((6L, 7L)) ++
      (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)).toSet)
  }

  test("fingerprint table: from-table pairs equal one-shot hammingPairs; " +
      "against-table flags batch-vs-stored AND intra-batch") {
    spark.sql("DROP TABLE IF EXISTS dedup_fp_inc")
    val whDir = new java.io.File("spark-warehouse/dedup_fp_inc")
    if (whDir.exists()) {
      java.nio.file.Files.walk(whDir.toPath)
        .sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val fps = Seq(1L -> 0x0000L, 2L -> 0x0001L, 3L -> 0x0FF0L,
      4L -> 0xFFFFL).toDF("id", "fp")
    Dedup.writeFingerprintTable(fps, col("id"), col("fp"),
      "dedup_fp_inc", buckets = 2)
    val oneShot = Dedup.hammingPairs(fps, col("id"), col("fp"))
      .as[(Long, Long, Int)].collect().toSet
    val fromTable = Dedup.hammingPairsFromFingerprintTable(spark,
        "dedup_fp_inc")
      .as[(Long, Long, Int)].collect().toSet
    assert(fromTable === oneShot)
    // batch: 100 duplicates stored 1 (distance 0); 200/201 duplicate
    // each other (distance 1) but nothing stored
    val batch = Seq(100L -> 0x0000L, 200L -> 0x5550L, 201L -> 0x5551L)
      .toDF("id", "fp")
    val pairs = Dedup.hammingPairsAgainstFingerprintTable(spark,
        "dedup_fp_inc", batch, col("id"), col("fp"))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 100L)), s"batch-vs-stored missing: $pairs")
    assert(pairs.contains((200L, 201L)), s"intra-batch missing: $pairs")
    assert(!pairs.contains((4L, 100L))) // distance 16 never flags
  }

  test("jaccardPairs: blocked, thresholded, deterministic rounding") {
    val out = Dedup.jaccardPairs(docs, col("doc_id"), col("text"),
      blockCols = Seq("lang", "source"), n = 3, threshold = 0.2)
      .as[(Long, Long, Double)].collect()
    val m = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(m((1L, 2L)) === 1.0)
    assert(m.contains((1L, 3L)) && m((1L, 3L)) < 1.0)
    assert(!m.contains((1L, 5L))) // different source block → never compared
    assert(!m.contains((1L, 4L))) // below threshold
  }

  test("jaccardPairs maxBlock drops hot blocks auditable, keeps small ones") {
    // block (en, web): 4 docs (hot); block (en, books): 2 near-dup docs.
    // maxBlock=3 must drop EVERY pair from the hot block (not sample it)
    // while the small block still scores — and the audit names the drop.
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val hot = (1L to 4L).map(i => (i, base + s" extra$i", "en", "web"))
    val small = Seq((10L, base, "en", "books"), (11L, base, "en", "books"))
    val df = (hot ++ small).toDF("doc_id", "text", "lang", "source")
    val valved = Dedup.jaccardPairs(df, col("doc_id"), col("text"),
      blockCols = Seq("lang", "source"), n = 3, threshold = 0.2,
      maxBlock = 3).as[(Long, Long, Double)].collect()
    assert(valved.map(r => (r._1, r._2)).toSet === Set((10L, 11L)))
    val audit = Dedup.jaccardOversizedBlocks(df, col("doc_id"),
      Seq("lang", "source"), maxBlock = 3)
      .as[(String, String, Long)].collect()
    assert(audit.toSet === Set(("en", "web", 4L)))
    // default valve is transparent: same pairs as the unvalved form
    val open = Dedup.jaccardPairs(df, col("doc_id"), col("text"),
      blockCols = Seq("lang", "source"), n = 3, threshold = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    val max = Dedup.jaccardPairs(df, col("doc_id"), col("text"),
      blockCols = Seq("lang", "source"), n = 3, threshold = 0.2,
      maxBlock = 100).as[(Long, Long, Double)].collect().toSet
    assert(open === max)
    // gate polarity: the broadcast side is the OVERSIZED complement
    // (LeftAnti build, bounded by corpus/maxBlock), never the kept-block
    // side (O(distinct blocks) — corpus-linear, a forced multi-GB
    // broadcast at 100 TB)
    val p = Dedup.jaccardPairs(df, col("doc_id"), col("text"),
        blockCols = Seq("lang", "source"), n = 3, threshold = 0.2,
        maxBlock = 3)
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("LeftSemi"), p)
  }

  test("cosineNearDupPairs: blocked pairs above threshold only") {
    val vecs = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0.01f), 0), // near-identical
      (3L, Seq(0f, 1f), 0),                          // orthogonal
      (4L, Seq(1f, 0f), 1))                          // other block
      .toDF("id", "v", "blk")
    val out = Dedup.cosineNearDupPairs(vecs, col("id"), col("v"),
      col("blk"), threshold = 0.9).as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet === Set((1L, 2L)))
    assert(out.head._3 > 0.99)
  }

  test("connectedComponents: chains collapse to the component min") {
    // 2-5-3 is ONE cluster even though (2,3) was never emitted as a pair;
    // 10-11 is a separate component
    val pairs = Seq((2L, 5L), (3L, 5L), (10L, 11L)).toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(2L -> 2L, 3L -> 2L, 5L -> 2L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: EMPTY pair input returns empty labels " +
      "(a fully-valved LSH round produces zero candidates)") {
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.connectedComponents(empty).collect().isEmpty)
    assert(Dedup.connectedComponentsStar(empty).collect().isEmpty)
  }

  test("connectedComponents: non-convergence throws instead of returning wrong labels") {
    // a 12-node path needs ~diameter iterations; cap at 2 → must throw,
    // not silently return a still-split labeling
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("id1", "id2")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // and with room to converge the same input is fine
    val cc = Dedup.connectedComponents(chain).as[(Long, Long)].collect()
    assert(cc.forall(_._2 == 1L))
  }

  test("connectedComponentsStar: labels equal the min-label variant on shallow graphs") {
    val pairs = Seq((2L, 5L), (3L, 5L), (10L, 11L), (7L, 7L)).toDF("id1", "id2")
    val star = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    val minLabel = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(star === minLabel)
  }

  test("connectedComponentsStar: a 1,000-link chain converges in O(log^2 n) rounds") {
    // min-label propagation needs ~1,000 rounds here (its maxIters=20
    // default would throw); star contraction collapses it well inside 40
    val chain = (0L until 1000L).map(i => (i, i + 1)).toDF("id1", "id2")
    val cc = Dedup.connectedComponentsStar(chain).as[(Long, Long)].collect()
    assert(cc.length === 1001)
    assert(cc.forall(_._2 == 0L), "every chain node must label to the min id")
  }

  test("connectedComponents variants: identical labels with a RELIABLE checkpoint dir set") {
    val sc = spark.sparkContext
    val pairs = Seq((2L, 5L), (3L, 5L), (10L, 11L)).toDF("id1", "id2")
    val localStar = Dedup.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    val localMin = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-chk").toString
    sc.setCheckpointDir(dir)
    try {
      assert(Dedup.connectedComponentsStar(pairs)
        .as[(Long, Long)].collect().toMap === localStar)
      assert(Dedup.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap === localMin)
      // the reliable path actually wrote checkpoint data
      val written = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(written > 0, "reliable checkpoint dir is empty — localCheckpoint was used")
    } finally {
      // restore the shared session's no-checkpoint-dir state (no public
      // unset API; private[spark] var via reflection)
      sc.getClass.getMethods.find(_.getName == "checkpointDir_$eq")
        .foreach(_.invoke(sc, None))
    }
  }

  test("curation composites: identical rows with a RELIABLE checkpoint " +
      "dir set, and the reliable path actually writes") {
    // the q_clean_pipeline / q_curation_funnel scored-corpus barrier
    // must survive executor loss on a cluster: with a checkpoint dir the
    // toggle takes df.checkpoint() (VERDICT round 10 item 1)
    val sc = spark.sparkContext
    val sfDir = "/root/testdata/sf0.001"
    def run(name: String) = SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).toSeq
    val localClean = run("q_clean_pipeline")
    val localFunnel = run("q_curation_funnel")
    val dir = java.nio.file.Files.createTempDirectory("graft-cur-chk").toString
    sc.setCheckpointDir(dir)
    try {
      assert(run("q_clean_pipeline") === localClean)
      assert(run("q_curation_funnel") === localFunnel)
      val written = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(written > 0,
        "reliable checkpoint dir is empty — localCheckpoint was used")
    } finally {
      sc.getClass.getMethods.find(_.getName == "checkpointDir_$eq")
        .foreach(_.invoke(sc, None))
    }
  }

  test("winnowing guarantee: docs sharing a >= w+n-1 token run share a fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta" // 7 >= 4+3-1
    val docs = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"five six seven $shared eight nine"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(docs, col("doc_id"), col("text"),
        n = 3, w = 4)
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
    // unrelated docs share nothing
    val other = Seq((3L, "cat dog bird fish lion tiger bear wolf"))
      .toDF("doc_id", "text")
    val fps3 = Dedup.winnowedFingerprints(
        docs.unionByName(other), col("doc_id"), col("text"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(fps3(3L).intersect(fps3(1L)).isEmpty)
  }

  test("winnowing: doc shorter than the window keeps one whole-doc window") {
    val docs = Seq((1L, "only two")).toDF("doc_id", "text") // 1 shingle
    assert(Dedup.winnowedFingerprints(docs, col("doc_id"), col("text"))
      .count() === 1)
  }

  test("cosineNearDupPairsNative matches the HOF cosine formulation") {
    // denser random-ish block so many pairs straddle the threshold
    val vecs = (0L until 60L).map { i =>
      (i, (0 until 8).map(j => (((i * 13 + j * 7) % 17) - 8).toFloat / 4f),
        (i % 3).toInt)
    }.toDF("id", "v", "blk")
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val hof = pairs(Dedup.cosineNearDupPairs(
      vecs, col("id"), col("v"), col("blk"), threshold = 0.2))
    val nat = pairs(Dedup.cosineNearDupPairsNative(
      vecs, col("id"), col("v"), col("blk"), threshold = 0.2))
    assert(nat.keySet === hof.keySet)
    nat.foreach { case (k, c) => assert(math.abs(c - hof(k)) < 1e-6, k) }
  }

  test("exhaustive semantic dedup: constant block ⇒ brute-force survivors") {
    // Independent local replay of the kernel's exact float path: cast to
    // double, left-to-right norm fold, elementwise divide, left-to-right
    // squared-diff fold, cos = 1 − Σ/2, floor-round to 6 decimals.
    val data = (0L until 40L).map { i =>
      (i, (0 until 8).map(j => (((i * 13 + j * 7) % 17) - 8).toFloat / 4f))
    }
    def norm(v: Seq[Float]) =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val (na, nb) = (norm(a), norm(b))
      val s = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        val d = x.toDouble / na - y.toDouble / nb; acc + d * d
      }
      math.floor((1.0 - s / 2) * 1e6) / 1e6
    }
    val expectedDrop = (for {
      (i, a) <- data; (j, b) <- data if i < j && cos(a, b) >= 0.2
    } yield j).toSet
    assert(expectedDrop.nonEmpty && expectedDrop.size < data.size)

    val vecs = data.toDF("id", "v")
    val drop = Dedup.cosineNearDupPairsNative(vecs, col("id"), col("v"),
        lit(0), threshold = 0.2)
      .select(col("id2").as("drop_id")).distinct()
    val survivors = vecs.join(drop, col("id") === col("drop_id"), "left_anti")
      .select("id").as[Long].collect().toSet
    assert(survivors === data.map(_._1).toSet -- expectedDrop)
  }

  test("embedLshNearDupPairs: planted near-dup collides, antipode does not") {
    import spark.implicits._
    val v0 = Seq(0.9, -0.8, 0.7, -0.6, 0.5, -0.4, 0.3, -0.2)
    val rows = Seq(
      (0L, v0),
      (1L, v0.updated(0, v0.head + 1e-6)), // near-identical → same signature
      (2L, v0.map(-_)),                    // antipode → all 16 bits flipped
      (3L, Seq(0.1, 0.9, -0.7, 0.2, -0.5, 0.8, -0.3, 0.6)))
      .toDF("id", "v")
    val out = Dedup.embedLshNearDupPairs(rows, col("id"), col("v"),
      threshold = 0.5, nPlanes = 16, bandBits = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val pairs = out.map(_._1)
    assert(pairs.contains((0L, 1L)), s"planted pair missing: ${pairs.toSeq}")
    assert(!pairs.contains((0L, 2L)), "antipode must not collide")
    // a 2-band collision still yields ONE output row per pair
    assert(pairs.distinct.length === pairs.length)
    out.foreach { case (k, c) => assert(c >= 0.5, s"$k below threshold") }
  }

  test("embedLshNearDupPairs: maxBucket valve drops only oversized buckets") {
    import spark.implicits._
    // 30 near-identical vectors (one hot bucket) + one isolated pair
    val hot = Seq(0.9, -0.8, 0.7, -0.6, 0.5, -0.4, 0.3, -0.2)
    val cold = Seq(0.1, 0.9, -0.7, 0.2, -0.5, 0.8, -0.3, 0.6)
    val rows = ((0L until 30L).map(i =>
        (i, hot.updated(0, hot.head + i * 1e-7))) ++
      Seq((100L, cold), (101L, cold.updated(1, cold(1) + 1e-7))))
      .toDF("id", "v")
    def run(cap: Int) = Dedup.embedLshNearDupPairs(rows, col("id"), col("v"),
        threshold = 0.5, nPlanes = 16, bandBits = 8, maxBucket = cap)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val unvalved = run(Int.MaxValue)
    assert(unvalved.contains((100L, 101L)) && unvalved.size > 100)
    // cap below the hot bucket: only the cold pair survives...
    assert(run(8) === Set((100L, 101L)))
    // ...and the audit lists exactly the dropped hot buckets
    val audited = Dedup.embedLshOversizedBuckets(rows, col("id"), col("v"),
        nPlanes = 16, bandBits = 8, maxBucket = 8)
      .select("n").as[Int].collect()
    assert(audited.nonEmpty && audited.forall(_ > 8))
    // cap above every bucket: identical to unvalved
    assert(run(64) === unvalved)
  }

  test("embedLsh maxBucket drops hot buckets auditable, keeps small ones") {
    import spark.implicits._
    val v0 = Seq(0.9, -0.8, 0.7, -0.6, 0.5, -0.4, 0.3, -0.2)
    val hot = (0L until 20L).map(i => (100L + i, v0)) // 20 identical rows
    val pair = Seq((0L, v0.map(-_)),
      (1L, v0.map(-_).updated(0, -v0.head + 1e-6)))   // small 2-bucket
    val df = (hot ++ pair).toDF("id", "v")
    val capped = Dedup.embedLshNearDupPairs(df, col("id"), col("v"),
      threshold = 0.5, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq === Seq((0L, 1L))) // hot-bucket pairs excluded
    val audit = Dedup.embedLshOversizedBuckets(df, col("id"), col("v"),
      maxBucket = 10).collect().map(_.getInt(2))
    assert(audit.toSeq === Seq(20, 20)) // both bands report the hot bucket
    val uncapped = Dedup.embedLshNearDupPairs(df, col("id"), col("v"),
      threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(uncapped.length === 20 * 19 / 2 + 1) // full quadratic + planted
  }

  test("hyperplaneBitsNative matches the HOF formulation bit-for-bit") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(100)
    val nat = emb.select(col("vec_id"),
        graft.plans.HyperplaneBits.hyperplaneBitsNative(
          col("embedding").cast("array<double>"), 16, 0.5).as("b"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val hof = emb.select(col("vec_id"),
        Dedup.hyperplaneBitsHof(col("embedding"), 16, 64, 0.5).as("b"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(nat === hof)
  }

  test("hyperplaneSigns: deterministic ±1, roughly balanced per plane") {
    val s1 = Dedup.hyperplaneSigns(16, 64)
    val s2 = Dedup.hyperplaneSigns(16, 64)
    assert(s1 === s2)
    s1.foreach { plane =>
      assert(plane.forall(x => x == 1.0 || x == -1.0))
      val pos = plane.count(_ == 1.0)
      assert(pos >= 16 && pos <= 48, s"badly unbalanced plane: $pos/64")
    }
  }
}
