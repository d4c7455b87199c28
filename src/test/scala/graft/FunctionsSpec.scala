package graft

import org.apache.spark.sql.functions._

import graft.functions.{Rounding, TextFunctions => TF, VectorFunctions => VF}

/** Column-function semantics: vector math, text analysis, portable rounding. */
class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def one = Seq(1).toDF("x")

  private def evalD(c: org.apache.spark.sql.Column): Double =
    one.select(c.cast("double").as("v")).as[Double].head()
  private def evalS(c: org.apache.spark.sql.Column): String =
    one.select(c.as("v")).as[String].head()

  // ---- vectors --------------------------------------------------------

  test("l2 / dot / norm / cosine on known vectors") {
    val a = typedlit(Seq(3.0, 4.0))
    val b = typedlit(Seq(0.0, 0.0))
    val c = typedlit(Seq(4.0, 3.0))
    assert(evalD(VF.l2(a, b)) === 5.0)
    assert(evalD(VF.norm(a)) === 5.0)
    assert(evalD(VF.dot(a, c)) === 24.0)
    assert(math.abs(evalD(VF.cosine(a, c)) - 24.0 / 25.0) < 1e-12)
    assert(evalD(VF.cosineDistance(a, a)) === 0.0)
  }

  test("cosine with a zero-norm side is NULL (matches DuckDB div-by-zero)") {
    val r = one.select(VF.cosine(typedlit(Seq(0.0, 0.0)),
      typedlit(Seq(1.0, 0.0))).as("v")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("float inputs are cast to double before arithmetic") {
    // 0.1f + 0.2f in float ≠ in double; the contract is double math
    val f = typedlit(Seq(0.1f, 0.2f))
    val z = typedlit(Seq(0.0f, 0.0f))
    val exp = math.sqrt(0.1f.toDouble * 0.1f.toDouble
      + 0.2f.toDouble * 0.2f.toDouble)
    assert(math.abs(evalD(VF.l2(f, z)) - exp) < 1e-15)
  }

  // ---- text -----------------------------------------------------------

  test("tokens: lowercased, whitespace-split, empties dropped") {
    val got = one.select(TF.tokens(lit("  The  quick\tBrown\nfox "))
      .as("t")).as[Seq[String]].head()
    assert(got === Seq("the", "quick", "brown", "fox"))
  }

  test("substrCount counts non-overlapping occurrences") {
    assert(evalD(TF.substrCount(lit("ababab"), "ab")) === 3.0)
    assert(evalD(TF.substrCount(lit("xyz"), "ab")) === 0.0)
  }

  test("langId picks the dominant marker language; CJK wins; und fallback") {
    assert(evalS(TF.langId(lit("the cat and the dog of the house"))) === "en")
    assert(evalS(TF.langId(lit("der Hund und die Katze"))) === "de")
    assert(evalS(TF.langId(lit("le chat et la maison"))) === "fr")
    assert(evalS(TF.langId(lit("el gato y los perros en una casa"))) === "es")
    assert(evalS(TF.langId(lit("这是 一个 中文 句子"))) === "zh")
    assert(evalS(TF.langId(lit("xyzzy plugh"))) === "und")
  }

  test("withLangId (staged) agrees with langId on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val joined = TF.withLangId(docs, col("text"))
      .withColumn("single", TF.langId(col("text")))
    assert(joined.filter(col("pred_lang") =!= col("single")).count() === 0)
  }

  test("qualityScore is in [0,1] and rewards fluent text") {
    val fluent = evalD(TF.qualityScore(lit(
      "The quick brown fox jumps over the lazy dog and runs to the house of a friend.")))
    val junk = evalD(TF.qualityScore(lit("!!! ,,, ;;; ???")))
    assert(fluent > junk)
    assert(fluent >= 0.0 && fluent <= 1.0 && junk >= 0.0)
  }

  test("withQualityScore (staged) agrees with qualityScore on the corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val joined = TF.withQualityScore(docs, col("text"))
      .withColumn("single", TF.qualityScore(col("text")))
    assert(joined.filter(col("quality") =!= col("single")).count() === 0)
  }

  test("token counts: whitespace vs alnum-run") {
    val t = lit("hello, world! x2")
    assert(evalD(TF.tokenCountWs(t)) === 3.0)
    // alnum runs: hello, world, x2
    assert(evalD(TF.tokenCountAlnum(t)) === 3.0)
  }

  test("fingerprint is order-sensitive and deterministic") {
    val a = evalD(TF.fingerprint(lit("alpha beta gamma")))
    val a2 = evalD(TF.fingerprint(lit("alpha beta gamma")))
    val b = evalD(TF.fingerprint(lit("beta alpha gamma")))
    assert(a === a2)
    assert(a !== b)
  }

  test("tokenHash16 matches manual md5-prefix arithmetic") {
    // md5("the") = 8fc42c6ddf9966db3b09e84365034357 → 0x8fc4 = 36804
    assert(evalD(TF.tokenHash16(lit("the"))) === 36804.0)
  }

  // ---- rounding -------------------------------------------------------

  test("floorRound: half-up at exact .5 boundaries, stable in both engines") {
    assert(evalD(Rounding.floorRound(lit(0.00005), 4)) === 0.0001)
    assert(evalD(Rounding.floorRound(lit(0.123449), 4)) === 0.1234)
    assert(Rounding.floorRoundSql("x", 4) === "floor((x) * 10000.0 + 0.5) / 10000.0")
  }

  test("nfcNormalize: composes decomposed forms, identity on NFC, null-safe") {
    import graft.plans.NfcNormalize.nfcNormalize
    val rows = Seq(
      ("decomp", "e\u0301\u1100\u1161"), // e+acute, jamo ga
      ("composed", "\u00e9\uac00"), // already NFC
      ("ascii", "plain text"))
      .toDF("k", "s")
      .select(col("k"), nfcNormalize(col("s")).as("n"),
        length(col("s")).as("lr"), length(nfcNormalize(col("s"))).as("ln"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(rows("decomp")._1 === "\u00e9\uac00") // composed output
    assert(rows("decomp")._2 === 4 && rows("decomp")._3 === 2)
    assert(rows("composed") === (("\u00e9\uac00", 2, 2)))
    assert(rows("ascii") === (("plain text", 10, 10)))
    val nul = Seq(Option.empty[String]).toDF("s")
      .select(nfcNormalize(col("s"))).collect()
    assert(nul.head.isNullAt(0))
  }

  test("normalizeUrl: case, default port, fragment, tracking params") {
    import graft.functions.UrlFunctions._
    val rows = Seq(
      // messy everything → canonical
      ("full", "HTTPS://WWW.Site.COM:443/A/b/?utm_source=x&ref=r&id=7#top"),
      // already-canonical stays fixed-point
      ("canon", "https://www.site.com/a/b?id=7"),
      // no path, no params; default http port
      ("bare", "HTTP://Site.COM:80"),
      // non-default port survives; utm-only query disappears
      ("port", "https://site.com:8080/x?utm_medium=m"),
      // a default-port NUMBER on the WRONG scheme is a distinct origin
      // and must survive (https:80 is not https:443)
      ("mismatch", "https://site.com:80/x"))
      .toDF("k", "url")
      .select(col("k"), normalizeUrl(col("url")).as("n"),
        urlHost(col("url")).as("h"), urlPathDepth(col("url")).as("d"))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    assert(rows("full") ===
      (("https://www.site.com/A/b?id=7", "www.site.com", 2)))
    assert(rows("canon") ===
      (("https://www.site.com/a/b?id=7", "www.site.com", 2)))
    assert(rows("bare") === (("http://site.com", "site.com", 0)))
    assert(rows("port") === (("https://site.com:8080/x", "site.com:8080", 1)))
    assert(rows("mismatch") === (("https://site.com:80/x", "site.com:80", 1)))
    // normalization is idempotent: norm(norm(u)) == norm(u)
    val once = Seq("HTTPS://WWW.Site.COM:443/A/b/?utm_source=x&id=7#f")
      .toDF("url").select(normalizeUrl(col("url")).as("n"))
    val twice = once.select(normalizeUrl(col("n"))).as[String].head()
    assert(twice === once.as[String].head())
  }
}
