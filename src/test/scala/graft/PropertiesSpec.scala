package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorFunctions._
import graft.operators.Knn

/** Property tests (SURVEY.md §5.2): distance laws, top-k ⊆ sort-prefix,
  * filter/top-k commutation. Uses scalacheck generators with fixed seeds
  * (deterministic — no scalatestplus bridge needed in the offline cache). */
class PropertiesSpec extends SparkSuite {
  import spark.implicits._

  private val pairGen: Gen[(Seq[Double], Seq[Double])] = for {
    n <- Gen.chooseNum(1, 6)
    a <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
    b <- Gen.listOfN(n, Gen.chooseNum(-100.0, 100.0))
  } yield (a.toSeq, b.toSeq)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def evalD(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double").as("v")).as[Double].head()

  test("L2 distance is symmetric, non-negative, zero iff equal") {
    // evaluate all cases through one DataFrame pass (not one job per case)
    val cases = samples(pairGen, 20)
    val df = cases.toDF("a", "b").select(
      l2(col("a"), col("b")).as("ab"), l2(col("b"), col("a")).as("ba"),
      l2(col("a"), col("a")).as("aa"))
    df.as[(Double, Double, Double)].collect().foreach { case (ab, ba, aa) =>
      assert(ab === ba)
      assert(ab >= 0.0)
      assert(aa === 0.0)
    }
  }

  test("cosine similarity is bounded in [-1, 1] for nonzero vectors") {
    val cases = samples(pairGen, 20)
      .filter { case (a, b) => a.exists(_ != 0.0) && b.exists(_ != 0.0) }
    val out = cases.toDF("a", "b")
      .select(cosine(col("a"), col("b")).as("c")).as[Double].collect()
    out.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
  }

  test("top-k result is the k-prefix of the full distance sort") {
    val rows = (0L until 40L).map(i =>
      (i, Seq((i % 7).toFloat, (i % 3).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val full = Knn.withL2Distance(df, col("embedding"), Seq(1.0, 1.0))
      .orderBy(col("dist").asc, col("vec_id").asc)
      .select("vec_id").as[Long].collect().toSeq
    samples(Gen.chooseNum(1, 12), 5).foreach { k =>
      val top = Knn.knnExact(df, col("embedding"), Seq(1.0, 1.0), k)
        .select("vec_id").as[Long].collect().toSeq
      assert(top === full.take(k))
    }
  }

  test("dedup laws: identical texts always LSH-pair; jaccard bounded; " +
      "simhash within 16 bits") {
    import graft.operators.Dedup
    val texts = samples(Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
        .map(_.mkString(" "))), 12)
    val df = texts.zipWithIndex
      .flatMap { case (t, i) => Seq((i.toLong * 2, t), (i.toLong * 2 + 1, t)) }
      .toDF("doc_id", "text").withColumn("b", lit(1))
    // every identical pair must surface as an LSH candidate
    val pairs = Dedup.lshCandidatePairs(df, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toSet
    texts.indices.foreach { i =>
      assert(pairs.contains((i.toLong * 2, i.toLong * 2 + 1)))
    }
    // jaccard values bounded in [0, 1]; identical pairs exactly 1
    val jac = Dedup.jaccardPairs(df, col("doc_id"), col("text"),
      blockCols = Seq("b"), threshold = 0.0)
      .as[(Long, Long, Double)].collect()
    jac.foreach { case (_, _, j) => assert(j >= 0.0 && j <= 1.0) }
    texts.indices.foreach { i =>
      assert(jac.find(p => p._1 == i * 2L && p._2 == i * 2L + 1)
        .exists(_._3 === 1.0))
    }
    // simhash fits in 16 bits and is equal for identical texts
    val sh = df.select(col("doc_id"), Dedup.simhash16(col("text")))
      .as[(Long, Long)].collect().toMap
    sh.values.foreach(h => assert(h >= 0 && h < 65536))
    texts.indices.foreach(i => assert(sh(i * 2L) === sh(i * 2L + 1)))
  }

  test("doc-text serialization is total: random null-riddled records " +
      "never crash and never produce NULL text") {
    import org.apache.spark.sql.Row
    import graft.sources.HrPipeline
    val strGen = Gen.option(Gen.oneOf("개발자", "x", "", "a b", "한국어(원어민)"))
    val listGen = Gen.option(Gen.listOf(Gen.oneOf("Python", "AWS", "기타")))
    val recGen = for {
      name <- strGen; pos <- strGen; dept <- strGen; jd <- strGen
      skills <- listGen; projects <- listGen; certs <- listGen
      langs <- listGen; prof <- strGen
      degree <- strGen; school <- strGen
      year <- Gen.option(Gen.chooseNum(1990, 2030))
      eduNull <- Gen.prob(0.3)
    } yield Row("ID", name.orNull, pos.orNull, dept.orNull, jd.orNull,
      skills.map(_.toSeq).orNull, projects.map(_.toSeq).orNull,
      if (eduNull) null
      else Row(degree.orNull, school.orNull,
        year.map(Int.box).orNull),
      certs.map(_.toSeq).orNull, langs.map(_.toSeq).orNull, prof.orNull)
    val rows = samples(recGen, 40)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), HrPipeline.employeeSchema)
    val out = df.select(HrPipeline.employeeDocText.as("t")).collect()
    assert(out.length === 40)
    out.foreach { r =>
      assert(!r.isNullAt(0)) // item.get defaults: always a string
      assert(r.getString(0).startsWith("직원 유형."))
    }
  }

  test("hammingPairs equals brute force for random fingerprints at " +
      "every (bits, maxHamming) layout") {
    import graft.operators.Dedup
    val fpGen = Gen.listOfN(24, Gen.chooseNum(0L, 0xFFFFL))
    val layouts = Seq((16, 1), (16, 2), (16, 3), (12, 2))
    samples(fpGen, 4).zipWithIndex.foreach { case (fps0, i) =>
      val fps = fps0.zipWithIndex.map { case (f, j) => (j.toLong, f) }
      layouts.foreach { case (bits, d) =>
        val mask = (1L << bits) - 1
        val masked = fps.map { case (id, f) => (id, f & mask) }
        val got = Dedup.hammingPairs(masked.toDF("id", "fp"), col("id"),
            col("fp"), bits = bits, maxHamming = d)
          .select("id1", "id2", "hamming").as[(Long, Long, Int)]
          .collect().toSet
        val want = (for {
          (a, fa) <- masked; (b, fb) <- masked if a < b
          h = java.lang.Long.bitCount(fa ^ fb) if h <= d
        } yield (a, b, h)).toSet
        assert(got === want, s"sample $i layout ($bits, $d)")
      }
    }
  }

  test("pre-filter commutes: filter-then-topk == topk-over-filtered-set") {
    val rows = (0L until 30L).map(i =>
      (i, Seq((i % 5).toFloat, (i % 4).toFloat), (i % 2).toInt))
    val df = rows.toDF("vec_id", "embedding", "label")
    val viaOption = Knn.knnExact(df, col("embedding"), Seq(0.0, 0.0), 5,
      preFilter = Some(col("label") === 1)).select("vec_id").as[Long].collect()
    val viaFilter = Knn.knnExact(df.filter(col("label") === 1),
      col("embedding"), Seq(0.0, 0.0), 5).select("vec_id").as[Long].collect()
    assert(viaOption === viaFilter)
  }
}
