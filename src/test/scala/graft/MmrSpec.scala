package graft

import org.apache.spark.sql.functions._

import graft.operators.Mmr

/** MMR greedy-selection semantics. */
class MmrSpec extends SparkSuite {
  import spark.implicits._

  // unit vectors: 1 and 2 are EXACT duplicates (sim 1.0), 3 mirrors
  // them across the query axis (sim(1,3) = 0.62); all have query-sim 0.9
  private val c = math.sqrt(0.19)
  private def cand = Seq(
    (1L, Seq(0.9, c), 0.9),
    (2L, Seq(0.9, c), 0.9),
    (3L, Seq(0.9, -c), 0.9))
    .toDF("id", "vec", "qsim")

  test("diversify defers the duplicate: diverse doc outranks the " +
      "near-copy of the first pick") {
    val out = Mmr.diversify(cand, col("id"), col("vec"), col("qsim"), k = 3)
      .orderBy("rank").as[(Int, Long, Double)].collect()
    assert(out.map(_._2).toSeq === Seq(1L, 3L, 2L))
    // rank-1 score = λ·qsim = 0.45; the duplicate's final score is
    // 0.5·0.9 − 0.5·1.0 = −0.05; the mirror's 0.5·0.9 − 0.5·0.62 = 0.14
    assert(math.abs(out(0)._3 - 0.45) < 1e-9)
    assert(math.abs(out(1)._3 - 0.14) < 1e-6)
    assert(math.abs(out(2)._3 - (-0.05)) < 1e-9)
  }

  test("k past the candidate count stops at N selections") {
    val out = Mmr.diversify(cand, col("id"), col("vec"), col("qsim"), k = 9)
    assert(out.count() === 3L)
  }

  test("empty candidate set selects nothing (no element_at(-1) crash " +
      "inside the fold)") {
    val empty = cand.where(lit(false))
    assert(Mmr.diversify(empty, col("id"), col("vec"), col("qsim"), k = 3)
      .count() === 0L)
    val emptyG = Seq.empty[(Long, Long, Seq[Double], Double)]
      .toDF("qid", "id", "vec", "qsim")
    assert(Mmr.diversifyGrouped(emptyG, col("qid"), col("id"), col("vec"),
      col("qsim"), k = 3).count() === 0L)
  }

  test("diversifyGrouped: per-query selections equal the single-query " +
      "fold run per group") {
    val grouped = Seq(10L, 20L).flatMap { qid =>
      Seq((qid, 1L, Seq(0.9, c), 0.9), (qid, 2L, Seq(0.9, c), 0.9),
        (qid, 3L, Seq(0.9, -c), 0.9))
    }.toDF("qid", "id", "vec", "qsim")
    val out = Mmr.diversifyGrouped(grouped, col("qid"), col("id"),
        col("vec"), col("qsim"), k = 3)
      .orderBy("qid", "rank")
      .as[(Long, Int, Long, Double)].collect()
    val single = Mmr.diversify(cand, col("id"), col("vec"), col("qsim"),
        k = 3)
      .orderBy("rank").as[(Int, Long, Double)].collect()
    Seq(10L, 20L).foreach { qid =>
      val g = out.filter(_._1 == qid).map(t => (t._2, t._3, t._4))
      assert(g.toSeq === single.toSeq)
    }
  }

  test("fold equals an independent Scala greedy reference on random " +
      "candidate sets") {
    // reference implementation mirrors the engine arithmetic exactly:
    // index-ordered sums, BigDecimal HALF_UP round-6 (Spark round's
    // double path), argmax by (score desc, id asc)
    def round6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      round6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    def refMmr(cand: Seq[(Long, Seq[Double], Double)],
               k: Int): Seq[(Long, Double)] = {
      val sel = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double], Double)]()
      val out = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
      var rem = cand
      while (out.size < k && rem.nonEmpty) {
        val scored = rem.map { c =>
          val pen = if (sel.isEmpty) 0.0
            else sel.map(s => cos(c._2, s._2)).max
          (c, 0.5 * c._3 - 0.5 * pen)
        }
        val best = scored.minBy { case (c, m) => (-m, c._1) }
        sel += best._1; out += ((best._1._1, best._2))
        rem = rem.filterNot(_._1 == best._1._1)
      }
      out.toSeq
    }
    def h(s: String): Double =
      (math.abs(s.hashCode.toLong % 1000L).toDouble + 1.0) / 1001.0
    (0 until 3).foreach { trial =>
      val cand = (1L to 12L).map(id =>
        (id, Seq.tabulate(6)(i => h(s"v:$trial:$id:$i")),
          round6(h(s"q:$trial:$id"))))
      val got = Mmr.diversify(cand.toDF("id", "vec", "qsim"),
          col("id"), col("vec"), col("qsim"), k = 6)
        .orderBy("rank").as[(Int, Long, Double)].collect()
        .map(t => (t._2, t._3)).toSeq
      val want = refMmr(cand, 6).map { case (id, m) =>
        // engine output applies floorRound6 (floor(x*1e6 + 0.5)/1e6)
        (id, math.floor(m * 1e6 + 0.5) / 1e6)
      }
      assert(got === want, s"trial $trial")
    }
  }

  test("ties break on the smaller id") {
    val out = Mmr.diversify(cand.filter(col("id") =!= 3L),
        col("id"), col("vec"), col("qsim"), k = 1)
      .as[(Int, Long, Double)].head()
    assert(out._2 === 1L)
  }
}
