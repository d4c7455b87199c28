package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunk, Profile, ZOrder}

/** One-pass profiling semantics: null counting, distinct cardinality,
  * string-surfaced extrema, one output row per column — plus the token
  * chunker's coverage guarantees. */
class ProfileSpec extends SparkSuite {
  import spark.implicits._

  test("profile: nulls, distincts, extrema in one pass") {
    val df = Seq(
      (1L, Some("en"), 10),
      (2L, None, 20),
      (3L, Some("ko"), 20),
      (4L, Some("en"), 30))
      .toDF("id", "lang", "n")
    val out = Profile.profile(df, Seq("id", "lang", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(out("id") === ((4L, 4L, 4L, "1", "4")))
    assert(out("lang") === ((4L, 3L, 2L, "en", "ko"))) // null excluded
    assert(out("n") === ((4L, 4L, 3L, "10", "30")))
    assert(out.size === 3)
  }

  test("chunkByTokens: every token covered, overlap = chunk − stride") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, "   ")) // zero tokens → no chunks
      .toDF("doc_id", "text")
    val out = Chunk.chunkByTokens(docs, col("doc_id"), col("text"),
        chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6,9 → windows of 4,4,4,1
    assert(d1.map(_._3) === Array(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10"))
    assert(d1.map(_._4) === Array(4, 4, 4, 1))
    // consecutive chunks overlap by chunk − stride = 1 token
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(a._3.split(" ").last === b._3.split(" ").head)
    }
    assert(out.filter(_._1 == 2L).map(_._3) === Array("only three tokens"))
    assert(!out.exists(_._1 == 3L))
  }

  test("zValue: bijective on the grid, per-dim monotone, tile-local") {
    val grid = spark.range(64L * 64L).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"))
    val z = grid.select(col("x"), col("y"),
        ZOrder.zValue(Seq(col("x"), col("y")), 6).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // bijection onto [0, 4096)
    assert(z.values.toSet.size === 4096)
    assert(z.values.min === 0L && z.values.max === 4095L)
    // monotone in each dimension with the other fixed
    (0 until 63).foreach { i =>
      assert(z((i + 1, 7)) > z((i, 7)))
      assert(z((7, i + 1)) > z((7, i)))
    }
    // an aligned 4x4 tile spans exactly 16 consecutive-ish z values
    // (span 15) — row-major order spans 3*64+3 = 195 for the same tile
    for (x0 <- Seq(0L, 16L, 60L); y0 <- Seq(0L, 16L, 60L)) {
      val tile = for (dx <- 0L until 4L; dy <- 0L until 4L)
        yield z((x0 + dx, y0 + dy))
      assert(tile.max - tile.min === 15L, s"tile at ($x0,$y0)")
    }
    // interleave slot order: dims(0) owns the LSB
    assert(z((1, 0)) === 1L && z((0, 1)) === 2L && z((1, 1)) === 3L)
  }

  test("hilbertValue: bijective, EVERY consecutive step grid-adjacent " +
      "(the locality Z-order lacks), matches the reference transform") {
    val bits = 6
    val grid = spark.range(64L * 64L).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"))
    val h = grid.select(col("x"), col("y"),
        ZOrder.hilbertValue(col("x"), col("y"), bits).as("h"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // bijection onto [0, 4096)
    assert(h.values.toSet.size === 4096)
    assert(h.values.min === 0L && h.values.max === 4095L)
    // perfect locality: walking the curve in index order moves exactly
    // one Manhattan step every time. Z-order fails this at every
    // power-of-two boundary (measure it for the contrast).
    val byIdx = h.toSeq.map { case (xy, d) => (d, xy) }.sortBy(_._1).map(_._2)
    val hilbertJumps = byIdx.sliding(2).count { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1L }
    assert(hilbertJumps === 0)
    // reference implementation (the Wikipedia xy2d loop) agrees exactly
    def ref(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L); var s = 32L
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = 63 - x; y = 63 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    for (x <- 0L until 64L by 7L; y <- 0L until 64L by 5L)
      assert(h((x, y)) === ref(x, y), s"($x,$y)")
    // first-order orientation: (0,0)->0, (0,1)->1, (1,1)->2, (1,0)->3
    val h1 = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L))
      .toDF("x", "y")
      .select(ZOrder.hilbertValue(col("x"), col("y"), 1))
      .as[Long].collect().toSeq
    assert(h1 === Seq(0L, 1L, 2L, 3L))
    // native kernel is bit-identical to the HOF reference formulation
    val parity = grid.select(
        ZOrder.hilbertValue(col("x"), col("y"), bits).as("n"),
        ZOrder.hilbertValueHof(col("x"), col("y"), bits).as("r"))
      .filter(col("n") =!= col("r")).count()
    assert(parity === 0L)
  }

  test("hilbertValueN: bijective with unit grid steps at n = 2, 3, 4 " +
      "(exhaustive), native == HOF, and == a Skilling reference") {
    // independent Scala reference: Skilling's AxesToTranspose + interleave
    def ref(xs0: Seq[Long], bits: Int): Long = {
      val n = xs0.size; val mask = (1L << bits) - 1
      val x = xs0.map(_ & mask).toArray
      var q = 1L << (bits - 1)
      while (q > 1) {
        val p = q - 1
        for (i <- 0 until n)
          if ((x(i) & q) != 0) x(0) ^= p
          else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        q >>= 1
      }
      for (i <- 1 until n) x(i) ^= x(i - 1)
      var t = 0L; q = 1L << (bits - 1)
      while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
      var d = 0L
      for (k <- (bits - 1) to 0 by -1; i <- 0 until n)
        d = (d << 1) | (((x(i) ^ t) >> k) & 1L)
      d
    }
    for ((n, bits) <- Seq((2, 3), (3, 3), (4, 2))) {
      val side = 1L << bits
      val cells = Seq.fill(n)(0L until side).foldLeft(Seq(Seq.empty[Long])) {
        (acc, r) => acc.flatMap(c => r.map(v => c :+ v))
      }
      val df = cells.map(c => Tuple1(c)).toDF("xs")
      val dims = (0 until n).map(i => element_at(col("xs"), i + 1))
      val got = df.select(col("xs"),
          ZOrder.hilbertValueN(dims, bits).as("h"),
          ZOrder.hilbertValueNHof(dims, bits).as("r"))
        .collect().map(r => (r.getSeq[Long](0), r.getLong(1), r.getLong(2)))
      // native == HOF executable spec == independent reference
      got.foreach { case (xs, h, r) =>
        assert(h === r, s"HOF mismatch at $xs")
        assert(h === ref(xs, bits), s"reference mismatch at $xs")
      }
      // bijection onto [0, side^n)
      val ds = got.map(_._2)
      assert(ds.toSet.size === cells.size && ds.min === 0L &&
        ds.max === cells.size - 1L, s"n=$n bits=$bits not a bijection")
      // the Hilbert property: EVERY consecutive index is one grid step
      val byIdx = got.sortBy(_._2).map(_._1)
      byIdx.sliding(2).foreach { w =>
        val (a, b) = (w(0), w(1))
        assert(a.zip(b).map { case (p, v) => math.abs(p - v) }.sum === 1L,
          s"n=$n bits=$bits jump between $a and $b")
      }
    }
    // a NULL element yields NULL, not garbage (try_element_at: ANSI-safe)
    val bad = Seq(Seq(1L, 2L, 3L), Seq(1L)).toDF("xs")
    val hs = bad.select(ZOrder.hilbertValueN(
        Seq(try_element_at(col("xs"), lit(1)),
          try_element_at(col("xs"), lit(2))), 4).as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(hs(0).isDefined && hs(1).isEmpty)
  }
}
