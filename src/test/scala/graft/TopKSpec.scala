package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, TopK}

/** TopK aggregator vs the window formulation; multimodal decode plumbing. */
class TopKSpec extends SparkSuite {
  import spark.implicits._

  test("topKPerGroup matches row_number window formulation") {
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 9.0), (1L, 12L, 9.0), (1L, 13L, 1.0),
      (2L, 20L, 3.0),
      (3L, 30L, 7.0), (3L, 31L, 2.0), (3L, 32L, 8.0), (3L, 33L, 6.0))
      .toDF("g", "id", "v")
    val got = TopK.topKPerGroup(spark, df, "g", "id", "v", k = 2)
      .orderBy("g", "rn").as[(Long, Long, Double, Int)].collect()
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .orderBy("g", "rn").as[(Long, Long, Double, Int)].collect()
    assert(got === want)
    // ties broken by id asc: group 1 keeps 11 then 12 (both 9.0)
    assert(got.take(2).map(_._2) === Array(11L, 12L))
  }

  test("topKPerGroupStr (string group key) matches the window formulation") {
    val df = Seq(
      ("a.com", 10L, 5.0), ("a.com", 11L, 9.0), ("a.com", 12L, 9.0),
      ("a.com", 13L, 1.0), ("b.org", 20L, 3.0),
      ("c.net", 30L, 7.0), ("c.net", 31L, 2.0), ("c.net", 32L, 8.0))
      .toDF("g", "id", "v")
    val got = TopK.topKPerGroupStr(spark, df, "g", "id", "v", k = 2)
      .orderBy("g", "rn").as[(String, Long, Double, Int)].collect()
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .orderBy("g", "rn").as[(String, Long, Double, Int)].collect()
    assert(got === want)
    // ties broken by id asc: a.com keeps 11 then 12 (both 9.0)
    assert(got.take(2).map(_._2) === Array(11L, 12L))
  }

  test("topKPerGroup emits at most k rows per group") {
    val df = (1L to 100L).map(i => (i % 5, i, i.toDouble)).toDF("g", "id", "v")
    val out = TopK.topKPerGroup(spark, df, "g", "id", "v", k = 3)
    assert(out.count() === 15)
    assert(out.groupBy("g").count().select(max("count")).as[Long].head() === 3)
  }

  test("multimodal: frame sampling and resize planning are deterministic") {
    val docs = Seq((1L, "x" * 10), (2L, "y" * 25)).toDF("doc_id", "text")
    val meta = Multimodal.metaColumns(Multimodal.attachPayload(docs))
    val frames = Multimodal.sampleFrames(meta, stride = 4)
      .as[(Long, String, Long)].collect()
    // doc 1: n_frames = 10 % 24 + 1 = 11 → indices 0,4,8
    assert(frames.filter(_._1 == 1L).map(_._3).sorted === Array(0L, 4L, 8L))
    val resized = Multimodal.resizePlan(meta, 224)
      .as[(Long, Long, Long, Long, Long)].collect()
    resized.foreach { case (_, w, h, nw, nh) =>
      assert(math.max(nw, nh) <= 224)
      assert(nw === w * 224 / math.max(w, h))
    }
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.attachPayload(docs), dim = 8).collect()
    assert(feats.length === 2)
    assert(feats.forall(f => f.feat.length == 8 &&
      f.feat.forall(x => x >= 0f && x < 1f)))
  }

  test("multimodal: REAL PNG/JPEG bytes decode through the batched kernel") {
    val docs = Seq((2L, "a"), (3L, "b"), (10L, "c")).toDF("doc_id", "text")
    val media = Multimodal.attachImagePayload(spark, docs)
    // payloads are genuine image files: magic bytes prove it
    val payloads = media.orderBy("doc_id")
      .as[(Long, String, Array[Byte])].collect()
    val png = payloads.find(_._2 == "png").get._3
    assert(png.slice(1, 4).map(_.toChar).mkString === "PNG")
    val jpg = payloads.find(_._2 == "jpg").get._3
    assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8) // SOI marker
    val decoded = Multimodal.decodeImagePartitions(spark, media, batchSize = 2)
      .collect().map(m => m.doc_id -> ((m.width, m.height))).toMap
    // width = id % 64 + 8, height = id*7 % 48 + 8 — read back from PIXELS
    assert(decoded === Map(2L -> ((10L, 22L)), 3L -> ((11L, 29L)),
      10L -> ((18L, 30L))))
    val feats = Multimodal.extractImageFeatures(spark, media, dim = 8)
      .collect()
    assert(feats.length === 3)
    feats.foreach { f =>
      assert(f.feat.length === 8)
      // histogram is a probability vector over the decoded pixels
      assert(math.abs(f.feat.sum - 1.0f) < 1e-4, f.feat.toString)
    }
  }

  test("multimodal: perceptual aHash survives a one-pixel edit that " +
      "changes every payload byte — and twins group where digests can't") {
    import graft.operators.Multimodal.ImageCodec
    // same scene, one-pixel blue bump: different PNG bytes, same aHash
    val a = ImageCodec.encode("png", 24, 16, seed = 5L)
    val b = ImageCodec.encode("png", 24, 16, seed = 5L,
      tweakX = 3, tweakY = 7)
    assert(!java.util.Arrays.equals(a, b))
    val docs = Seq((0L, "x"), (100L, "y"), (1L, "z")).toDF("doc_id", "text")
    // folded k=100: ids 0 and 100 are twins (seed 0), id 1 stands alone
    val ph = Multimodal.imagePhashPartitions(spark,
        Multimodal.attachImagePayloadFolded(spark, docs, k = 100))
      .collect().map(p => p.doc_id -> ((p.phash_hi, p.phash_lo))).toMap
    assert(ph(0L) === ph(100L), "perceptual twins must share an aHash")
    assert(ph(0L) !== ph(1L), "different scenes must differ")
    // while the exact payload BYTES of the twins differ (tweak positions
    // depend on doc_id) — byte-level dedup finds nothing here
    val pay = Multimodal.attachImagePayloadFolded(spark, docs, k = 100)
      .as[(Long, String, Array[Byte])].collect().map(r => r._1 -> r._3).toMap
    assert(!java.util.Arrays.equals(pay(0L), pay(100L)))
  }

  test("multimodal: REAL WAV bytes decode through the batched kernel") {
    val docs = Seq((2L, "a"), (3L, "b"), (10L, "c")).toDF("doc_id", "text")
    val media = Multimodal.attachAudioPayload(spark, docs)
    // payloads are genuine RIFF/WAVE files: magic bytes prove it
    val payloads = media.orderBy("doc_id")
      .as[(Long, String, Array[Byte])].collect()
    payloads.foreach { case (_, _, b) =>
      assert(b.slice(0, 4).map(_.toChar).mkString === "RIFF")
      assert(b.slice(8, 12).map(_.toChar).mkString === "WAVE")
    }
    val decoded = Multimodal.decodeAudioPartitions(spark, media, batchSize = 2)
      .collect().map(a => a.doc_id ->
        ((a.sample_rate, a.n_channels, a.n_samples, a.duration_us))).toMap
    // n_samples = id % 400 + 100 — read back from the parsed container
    assert(decoded === Map(
      2L -> ((8000L, 1L, 102L, 12750L)),
      3L -> ((8000L, 1L, 103L, 12875L)),
      10L -> ((8000L, 1L, 110L, 13750L))))
    // PCM round trip is bit-exact: decoded samples equal the generator
    val (_, _, samples) = Multimodal.AudioCodec.decode(
      payloads.find(_._1 == 2L).get._3)
    (0 until samples.length).foreach { t =>
      val expect = ((2L * 31 + t.toLong * 7919) % 65536 - 32768).toShort
      assert(samples(t) === expect, s"sample $t")
    }
    val feats = Multimodal.extractAudioFeatures(spark, media, dim = 8)
      .collect()
    assert(feats.length === 3)
    feats.foreach { f =>
      assert(f.feat.length === 8)
      assert(f.feat.forall(x => x >= 0f && x <= 1f), f.feat.toString)
    }
  }

  test("multimodal: GXD1 delta video round-trips and checksums catch corruption") {
    val bytes = Multimodal.DeltaVideoCodec.encode(
      nFrames = 5, width = 33, height = 21, fpsX1000 = 10000, seed = 42L)
    assert(Multimodal.DeltaVideoCodec.decode(bytes) === (5, 10000, 33, 21))
    // inter-frame prediction must beat storing raw frames: deltas are
    // sparse XORs so the container is far smaller than raw pixel bytes
    val (container, raw) = Multimodal.DeltaVideoCodec.compressionStats(bytes)
    assert(container < raw / 2, s"container=$container raw=$raw")
    // a bit flip in a delta frame must fail the CRC chain, not decode
    val corrupt = bytes.clone()
    corrupt(corrupt.length - 10) = (corrupt(corrupt.length - 10) ^ 0x40).toByte
    intercept[Exception](Multimodal.DeltaVideoCodec.decode(corrupt))
  }

  test("multimodal: batched delta-video decode matches id-derived params") {
    val docs = Seq(1L, 2L, 3L, 7L).toDF("doc_id")
    val media = Multimodal.attachDeltaVideoPayload(spark, docs)
    val out = Multimodal.decodeDeltaVideoPartitions(spark, media)
      .collect().sortBy(_.doc_id)
    out.foreach { v =>
      val id = v.doc_id
      assert(v.n_frames === id % 4 + 2)
      assert(v.width === id % 32 + 16)
      assert(v.height === id * 5 % 32 + 16)
      assert(v.duration_us === (id % 4 + 2) * 100000L)
    }
  }
}
