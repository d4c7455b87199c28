package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Guards for the round-8 kernel-parallelism fix (Multimodal
  * `spreadForKernel`): coarse scan-shaped inputs widen to the cluster's
  * parallelism, exchange-bearing inputs are neither probed (probing
  * materializes AQE query stages — i.e. executes the pipeline) nor
  * reshaped, and the hoisted javax.sound provider path stays correct
  * under reuse and across undecodable payloads. */
class KernelSpreadSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-kspread")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("codec kernel spreads a single-split parquet scan to full width") {
    val dir = tmpDir()
    (0L until 64L).toDF("doc_id").withColumn("text", lit("x"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    // the compact source arrives as ONE split…
    assert(docs.rdd.getNumPartitions === 1)
    // …but the encode kernel runs at defaultParallelism
    val media = Multimodal.attachAudioPayload(spark, docs)
    assert(media.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    // and output is unchanged by the spread
    val decoded = Multimodal.decodeAudioPartitions(spark, media)
      .collect().map(a => a.doc_id -> a.n_samples).toMap
    assert(decoded.size === 64)
    assert((0L until 64L).forall(id => decoded(id) == id % 400 + 100))
  }

  test("exchange-bearing kernel input is not probed and not reshaped") {
    // an input whose plan contains an exchange: the spread guard must
    // leave it alone — probing it would MATERIALIZE the upstream stages
    // (executing the pipeline once for the probe, again for the action)
    val srcRows = spark.sparkContext.longAccumulator("srcRows")
    val docs = (0L until 32L).toDF("doc_id")
      .as[Long].map { id => srcRows.add(1); id }.toDF("doc_id")
      .withColumn("text", lit("x"))
      .repartition(7, col("doc_id"))
    val media = Multimodal.attachAudioPayload(spark, docs)
    val decoded = Multimodal.decodeAudioPartitions(spark, media)
    // constructing the kernels ran NO job: nothing touched the source
    assert(srcRows.value === 0L,
      "kernel construction executed the upstream pipeline (probe leak)")
    val n = decoded.collect().length
    assert(n === 32)
    // the one action processed each source row exactly once
    assert(srcRows.value === 32L,
      s"upstream ran ${srcRows.value / 32.0} times; expected once")
    // width followed the input's explicit distribution, not the guard
    assert(media.rdd.getNumPartitions === 7)
  }

  test("audio decode stays correct across undecodable payloads and reuse") {
    val wav = Multimodal.AudioCodec.encode(nSamples = 150, seed = 9L)
    val (rate, ch, samples) = Multimodal.AudioCodec.decode(wav)
    assert((rate, ch, samples.length) === ((8000f, 1, 150)))
    // undecodable bytes fail fast — and must not poison the hot provider
    intercept[IllegalArgumentException] {
      Multimodal.AudioCodec.decode(Array.fill[Byte](64)(0x42))
    }
    val again = Multimodal.AudioCodec.decode(wav)
    assert(again._3.toSeq === samples.toSeq)
  }

  test("audio codec round trip is thread-safe at kernel parallelism") {
    val inputs = (0 until 64).map(i =>
      i.toLong -> Multimodal.AudioCodec.encode((i % 40 + 10), i.toLong))
    val results = new java.util.concurrent.ConcurrentHashMap[Long, Int]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      inputs.map { case (id, bytes) =>
        pool.submit(new Runnable {
          def run(): Unit =
            results.put(id, Multimodal.AudioCodec.decode(bytes)._3.length)
        })
      }.foreach(_.get())
    } finally pool.shutdown()
    inputs.foreach { case (id, _) =>
      assert(results.get(id) === id % 40 + 10)
    }
  }
}
