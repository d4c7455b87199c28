package graft

import org.apache.spark.sql.functions._

import graft.operators.BatchEncode

/** Semantics of the pluggable batch-inference embedding seam
  * (reference: vector_db.py:146-175 batch-encode loop). */
class BatchEncodeSpec extends SparkSuite {
  import spark.implicits._
  import BatchEncodeSpecKernels._

  private def docs = Seq(
    (1L, "alpha beta"), (2L, "gamma"), (3L, "alpha beta"),
    (4L, "delta epsilon zeta"), (5L, "eta"))
    .toDF("doc_id", "text")

  test("default kernel is bit-identical to the in-plan expression") {
    val viaSeam = BatchEncode.withEmbedding(
        docs, "text", new BatchEncode.FeatureHashEncoder(8), batchSize = 2)
      .select(col("doc_id"), col("embedding"))
    val viaExpr = docs.select(col("doc_id"),
      graft.plans.FeatureHashEmbed.featureHashNative(col("text"), 8)
        .as("embedding"))
    assert(viaSeam.exceptAll(viaExpr).count() === 0)
    assert(viaExpr.exceptAll(viaSeam).count() === 0)
  }

  test("batchSize knob bounds every kernel invocation") {
    val sizes = BatchEncode.withEmbedding(
        docs.repartition(1), "text", new SizeEncoder, batchSize = 2)
      .select(element_at(col("embedding"), 1)).as[Double].collect()
    // 5 rows in one partition, batchSize 2 → batches of 2, 2, 1
    assert(sizes.sorted === Array(1.0, 2.0, 2.0, 2.0, 2.0))
  }

  test("skipFailedBatches drops only the poisoned batch") {
    val out = BatchEncode.withEmbedding(
        docs.orderBy("doc_id").coalesce(1), "text", new PoisonEncoder,
        batchSize = 2, skipFailedBatches = true)
      .select("doc_id").as[Long].collect().sorted
    // batch (3,4) contains "delta..." → poisoned, its 2 rows dropped
    assert(out === Array(1L, 2L, 5L))
  }

  test("without skipFailedBatches the encoder error propagates") {
    intercept[org.apache.spark.SparkException] {
      BatchEncode.withEmbedding(docs, "text", new PoisonEncoder,
        batchSize = 2).collect()
    }
  }

  test("ProjectionEncoder: real external kernel — deterministic, batch-" +
      "size invariant, unit-norm, distribution-shipped") {
    val enc = new BatchEncode.ProjectionEncoder(dim = 16)
    // parity across batch sizes AND partitionings: the kernel must not
    // depend on how Spark slices the work (retry/speculation contract)
    val a = BatchEncode.withEmbedding(docs.repartition(3), "text", enc,
        batchSize = 2)
      .select(col("doc_id"), col("embedding"))
    val b = BatchEncode.withEmbedding(docs.coalesce(1), "text", enc,
        batchSize = 5000)
      .select(col("doc_id"), col("embedding"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    val rows = a.as[(Long, Seq[Double])].collect().toMap
    // identical texts → identical vectors; distinct texts → distinct
    assert(rows(1L) === rows(3L))
    assert(rows(1L) !== rows(2L))
    // sentence-encoder contract: unit L2 norm for non-empty text
    rows.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, s"norm $n")
    }
    // the embedding is cosine-meaningful: shared-token docs sit closer
    // than disjoint ones
    def cos(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    val shared = cos(rows(1L), rows(4L))   // disjoint vocab
    val self = cos(rows(1L), rows(3L))     // identical
    assert(self > shared)
  }

  test("null text encodes as empty string (zero vector)") {
    val withNull = Seq((1L, "alpha"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = BatchEncode.withEmbedding(withNull, "text",
        new BatchEncode.FeatureHashEncoder(4))
      .filter(col("doc_id") === 2)
      .select("embedding").as[Seq[Double]].head()
    assert(out === Seq(0.0, 0.0, 0.0, 0.0))
  }
}

/** Top-level kernels: encoders ship to executors, so they must not
  * capture the (non-serializable) suite instance. */
object BatchEncodeSpecKernels {
  final class SizeEncoder extends BatchEncode.Encoder {
    val dim = 1
    def encodeBatch(texts: Seq[String]): Seq[Array[Double]] =
      texts.map(_ => Array(texts.length.toDouble))
  }
  final class PoisonEncoder extends BatchEncode.Encoder {
    val dim = 1
    def encodeBatch(texts: Seq[String]): Seq[Array[Double]] = {
      require(!texts.exists(_.startsWith("delta")), "poisoned batch")
      texts.map(_ => Array(1.0))
    }
  }
}
