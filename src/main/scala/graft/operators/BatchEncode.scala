package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pluggable batch-inference embedding seam — the Spark form of the
  * reference's batch-encode loop (recommender/vector_db.py:146-175:
  * slice the corpus into `CHROMA_UPSERT_BATCH_SIZE`-doc batches,
  * `model.encode(batch)`, upsert; batch size 5000 from config.py:24).
  *
  * A real encoder is an external kernel (ONNX session, JNI runtime, or an
  * Arrow-batch subprocess) — exactly the seam a Catalyst `Expression`
  * cannot express, so `mapPartitions` is the right escalation (SURVEY
  * §7.3 order): the model loads ONCE per partition, every call sees a
  * `batchSize`-row slice (GPU-batchable), and a poisoned batch can
  * skip-and-continue like the reference's per-batch try/except
  * (vector_db.py:173-176) instead of killing the job.
  *
  * 100 TB notes: embedding is embarrassingly parallel — no shuffle is
  * introduced; throughput scales with partitions × per-batch kernel
  * throughput. Encoders MUST be deterministic per text: Spark retries and
  * speculative tasks re-encode rows, and two attempts must agree.
  */
object BatchEncode {

  /** One batch of texts in, one vector per text out (order-preserving,
    * same length). Implementations must be deterministic and
    * serializable (constructed on the driver, shipped to executors —
    * heavyweight model state belongs in a lazy/transient field so it
    * loads per executor, not per serialization). */
  trait Encoder extends Serializable {
    def dim: Int
    def encodeBatch(texts: Seq[String]): Seq[Array[Double]]
  }

  /** Default kernel: the deterministic feature-hash embedding — same bits
    * as the in-plan [[graft.plans.FeatureHashEmbed]] expression (shared
    * `compute`), so the seam stays oracle-checkable while standing in for
    * `model.encode`. */
  final class FeatureHashEncoder(val dim: Int) extends Encoder {
    def encodeBatch(texts: Seq[String]): Seq[Array[Double]] =
      texts.map(t => graft.plans.FeatureHashEmbed
        .compute(UTF8String.fromString(t), dim)
        .toDoubleArray())
  }

  /** Append `outCol` (ARRAY<DOUBLE>) to `df` by running `encoder` over
    * `batchSize`-row slices of each partition. NULL text encodes as ""
    * (the reference templates never produce null docs — validity-filtered
    * upstream). With `skipFailedBatches` a throwing batch drops its rows
    * and the job continues (the reference's per-batch resilience);
    * without it the error propagates and the task retries. */
  def withEmbedding(df: DataFrame, textCol: String, encoder: Encoder,
                    batchSize: Int = 5000, // CHROMA_UPSERT_BATCH_SIZE
                    outCol: String = "embedding",
                    skipFailedBatches: Boolean = false): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType, containsNull = false))
    val tIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(r => if (r.isNullAt(tIdx)) "" else r.getString(tIdx))
        // only the ENCODER call is skippable — a vector-count mismatch is
        // an encoder contract bug (not a poisoned batch) and always throws;
        // skipped batches are logged so row loss is observable
        val vecsOpt =
          try Some(encoder.encodeBatch(texts))
          catch {
            case e: Exception if skipFailedBatches =>
              org.slf4j.LoggerFactory.getLogger("graft.operators.BatchEncode")
                .warn(s"dropping failed batch of ${batch.length} rows: $e")
              None
          }
        vecsOpt match {
          case Some(vecs) =>
            require(vecs.length == batch.length,
              s"encoder returned ${vecs.length} vectors for ${batch.length} texts")
            batch.zip(vecs).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
          case None => Seq.empty[Row]
        }
      }
    }(Encoders.row(outSchema))
  }
}
