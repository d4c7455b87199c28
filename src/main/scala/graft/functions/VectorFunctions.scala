package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>`.
  *
  * The reference stores 384-dim float vectors in hnswlib and scores with L2
  * (reference: vector_db.py:160 builds the matrix; talent_recommender.py:37-42
  * queries with ChromaDB's default L2 space). Here vectors are ordinary array
  * columns and distances are ordinary expressions, so Catalyst can pipeline
  * them inside whole-stage codegen with the surrounding filter/top-k.
  *
  * Determinism contract (SURVEY.md §2.8): every element is cast to DOUBLE
  * before arithmetic and folds run left-to-right (`aggregate` over a
  * `zip_with`), so Spark and the DuckDB oracle compute bit-identical sums;
  * query results additionally `round(_, 6)`.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Squared L2 distance — the monotone stand-in for L2 in ranking. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) distance, as ChromaDB reports for the reference. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Dot product, left-to-right fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(asDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; 0-norm inputs yield NULL. Spark 4 runs ANSI mode by
    * default where x/0 *throws* — `nullif` turns the zero denominator into
    * NULL first, making the result NULL (matching the DuckDB oracle) instead
    * of a runtime error. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDistance(a: Column, b: Column): Column = lit(1.0) - cosine(a, b)

  /** Deterministic feature-hash embedding in DOUBLE: token → md5-derived
    * bucket → L2-normalized count vector. Stands in for the external
    * sentence-transformer (SURVEY §2.3 V1 is a model call, outside the
    * engine) with the same dataflow shape, and is exactly reproducible in
    * the DuckDB oracle.
    *
    * Delegates to the native codegen'd [[graft.plans.FeatureHashEmbed]]
    * kernel; [[featureHashEmbeddingHof]] is the declarative higher-order
    * reference formulation — bit-identical, spec-enforced — kept as the
    * executable specification of the semantics. */
  def featureHashEmbeddingD(textCol: Column, dim: Int): Column =
    graft.plans.FeatureHashEmbed.featureHashNative(textCol, dim)

  /** Reference HOF formulation of [[featureHashEmbeddingD]] (slower:
    * O(tokens × dim) interpreted lambda dispatches per row).
    *
    * Single aggregate pass accumulates all `dim` counts at once — a
    * per-dimension `filter(buckets, _ === i)` would re-run the tokenize +
    * md5 pipeline per DIMENSION (interpreted HOFs share nothing). */
  def featureHashEmbeddingHof(textCol: Column, dim: Int): Column = {
    import graft.functions.TextFunctions.{tokens, tokenHash16}
    val buckets = transform(tokens(textCol), t => tokenHash16(t) % dim)
    val dimIdx = sequence(lit(0L), lit(dim - 1L))
    val counts = aggregate(buckets, array_repeat(lit(0.0), dim), (acc, b) =>
      zip_with(acc, dimIdx, (a, i) =>
        a + when(i === b, lit(1.0)).otherwise(lit(0.0))))
    val nrm = sqrt(aggregate(counts, lit(0.0), (acc, x) => acc + x * x))
    // nrm rides along as a zip argument (evaluated once per row) — naming it
    // inside the lambda would re-run the whole count aggregation per ELEMENT
    zip_with(counts, array_repeat(nrm, dim),
      (x, nn) => when(nn > 0, x / nn).otherwise(lit(0.0)))
  }

  /** [[featureHashEmbeddingD]] cast to the `ARRAY<FLOAT>` storage type. */
  def featureHashEmbedding(textCol: Column, dim: Int): Column =
    transform(featureHashEmbeddingD(textCol, dim), _.cast("float"))
}
