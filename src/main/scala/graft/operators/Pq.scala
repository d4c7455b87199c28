package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.NativeFunctions.l2SqNative

/** Product quantization — the memory-compression layer under
  * billion-scale ANN (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011; the layout FAISS calls IVF-PQ).
  *
  * The reference's hnswlib index (BASELINE.md: M=16/ef=100) holds full
  * float vectors in RAM — at 100 TB that is the scale wall. PQ splits a
  * d-dim vector into `m` subvectors of d/m dims, trains a tiny k-means
  * codebook (ks centroids) per subspace, and stores each vector as `m`
  * small codes: 64-dim float32 → 8 bytes at m=8/ks=256, a 32× cut, which
  * is what lets an index of a 100 TB corpus fit a cluster's memory.
  *
  * Spark-first shape:
  *  - codebooks are m×ks×(d/m) doubles — driver-sized, shipped as plan
  *    literals exactly like [[Ann]]'s centroid table; training is ONE job
  *    per Lloyd's iteration for ALL subspaces (explode by subspace, then
  *    the [[graft.plans.VectorSum]] map-side aggregate), so the corpus is
  *    scanned iters times total, not m×iters;
  *  - encoding is map-side (no join, no shuffle): m independent argmins
  *    against per-subspace codebook literals;
  *  - a query never touches the vectors: the driver precomputes the
  *    m×ks table of squared sub-distances (ADC — asymmetric distance
  *    computation), each row sums m table lookups, and top-k is
  *    `TakeOrderedAndProject` — k×partitions rows move, zero shuffle;
  *  - optional exact re-rank over an ADC overfetch restores recall while
  *    still scanning codes, not vectors.
  *
  * Approximate like [[Ann.ivfTopK]]: recall vs brute force is asserted in
  * KnnSpec per SURVEY §5.2; with codebooks that reproduce every distinct
  * subvector the quantization is lossless and ADC top-k EQUALS exact
  * [[Knn.knnExact]] — that equivalence is the parity test.
  */
object Pq {

  /** Trained product-quantizer: `books(s)` is subspace s's codebook as
    * (code, centroid) pairs, `subDim` = d/m components each. */
  case class PqModel(m: Int, subDim: Int, ks: Int,
                     books: Seq[Seq[(Int, Seq[Double])]]) {
    require(books.length == m, s"expected $m codebooks, got ${books.length}")
  }

  /** The i-th subvector slice (0-based subspace index). */
  private def sub(vecCol: Column, i: Int, subDim: Int): Column =
    slice(vecCol, i * subDim + 1, subDim)

  /** Train per-subspace codebooks with deterministic Lloyd's — one job
    * per iteration covering ALL m subspaces.
    *
    * Seeding: the ks rows with the smallest `md5('seed:' || id)` (the
    * [[Ann.kmeansCentroids]] rule — order-independent, partitioning-
    * independent), sliced per subspace. Each iteration explodes rows to
    * (subspace, subvector) — m× the row count but the SAME total data
    * volume (each slice is 1/m the width) — assigns map-side against the
    * codebook literal, and re-aggregates with the vector-sum typed
    * aggregate, so the only shuffle is m×ks subDim-length buffers per
    * task. Codes that lose every member keep their previous centroid. */
  def trainCodebooks(df: DataFrame, idCol: Column, vecCol: Column,
                     m: Int, ks: Int, iters: Int = 5): PqModel = {
    val vecs = df.select(idCol.as("_pid"),
      vecCol.cast("array<double>").as("_pv"))
    val dim = vecs.select(size(col("_pv"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m

    val seeds = vecs
      .orderBy(md5(concat(lit("seed:"), col("_pid").cast("string"))), col("_pid"))
      .limit(ks)
      .select("_pv").collect().map(_.getSeq[Double](0))
    var books: Seq[Seq[(Int, Seq[Double])]] =
      (0 until m).map { s =>
        seeds.zipWithIndex.map { case (v, j) =>
          (j, v.slice(s * subDim, (s + 1) * subDim))
        }.toSeq
      }

    // one exploded (subspace, subvector) frame reused every iteration
    val subRows = vecs.select(explode(array((0 until m).map(s =>
      struct(lit(s).as("sub"), sub(col("_pv"), s, subDim).as("sv"))): _*))
      .as("e")).select(col("e.sub").as("sub"), col("e.sv").as("sv"))

    var it = 0
    while (it < iters) {
      // map-side argmin: the subspace id selects its codebook from one
      // m-entry literal, then the ks-candidate argmin runs per row
      val bookLit = typedlit(books.zipWithIndex.map { case (b, s) => (s, b) })
      val assigned = subRows.withColumn("code",
        element_at(array_sort(transform(
          element_at(bookLit, col("sub") + 1).getField("_2"), c =>
            struct(l2SqNative(col("sv"), c.getField("_2")).as("d"),
              c.getField("_1").as("code")))), 1).getField("code"))
      import graft.plans.VectorSum.vectorSum
      val updated = assigned.groupBy(col("sub"), col("code"))
        .agg(vectorSum(col("sv")).as("_s"),
          count(when(!exists(col("sv"), x => x.isNull), lit(1))).as("_n"))
        .select(col("sub"), col("code"),
          transform(col("_s"), x => x / col("_n")).as("c"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2)))
        .toMap
      books = books.zipWithIndex.map { case (b, s) =>
        b.map { case (j, old) => (j, updated.getOrElse((s, j), old)) }
      }
      it += 1
    }
    PqModel(m, subDim, ks, books)
  }

  /** Map-side encode: vector → `m` codebook codes (`ARRAY<INT>`) via the
    * native [[graft.plans.NearestCentroid]] kernel per subspace — this is
    * the full-corpus pass of a PQ index build, and the interpreted HOF
    * argmin cost ~3 s at sf0.1 (m×ks lambda dispatches per row). No
    * join, no shuffle; the operator just adds `codes`. */
  def encode(df: DataFrame, vecCol: Column, model: PqModel,
             codesName: String = "codes"): DataFrame = {
    import graft.plans.NearestCentroid.nearestCentroid
    val v = vecCol.cast("array<double>")
    df.withColumn(codesName, array((0 until model.m).map { s =>
      val book = model.books(s).sortBy(_._1)
      element_at(typedlit(book.map(_._1)),
        nearestCentroid(sub(v, s, model.subDim), book.map(_._2))
          .getField("cell") + 1)
    }: _*))
  }

  /** Higher-order-function formulation of [[encode]] — the executable
    * specification (bit-parity-tested in KnnSpec). One `transform` over
    * the subspace sequence with the codebook selected per element; kept
    * out of production paths per the interpreted-HOF trap. */
  def encodeHof(df: DataFrame, vecCol: Column, model: PqModel,
                codesName: String = "codes"): DataFrame = {
    val bookLit = typedlit(model.books.zipWithIndex.map { case (b, s) => (s, b) })
    val v = vecCol.cast("array<double>")
    // sorts by the SQUARED distance — matches the kernel's
    // squared-accumulation argmin (sqrt-before-compare can collapse two
    // distinct squared distances onto the same double and flip a tiebreak)
    df.withColumn(codesName,
      transform(sequence(lit(0), lit(model.m - 1)), s =>
        element_at(array_sort(transform(
          element_at(bookLit, s + 1).getField("_2"), c =>
            struct(l2SqNative(slice(v, s * model.subDim + 1, lit(model.subDim)),
              c.getField("_2")).as("d"),
              c.getField("_1").as("code")))), 1).getField("code")))
  }

  /** Driver-side ADC table: `table(s)(j)` = squared L2 between the
    * query's s-th subvector and codebook centroid j — m×ks doubles,
    * computed once per query, shipped as a literal. Accumulation is
    * left-to-right double adds, the repo-wide IEEE-parity rule. */
  def adcTable(model: PqModel, query: Seq[Double]): Seq[Seq[Double]] = {
    require(query.length == model.m * model.subDim,
      s"query dim ${query.length} != ${model.m}×${model.subDim}")
    model.books.zipWithIndex.map { case (book, s) =>
      // table position j must be the distance of CODE j — the lookup
      // side indexes by code value, so a books seq that lost its code
      // order (or has non-contiguous codes) would silently read the
      // wrong centroid's distance. Sort and verify instead.
      val sorted = book.sortBy(_._1)
      require(sorted.map(_._1) == (0 until sorted.length),
        s"subspace $s codebook codes must be contiguous 0..${sorted.length - 1}, " +
          s"got ${sorted.map(_._1).take(8)}...")
      val q = query.slice(s * model.subDim, (s + 1) * model.subDim)
      sorted.map { case (_, c) =>
        var acc = 0.0
        var i = 0
        while (i < model.subDim) {
          val d = q(i) - c(i)
          acc += d * d
          i += 1
        }
        acc
      }
    }
  }

  /** ADC distance of a codes row against a precomputed table: sum of m
    * table lookups, then sqrt — never touches the vector column. Static
    * expression tree (codegen'd lookups, no HOF). */
  def adcDist(codesCol: Column, table: Seq[Seq[Double]]): Column = {
    val lookups = table.zipWithIndex.map { case (row, s) =>
      element_at(typedlit(row), element_at(codesCol, s + 1) + 1)
    }
    sqrt(lookups.reduce(_ + _))
  }

  /** PQ top-k: ADC distances over the codes column, then
    * `TakeOrderedAndProject` — the scan reads m ints per row instead of
    * d floats, and only k×partitions rows move. Output column `dist` is
    * the rounded ADC approximation of L2. */
  def pqTopK(df: DataFrame, codesCol: Column, model: PqModel,
             query: Seq[Double], k: Int,
             tieBreak: String = "vec_id"): DataFrame =
    df.withColumn("dist", round(adcDist(codesCol, adcTable(model, query)), 6))
      .orderBy(col("dist").asc, col(tieBreak).asc)
      .limit(k)

  /** ADC overfetch + exact re-rank: top `k×overfetch` rows by ADC (codes
    * only), then true L2 on the carried vector column for the final
    * order — the standard recall-restoring refinement; the exact
    * distance runs on k×overfetch rows, not the corpus. */
  def pqTopKRefined(df: DataFrame, codesCol: Column, vecCol: Column,
                    model: PqModel, query: Seq[Double], k: Int,
                    overfetch: Int = 4,
                    tieBreak: String = "vec_id"): DataFrame = {
    val cand = df.withColumn("adc",
        round(adcDist(codesCol, adcTable(model, query)), 6))
      .orderBy(col("adc").asc, col(tieBreak).asc)
      .limit(k * overfetch)
    Knn.knnExact(cand, vecCol, query, k, preFilter = None, tieBreak = tieBreak)
      .drop("adc")
  }

  /** [[pqTopKRefined]] against a SEPARATED layout — a codes-only store
    * plus the vector table: ADC overfetch runs over the codes scan (m
    * small ints per row, no vector payload), the top k×overfetch
    * candidate ids become the BUILD side of a broadcast LEFT SEMI join
    * against the vector table, and exact L2 on just the fetched rows
    * decides the final top-k. The serving shape of a persisted PQ store
    * at corpus scale: the big scan never reads vectors, and the vector
    * read never scans — the semi join's build side is one bounded
    * (k×overfetch-row) hash table, no corpus shuffle.
    *
    * LAZY end to end: the candidate set is a SUBQUERY of the returned
    * plan (ADC sort-limit feeding the broadcast exchange), not a
    * collect at construction — the serve is plan-auditable and nothing
    * runs before the caller's action, like every other tier. (The
    * earlier eager form collected candidate ids at call time to build
    * an `isin` literal; the broadcast-semi subquery carries the same
    * bounded row set without leaving the plan.) Consequently an EMPTY
    * codes store surfaces as an empty result at action time, not a
    * construction-time failure — guard upstream if an empty store is a
    * deployment error. */
  def pqTopKRefinedFetch(codes: DataFrame, codesCol: Column,
                         vectors: DataFrame, idName: String,
                         vecCol: Column, model: PqModel,
                         query: Seq[Double], k: Int, overfetch: Int = 4,
                         tieBreak: String = "vec_id"): DataFrame = {
    val cand = codes.withColumn("adc",
        round(adcDist(codesCol, adcTable(model, query)), 6))
      .orderBy(col("adc").asc, col(tieBreak).asc)
      .limit(k * overfetch)
      .select(col(idName))
    Knn.knnExact(vectors.join(broadcast(cand), Seq(idName), "left_semi"),
      vecCol, query, k, preFilter = None, tieBreak = tieBreak)
  }

  // ---- IVF-PQ: residual quantization inside IVF cells ----------------

  /** Train PQ over residuals (vector − its cell centroid): within one
    * cell residuals are small and centered, so the same ks codes spend
    * their resolution on the local neighborhood — the composition FAISS
    * ships as IVF-PQ. `dfWithCell` must carry `cell`; `cents` is the
    * [[Ann]] centroid table. */
  def trainResidual(dfWithCell: DataFrame, idCol: Column, vecCol: Column,
                    cents: DataFrame, m: Int, ks: Int,
                    iters: Int = 5): PqModel = {
    val resid = withResidual(dfWithCell, vecCol, cents)
    trainCodebooks(resid, idCol, col("_resid"), m, ks, iters)
  }

  /** Encode residuals map-side: subtract the cell centroid (map literal,
    * no join) then [[encode]]. Keeps `cell` + codes — the persisted form
    * stores m ints + a cell id per vector. */
  def encodeResidual(dfWithCell: DataFrame, vecCol: Column,
                     cents: DataFrame, model: PqModel,
                     codesName: String = "codes"): DataFrame =
    encode(withResidual(dfWithCell, vecCol, cents), col("_resid"), model,
      codesName).drop("_resid")

  private def withResidual(dfWithCell: DataFrame, vecCol: Column,
                           cents: DataFrame): DataFrame = {
    val centMap: Map[Int, Seq[Double]] = cents
      .select(col("cell").cast("int"), col("centroid").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    val centLit = typedlit(centMap)
    dfWithCell.withColumn("_resid",
      zip_with(vecCol.cast("array<double>"),
        element_at(centLit, col("cell").cast("int")), (x, c) => x - c))
  }

  /** IVF-PQ top-k: probe the `nProbe` nearest cells ([[Ann.probeCells]]),
    * then ADC inside them — the table is PER CELL (the query residual
    * differs by cell), so the driver builds nProbe m×ks tables and ships
    * them as one map literal keyed by cell id. The scan is partition-
    * pruned to the probed cells AND reads only codes — the two
    * compressions compose. */
  def ivfPqTopK(encoded: DataFrame, codesCol: Column, cents: DataFrame,
                model: PqModel, query: Seq[Double], k: Int,
                nProbe: Int = 2, tieBreak: String = "vec_id"): DataFrame =
    ivfPqAdcScan(encoded, codesCol, cents, model, query, nProbe)
      .orderBy(col("dist").asc, col(tieBreak).asc)
      .limit(k)

  /** The probed-cell ADC scan both IVF-PQ serves share: per-cell
    * residual tables shipped as one map literal, the scan filtered to
    * the probed cells (partition pruning on a cell-partitioned store)
    * and reading only codes. Adds `dist` (rounded ADC L2). */
  private def ivfPqAdcScan(encoded: DataFrame, codesCol: Column,
                           cents: DataFrame, model: PqModel,
                           query: Seq[Double], nProbe: Int): DataFrame = {
    val centLocal = cents
      .select(col("cell").cast("int"), col("centroid").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
    val probed: Seq[Int] = centLocal.toSeq
      .map { case (c, v) =>
        var acc = 0.0; var i = 0
        while (i < v.length) { val d = query(i) - v(i); acc += d * d; i += 1 }
        (acc, c)
      }.sorted.take(nProbe).map(_._2)
    val tables: Map[Int, Seq[Seq[Double]]] = probed.map { c =>
      val cent = centLocal(c)
      val residQ = query.indices.map(i => query(i) - cent(i))
      (c, adcTable(model, residQ))
    }.toMap
    val tabLit = typedlit(tables)
    val cellTab = element_at(tabLit, col("cell").cast("int"))
    val lookups = (0 until model.m).map(s =>
      element_at(element_at(cellTab, s + 1), element_at(codesCol, s + 1) + 1))
    encoded.filter(col("cell").cast("int").isin(probed: _*))
      .withColumn("dist", round(sqrt(lookups.reduce(_ + _)), 6))
  }

  /** IVF-PQ with the recall-restoring bounded refine — the serving
    * shape that composes BOTH compressions with exact final ranking:
    * the probed-cell ADC scan ranks codes (partition-pruned, m ints per
    * row), the top k×overfetch candidate ids feed a broadcast LEFT
    * SEMI join against the vector table, and true L2 on just the
    * fetched rows decides the final top-k. LAZY over the corpus-sized
    * stores like [[pqTopKRefinedFetch]] (the candidate set is a bounded
    * subquery of the returned plan; an empty store / all-empty probed
    * cells surface as an empty result) — the only construction-time
    * work is the k×dim centroid collect every IVF tier performs for
    * probe selection.
    * ADC quantization error then costs recall ONLY when a true neighbor
    * falls outside the overfetch window — the window is the knob
    * [[AnnMatrix.recommendBudgets]] sizes from measurement. */
  def ivfPqTopKRefinedFetch(encoded: DataFrame, codesCol: Column,
                            cents: DataFrame, vectors: DataFrame,
                            idName: String, vecCol: Column, model: PqModel,
                            query: Seq[Double], k: Int, nProbe: Int = 2,
                            overfetch: Int = 8, tieBreak: String = "vec_id")
      : DataFrame = {
    val cand = ivfPqAdcScan(encoded, codesCol, cents, model, query, nProbe)
      .orderBy(col("dist").asc, col(tieBreak).asc)
      .limit(k * overfetch)
      .select(col(idName))
    Knn.knnExact(vectors.join(broadcast(cand), Seq(idName), "left_semi"),
      vecCol, query, k, preFilter = None, tieBreak = tieBreak)
  }
}
