package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate nearest-neighbor search — the scale path past brute force.
  *
  * The reference relies on an in-process HNSW graph (hnswlib via ChromaDB,
  * decoded params M=16/ef=100 in BASELINE.md). A pointer-chasing graph
  * doesn't distribute; the Spark-native equivalent is IVF (inverted file):
  * partition vectors by nearest centroid, search only the closest
  * `nProbe` cells. With the table *written partitioned by cell id*,
  * Catalyst partition-prunes the scan — at 100 TB a top-k touches
  * nProbe/nCells of the data instead of all of it.
  *
  * Centroids come from [[kmeansCentroids]] (deterministic Lloyd's — no
  * label column needed) or, when the corpus already carries a cluster
  * column, from [[centroids]] directly. Approximate results are
  * recall-tested (not hash-matched) per SURVEY §5.2.
  */
object Ann {

  /** Per-cell mean vectors via the [[graft.plans.VectorSum]] typed
    * aggregate: ONE double[] accumulator per cell, summed map-side — the
    * shuffle carries one dim-length buffer per (cell, task) instead of the
    * n×dim scalar rows the posexplode formulation ships. At 384-dim this
    * is a 384× cut in shuffle rows on the index-build path. */
  def centroids(df: DataFrame, cellCol: Column, vecCol: Column): DataFrame = {
    import graft.plans.VectorSum.vectorSum
    // the count must use the SAME skip rule as vector_sum (null rows and
    // rows whose array contains a null element are excluded) or centroids
    // on such input divide by an inflated n; `exists` is null on a null
    // array, so the `when` guard skips both cases in one predicate
    df.select(cellCol.as("cell"), vecCol.as("_v"))
      .groupBy(col("cell"))
      .agg(vectorSum(col("_v")).as("_s"),
        count(when(!exists(col("_v"), x => x.isNull), lit(1))).as("_n"))
      .select(col("cell"),
        transform(col("_s"), x => x / col("_n")).as("centroid"))
  }

  /** Declarative reference formulation of [[centroids]] — explode to
    * (cell, pos, component), average, reassemble. Kept as the executable
    * specification (parity-tested in KnnSpec); shuffles n×dim scalar rows,
    * so don't use it on real corpora. */
  def centroidsExploded(df: DataFrame, cellCol: Column, vecCol: Column): DataFrame =
    df.select(cellCol.as("cell"), posexplode(vecCol).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** The `nProbe` cell ids whose centroids are nearest the query. */
  def probeCells(cents: DataFrame, query: Seq[Double], nProbe: Int): Seq[Any] =
    cents.withColumn("d", l2Sq(col("centroid"), typedlit(query)))
      .orderBy(col("d").asc, col("cell").asc)
      .limit(nProbe)
      .select("cell").collect().map(_.get(0)).toSeq

  /** IVF top-k: restrict the scan to the probed cells (partition pruning
    * when the table is partitioned by cell), then exact top-k within. */
  def ivfTopK(df: DataFrame, cellCol: Column, vecCol: Column,
              cents: DataFrame, query: Seq[Double], k: Int,
              nProbe: Int = 2, tieBreak: String = "vec_id"): DataFrame = {
    val cells = probeCells(cents, query, nProbe)
    Knn.knnExact(df.filter(cellCol.isin(cells: _*)), vecCol, query, k,
      preFilter = None, tieBreak = tieBreak)
  }

  /** Map-side nearest-centroid assignment from an in-memory centroid set
    * via the native [[graft.plans.NearestCentroid]] kernel — one compiled
    * k×dim loop per row (the HOF form below evaluates l2 inside an
    * interpreted lambda, k lambda dispatches per row — the index-build
    * hot path at corpus scale). Tiebreak: centroids sorted by cell id, so
    * equal distance keeps the smaller id — identical to the (dist, cell)
    * struct sort. */
  private[graft] def assignByLiteral(df: DataFrame, vecCol: Column,
      centsLocal: Seq[(Int, Seq[Double])]): DataFrame = {
    import graft.plans.NearestCentroid.nearestCentroid
    val sorted = centsLocal.sortBy(_._1)
    val best = nearestCentroid(vecCol.cast("array<double>"),
      sorted.map(_._2))
    df.withColumn("cell",
      element_at(typedlit(sorted.map(_._1)), best.getField("cell") + 1))
  }

  /** HOF executable spec of [[assignByLiteral]] — bit-parity-tested in
    * KnnSpec, not on any production path (interpreted lambda per
    * centroid per row). Sorts by the SQUARED distance, matching the
    * kernel's squared-accumulation argmin (sqrt before comparing can
    * round two distinct squared distances onto the same double and flip
    * a tiebreak — same reason the q_pq_adc oracle orders by d2doc). */
  private[graft] def assignByLiteralHof(df: DataFrame, vecCol: Column,
      centsLocal: Seq[(Int, Seq[Double])]): DataFrame = {
    import graft.plans.NativeFunctions.l2SqNative
    val centLit = typedlit(centsLocal)
    df.withColumn("cell", element_at(array_sort(transform(centLit, c =>
      struct(l2SqNative(vecCol, c.getField("_2")).as("d"),
        c.getField("_1").as("cell")))), 1).getField("cell"))
  }

  /** Collect a centroid DataFrame to the driver-sized literal form
    * (k×dim doubles — the same object [[probeCells]] collects). */
  private def collectCents(cents: DataFrame): Seq[(Int, Seq[Double])] =
    cents.select(col("cell").cast("int"), col("centroid").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq

  /** Assign every vector to its nearest centroid (the IVF index-build
    * step), MAP-SIDE: the centroid table is driver-sized, so it ships as
    * a literal inside the plan — no join, no shuffle, the operator just
    * adds a `cell` column and preserves everything else. (The earlier
    * broadcast-crossJoin + `min_by` + join-back formulation shuffled the
    * whole corpus twice per call; the argmin tiebreak — (dist, cell)
    * lexicographic — is identical.) `idCol` is kept for API stability. */
  def assignCells(df: DataFrame, idCol: Column, vecCol: Column,
                  cents: DataFrame): DataFrame =
    assignByLiteral(df, vecCol, collectCents(cents))

  /** [[assignCells]] plus the distance to the assigned centroid as
    * `cdist` — the per-row drift signal an index-maintenance job watches
    * (mean cdist rising ⇒ the trained cells no longer fit the data). */
  def assignCellsWithDist(df: DataFrame, vecCol: Column,
                          cents: DataFrame): DataFrame = {
    import graft.plans.NearestCentroid.nearestCentroid
    val sorted = collectCents(cents).sortBy(_._1)
    val best = nearestCentroid(vecCol.cast("array<double>"),
      sorted.map(_._2))
    df.withColumn("_best", best)
      .withColumn("cell",
        element_at(typedlit(sorted.map(_._1)), col("_best").getField("cell") + 1))
      .withColumn("cdist", col("_best").getField("dist"))
      .drop("_best")
  }

  /** Greedy farthest-first seed selection over a driver-sized sample
    * (Gonzalez's k-center traversal — the deterministic stand-in for
    * k-means++'s D² sampling): start from the sample's first row, then
    * repeatedly take the point farthest (max min-distance²) from every
    * seed chosen so far, ties on the smaller sample index. Guarantees
    * every well-separated cluster in the sample contributes a seed —
    * the fix for the round-7 soak finding that k independent smallest-
    * md5 rows leave ~1/e of 256 true clusters unseeded, which 2 Lloyd's
    * iterations cannot repair (6× pruning where balanced cells give
    * 32×). O(sample × k × dim) driver flops — ~200M at k=256/S=2048/
    * d=384, well under one iteration's cluster cost. */
  private[graft] def farthestFirstSeeds(sample: Array[Array[Double]],
                                        k: Int): Seq[Seq[Double]] = {
    if (sample.length <= k) return sample.map(_.toSeq).toSeq
    val chosen = new Array[Int](k)
    chosen(0) = 0
    val d2 = Array.fill(sample.length)(Double.MaxValue)
    var count = 1
    while (count < k) {
      val cv = sample(chosen(count - 1))
      var i = 0; var best = 0; var bestD = -1.0
      while (i < sample.length) {
        val v = sample(i)
        var acc = 0.0; var j = 0
        while (j < v.length) { val d = v(j) - cv(j); acc += d * d; j += 1 }
        if (acc < d2(i)) d2(i) = acc
        if (d2(i) > bestD) { bestD = d2(i); best = i }
        i += 1
      }
      chosen(count) = best
      count += 1
    }
    chosen.map(i => sample(i).toSeq).toSeq
  }

  /** Deterministic Lloyd's k-means over DataFrame ops — makes IVF real on
    * corpora with no label column (the reference's index is a trained ANN
    * structure: hnswlib, M=16/ef=100 — BASELINE.md).
    *
    * Seeding: [[farthestFirstSeeds]] over the `k × seedSampleFactor`
    * rows with the smallest `md5('seed:' || id)` — the sample is an
    * order-independent pseudo-random draw, identical on any partitioning
    * or cluster layout, and the greedy traversal over it is a pure
    * driver-side function of the sample, so seeding stays deterministic
    * end to end while covering every cluster the sample touches (plain
    * smallest-md5-k seeding left true clusters unseeded and produced
    * the 1M soak's 6×-instead-of-32× pruning skew). Each iteration is
    * ONE job: map-side argmin against the centroid literal
    * ([[assignByLiteral]] — no join, no row shuffle) into the
    * [[centroids]] vector-sum aggregate, whose map-side partials mean
    * the only shuffle is k dim-length buffers per task. Centroids come
    * back to the driver between iterations — k×dim doubles, the same
    * driver-size object [[probeCells]] already collects — which also
    * keeps the per-iteration plan flat instead of a growing lineage
    * chain. Cells that lose every member keep their previous centroid. */
  def kmeansCentroids(df: DataFrame, idCol: Column, vecCol: Column,
                      k: Int, iters: Int = 5,
                      seedSampleFactor: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val vecs = df.select(idCol.as("_kid"), vecCol.cast("array<double>").as("_kv"))
    val sample: Array[Array[Double]] = vecs
      .orderBy(md5(concat(lit("seed:"), col("_kid").cast("string"))), col("_kid"))
      .limit(math.max(k, k * seedSampleFactor))
      .select("_kv").collect().map(_.getSeq[Double](0).toArray)
    var cents: Seq[(Int, Seq[Double])] =
      farthestFirstSeeds(sample, k).zipWithIndex.map { case (v, i) => (i, v) }
    var it = 0
    while (it < iters) {
      val assigned = assignByLiteral(vecs, col("_kv"), cents)
      val updated = centroids(assigned, col("cell"), col("_kv"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toMap
      cents = cents.map { case (c, v) => (c, updated.getOrElse(c, v)) }
      it += 1
    }
    import spark.implicits._
    cents.toDF("cell", "centroid")
  }

  /** Persist the collection partitioned by cell id: each IVF cell is a
    * directory, so [[ivfTopK]]'s probe filter becomes a PartitionFilter —
    * at 100 TB a probe touches nProbe/nCells of the files, verified in
    * PlanSpec. */
  def writePartitioned(df: DataFrame, dir: String): Unit =
    df.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)

  // ---- index lifecycle (the persisted-store analogue of the reference's
  // on-disk ChromaDB collection, vector_db.py:44-66) -------------------

  /** Train + assign + persist in one call: k-means centroids, map-side
    * cell assignment, cell-partitioned data layout, and the (k×dim)
    * centroid table written alongside under `<dir>/centroids`. The whole
    * build is two passes over the corpus beyond the k-means iterations. */
  def buildIvfIndex(df: DataFrame, idCol: Column, vecCol: Column,
                    dir: String, k: Int, iters: Int = 5): Unit = {
    val cents = kmeansCentroids(df, idCol, vecCol, k, iters)
    writePartitioned(assignByLiteral(df, vecCol, collectCents(cents)),
      s"${dir.stripSuffix("/")}/data")
    cents.coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.stripSuffix("/")}/centroids")
  }

  /** Load a persisted IVF index: (cell-partitioned data, centroids).
    * Queries against the data side partition-prune on `cell`. */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
                   dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"${dir.stripSuffix("/")}/data"),
      spark.read.parquet(s"${dir.stripSuffix("/")}/centroids"))

  /** Cell-size balance of an assigned corpus or persisted index — the
    * diagnostic behind nProbe sizing: [[ivfTopK]]'s cost is the SUM of
    * the probed cells' sizes, so a skewed layout (maxToMean ≫ 1 —
    * k-means underfit from too few iterations, or post-train data
    * drift) silently turns the nominal nProbe/k scan fraction into
    * something much larger (BASELINE.md's 1M soak measured 6× pruning
    * where balanced cells would give 32×). One aggregation, k rows to
    * the driver; pairs with [[assignCellsWithDist]]'s cdist drift
    * signal as the maintenance dashboard for a persisted IVF store. */
  case class CellStats(cells: Int, minSize: Long, maxSize: Long,
                       meanSize: Double, medianSize: Long,
                       maxToMean: Double)
  def cellStats(indexed: DataFrame,
                cellCol: Column = col("cell")): CellStats = {
    val sizes = indexed.groupBy(cellCol.cast("int").as("cell")).count()
      .select(col("count")).collect().map(_.getLong(0)).sorted
    require(sizes.nonEmpty, "cellStats over an empty layout")
    val mean = sizes.sum.toDouble / sizes.length
    CellStats(sizes.length, sizes.head, sizes.last, mean,
      sizes(sizes.length / 2), sizes.last / mean)
  }
}
