package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators for long-lived collections.
  *
  * At 100 TB the killers are small files (incremental appends → metadata
  * blowup + tiny scans) and unstable row identity. These keep a persisted
  * collection healthy:
  *  - [[compact]]: rewrite a parquet directory into ~`targetFileRows`-row
  *    files (read → repartition → atomic-ish overwrite via temp dir);
  *  - [[withDenseIds]]: assign contiguous 0..n-1 labels in a deterministic
  *    key order — the analogue of the reference's `id_to_label` map
  *    (hnswlib needs dense int labels; `index_metadata.pickle` decodes to
  *    exactly this). One sort; the zip is per-partition arithmetic.
  */
object Maintenance {

  /** Rewrite `dir` into ceil(rows/targetFileRows) files. Returns the new
    * file count. Writes to a sibling temp dir first, then swaps, so a
    * failed compaction never corrupts the source. */
  def compact(spark: SparkSession, dir: String,
              targetFileRows: Long = 1000000L): Int = {
    val df = spark.read.parquet(dir)
    val rows = df.count()
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetFileRows).toInt)
    val tmp = dir.stripSuffix("/") + "__compacting"
    df.repartition(nFiles).write.mode("overwrite").parquet(tmp)
    // resolve the FS from the path, not the default FS: dir may live on
    // s3a:// etc. while defaultFS is hdfs/file
    val target = new org.apache.hadoop.fs.Path(dir)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(target, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), target)
    nFiles
  }

  /** Deterministic dense 0-based labels in `orderCol` order, fully
    * DataFrame-native (no RDD round trip — the old `rdd.zipWithIndex`
    * exited Tungsten and re-encoded every row through Scala objects):
    *
    *  1. range-shuffled sort on `orderCol`, materialized ONCE via an
    *     eager `localCheckpoint` so the counting pass and the labeling
    *     pass see the SAME partition boundaries (the range sampler is
    *     not re-plan-stable across separate queries). A checkpoint, not
    *     `persist`: CacheManager entries are pinned for the session —
    *     every call would permanently hold a sorted copy of the whole
    *     table — while checkpoint blocks are released by the
    *     ContextCleaner as soon as the returned frame is unreachable;
    *  2. per-partition row counts via a `spark_partition_id()` groupBy —
    *     a driver-sized aggregate (one row per partition);
    *  3. cumulative offsets ship back as a map LITERAL inside the plan,
    *     and each row's label = offset(pid) + (row_number within pid − 1)
    *     — the per-partition window keeps full parallelism (no global
    *     single-partition window).
    *
    * `orderCol` must be a UNIQUE key: range partitioning may split equal
    * keys across partitions, which would make labels among ties depend on
    * the physical split. The analogue of the reference's `id_to_label`
    * dense-int relabeling (hnswlib index metadata). */
  def withDenseIds(spark: SparkSession, df: DataFrame, orderCol: Column,
                   out: String = "label_id"): DataFrame =
    withDenseIdsBy(spark, df, Seq(orderCol), out)

  /** [[withDenseIds]] over a composite order — same mechanism; the
    * `orderCols` tuple must be unique as a whole (e.g. a hash plus the
    * key as tiebreak, the epoch-shuffle shape). */
  def withDenseIdsBy(spark: SparkSession, df: DataFrame,
                     orderCols: Seq[Column], out: String): DataFrame = {
    val asc = orderCols.map(_.asc)
    val sorted = df.orderBy(asc: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = sorted.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .orderBy("_pid")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val offsets = counts.foldLeft((Map.empty[Int, Long], 0L)) {
      case ((m, acc), (pid, n)) => (m + (pid -> acc), acc + n)
    }._1
    sorted
      .withColumn(out,
        element_at(typedlit(offsets), col("_pid")) +
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("_pid")).orderBy(asc: _*)).cast("long") - 1)
      .drop("_pid")
  }

  /** Balanced per-group global running sum — the scale form of a
    * `sum over (partition by group order by k)` window when one group
    * holds most of the data (a train split is ~80 % of the corpus; the
    * plain window would put it in ONE task). Same mechanism as
    * [[withDenseIdsBy]]: range sort on (group, order) keeps full
    * parallelism, per-(partition, group) value totals collect to the
    * driver (#partitions × #groups rows), prefix offsets broadcast
    * back, and the running sum inside each partition is a LOCAL window.
    * `orderCol` must be unique within each group. */
  def withGroupedCumSum(spark: SparkSession, df: DataFrame,
                        groupCol: Column, orderCol: Column,
                        valueCol: Column, out: String): DataFrame = {
    val sorted = df.orderBy(groupCol.asc, orderCol.asc)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_g", groupCol.cast("string"))
      .localCheckpoint(true)
    // long throughout: an int valueCol would otherwise surface as
    // Integer in the driver collect and as int sums in the window
    val v = valueCol.cast("long")
    val parts = sorted.groupBy(col("_g"), col("_pid"))
      .agg(sum(v).as("_n"))
      .orderBy("_g", "_pid")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offsets: Map[String, Long] = {
      val m = Map.newBuilder[String, Long]
      var cur: String = null
      var run = 0L
      parts.foreach { case (g, pid, n) =>
        if (g != cur) { cur = g; run = 0L }
        m += (s"$pid:$g" -> run)
        run += n
      }
      m.result()
    }
    val w = Window.partitionBy(col("_pid"), col("_g"))
      .orderBy(orderCol.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.withColumn(out,
        element_at(typedlit(offsets),
          concat(col("_pid").cast("string"), lit(":"), col("_g"))) +
          sum(v).over(w))
      .drop("_pid", "_g")
  }

  /** Per-document training-shard assignment — the last mile of the
    * curation pipeline: hash split (train/val/test), deterministic
    * epoch-shuffle order within each split, consecutive docs packed
    * into ~`budgetTokens` shards ([[graft.operators.Sampling]] pieces
    * composed over [[withGroupedCumSum]], so no single-partition
    * window anywhere). Fully deterministic — oracled as
    * `q_train_shards`. */
  def trainingShardAssignment(spark: SparkSession, docs: DataFrame,
                              idCol: Column, textCol: Column, epoch: Int,
                              budgetTokens: Long): DataFrame =
    shardAssignmentBy(spark, docs, idCol,
      size(graft.functions.TextFunctions.tokens(textCol)).cast("long"),
      epoch, budgetTokens, valueName = "n_tokens", cumName = "cum_tokens")

  /** [[trainingShardAssignment]] for BYTE-packed multimodal shards:
    * image/audio/video training shards are sized by payload bytes, not
    * token counts — same split → epoch order → consecutive packing
    * machinery over `octet_length(payload)`. Oracled as
    * `q_pack_byte_budget`. */
  def byteShardAssignment(spark: SparkSession, media: DataFrame,
                          idCol: Column, payloadCol: Column, epoch: Int,
                          budgetBytes: Long): DataFrame =
    shardAssignmentBy(spark, media, idCol,
      octet_length(payloadCol).cast("long"), epoch, budgetBytes,
      valueName = "n_bytes", cumName = "cum_bytes")

  /** The generalized core both assignment flavors share: hash split
    * (train/val/test), deterministic epoch-shuffle order within each
    * split, consecutive items packed into ~`budget` shards by an
    * arbitrary map-side VALUE column — the cum-sum rides
    * [[withGroupedCumSum]], so no single-partition window even though
    * the train split holds ~80 % of the corpus. An item crossing a
    * budget boundary belongs to the shard it STARTS in (a shard's
    * total exceeds the budget by at most one item's value). */
  def shardAssignmentBy(spark: SparkSession, items: DataFrame,
                        idCol: Column, valueCol: Column, epoch: Int,
                        budget: Long, valueName: String,
                        cumName: String): DataFrame = {
    import graft.operators.Sampling
    // spread past a single-row-group scan BEFORE the per-item value is
    // computed (tokenize / payload length are the CPU-bound stage fused
    // onto the scan — sf10 soak finding)
    val shuffled = Sampling.epochShuffle(spark,
      Sampling.assignSplit(graft.operators.Spread.forKernel(items), idCol),
        idCol, epoch)
      .withColumn(valueName, valueCol.cast("long"))
    withGroupedCumSum(spark, shuffled, col("split"), col("pos"),
        col(valueName), cumName)
      .withColumn("shard",
        floor((col(cumName) - col(valueName)) / lit(budget))
          .cast("bigint"))
  }

  /** Write the training-shard store: [[trainingShardAssignment]]
    * materialized as parquet partitioned by (split, shard), one task —
    * and so one ordered file set — per shard (size the token budget so
    * a shard is a sane file: ~100 M tokens ≈ 500 MB). Returns the
    * per-shard manifest (split, shard, n_docs, n_tokens) a trainer
    * consumes. Layout: FLAT `outDir/split=/shard=` — incompatible with
    * [[appendTrainingShards]]'s `wave=`-prefixed store on the same
    * outDir (the append sink refuses a flat store at the root). */
  def writeTrainingShards(spark: SparkSession, docs: DataFrame,
                          outDir: String, idCol: Column, textCol: Column,
                          epoch: Int = 0,
                          budgetTokens: Long = 100000L): DataFrame = {
    trainingShardAssignment(spark, docs, idCol, textCol, epoch,
        budgetTokens)
      .repartition(col("split"), col("shard"))
      // the writer's REQUIRED ordering starts with the partition columns;
      // sorting by pos alone would make the dynamic-partition writer
      // insert its own (not-guaranteed-stable) sort on (split, shard),
      // voiding the per-shard pos-order guarantee this doc promises
      .sortWithinPartitions("split", "shard", "pos")
      .write.mode("overwrite")
      .partitionBy("split", "shard")
      .parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
  }

  /** [[writeTrainingShards]] for BYTE-packed multimodal shards: the
    * [[byteShardAssignment]] materialized as parquet partitioned by
    * (split, shard) with the same writer-required ordering (one
    * pos-ordered file set per shard). Size `budgetBytes` so a shard is
    * a sane object-store file (default 512 MB). Returns the per-shard
    * manifest (split, shard, n_docs, n_bytes). */
  def writeMultimodalShards(spark: SparkSession, media: DataFrame,
                            outDir: String, idCol: Column,
                            payloadCol: Column, epoch: Int = 0,
                            budgetBytes: Long = 512L << 20): DataFrame = {
    byteShardAssignment(spark, media, idCol, payloadCol, epoch,
        budgetBytes)
      .repartition(col("split"), col("shard"))
      .sortWithinPartitions("split", "shard", "pos")
      .write.mode("overwrite")
      .partitionBy("split", "shard")
      .parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_bytes").as("n_bytes"))
  }

  /** Recurring-ingest shard export: assign and write ONLY the new
    * wave's documents, opening fresh shards after each split's current
    * maximum — existing shard files are immutable (a trainer may
    * already hold them; reopening a partially-filled shard would
    * rewrite consumed data). The wave is epoch-ordered and packed
    * within itself; cost is sized by the wave, plus one driver-sized
    * read of the store's (split, shard) ids. Returns the wave's
    * manifest rows.
    *
    * The store layout is `outDir/wave=<waveId>/split=<s>/shard=<n>` and
    * the commit is ONE directory rename of the staged wave into its
    * `wave=` slot — atomic on a rename-atomic filesystem, so the store
    * NEVER holds a partially-committed wave (the earlier
    * one-rename-per-shard loop could crash mid-loop, and a replay —
    * computing base ids from the new max — would then re-append the
    * whole wave under fresh ids, duplicating every document). `waveId`
    * must be a DURABLE caller-owned identifier (ingest date, batch id):
    * it is the idempotency key — a replay whose `wave=` directory
    * already exists skips the append entirely and just returns the
    * stored wave's manifest. Because a wave is all-or-nothing, the
    * base-id scan only ever sees complete waves, so shard ids stay
    * globally consecutive per split across waves.
    *
    * Layout note: this store is `wave=`-partitioned at the root and is
    * NOT interchangeable with [[writeTrainingShards]]'s flat
    * `split=/shard=` layout — a mixed store has conflicting
    * partition-directory depths and fails Spark's partition discovery.
    * This sink detects a flat store and throws. */
  def appendTrainingShards(spark: SparkSession, newDocs: DataFrame,
                           outDir: String, waveId: String,
                           idCol: Column, textCol: Column,
                           epoch: Int = 0,
                           budgetTokens: Long = 100000L): DataFrame = {
    require(waveId.nonEmpty && !waveId.contains("/") &&
        !waveId.contains("="),
      s"waveId must be a plain partition-safe token, got '$waveId'")
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // layout guard: writeTrainingShards writes FLAT outDir/split=/shard=,
    // this sink writes outDir/wave=/split=/shard= — mixing the two depths
    // in one store breaks partition discovery for every reader (including
    // this sink's own base-id scan). Fail fast instead.
    if (fs.exists(outPath) &&
        fs.listStatus(outPath).exists(_.getPath.getName.startsWith("split=")))
      throw new IllegalStateException(
        s"$outDir holds a flat writeTrainingShards layout (split=… at the " +
          "root); appendTrainingShards writes wave=…/split=… and cannot " +
          "share a store with the flat sink — use a fresh outDir, or " +
          "rewrite the store once as wave=<id0> before appending")
    val wavePath = new org.apache.hadoop.fs.Path(outPath, s"wave=$waveId")
    def storedManifest(): DataFrame =
      spark.read.parquet(wavePath.toString)
        .groupBy("split", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    // replay of an already-committed wave: idempotent no-op
    if (fs.exists(wavePath)) return storedManifest()
    val base: Map[String, Long] =
      try spark.read.parquet(outDir)
        // partition-dir inference types `shard` as INT on read-back
        .groupBy("split").agg(max(col("shard").cast("long")).as("m"))
        .collect().map(r => r.getString(0) -> (r.getLong(1) + 1L)).toMap
      catch { case _: org.apache.spark.sql.AnalysisException => Map() }
    val baseCol =
      if (base.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(base), col("split")), lit(0L))
    val assigned = trainingShardAssignment(spark, newDocs, idCol, textCol,
        epoch, budgetTokens)
      .withColumn("shard", col("shard") + baseCol)
    // stage the whole wave (waveId-scoped staging dir — a leftover from
    // a crashed attempt is simply overwritten), then ONE rename commits
    // it: a crash leaves either no wave or a complete wave, never a
    // partial one
    val stg = outDir.stripSuffix("/") + s"__wave_$waveId"
    assigned
      .repartition(col("split"), col("shard"))
      // writer-required ordering (partition columns first) — see
      // writeTrainingShards
      .sortWithinPartitions("split", "shard", "pos")
      .write.mode("overwrite")
      .partitionBy("split", "shard")
      .parquet(stg)
    fs.mkdirs(outPath)
    val stgPath = new org.apache.hadoop.fs.Path(stg)
    if (!fs.rename(stgPath, wavePath)) {
      // lost a race with a concurrent identical replay: its committed
      // wave is the same deterministic content — adopt it
      require(fs.exists(wavePath),
        s"failed to commit staged wave $stgPath to $wavePath")
      fs.delete(stgPath, true)
      return storedManifest()
    }
    assigned.groupBy("split", "shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
  }

  /** Observed write: attach pipeline-health metrics (row count, null-key
    * count, …) to a job with `df.observe` — they're computed DURING the
    * write, no second pass over the data — and return them. The batch
    * analogue of streaming query progress metrics; at 100 TB a validation
    * re-scan is a job of its own, this is free. */
  def observedWrite(df: DataFrame, dir: String,
                    metrics: (String, Column)*): Map[String, Any] = {
    val obs = org.apache.spark.sql.Observation()
    val first +: rest = metrics.map { case (n, c) => c.as(n) }.toSeq
    df.observe(obs, first, rest: _*)
      .write.mode("overwrite").parquet(dir)
    obs.get
  }

  /** Window-based variant for comparison/small data: row_number() − 1 over
    * a global order — simple, but the single unbounded partition caps
    * parallelism; prefer [[withDenseIds]] at scale. */
  def withDenseIdsWindow(df: DataFrame, orderCol: Column,
                         out: String = "label_id"): DataFrame =
    df.withColumn(out,
      row_number().over(Window.orderBy(orderCol.asc)).cast("long") - 1)

  /** Snapshot diff between two versions of a keyed collection — the
    * dataset-versioning primitive (what changed between crawl N and
    * crawl N+1): every key classified `added` / `removed` / `changed`
    * (or `unchanged`, off by default — at 100 TB the unchanged class is
    * ~the whole corpus and emitting it is a full rewrite).
    *
    * 100 TB shape: each side is reduced to (id, content digest) BEFORE
    * the full-outer join, so the shuffle carries 16 bytes/row instead
    * of document payloads, and the join is a plain co-partitioned
    * equi join — one exchange per side, no driver state. Content
    * equality is xxhash64 over the content columns serialized with
    * explicit field/null sentinels (Spark's multi-arg hash SKIPS null
    * arguments, which would make (null, "a") collide with ("a", null);
    * the sentinel encoding keeps null ≠ "null" ≠ absent). A 2⁻⁶⁴
    * digest collision misreports one changed row as unchanged — the
    * standard content-addressing trade, same as any dedup-by-hash. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   contentCols: Seq[String],
                   includeUnchanged: Boolean = false): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff needs ≥1 content column")
    classify(
      oldDf.select(col(idCol), digestColumn(contentCols).as("_oh"))
        .join(newDf.select(col(idCol), digestColumn(contentCols).as("_nh")),
          Seq(idCol), "full_outer"),
      idCol, includeUnchanged)
  }

  /** ONE digest serialization shared by [[snapshotDiff]], the persisted
    * digest table, and any STREAMING maintainer of it — a stored digest
    * computed by a different encoding than the fresh side would
    * misclassify every row. Public because it is the composition point:
    * the digest is a map-side deterministic function of the content
    * columns, so it composes directly onto a streaming source feeding
    * `Streams.upsertStreamBucketed` (the digest-table maintenance
    * lifecycle — StreamsSpec proves streamed state ≡ batch table). */
  def digestColumn(contentCols: Seq[String]): Column =
    // LENGTH-PREFIXED field framing — "<len>:<value>" per column, null
    // framed as "-:". A separator/sentinel scheme is ambiguous when a
    // value itself contains the separator character (("a\u0001b","c") and
    // ("a","b\u0001c") would digest identically, and a literal "\u0002"
    // value would collide with NULL — control characters are plausible
    // in web-crawl text); the length prefix pins every field boundary,
    // and "-" ≠ "0" keeps null ≠ "".
    //
    // FORMAT v2 (= [[digestFormatVersion]]). v1 (rounds ≤8) framed with
    // separator/sentinel characters; every v2 digest differs from its
    // v1 value, so a digest table persisted under v1 classifies EVERY
    // row as "changed" on its first v2 diff. [[writeDigestTable]]
    // stamps the version as a table property and
    // [[snapshotDiffAgainstDigestTable]] refuses a table without the
    // current stamp — rebuild stale stores with writeDigestTable
    // instead of trusting a one-time all-changed diff. Streaming
    // maintainers (Streams.upsertStreamBucketed digest lifecycles) keep
    // digests as plain columns in their own stores; on a framing
    // upgrade those stores must be rebuilt the same way.
    xxhash64(concat(contentCols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(coalesce(length(s).cast("string"), lit("-")), lit(":"),
        coalesce(s, lit("")))
    }: _*))

  private def classify(joined: DataFrame, idCol: String,
                       includeUnchanged: Boolean): DataFrame = {
    val tagged = joined.withColumn("change",
      when(col("_oh").isNull, lit("added"))
        .when(col("_nh").isNull, lit("removed"))
        .when(col("_oh") === col("_nh"), lit("unchanged"))
        .otherwise(lit("changed")))
    (if (includeUnchanged) tagged
     else tagged.filter(col("change") =!= "unchanged"))
      .select(col(idCol), col("change"))
  }

  /** Persist the previous snapshot as an (id, digest) table BUCKETED and
    * sorted by the id — the recurring-ingest layout: the stored corpus
    * is digested ONCE at write time, and every later
    * [[snapshotDiffAgainstDigestTable]] reads its buckets in place. The
    * digest table is ~16 bytes/row — at 100 TB of documents it is
    * tens of GB, not the corpus. */
  /** The digest framing version [[digestColumn]] currently computes.
    * Stamped into every [[writeDigestTable]] store and checked by
    * [[snapshotDiffAgainstDigestTable]] so a framing upgrade can never
    * silently mis-diff a stale store. */
  val digestFormatVersion = "2"

  def writeDigestTable(df: DataFrame, idCol: String,
                       contentCols: Seq[String], table: String,
                       buckets: Int = 32): Unit = {
    require(contentCols.nonEmpty, "digest table needs ≥1 content column")
    df.select(col(idCol), digestColumn(contentCols).as("digest"))
      .write.mode("overwrite")
      .bucketBy(buckets, idCol).sortBy(idCol)
      .saveAsTable(table)
    // version stamp — see the FORMAT note on digestColumn
    df.sparkSession.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
      s"('graft.digest.format' = '$digestFormatVersion')")
  }

  /** [[snapshotDiff]] served against a persisted digest table: the
    * stored side's bucketed scan already provides the id hash
    * distribution the full-outer join needs, so the only exchange the
    * stored side ever sees is NONE — the recurring form never re-reads,
    * re-shuffles, or re-digests old payloads; only the NEW snapshot is
    * digested and shuffled. Output is IDENTICAL to the one-shot
    * operator over the same two snapshots (PlanSpec-asserted). */
  def snapshotDiffAgainstDigestTable(spark: SparkSession, table: String,
                                     newDf: DataFrame, idCol: String,
                                     contentCols: Seq[String],
                                     includeUnchanged: Boolean = false)
      : DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff needs ≥1 content column")
    // refuse a store written under an older digest framing (every row
    // would misclassify as "changed") — rebuild with writeDigestTable
    val stamp = spark.sql(s"SHOW TBLPROPERTIES $table")
      .filter(col("key") === "graft.digest.format")
      .collect().headOption.map(_.getString(1))
    require(stamp.contains(digestFormatVersion),
      s"digest table $table has format ${stamp.getOrElse("<unstamped>")}" +
        s" but this build computes v$digestFormatVersion — rebuild the" +
        " store with writeDigestTable (see digestColumn's FORMAT note)")
    classify(
      spark.table(table).select(col(idCol), col("digest").as("_oh"))
        .join(newDf.select(col(idCol), digestColumn(contentCols).as("_nh")),
          Seq(idCol), "full_outer"),
      idCol, includeUnchanged)
  }
}
