package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators — the incremental face of the engine.
  *
  * The reference is batch-only (SURVEY.md §2.7: no streams), but its
  * lifecycle — "new records arrive, re-embed, upsert into the index"
  * (`vector_db.py:81-107` rebuilds on change) — is exactly a streaming
  * ingest problem at scale. These operators re-express that plus the
  * LLM-pipeline extensions as `readStream → transform → writeStream`:
  *
  *  - event-time windowed aggregation with watermarks (late data bounded,
  *    state pruned — the 100 TB requirement: state size is O(open windows),
  *    never O(stream length));
  *  - gap-based sessionization via the built-in `session_window` (preferred:
  *    Catalyst owns state merging) and via `flatMapGroupsWithState` (the
  *    custom-state escape hatch, with event-time timeout);
  *  - streaming exact-dedup on a content digest within a watermark —
  *    the incremental form of [[graft.operators.Dedup.exactDedup]];
  *  - incremental collection build: file-source stream → doc transform →
  *    embedding → append parquet sink with checkpointing (the streaming
  *    form of the reference's batch upsert loop, `vector_db.py:144-180`,
  *    with exactly-once file-sink semantics replacing its per-batch
  *    skip-and-continue error handling).
  */
object Streams {

  // ---- windowed aggregation ------------------------------------------

  /** Tumbling event-time window stats per event_type. Append mode emits a
    * window once the watermark passes its end — deterministic, late rows
    * beyond `watermark` dropped. One shuffle on (window, event_type). */
  def windowedEventStats(events: DataFrame, tsCol: String = "ts",
                         watermark: String = "10 minutes",
                         windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessions via the built-in `session_window` — state merges
    * are handled by the engine; the watermark closes (and prunes) sessions
    * once no event can extend them. */
  def sessionWindows(events: DataFrame, tsCol: String = "ts",
                     gap: String = "30 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  // ---- streaming dedup ------------------------------------------------

  /** Streaming exact-dedup: first occurrence of each content digest within
    * the watermark horizon passes; replays/duplicates are dropped. State =
    * one digest per distinct doc inside the horizon (bounded, pruned). */
  def dedupStream(docs: DataFrame, textCol: String = "text",
                  tsCol: String = "ts",
                  watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming percolation (the alerting shape — stored queries match
    * INCOMING docs): [[graft.operators.Percolate.matches]] applied to
    * each micro-batch — STATELESS per batch (matching is per-doc, no
    * cross-batch state), so it runs in foreachBatch with the
    * batch_id-partitioned replay-idempotent output of the other
    * append sinks; streamed matches over any prefix equal the batch
    * operator over the same docs (StreamsSpec). The query registry is
    * re-read per batch, so registered queries can change mid-stream
    * (the enrichWithDim slowly-changing rule). */
  def percolateStream(spark: SparkSession, docs: DataFrame,
                      queries: DataFrame, outDir: String,
                      checkpointDir: String, idCol: String = "doc_id",
                      textCol: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Percolate.matches(batch, col(idCol),
              col(textCol), queries)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
        }
        ()
      }
      .start()

  // ---- streaming joins ------------------------------------------------

  /** Stream-static enrichment: per-micro-batch broadcast hash join against
    * a dimension table — stateless on the stream side; the dim is re-read
    * per batch, so slowly-changing dimensions stay current. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left_outer")

  /** Stream-stream interval join (click attribution shape): pair each
    * impression with clicks by the same user within `horizon` AFTER it.
    * Watermarks on BOTH sides + the interval condition bound the join
    * state — Spark drops an impression's state once no future click can
    * match it. Column contract: impressions(imp_user, imp_id, imp_ts),
    * clicks(click_user, click_id, click_ts). */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
                       horizon: String = "10 minutes",
                       watermark: String = "10 minutes"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", watermark)
    val clk = clicks.withWatermark("click_ts", watermark)
    imp.join(clk, expr(
      s"""imp_user = click_user AND
         |click_ts >= imp_ts AND
         |click_ts <= imp_ts + interval $horizon""".stripMargin))
      .select(col("imp_user").as("user_id"), col("imp_id"), col("click_id"),
        col("imp_ts"), col("click_ts"))
  }

  /** Stream-stream LEFT SEMI join: impressions that HAVE a matching click
    * within `horizon`, emitted without click columns (the streaming form
    * of a correlated EXISTS). Same watermark + interval bounds as
    * [[clickAttribution]], so join state stays O(horizon), and each
    * impression is emitted at most once regardless of click count —
    * no output inflation on hot keys. */
  def existsWithin(impressions: DataFrame, clicks: DataFrame,
                   horizon: String = "10 minutes",
                   watermark: String = "10 minutes"): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", watermark)
    val clk = clicks.withWatermark("click_ts", watermark)
    imp.join(clk, expr(
      s"""imp_user = click_user AND
         |click_ts >= imp_ts AND
         |click_ts <= imp_ts + interval $horizon""".stripMargin), "left_semi")
  }

  /** Point the session's streaming state at the RocksDB provider: state
    * lives off-heap in a local RocksDB per partition (changelog/snapshot
    * checkpointed), so state size is bounded by local disk instead of
    * executor heap — the 100 TB requirement for big joins/dedup maps.
    * Read by each query at START; set before `.start()`. */
  def useRocksDbStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  // ---- streaming near-dedup ------------------------------------------

  case class SimDoc(doc_id: Long, sim: Long, ts: Timestamp)
  case class SimBucketState(sigs: List[(Long, Long)]) // (simhash, tsMillis)

  /** Streaming NEAR-dedup: the incremental form of the SimHash batch
    * family — first doc of each near-dup cluster passes, later docs
    * whose 16-bit SimHash is within `maxHamming` of a signature seen in
    * the same bucket inside the horizon are dropped.
    *
    * Bucketing: top-4 SimHash bits (16 groups) — near-dups that differ
    * in the top bits are missed (approximate, like any banding scheme);
    * state per bucket is the signature list inside the watermark
    * horizon, pruned on every invocation and expired by event-time
    * timeout — bounded by horizon × arrival rate, never O(stream).
    * Deterministic: micro-batch rows are folded in (ts, doc_id) order. */
  def nearDedupStream(spark: SparkSession, docs: DataFrame,
                      textCol: String = "text", tsCol: String = "ts",
                      watermark: String = "10 minutes",
                      horizonMs: Long = 10L * 60 * 1000,
                      maxHamming: Int = 3): Dataset[SimDoc] = {
    import spark.implicits._
    docs
      .withColumn("sim", graft.operators.Dedup.simhash16(col(textCol)))
      .select(col("doc_id"), col("sim"), col(tsCol).as("ts"))
      .as[SimDoc]
      .withWatermark("ts", watermark)
      .groupByKey(_.sim >> 12)
      .flatMapGroupsWithState[SimBucketState, SimDoc](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[SimDoc],
         state: GroupState[SimBucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var sigs = state.getOption.map(_.sigs).getOrElse(Nil)
            val kept = List.newBuilder[SimDoc]
            rows.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              val dup = sigs.exists { case (s, _) =>
                java.lang.Long.bitCount(s ^ d.sim) <= maxHamming }
              if (!dup) { kept += d; sigs = (d.sim, d.ts.getTime) :: sigs }
            }
            sigs = sigs.filter(_._2 >= state.getCurrentWatermarkMs())
            if (sigs.nonEmpty) {
              state.update(SimBucketState(sigs))
              state.setTimeoutTimestamp(sigs.map(_._2).max + horizonMs)
            } else state.remove()
            kept.result().iterator
          }
      }
  }

  // ---- custom-state sessionization -----------------------------------

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, start_sec: Long, end_sec: Long,
                     n_events: Long)

  /** Sessionization with explicit state — the `flatMapGroupsWithState`
    * pattern for semantics `session_window` can't express (per-session
    * custom accumulators, mid-session emission, cross-session features).
    * Event-time timeout closes a session once the watermark passes
    * last-event + gap. State per key is O(1). */
  def sessionizeCustom(spark: SparkSession, events: Dataset[Event],
                       gapMs: Long = 30L * 60 * 1000,
                       watermark: String = "10 minutes"): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start / 1000, s.last / 1000, s.n))
          } else {
            // fold this micro-batch's events (in event-time order) into
            // sessions; emit every closed session, keep the open one
            val sorted = rows.map(_.ts.getTime).toSeq.sorted
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
                case Some(s) =>
                  closed += Session(userId, s.start / 1000, s.last / 1000, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming upsert-by-key into a persisted collection: the canonical
    * `foreachBatch` merge pattern. Each micro-batch replaces same-key rows
    * and appends new ones (via [[graft.sources.HrPipeline.upsertByKey]]);
    * the rewrite goes through a temp-dir swap so a failed batch never
    * corrupts the index. NOTE the rewrite is O(index) per batch — use
    * [[upsertStreamBucketed]] once the index outgrows a per-batch
    * rewrite, or MERGE INTO on a transactional table format. */
  def upsertStream(spark: SparkSession, src: DataFrame, indexDir: String,
                   checkpointDir: String, key: String = "doc_id",
                   deleteCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        import org.apache.hadoop.fs.Path
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val base = indexDir.stripSuffix("/")
        val target = new Path(base)
        val tmp = new Path(base + "__upserting")
        val old = new Path(base + "__old")
        // crash recovery: a previous batch that died between the two swap
        // renames left the index aside at __old — restore it before merging
        if (!fs.exists(target) && fs.exists(old)) renameOrThrow(fs, old, target)
        val deduped = batch.dropDuplicates(key) // last-write-wins per batch
          .withColumn("_del", tombstoneFlag(deleteCol))
        val ups = deduped.filter(!col("_del"))
          .drop("_del").drop(deleteCol.toSeq: _*)
        // "first batch" ONLY when the index genuinely doesn't exist; any
        // other read failure (transient FS error, corrupt footer) must fail
        // the batch — a catch-all here would silently overwrite the whole
        // persisted collection with one micro-batch. Anti side = ALL
        // batch keys (upserts AND tombstones — the per-id delete
        // lifecycle, vector_db.py:99); union side = upserts only.
        val merged =
          if (fs.exists(target))
            spark.read.parquet(indexDir)
              .join(deduped.select(col(key).as("_bk")),
                col(key) === col("_bk"), "left_anti")
              .unionByName(ups)
          else ups
        // the write below lazily READS target, so it must complete before
        // the swap touches target
        merged.write.mode("overwrite").parquet(tmp.toString)
        // rename-aside swap (target → __old, tmp → target, drop __old):
        // the no-index window is one rename, not a full delete + rename
        if (fs.exists(old)) fs.delete(old, true)
        if (fs.exists(target)) renameOrThrow(fs, target, old)
        renameOrThrow(fs, tmp, target)
        fs.delete(old, true)
        ()
      }
      .start()

  /** Streaming chunker: the real ingest order is chunk → dedup → index,
    * and this is its first stage — documents arrive on a stream,
    * re-deliveries are dropped by WATERMARK-BOUNDED streaming dedup
    * (`withWatermark` + `dropDuplicates` on (id, ts): Spark keeps dedup
    * state only until the watermark passes the row's event time, so
    * state is O(docs per horizon), not O(corpus) — the property that
    * matters when the stream runs for months), then each micro-batch
    * chunks map-side ([[graft.operators.Chunk.chunkByTokens]] — a pure
    * generator, no shuffle) and lands in the chunk store.
    *
    * Each chunk carries a content digest so the downstream stages
    * compose directly: `digest` feeds exact dedup / [[nearDedupStreamLsh]]
    * and the chunk store is the input of [[upsertStreamBucketed]] /
    * [[ivfUpsertStream]] indexing.
    *
    * Idempotent under micro-batch REPLAY (crash between output write and
    * checkpoint commit): each batch writes its own `batch_id` partition
    * with dynamic partition overwrite, so the replay overwrites its own
    * output instead of appending twice (StreamsSpec pre-seeds the
    * partition to prove it). */
  def chunkStream(spark: SparkSession, docs: DataFrame, outDir: String,
                  checkpointDir: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  tsCol: String = "ts", chunkTokens: Int = 64,
                  stride: Int = 32, watermarkDelay: String = "10 minutes")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(Seq(idCol, tsCol))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Chunk
            .chunkByTokens(batch, col(idCol), col(textCol),
              chunkTokens, stride)
            .withColumn("digest", md5(col("chunk_text")))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
        }
        ()
      }
      .start()

  // ---- streaming quality-bucket assignment ----------------------------

  /** Persist the corpus-global quality statistics that
    * [[qualityBucketStream]] reads: the unigram probability table
    * (`$statsDir/probs`: term, p) and the per-language sampled tercile
    * thresholds (`$statsDir/cuts`: lang, head_min, mid_min). Rebuilt on
    * the periodic-recompute cadence (the digest/band-table lifecycle);
    * between rebuilds, new documents score and bucket against these
    * stored stats with ZERO corpus-global work. */
  def writeQualityStats(spark: SparkSession, docs: DataFrame,
      statsDir: String, idCol: String = "doc_id",
      textCol: String = "text", langCol: String = "lang",
      rate: Double = 0.25): Unit = {
    import graft.operators.LmScore
    val probs = LmScore.unigramProbs(docs, col(idCol), col(textCol))
    probs.write.mode("overwrite").parquet(s"$statsDir/probs")
    val stored = spark.read.parquet(s"$statsDir/probs")
    val scored = LmScore
      .lmScoreWith(docs, col(idCol), col(textCol), stored)
      .join(docs.select(col(idCol).as("doc_id"),
        coalesce(col(langCol), lit("und")).as("lang")), "doc_id")
    LmScore.tercileCuts(scored, rate)
      .write.mode("overwrite").parquet(s"$statsDir/cuts")
  }

  /** Streaming quality-bucket assignment — the incremental form of
    * [[graft.operators.LmScore.perplexityBucketsSampled]]: each
    * micro-batch of documents is LM-scored against the persisted
    * unigram table and bucketed with the persisted per-language
    * thresholds ([[writeQualityStats]]). All corpus-global state lives
    * in those two stored tables — the stream itself does one
    * vocabulary join and a broadcast threshold compare per batch, so a
    * batch's cost is sized by the batch, never the corpus.
    *
    * Replay-idempotent via the chunkStream pattern: each batch writes
    * its own `batch_id` partition with dynamic overwrite, so a
    * crash-replayed batch overwrites its own output. Stats tables are
    * read INSIDE foreachBatch — a stats rebuild between micro-batches
    * is picked up without restarting the stream. */
  def qualityBucketStream(spark: SparkSession, docs: DataFrame,
      statsDir: String, outDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      langCol: String = "lang", tsCol: String = "ts",
      watermarkDelay: String = "10 minutes")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(Seq(idCol, tsCol))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.LmScore
          val probs = spark.read.parquet(s"$statsDir/probs")
          val cuts = spark.read.parquet(s"$statsDir/cuts")
          val scored = LmScore
            .lmScoreWith(batch.toDF(), col(idCol), col(textCol), probs)
            .join(batch.select(col(idCol).as("doc_id"),
              coalesce(col(langCol), lit("und")).as("lang")), "doc_id")
          LmScore.assignBuckets(scored, cuts)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
        }
        ()
      }
      .start()

  // ---- streaming training-shard export --------------------------------

  /** Streaming shard export — the foreachBatch form of
    * [[graft.sources.Maintenance.appendTrainingShards]] with
    * replay-idempotent output: shard ids are scoped PER MICRO-BATCH and
    * written under a `batch_id=<b>` partition with dynamic overwrite
    * (the chunkStream pattern), so a crash-replayed batch overwrites
    * its own wave instead of appending duplicates — the shard key a
    * trainer consumes is (batch_id, split, shard). The batch-cadence
    * append form (globally consecutive shard ids, staged move) is the
    * Maintenance method; this is the always-on form. */
  def shardStream(spark: SparkSession, docs: DataFrame, outDir: String,
                  checkpointDir: String, idCol: String = "doc_id",
                  textCol: String = "text", tsCol: String = "ts",
                  watermarkDelay: String = "10 minutes", epoch: Int = 0,
                  budgetTokens: Long = 100000L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(Seq(idCol, tsCol))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.sources.Maintenance
            .trainingShardAssignment(spark, batch.toDF(), col(idCol),
              col(textCol), epoch, budgetTokens)
            .withColumn("batch_id", lit(batchId))
            .repartition(col("split"), col("shard"))
            // sort by the writer's REQUIRED ordering (partition columns
            // first): an ordering that doesn't start with the partition
            // columns makes the dynamic-partition writer insert its own
            // (not-guaranteed-stable) sort, which could break the
            // one-pos-ordered-file-set-per-shard invariant
            .sortWithinPartitions("batch_id", "split", "shard", "pos")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id", "split", "shard")
            .parquet(outDir)
        }
        ()
      }
      .start()

  // ---- streaming Count-Min sketch maintenance -------------------------

  /** Streaming Count-Min sketch maintenance — approximate per-key
    * frequencies over an unbounded stream in fixed space, the
    * incremental form of [[graft.operators.Sketches.cmsCounters]].
    *
    * Counters are ADDITIVE, so the stream needs no read-modify-write
    * state: each micro-batch writes its own PARTIAL grid (≤ d·w rows)
    * into a `batch_id=<b>` partition with dynamic partition overwrite —
    * a crash-replayed batch overwrites its own partition and can never
    * double-count (the chunkStream idempotency pattern; it IS the
    * exactly-once answer for a counter, where upsert-style state would
    * need a transactional read-modify-write). The queryable grid is
    * merge-on-read ([[readCmsGrid]]); [[compactCms]] folds accumulated
    * partials back into one baseline partition. Append partials →
    * merge on read → compact is the lifecycle a production sketch
    * store runs. */
  def cmsStream(spark: SparkSession, keys: DataFrame, gridDir: String,
                checkpointDir: String, keyCol: String = "term",
                d: Int = 4, w: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery =
    keys.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Sketches.cmsCounters(batch, col(keyCol), d, w)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(gridDir)
        }
        ()
      }
      .start()

  /** Merge-on-read over the partial grids: one groupBy-sum over
    * ≤ d·w rows per partial. Runs crashed-compaction recovery first so
    * a reader never sees a half-swapped directory. */
  def readCmsGrid(spark: SparkSession, gridDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverDirSwap(fs, gridDir)
    spark.read.parquet(gridDir)
      .groupBy("cms_row", "cms_bucket")
      .agg(sum(col("cms_cnt")).as("cms_cnt"))
  }

  /** Fold every accumulated partial into ONE `batch_id=-1` baseline
    * partition (stream batch ids are non-negative, so the baseline can
    * never collide with a live batch) via the whole-dir rename-aside
    * swap with crash recovery. Run with the stream STOPPED — the same
    * exclusive-maintenance contract as `Maintenance.compact`. */
  def compactCms(spark: SparkSession, gridDir: String): Unit =
    compactPartials(spark, gridDir,
      _.groupBy("cms_row", "cms_bucket").agg(sum(col("cms_cnt")).as("cms_cnt")))

  /** Shared compaction for partial-partition sketch stores ([[compactCms]],
    * [[compactBloom]]): read live partials, `merge` them, write the
    * merged baseline as `batch_id=-1` to a tmp layout, whole-dir
    * rename-aside swap with crash recovery. One copy of the crash-window
    * sequence — a recovery fix lands everywhere at once. */
  private def compactPartials(spark: SparkSession, dir: String,
                              merge: DataFrame => DataFrame): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverDirSwap(fs, dir)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compacting")
    fs.delete(tmp, true)
    merge(spark.read.parquet(dir))
      .withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").parquet(tmp.toString)
    val live = new org.apache.hadoop.fs.Path(dir)
    val aside = new org.apache.hadoop.fs.Path(dir + "__old")
    fs.delete(aside, true)
    renameOrThrow(fs, live, aside)
    renameOrThrow(fs, tmp, live)
    fs.delete(aside, true)
  }

  /** Streaming DSIR marginal maintenance — the incremental form of
    * [[graft.operators.Dsir.bucketMarginals]], on [[cmsStream]]'s
    * append-partials lifecycle: the (bucket, ct, cr) histogram is
    * ADDITIVE (marginals of a union = bucket-wise sums of the parts),
    * so each micro-batch writes its own ≤ B-row partial into a
    * `batch_id` partition with dynamic overwrite — a crash-replayed
    * batch overwrites ITS OWN partition, totals stay exact. The stored
    * state is the exact histogram, never a derived score (the
    * decayed-counter rule: a stored derived value is stale the moment
    * it is written) — weights come at READ via
    * [[readDsirMarginals]] + [[graft.operators.Dsir.weightsAgainst]],
    * which is the serving shape: score ANY candidate corpus against
    * whatever the target/raw streams have accumulated so far. */
  def dsirStream(spark: SparkSession, docs: DataFrame, statsDir: String,
                 checkpointDir: String, idCol: String = "doc_id",
                 textCol: String = "text",
                 targetCol: String = "is_target", buckets: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Dsir.bucketMarginals(
              graft.operators.Dsir.profile(batch.toDF(), col(idCol),
                col(textCol), col(targetCol).cast("boolean"), buckets))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(statsDir)
        }
        ()
      }
      .start()

  /** Merge-on-read over the partial marginal histograms: one
    * groupBy-sum over ≤ B rows per partial. */
  def readDsirMarginals(spark: SparkSession, statsDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverDirSwap(fs, statsDir)
    if (!hasCommittedPartials(fs, statsDir)) {
      // serve-before-first-commit: the additive-marginals contract says
      // "no partials yet" is the zero histogram, not a schema-inference
      // crash
      import spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("bucket", "ct", "cr")
    }
    spark.read.parquet(statsDir)
      .groupBy("bucket")
      .agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr"))
  }

  /** Fold accumulated partials into one `batch_id=-1` baseline — the
    * [[compactCms]] contract (stream stopped, whole-dir swap). */
  def compactDsir(spark: SparkSession, statsDir: String): Unit =
    compactPartials(spark, statsDir,
      _.groupBy("bucket").agg(sum(col("ct")).as("ct"),
        sum(col("cr")).as("cr")))

  /** Streaming Kneser-Ney model maintenance — the incremental form of
    * [[graft.operators.LmScore.knBigramCountsOf]], on [[cmsStream]]'s
    * append-partials lifecycle: bigram counts are ADDITIVE (counts of a
    * union = pair-wise sums of the parts), so each micro-batch writes
    * its own bigram-vocabulary-sized partial into a `batch_id`
    * partition with dynamic overwrite — a crash-replayed batch
    * overwrites ITS OWN partition, totals stay exact. The stored state
    * is the exact count table, never a derived probability (the
    * decayed-counter rule — and every KN quantity (c(v), N1+(v·),
    * N1+(·w), N1+(··)) re-derives from the counts at read); scoring
    * comes at READ via [[readKnBigrams]] +
    * [[graft.operators.LmScore.lmScoreKnWith]] — score ANY candidate
    * batch under whatever the reference stream has accumulated. */
  def knStream(spark: SparkSession, docs: DataFrame, statsDir: String,
               checkpointDir: String, idCol: String = "doc_id",
               textCol: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.LmScore.knBigramCountsOf(batch.toDF(),
              col(idCol), col(textCol))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(statsDir)
        }
        ()
      }
      .start()

  /** Merge-on-read over the partial bigram counts: one groupBy-sum,
    * bigram-vocabulary-sized. */
  def readKnBigrams(spark: SparkSession, statsDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverDirSwap(fs, statsDir)
    if (!hasCommittedPartials(fs, statsDir)) {
      // serve-before-first-commit: additive counts start at the empty
      // table (lmScoreKnWith backs every token off to Pcont = 0), not
      // at Spark's 'unable to infer schema' parquet error
      import spark.implicits._
      return Seq.empty[(String, String, Long)].toDF("prev", "cur", "_bc")
    }
    spark.read.parquet(statsDir)
      .groupBy("prev", "cur")
      .agg(sum(col("_bc")).as("_bc"))
  }

  /** Fold accumulated partials into one `batch_id=-1` baseline — the
    * [[compactCms]] contract (stream stopped, whole-dir swap). */
  def compactKn(spark: SparkSession, statsDir: String): Unit =
    compactPartials(spark, statsDir,
      _.groupBy("prev", "cur").agg(sum(col("_bc")).as("_bc")))

  /** Streaming MODIFIED-Kneser-Ney model maintenance — [[knStream]]'s
    * lifecycle one order up: the stored state is the exact trigram
    * count table ([[graft.operators.LmScore.kn3TrigramCounts]], also
    * additive across batches); every mKN quantity — context totals,
    * continuation counts, count-of-counts, the D1/D2/D3+ discounts
    * themselves — re-derives from it at read
    * ([[readKn3Trigrams]] + [[graft.operators.LmScore.lmScoreKn3With]]),
    * so the discounts always reflect the FULL accumulated corpus, never
    * a stale batch's count-of-counts. */
  def kn3Stream(spark: SparkSession, docs: DataFrame, statsDir: String,
                checkpointDir: String, idCol: String = "doc_id",
                textCol: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.LmScore.kn3TrigramCountsOf(batch.toDF(),
              col(idCol), col(textCol))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(statsDir)
        }
        ()
      }
      .start()

  /** Merge-on-read over the partial trigram counts: one groupBy-sum,
    * trigram-vocabulary-sized; the additive zero element before the
    * first commit. */
  def readKn3Trigrams(spark: SparkSession, statsDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverDirSwap(fs, statsDir)
    if (!hasCommittedPartials(fs, statsDir)) {
      import spark.implicits._
      return Seq.empty[(String, String, String, Long)]
        .toDF("u", "v", "w", "_tc")
    }
    spark.read.parquet(statsDir)
      .groupBy("u", "v", "w")
      .agg(sum(col("_tc")).as("_tc"))
  }

  /** Fold accumulated trigram partials into one `batch_id=-1` baseline
    * — the [[compactCms]] contract (stream stopped, whole-dir swap). */
  def compactKn3(spark: SparkSession, statsDir: String): Unit =
    compactPartials(spark, statsDir,
      _.groupBy("u", "v", "w").agg(sum(col("_tc")).as("_tc")))

  /** Streaming BM25 corpus-statistics maintenance — the [[knStream]]
    * lifecycle for the FULL-TEXT retrieval leg: the stored state is
    * the exact (term → df) table plus total-token/doc-count scalars
    * ([[graft.operators.Bm25.statsPartial]]), all additive across
    * doc-disjoint append batches, so each micro-batch writes one
    * vocabulary-sized partial into a `batch_id` partition with dynamic
    * overwrite (exactly-once under replay) and a query NEVER
    * re-aggregates the corpus: [[readBm25Stats]] +
    * [[graft.operators.Bm25.scoresWith]] serve candidates under the
    * accumulated statistics, equal to batch [[graft.operators.Bm25.scores]]
    * over everything ingested (StreamsSpec-proven). */
  def bm25Stream(spark: SparkSession, docs: DataFrame, statsDir: String,
                 checkpointDir: String, idCol: String = "doc_id",
                 textCol: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Bm25.statsPartial(batch.toDF(),
              col(idCol), col(textCol))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(statsDir)
        }
        ()
      }
      .start()

  /** Merge-on-read over the partial BM25 statistics: one groupBy-sum
    * (vocabulary-sized), split into the `(term, df)` frame and the
    * 1-row `(avgdl, nd)` stats frame [[graft.operators.Bm25.scoresWith]]
    * takes. Before the first commit both frames are empty — serving
    * yields no scores (nothing ingested), not a schema error. */
  def readBm25Stats(spark: SparkSession, statsDir: String)
      : (DataFrame, DataFrame) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverDirSwap(fs, statsDir)
    if (!hasCommittedPartials(fs, statsDir)) {
      import spark.implicits._
      return (Seq.empty[(String, Long)].toDF("term", "df"),
        Seq.empty[(Double, Double)].toDF("avgdl", "nd"))
    }
    val merged = spark.read.parquet(statsDir)
      .groupBy("term")
      .agg(sum(col("_df")).as("_df"), sum(col("_dl")).as("_dl"),
        sum(col("_n")).as("_n"))
    val dfreq = merged.filter(col("term") =!= "")
      .select(col("term"), col("_df").as("df"))
    val stats = merged.filter(col("term") === "")
      .select(
        (col("_dl").cast("double") / col("_n").cast("double")).as("avgdl"),
        col("_n").cast("double").as("nd"))
    (dfreq, stats)
  }

  /** Fold accumulated statistics partials into one `batch_id=-1`
    * baseline — the [[compactCms]] contract (stream stopped, whole-dir
    * swap). */
  def compactBm25(spark: SparkSession, statsDir: String): Unit =
    compactPartials(spark, statsDir,
      _.groupBy("term").agg(sum(col("_df")).as("_df"),
        sum(col("_dl")).as("_dl"), sum(col("_n")).as("_n")))

  /** Streaming Bloom-filter maintenance — the incremental form of
    * [[graft.operators.BloomJoin.buildBits]], with [[cmsStream]]'s
    * append-partials lifecycle: bloom words OR-merge exactly as CMS
    * counters add, so each micro-batch writes its own partial word
    * relation (≤ m/64 rows) into a `batch_id` partition with dynamic
    * overwrite (replay overwrites its own partition; OR is idempotent
    * anyway, so bloom state is doubly safe). [[readBloomBits]] ORs the
    * partials into the query-side literal — a filter over keys ingested
    * ACROSS the whole stream, e.g. "prune this scan to ids ever seen on
    * the ingest stream". */
  def bloomStream(spark: SparkSession, keys: DataFrame, bitsDir: String,
                  checkpointDir: String, keyCol: String = "doc_id",
                  mBits: Int = 1 << 16, kHash: Int = 4)
      : org.apache.spark.sql.streaming.StreamingQuery =
    keys.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.BloomJoin.buildWords(batch, col(keyCol),
              mBits, kHash)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(bitsDir)
        }
        ()
      }
      .start()

  /** OR-merge the streamed bloom partials into the bitmap literal
    * (mBits/64 longs) for [[graft.operators.BloomJoin.membershipTest]].
    * Runs crashed-compaction recovery first. */
  def readBloomBits(spark: SparkSession, bitsDir: String,
                    mBits: Int): Array[Long] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverDirSwap(fs, bitsDir)
    graft.operators.BloomJoin.wordsToBits(
      spark.read.parquet(bitsDir)
        .groupBy("word").agg(expr("bit_or(bits)").as("bits"))
        .collect().map(r => (r.getInt(0), r.getLong(1))), mBits)
  }

  /** Fold streamed bloom partials into one `batch_id=-1` baseline
    * partition — [[compactCms]]'s contract (stream stopped) with an OR
    * merge instead of a sum. */
  def compactBloom(spark: SparkSession, bitsDir: String): Unit =
    compactPartials(spark, bitsDir,
      _.groupBy("word").agg(expr("bit_or(bits)").as("bits")))

  /** Streaming LINE-count maintenance — the incremental half of
    * [[graft.operators.Dedup.dedupLines]]'s boilerplate detection:
    * per-batch (h, nd) distinct-doc line counts land in `batch_id=<b>`
    * partitions with dynamic overwrite (the cmsStream exactly-once
    * pattern: a crash-replayed batch overwrites its own partition and
    * can never double-count). Distinct-doc counts are ADDITIVE across
    * batches because a document arrives WHOLE in one micro-batch — the
    * contract the upstream chunk/dedup stages already guarantee
    * ([[chunkStream]]'s watermark dedup); re-delivered docs must be
    * dropped there, not here. Query-side:
    * [[graft.operators.Dedup.dedupLinesAgainstCounts]] over
    * [[readLineCounts]] scrubs any batch under the whole stream's line
    * statistics — StreamsSpec proves streamed counts ≡ the batch
    * [[graft.operators.Dedup.lineDocCounts]] bit-equal after replay. */
  def lineCountStream(spark: SparkSession, docs: DataFrame,
                      countsDir: String, checkpointDir: String,
                      idCol: String = "doc_id", textCol: String = "text")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Dedup.lineDocCounts(
              graft.operators.Dedup.docLines(batch, col(idCol),
                col(textCol)))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(countsDir)
        }
        ()
      }
      .start()

  /** Merge-on-read over the partial line-count partitions: counts ADD
    * (see [[lineCountStream]]). Crash-recovery first, like the sketch
    * readers. */
  def readLineCounts(spark: SparkSession, countsDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverDirSwap(fs, countsDir)
    spark.read.parquet(countsDir)
      .groupBy("h").agg(sum(col("nd")).as("nd"))
  }

  /** Fold accumulated line-count partials into one baseline partition —
    * the same rename-aside lifecycle as [[compactCms]]. */
  def compactLineCounts(spark: SparkSession, countsDir: String): Unit =
    compactPartials(spark, countsDir,
      _.groupBy("h").agg(sum(col("nd")).as("nd")))

  /** Streaming day-bucketed event counters with DECAY AT READ — the
    * additive-state lifecycle ([[cmsStream]]/[[lineCountStream]]:
    * per-batch partial partitions, a replayed batch overwrites its own
    * partition, merge on read) applied to the q_decayed_count trending
    * signal. The STORED state is the exact (event_type, day, n)
    * histogram: decay is a pure function of (histogram, now), so
    * [[decayedFromDayCounts]] applies the integer-scaled dyadic math
    * for ANY `now` and the state never needs rewriting as time
    * advances — a stored pre-decayed value would decay stale the
    * moment it was written. State size is types × days, bounded. */
  def dayCountStream(spark: SparkSession, events: DataFrame,
                     countsDir: String, checkpointDir: String,
                     tsCol: String = "ts",
                     typeCol: String = "event_type")
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        if (!batch.isEmpty) {
          batch.select(col(typeCol).as("event_type"),
              expr(s"unix_micros($tsCol) div 86400000000").as("day"))
            .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(countsDir)
        }
        ()
      }
      .start()

  /** Merge-on-read over the partial day-count partitions (counts ADD).
    * Crash-recovery first, like the sketch readers. */
  def readDayCounts(spark: SparkSession, countsDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    recoverDirSwap(fs, countsDir)
    spark.read.parquet(countsDir)
      .groupBy("event_type", "day").agg(sum(col("n")).as("n"))
  }

  /** Fold accumulated day-count partials into one baseline partition —
    * the [[compactCms]] rename-aside lifecycle. */
  def compactDayCounts(spark: SparkSession, countsDir: String): Unit =
    compactPartials(spark, countsDir,
      _.groupBy("event_type", "day").agg(sum(col("n")).as("n")))

  /** Decay-at-read over a (event_type, day, n) histogram: half-life one
    * day, weights n·2^(50−age) summed in integer space (the
    * q_decayed_count arithmetic at day granularity), one exact
    * integer→double cast + /2^50 shift. */
  def decayedFromDayCounts(counts: DataFrame, nowDay: Long): DataFrame =
    counts
      // clamp from BELOW too: a stored day later than the caller's nowDay
      // (stale 'now', clock skew) would make age_d negative, the shift
      // amount exceed 63, and shiftleft silently wrap mod 64 — clamping
      // to 0 treats future days as "today" instead of producing garbage
      .withColumn("age_d",
        greatest(lit(0L), least(lit(nowDay) - col("day"), lit(50L))))
      .withColumn("w",
        expr("shiftleft(1L, cast(50 - age_d AS int))").cast("decimal(38,0)")
          * col("n").cast("decimal(38,0)"))
      .groupBy("event_type")
      .agg((sum(col("w")).cast("double") / lit(1125899906842624.0))
        .as("decayed_count"), sum(col("n")).as("n"))

  // ---- hash-bucketed state-dir machinery (shared by the bucketed
  // upsert and the LSH dedup state table) ------------------------------

  /** `fs.rename` reports failure by RETURNING FALSE on HDFS and most
    * object stores (no exception) — an unchecked rename inside a swap
    * sequence would fall through to the aside-dir delete and silently
    * lose the bucket (or on retrain, the whole index). Every swap /
    * recovery rename goes through here: on `false` we throw, the
    * micro-batch fails un-committed, the aside dir stays in place, and
    * `recoverAsideBuckets`/`recoverDirSwap` restores it on restart. */
  private[graft] def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new java.io.IOException(
        s"rename failed: $src -> $dst (source left in place; " +
        "crash recovery will restore any aside dir on restart)")

  private[streaming] def bucketPath(base: String, b: Int,
      part: String = "bucket") =
    new org.apache.hadoop.fs.Path(s"$base/$part=$b")
  private[streaming] def asidePath(base: String, b: Int,
      part: String = "bucket") =
    new org.apache.hadoop.fs.Path(s"$base/.${part}_${b}_old") // hidden
  private[streaming] def pendingShardPath(base: String, s: Int) =
    new org.apache.hadoop.fs.Path(s"$base/.shard_${s}_pending") // hidden
  private[streaming] def mergePendingPath(base: String, s: Int) =
    new org.apache.hadoop.fs.Path(s"$base/.shard_${s}_mergepending")
  private[streaming] def mergeDropPath(base: String, s: Int) =
    new org.apache.hadoop.fs.Path(s"$base/.shard_${s}_mergedrop")

  /** The parent a dir named `n ≥ numShards` was split from (the sibling
    * name determines its parent uniquely — the split-recovery rule). */
  private def shardParentOf(n: Int, numShards: Int): Int =
    n - (numShards <<
      (graft.operators.GraphAnn.minShardDepth(n, numShards) - 1))

  /** Crash recovery for the graph-shard MERGE protocol — the split
    * protocol reversed. A merge publishes in this order: fresh merged
    * parent parked hidden (`.shard_<p>_mergepending`), the two child
    * dirs hidden (`.shard_<n>_mergedrop`, high sibling first), then the
    * pending parent renamed onto `shard=<p>` (the COMMIT point), drops
    * deleted. Every crash window rolls back to the intact children or
    * forward to the merged parent; rows never vanish or duplicate:
    *   - pending + live `shard=<p>`: pre-commit — restore any hidden
    *     high sibling, delete the pending parent (rollback);
    *   - pending + `shard=<p>` missing: both children are hidden —
    *     commit the pending parent (roll forward);
    *   - leftover drops with no pending: post-commit cleanup. */
  private[streaming] def recoverShardMerges(
      fs: org.apache.hadoop.fs.FileSystem, base: String,
      numShards: Int): Unit = {
    val root = new org.apache.hadoop.fs.Path(base)
    if (!fs.exists(root)) return
    val pendPat = """\.shard_(\d+)_mergepending""".r
    val dropPat = """\.shard_(\d+)_mergedrop""".r
    val names = fs.listStatus(root).map(_.getPath.getName)
    val drops = names.collect { case dropPat(x) => x.toInt }.toSet
    names.foreach {
      case pendPat(pStr) =>
        val p = pStr.toInt
        if (fs.exists(bucketPath(base, p, part = "shard"))) {
          // pre-commit: the low child is still live — roll back
          drops.filter(x => x >= numShards && x != p &&
              shardParentOf(x, numShards) == p)
            .foreach { x =>
              if (!fs.exists(bucketPath(base, x, part = "shard")))
                renameOrThrow(fs, mergeDropPath(base, x),
                  bucketPath(base, x, part = "shard"))
              else fs.delete(mergeDropPath(base, x), true)
            }
          fs.delete(mergePendingPath(base, p), true)
        } else {
          // both children hidden: roll forward to the merged parent
          renameOrThrow(fs, mergePendingPath(base, p),
            bucketPath(base, p, part = "shard"))
        }
      case _ => ()
    }
    // post-commit leftovers (and drops stranded by the rollbacks above)
    fs.listStatus(root).map(_.getPath.getName).foreach {
      case dropPat(xStr) =>
        val x = xStr.toInt
        val live = fs.exists(bucketPath(base, x, part = "shard"))
        val parentLive = x >= numShards &&
          fs.exists(bucketPath(base, shardParentOf(x, numShards),
            part = "shard")) &&
          !fs.exists(mergePendingPath(base, shardParentOf(x, numShards)))
        if (live || parentLive) fs.delete(mergeDropPath(base, x), true)
      case _ => ()
    }
  }

  /** Crash recovery for the graph-shard SPLIT protocol. A split moves
    * rows ACROSS dirs, so the plain per-dir aside swap is not enough —
    * a crash after the parent was replaced by child-n-only content but
    * before the sibling landed would lose the sibling half. The live
    * protocol therefore parks the sibling at a HIDDEN `_pending` path
    * first and makes the parent swap the commit point; every crash
    * window is then decidable from dir EXISTENCE alone:
    *
    *   pending + parent dir + NO aside  → split never began its swap:
    *     roll BACK (drop the pending sibling; parent intact).
    *   pending + aside + NO parent dir  → swap began, not committed:
    *     roll BACK (drop pending; [[recoverAsideBuckets]] restores the
    *     parent from its aside).
    *   pending + aside + parent dir     → committed (the parent dir
    *     holds child-n content): roll FORWARD (promote the pending
    *     sibling, drop the old-parent aside).
    *
    * Idempotent — a crash during recovery re-decides from the same
    * checks. Must run BEFORE [[recoverAsideBuckets]] (the roll-forward
    * case must consume its aside before the generic pass could restore
    * it over the committed child). */
  private[streaming] def recoverShardSplits(
      fs: org.apache.hadoop.fs.FileSystem, base: String,
      numShards: Int): Unit = {
    val root = new org.apache.hadoop.fs.Path(base)
    if (!fs.exists(root)) return
    val pat = """\.shard_(\d+)_pending""".r
    fs.listStatus(root).map(_.getPath.getName).foreach {
      case pat(sStr) =>
        val s = sStr.toInt
        val pending = pendingShardPath(base, s)
        if (s < numShards) fs.delete(pending, true) // never a sibling name
        else {
          val p = s - (numShards <<
            (graft.operators.GraphAnn.minShardDepth(s, numShards) - 1))
          val parentDir = bucketPath(base, p, part = "shard")
          val aside = asidePath(base, p, part = "shard")
          if (fs.exists(aside) && fs.exists(parentDir)) {
            // post-commit: promote the sibling, drop the old parent
            if (!fs.exists(bucketPath(base, s, part = "shard")))
              renameOrThrow(fs, pending, bucketPath(base, s, part = "shard"))
            else fs.delete(pending, true)
            fs.delete(aside, true)
          } else {
            // pre-commit: drop the sibling; the parent is intact at its
            // dir or comes back via recoverAsideBuckets
            fs.delete(pending, true)
          }
        }
      case _ => ()
    }
  }

  /** Crash recovery: restore EVERY partition dir a died swap left aside —
    * not just ones the current batch touches. A swap that died between
    * rename(dir→aside) and rename(fresh→dir) on an untouched partition
    * would otherwise stay invisible to reads indefinitely. */
  private[streaming] def recoverAsideBuckets(
      fs: org.apache.hadoop.fs.FileSystem, base: String,
      part: String = "bucket"): Unit = {
    val root = new org.apache.hadoop.fs.Path(base)
    if (fs.exists(root)) {
      val asidePat = ("""\.""" + part + """_(\d+)_old""").r
      fs.listStatus(root).map(_.getPath.getName).foreach {
        case asidePat(b) =>
          val bi = b.toInt
          if (!fs.exists(bucketPath(base, bi, part)))
            renameOrThrow(fs, asidePath(base, bi, part), bucketPath(base, bi, part))
        case _ => ()
      }
    }
  }

  /** Crash recovery for a WHOLE-directory swap (the retrain path's
    * `<dir>__old` aside): if the live dir is missing but the aside
    * exists, restore it — the crash loses the rebuilt copy (re-derived
    * on the next trigger), never the index itself. */
  /** True iff `dir` holds at least one committed `batch_id=` partition
    * — the partial-partition lifecycle's "has anything ever committed"
    * probe, so merge-on-read readers can return their additive zero
    * element instead of tripping parquet schema inference on an empty
    * or missing directory. */
  private[streaming] def hasCommittedPartials(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.startsWith("batch_id="))
  }

  private[streaming] def recoverDirSwap(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir)
    val aside = new org.apache.hadoop.fs.Path(dir + "__old")
    if (!fs.exists(live) && fs.exists(aside)) renameOrThrow(fs, aside, live)
  }

  /** Rename-aside swap of the touched `<part>=<v>` dirs from a freshly
    * written tmp layout; aside dirs are dot-prefixed so partition
    * discovery never sees a half-swapped state. Deletes `tmp` when done. */
  private[streaming] def swapBuckets(fs: org.apache.hadoop.fs.FileSystem,
      base: String, tmp: org.apache.hadoop.fs.Path, touched: Seq[Int],
      part: String = "bucket"): Unit = {
    if (!fs.exists(new org.apache.hadoop.fs.Path(base)))
      fs.mkdirs(new org.apache.hadoop.fs.Path(base))
    touched.foreach { b =>
      val fresh = new org.apache.hadoop.fs.Path(s"$tmp/$part=$b")
      if (fs.exists(asidePath(base, b, part)))
        fs.delete(asidePath(base, b, part), true)
      if (fs.exists(bucketPath(base, b, part)))
        renameOrThrow(fs, bucketPath(base, b, part), asidePath(base, b, part))
      if (fs.exists(fresh)) renameOrThrow(fs, fresh, bucketPath(base, b, part))
      fs.delete(asidePath(base, b, part), true)
    }
    fs.delete(tmp, true)
  }

  /** The tombstone predicate for the CDC-shaped ingest streams: when
    * `deleteCol` is set, rows whose boolean flag is true are DELETIONS —
    * only their key is consulted, the payload is ignored, and the flag
    * column never reaches storage. Null flags count as upserts. */
  private def tombstoneFlag(deleteCol: Option[String]): Column =
    deleteCol.map(c => coalesce(col(c).cast("boolean"), lit(false)))
      .getOrElse(lit(false))

  /** Bucketed incremental streaming upsert — the scale path past
    * [[upsertStream]]'s whole-index rewrite (O(index) per micro-batch).
    *
    * The index is laid out hash-bucketed by key (`bucket=<b>/` partition
    * directories, `b = pmod(hash(key), nBuckets)`). Each micro-batch:
    *   1. buckets its deduped rows and collects the touched bucket ids
    *      (≤ nBuckets ints on the driver);
    *   2. reads ONLY the touched bucket directories (partition pruning on
    *      the `bucket` column), drops every batch key's prior copy, and
    *      re-inserts the upsert rows ([[graft.sources.HrPipeline
    *      .upsertByKey]]'s anti-join-then-union, with the anti side
    *      widened to DELETE keys);
    *   3. rewrites and swaps ONLY the touched bucket dirs — untouched
    *      buckets' files are never read, rewritten, or moved
    *      (StreamsSpec asserts their names+mtimes survive a batch).
    * Per-batch cost is O(batch + touched-bucket data), not O(index); at
    * scale `nBuckets` is sized so a bucket ≈ a few HDFS blocks. The swap
    * is rename-aside per bucket with crash recovery; aside dirs are
    * dot-prefixed so partition discovery never sees a half-swapped state.
    * With a transactional table format this collapses to MERGE INTO.
    *
    * `deleteCol`: optional boolean tombstone flag — the per-id DELETE
    * lifecycle (the reference's whole-collection
    * `client.delete_collection`, `vector_db.py:99`, refined to row
    * granularity). A deletion touches exactly its key's bucket; a bucket
    * whose rows are all deleted disappears from the layout (the swap
    * finds no fresh dir and removes it). Replay-safe like upserts:
    * deleting an absent key is a no-op rewrite of its bucket. */
  def upsertStreamBucketed(spark: SparkSession, src: DataFrame,
                           indexDir: String, checkpointDir: String,
                           key: String = "doc_id", nBuckets: Int = 16,
                           deleteCol: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        import org.apache.hadoop.fs.Path
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val base = indexDir.stripSuffix("/")
        // last-write-wins per batch; a key is EITHER an upsert or a
        // tombstone after the dedup, never both
        val deduped = batch.dropDuplicates(key)
          .withColumn("_del", tombstoneFlag(deleteCol))
          .withColumn("bucket", pmod(hash(col(key)), lit(nBuckets)))
        val touched = deduped.select("bucket").distinct()
          .collect().map(_.getInt(0)).sorted.toIndexedSeq
        recoverAsideBuckets(fs, base)
        val ups = deduped.filter(!col("_del"))
          .drop("_del").drop(deleteCol.toSeq: _*)
        val existing = touched.filter(b => fs.exists(bucketPath(base, b)))
        val merged =
          if (existing.isEmpty) ups
          // upsertByKey's shape with the anti side = ALL batch keys
          // (upserts AND tombstones) and the union side = upserts only —
          // with no tombstones this IS upsertByKey
          else spark.read.parquet(base)
            .filter(col("bucket").isin(touched.map(Int.box): _*))
            .join(deduped.select(col(key).as("_bk")),
              col(key) === col("_bk"), "left_anti")
            .unionByName(ups)
        val tmp = new Path(base + "__upserting")
        fs.delete(tmp, true)
        // the write READS the touched buckets of target, so it must finish
        // before any swap touches them
        merged.write.mode("overwrite").partitionBy("bucket")
          .parquet(tmp.toString)
        swapBuckets(fs, base, tmp, touched)
        ()
      }
      .start()

  /** Streaming MinHash-LSH near-dedup — the banding the batch path uses
    * ([[graft.operators.Dedup.lshCandidatePairs]]), incremental. Catches
    * near-dups SimHash bucketing misses ([[nearDedupStream]] compares
    * only within one 16-bit fingerprint's neighborhood; MinHash banding
    * matches on ANY of `bands` signature slices).
    *
    * DESIGN NOTE — why foreachBatch, not flatMapGroupsWithState: the
    * per-band-group FMGWS formulation (doc exploded into its `bands`
    * groups, per-bucket state, then a per-doc distinct/aggregate to
    * combine band verdicts) is REJECTED by Spark's global-watermark
    * correctness check: `flatMapGroupsWithState` output feeding any
    * downstream stateful operator is a potential late-row-discard hazard
    * (verified empirically on 4.1 — ExtendedAnalysisException). The
    * cross-band combination therefore runs per micro-batch in
    * foreachBatch, with band-key state persisted in the same
    * hash-bucketed parquet layout as [[upsertStreamBucketed]]:
    *   - only buckets touched by the batch's band keys are read and
    *     swapped (partition pruning on `bucket`) — per-batch cost is
    *     O(batch + touched-bucket state), never O(stream);
    *   - state rows older than `horizonMs` before the batch max event
    *     time are pruned on rewrite (the watermark analogue);
    *   - aside-dir crash recovery identical to the upsert path.
    *
    * Semantics match the batch pair rule: a doc is a dup iff ANY of its
    * band keys was seen earlier — in persisted state or earlier in the
    * same batch by (ts, doc_id) order ("first occupant" of the bucket).
    * ALL docs mark state, dropped ones too, so chains close greedily
    * (A~B, B~C ⇒ C dropped even though A≁C — the connected-components
    * keep rule, incremental). Kept docs append to `outDir`. */
  def nearDedupStreamLsh(spark: SparkSession, docs: DataFrame,
                         outDir: String, stateDir: String,
                         checkpointDir: String,
                         idCol: String = "doc_id", textCol: String = "text",
                         tsCol: String = "ts", n: Int = 3,
                         numHashes: Int = 8, bands: Int = 4,
                         horizonMs: Long = 10L * 60 * 1000,
                         nBuckets: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rPerBand = numHashes / bands
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.hadoop.fs.Path
          val fs = org.apache.hadoop.fs.FileSystem.get(
            spark.sparkContext.hadoopConfiguration)
          val base = stateDir.stripSuffix("/")
          recoverAsideBuckets(fs, base)
          val keys = batch
            .select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
              graft.operators.Dedup.minhashFromHashes(
                graft.plans.HashedShingles.shingleHashes(col(textCol), n, 4),
                numHashes).as("sig"))
            .select(col("doc_id"), col("ts"),
              posexplode(graft.operators.Dedup.bandKeys(
                col("sig"), bands, rPerBand)).as(Seq("band_idx", "band_key")))
            .withColumn("bucket",
              pmod(hash(col("band_idx"), col("band_key")), lit(nBuckets)))
            .persist()
          val touched = keys.select("bucket").distinct()
            .collect().map(_.getInt(0)).sorted.toIndexedSeq
          // the horizon applies at READ time too: an expired key must not
          // influence the dup decision even if its physical prune (which
          // only happens when its bucket is next touched) hasn't run yet
          val maxTs = batch.agg(max(col(tsCol))).head().getTimestamp(0)
          // clamp at epoch: a horizon wider than the timeline means
          // "never expire", and the raw subtraction would overflow to a
          // huge negative ms value whose ms→µs conversion then overflows
          // LONG inside the comparison (found by the parity spec)
          val cutoff = new java.sql.Timestamp(
            if (horizonMs >= maxTs.getTime) 0L else maxTs.getTime - horizonMs)
          val prior: Option[DataFrame] =
            if (touched.exists(b => fs.exists(bucketPath(base, b))))
              Some(spark.read.parquet(base)
                .filter(col("bucket").isin(touched.map(Int.box): _*))
                .filter(col("ts") >= lit(cutoff)))
            else None
          val batchKeys =
            keys.select("band_idx", "band_key", "ts", "doc_id", "bucket")
          // dropDuplicates on the full key: on micro-batch REPLAY (crash
          // between state swap and checkpoint commit) `prior` already
          // contains this batch's band keys, and a plain union would write
          // duplicate state rows that compound across repeated replays in
          // hot buckets until horizon pruning. Dedup makes the replayed
          // state rewrite byte-identical; `firstOcc`'s min() is
          // duplicate-insensitive so the dup verdict is unchanged.
          val allKeys = prior
            .map(_.select("band_idx", "band_key", "ts", "doc_id", "bucket")
              .unionByName(batchKeys))
            .getOrElse(batchKeys)
            .dropDuplicates("band_idx", "band_key", "doc_id", "ts")
          // first occupant of each band bucket decides: later (ts, id)
          // arrivals sharing the key are dups (deterministic tiebreak)
          val firstOcc = allKeys.groupBy("band_idx", "band_key")
            .agg(min(struct(col("ts"), col("doc_id"))).as("occ"))
          val verdict = keys.join(firstOcc, Seq("band_idx", "band_key"))
            .groupBy("doc_id")
            .agg(max(struct(col("ts"), col("doc_id")) > col("occ")).as("dup"))
          val kept = batch.join(
            verdict.filter(!col("dup")).select(col("doc_id").as(idCol)),
            Seq(idCol), "left_semi")
          // idempotent under micro-batch REPLAY: a crash between output
          // write and checkpoint commit re-runs the batch, and a plain
          // append would emit the kept rows twice — writing each batch
          // into its own batch_id partition with dynamic partition
          // overwrite makes the replay overwrite its own output instead
          kept.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
          // state rewrite: touched buckets only, pruned to the horizon
          val tmp = new Path(base + "__upserting")
          fs.delete(tmp, true)
          allKeys.filter(col("ts") >= lit(cutoff))
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(tmp.toString)
          swapBuckets(fs, base, tmp, touched)
          keys.unpersist()
        }
        ()
      }
      .start()
  }

  /** Streaming pigeonhole-Hamming near-dedup — the EXACT-recall
    * incremental form of the simhash family ([[nearDedupStream]]'s
    * FMGWS formulation buckets on the top fingerprint bits and misses
    * Hamming diffs crossing them; here any pair within `maxHamming`
    * shares one of the maxHamming+1 pigeonhole blocks by construction,
    * so nothing inside the horizon is missed — the
    * [[graft.operators.Dedup.hammingPairs]] guarantee, incremental).
    *
    * Same foreachBatch + hash-bucketed parquet state lifecycle as
    * [[nearDedupStreamLsh]] (touched-bucket-only reads and swaps,
    * horizon pruning at read AND rewrite, aside-dir crash recovery,
    * replay-idempotent state and batch_id-partitioned output). The dup
    * verdict is PAIRWISE within a block bucket — exact
    * `bit_count(xor) <= maxHamming` against every state/earlier-batch
    * row sharing the block, ordered by (ts, doc_id) — not
    * first-occupant-of-bucket: two docs in one block bucket at Hamming
    * distance > maxHamming both survive. Dropped docs still mark
    * state (greedy chain closure, the LSH rule). */
  def nearDedupStreamHamming(spark: SparkSession, docs: DataFrame,
                             outDir: String, stateDir: String,
                             checkpointDir: String,
                             idCol: String = "doc_id",
                             textCol: String = "text",
                             tsCol: String = "ts", bits: Int = 16,
                             maxHamming: Int = 2,
                             horizonMs: Long = 10L * 60 * 1000,
                             nBuckets: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.hadoop.fs.Path
          val fs = org.apache.hadoop.fs.FileSystem.get(
            spark.sparkContext.hadoopConfiguration)
          val base = stateDir.stripSuffix("/")
          recoverAsideBuckets(fs, base)
          val keys = batch
            .select(col(idCol).as("doc_id"), col(tsCol).as("ts"),
              graft.operators.Dedup.simhash16(col(textCol)).as("fp"))
            .select(col("doc_id"), col("ts"), col("fp"),
              posexplode(graft.operators.Dedup.blockVals(col("fp"), bits,
                maxHamming)).as(Seq("bi", "bv")))
            .withColumn("bucket",
              pmod(hash(col("bi"), col("bv")), lit(nBuckets)))
            .persist()
          val touched = keys.select("bucket").distinct()
            .collect().map(_.getInt(0)).sorted.toIndexedSeq
          val maxTs = batch.agg(max(col(tsCol))).head().getTimestamp(0)
          val cutoff = new java.sql.Timestamp(
            if (horizonMs >= maxTs.getTime) 0L else maxTs.getTime - horizonMs)
          val prior: Option[DataFrame] =
            if (touched.exists(b => fs.exists(bucketPath(base, b))))
              Some(spark.read.parquet(base)
                .filter(col("bucket").isin(touched.map(Int.box): _*))
                .filter(col("ts") >= lit(cutoff)))
            else None
          val batchKeys =
            keys.select("bi", "bv", "fp", "ts", "doc_id", "bucket")
          val allKeys = prior
            .map(_.select("bi", "bv", "fp", "ts", "doc_id", "bucket")
              .unionByName(batchKeys))
            .getOrElse(batchKeys)
            .dropDuplicates("bi", "bv", "doc_id", "ts")
          // pairwise verdict: a batch doc is a dup iff some state or
          // earlier-(ts, id) row shares a block AND is within maxHamming
          val dups = keys.as("k")
            .join(allKeys.as("s"),
              col("k.bi") === col("s.bi") && col("k.bv") === col("s.bv"))
            .filter(bit_count(col("k.fp").bitwiseXOR(col("s.fp")))
              <= maxHamming)
            .filter(struct(col("s.ts"), col("s.doc_id")) <
              struct(col("k.ts"), col("k.doc_id")))
            .select(col("k.doc_id").as(idCol)).distinct()
          val kept = batch.join(dups, Seq(idCol), "left_anti")
          kept.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outDir)
          val tmp = new Path(base + "__upserting")
          fs.delete(tmp, true)
          allKeys.filter(col("ts") >= lit(cutoff))
            .write.mode("overwrite").partitionBy("bucket")
            .parquet(tmp.toString)
          swapBuckets(fs, base, tmp, touched)
          keys.unpersist()
        }
        ()
      }
      .start()
  }

  /** Streaming IVF index maintenance — [[upsertStreamBucketed]]'s
    * incremental-rewrite pattern composed with the
    * [[graft.operators.Ann.buildIvfIndex]] layout
    * (`<dir>/data/cell=<c>/` + `<dir>/centroids`):
    *
    *  1. each micro-batch assigns cells map-side against the PERSISTED
    *     centroid table (driver-sized literal — no join, no shuffle);
    *  2. upserts by key into ONLY the touched `cell=` directories
    *     (partition pruning on read, rename-aside swap with crash
    *     recovery on write) — per-batch cost is O(batch + touched
    *     cells), untouched cells' files are never read or moved;
    *  3. tracks a drift metric — the batch's mean distance to its
    *     assigned centroids — as one driver-sized aggregate over the
    *     persisted batch (`df.observe` would be free-er but
    *     `Observation.get` never completes inside a foreachBatch body:
    *     the nested execution's listener event is not delivered; see
    *     the inline note);
    *  4. when drift exceeds `driftThreshold`, RETRAINS: deterministic
    *     k-means over the full index, full re-assign, whole-directory
    *     swap of data + centroids (the O(index) rebuild, deliberately
    *     rare — the reference's `needs_rebuild` lifecycle, streaming).
    *
    * `onBatch(batchId, drift, retrained)` exposes the metric stream.
    *
    * `deleteCol`: optional boolean tombstone flag (the per-id DELETE
    * lifecycle — `vector_db.py:99` refined to row granularity). A
    * deleted id's cell comes from the same column-pruned (id, cell)
    * lookup relocation already pays — cell is a function of the VALUE,
    * and a tombstone carries none — so deletes add no extra index pass;
    * only the cells holding deleted ids are rewritten. Tombstones may
    * carry a null vector. A delete-only batch reports drift 0.0. */
  def ivfUpsertStream(spark: SparkSession, src: DataFrame, indexDir: String,
                      checkpointDir: String, idCol: String = "vec_id",
                      vecCol: String = "embedding",
                      driftThreshold: Double = Double.PositiveInfinity,
                      retrainIters: Int = 3,
                      onBatch: (Long, Double, Boolean) => Unit = (_, _, _) => (),
                      deleteCol: Option[String] = None,
                      // post-assignment row transform (batch-with-cell,
                      // current centroids) => stored rows — the IVF-PQ
                      // composition point: pass Pq.encodeResidual here and
                      // the streamed index carries codes alongside cells.
                      // MUST be idempotent via withColumn-replace (it is
                      // re-applied on retrain over rows that already carry
                      // its columns, with the NEW centroids)
                      enrich: (DataFrame, DataFrame) => DataFrame = (b, _) => b)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.Ann
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.hadoop.fs.Path
          val fs = org.apache.hadoop.fs.FileSystem.get(
            spark.sparkContext.hadoopConfiguration)
          val base = indexDir.stripSuffix("/")
          val dataDir = s"$base/data"
          val centsDir = s"$base/centroids"
          recoverAsideBuckets(fs, dataDir, part = "cell")
          // a retrain's whole-directory swap can die between
          // rename(dir→__old) and rename(fresh→dir) — restore the aside
          // copy so the crash loses the retrain, never the index
          recoverDirSwap(fs, dataDir)
          recoverDirSwap(fs, centsDir)
          val cents = spark.read.parquet(centsDir)
          // a key is EITHER an upsert or a tombstone after the dedup
          val raw = batch.dropDuplicates(idCol)
            .withColumn("_del", tombstoneFlag(deleteCol)).persist()
          val ups = raw.filter(!col("_del"))
            .drop("_del").drop(deleteCol.toSeq: _*)
          // NOTE: `df.observe` + `Observation.get` DEADLOCKS here — the
          // foreachBatch body runs inside the micro-batch's nested SQL
          // execution, whose listener event (the only thing that
          // completes Observation.get) is never delivered for the inner
          // write (verified by thread dump: get parks forever). The
          // batch is persisted anyway for the multi-pass merge, so the
          // drift metric is one driver-sized aggregate over it instead.
          val assignedRaw = Ann.assignCellsWithDist(
            ups, col(vecCol), cents).persist()
          val assigned = enrich(assignedRaw.drop("cdist"), cents)
          val driftRow = assignedRaw.agg(avg(col("cdist"))).head()
          val drift = if (driftRow.isNullAt(0)) 0.0 else driftRow.getDouble(0)
          val newCells = assignedRaw.select("cell").distinct()
            .collect().map(_.getInt(0)).toSet
          // a re-ingested key whose updated vector lands in a DIFFERENT
          // cell leaves a stale copy in its old cell unless that cell is
          // also rewritten — cell is a function of the VALUE, so finding
          // old copies needs a key lookup: one column-pruned (id, cell)
          // pass over the index per batch, the inherent price of key
          // relocation on a value-partitioned layout (the key-partitioned
          // upsertStreamBucketed never pays it). Tombstoned ids ride the
          // SAME lookup — it is also how a delete finds its cell.
          val oldCells =
            if (!fs.exists(new org.apache.hadoop.fs.Path(dataDir)))
              Set.empty[Int]
            else spark.read.parquet(dataDir)
              .select(col(idCol), col("cell"))
              .join(raw.select(col(idCol).as("_uk")),
                col(idCol) === col("_uk"), "left_semi")
              .select("cell").distinct()
              .collect().map(_.getInt(0)).toSet
          val touched = (newCells ++ oldCells).toIndexedSeq.sorted
          val existing = touched.filter(c =>
            fs.exists(bucketPath(dataDir, c, part = "cell")))
          // anti side = ALL batch ids (upserts AND tombstones); union
          // side = the assigned upserts — a tombstoned id simply never
          // comes back
          val merged =
            if (existing.isEmpty) assigned
            else spark.read.parquet(dataDir)
              .filter(col("cell").isin(touched.map(Int.box): _*))
              .join(raw.select(col(idCol).as("_uk")),
                col(idCol) === col("_uk"), "left_anti")
              .unionByName(assigned, allowMissingColumns = true)
          val tmp = new Path(dataDir + "__upserting")
          fs.delete(tmp, true)
          merged.write.mode("overwrite").partitionBy("cell")
            .parquet(tmp.toString)
          swapBuckets(fs, dataDir, tmp, touched, part = "cell")
          assignedRaw.unpersist(); raw.unpersist()
          val retrain = drift > driftThreshold
          if (retrain) {
            // O(index) rebuild: re-learn cells from ALL current vectors,
            // re-assign, swap the whole data dir + centroid table.
            // Each swap individually recovers via recoverDirSwap (no
            // data loss); the residual window is BETWEEN the two swaps —
            // a crash there leaves new data with old centroids for one
            // restart, a transient recall dip the next retrain repairs,
            // not an error (probe cells always come from the live
            // centroid table)
            val all = spark.read.parquet(dataDir).drop("cell")
            val k = cents.count().toInt
            val newCents = Ann.kmeansCentroids(
              all, col(idCol), col(vecCol), k, retrainIters)
            val reTmp = new Path(dataDir + "__retraining")
            fs.delete(reTmp, true)
            enrich(Ann.assignCells(all, col(idCol), col(vecCol), newCents),
                newCents)
              .write.mode("overwrite").partitionBy("cell")
              .parquet(reTmp.toString)
            val old = new Path(dataDir + "__old")
            fs.delete(old, true)
            renameOrThrow(fs, new Path(dataDir), old)
            renameOrThrow(fs, reTmp, new Path(dataDir))
            fs.delete(old, true)
            val centsTmp = new Path(centsDir + "__retraining")
            fs.delete(centsTmp, true)
            newCents.coalesce(1).write.mode("overwrite")
              .parquet(centsTmp.toString)
            val centsOld = new Path(centsDir + "__old")
            fs.delete(centsOld, true)
            renameOrThrow(fs, new Path(centsDir), centsOld)
            renameOrThrow(fs, centsTmp, new Path(centsDir))
            fs.delete(centsOld, true)
          }
          onBatch(batchId, drift, retrain)
        }
        ()
      }
      .start()
  }

  /** Streaming maintenance for the sharded NSW graph index — the HNSW
    * insert lifecycle ([[graft.operators.GraphAnn]]), completing the
    * graph family's parity with [[ivfUpsertStream]] on the IVF side.
    *
    * Each micro-batch:
    *   1. hash-shards its deduped rows (the same pure-function-of-id
    *      sharding the build uses) and collects the touched shard ids
    *      (≤ numShards ints on the driver);
    *   2. reads ONLY the touched `shard=<s>` dirs (partition pruning)
    *      and, per shard IN the executor: brand-new ids run the genuine
    *      incremental insert — beam search from the stored entry, link m
    *      nearest, 2m degree cap, O(|adds|·ef·M·log n_s), NOT a shard
    *      rebuild; a batch that REPLACES an existing id triggers a
    *      deterministic full rebuild of that shard over the merged rows
    *      (edge surgery on a pruned NSW graph is not well-defined, and
    *      the rebuild equals a from-scratch build of the same set —
    *      the determinism GraphAnnSpec pins);
    *   3. swaps ONLY the touched shard dirs (rename-aside, dot-prefixed
    *      aside dirs, crash recovery on the next batch) — untouched
    *      shards' files are never read, rewritten, or moved.
    *
    * `onBatch(batchId, nAdds, rebuiltShards)` exposes the maintenance
    * metric stream.
    *
    * `deleteCol`: optional boolean tombstone flag (the per-id DELETE
    * lifecycle — `vector_db.py:99` refined to row granularity).
    * Tombstones may carry a null vector; each hash-shards by id exactly
    * like an insert, and a shard holding a deleted id takes the
    * deterministic-rebuild path over its surviving rows — the same rule
    * as replacement, because edge surgery on a pruned HNSW graph is not
    * well-defined (removing a node's edges can strand its neighbors'
    * only route). Only the touched shards are rewritten; a shard whose
    * nodes are all deleted disappears from the layout. Deleting an
    * absent id is a no-op rewrite of its shard.
    *
    * Shard GROWTH (round-13 verdict item 5): without a re-shard path,
    * sustained upserts fatten every shard forever — warm-serve cost and
    * per-shard build memory grow linearly with no recourse short of a
    * full rebuild. `maxShardRows` arms a size-triggered SPLIT: after the
    * swap, any touched shard over the limit is split into two children
    * under the extendible-hash dir naming
    * ([[graft.operators.GraphAnn.routeShard]] — the dir set itself
    * encodes each leaf's depth, no metadata file): its rows rehash by
    * the doubled modulus, each child rebuilds as an independent HNSW
    * graph IN an executor (deterministic — same discipline as the
    * replacement rebuild), and publication swaps exactly the parent dir
    * plus its new sibling. Untouched shards are never read, rewritten,
    * or moved; serving fans out over whatever `shard=*` dirs exist, so
    * splits need no reader-side coordination. Children still over the
    * limit split again within the same batch (log-bounded).
    * `onSplit(batchId, splits)` reports each (parent, newSibling).
    *
    * Shard SHRINK (round-14 verdict item 7): the inverse lifecycle.
    * After a heavy dedup/TTL delete pass the dir set would otherwise
    * stay fragmented at its high-water mark — warm-serve cost is
    * O(dirs), not O(rows). `minShardRows` arms a size-triggered sibling
    * MERGE: two same-depth sibling LEAVES whose combined rows fit under
    * the limit rebuild as ONE parent (the split protocol reversed —
    * per-parent commit via [[recoverShardMerges]], touched dirs only,
    * crash-safe), and the extendible-hash depth collapses by one.
    * Merged parents re-candidate within the batch, so a bulk delete
    * cascades the tree back down (log-bounded). Set `minShardRows` well
    * below `maxShardRows` for split/merge hysteresis.
    * `onMerge(batchId, merges)` reports each (parent, absorbedSibling). */
  def graphUpsertStream(spark: SparkSession, src: DataFrame,
                        indexDir: String, checkpointDir: String,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        numShards: Int = 8, m: Int = 16,
                        efConstruction: Int = 100, maxLevel: Int = 3,
                        onBatch: (Long, Long, Seq[Int]) => Unit =
                          (_, _, _) => (),
                        deleteCol: Option[String] = None,
                        maxShardRows: Long = Long.MaxValue,
                        onSplit: (Long, Seq[(Int, Int)]) => Unit =
                          (_, _) => (),
                        minShardRows: Long = 0L,
                        onMerge: (Long, Seq[(Int, Int)]) => Unit =
                          (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.{GraphAnn, GraphNode}
    src.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Update)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          import org.apache.hadoop.fs.Path
          import spark.implicits._
          val fs = org.apache.hadoop.fs.FileSystem.get(
            spark.sparkContext.hadoopConfiguration)
          val base = indexDir.stripSuffix("/")
          recoverShardMerges(fs, base, numShards) // own hidden namespace
          recoverShardSplits(fs, base, numShards) // before the aside pass
          recoverAsideBuckets(fs, base, part = "shard")
          // a key is EITHER an upsert or a tombstone after the dedup;
          // tombstones keep a null vec — that null IS their tag on the
          // wire (stored: neighbors≠null; add: vec≠null; delete: vec=null)
          val allRows = batch.dropDuplicates(idCol)
            .withColumn("_del", tombstoneFlag(deleteCol))
            .select(col(idCol).cast("long").as("id"),
              when(!col("_del"), col(vecCol).cast("array<double>")).as("vec"))
            // route against the CURRENT dir set (split-aware; reduces to
            // pmod(hash(id), numShards) while no shard has split)
            .withColumn("shard", GraphAnn.routeShard(col("id"), numShards,
              GraphAnn.listShardDirIds(fs, base)))
            .persist()
          val rows = allRows.filter(col("vec").isNotNull)
          val touched = allRows.select("shard").distinct()
            .collect().map(_.getInt(0)).sorted.toIndexedSeq
          val nAdds = rows.count()
          val existingShards = touched.filter(s =>
            fs.exists(bucketPath(base, s, part = "shard")))
          // adds and tombstones ride tagged with null neighbors; stored
          // nodes carry their adjacency — one union, one shuffle on shard
          val addNodes = allRows.select(col("shard"), col("id"), col("vec"),
            lit(null).cast("array<bigint>").as("neighbors"),
            lit(null).cast("array<array<bigint>>").as("layers"))
          val merged = (if (existingShards.nonEmpty)
              GraphAnn.withLayers(spark.read.parquet(base))
                .filter(col("shard").isin(existingShards.map(Int.box): _*))
                .select("shard", "id", "vec", "neighbors", "layers")
                .unionByName(addNodes)
            else addNodes)
            .repartition(math.max(touched.size, 1), col("shard"))
            .as[GraphNode]
            .mapPartitions { it =>
              it.toArray.groupBy(_.shard).iterator.flatMap {
                case (shard, nodes) =>
                  val (live, tombstones) =
                    nodes.partition(n => n.vec != null || n.neighbors != null)
                  val delIds = tombstones.map(_.id).toSet
                  val (stored, adds) = live.partition(_.neighbors != null)
                  val addPairs = adds.map(n => (n.id, n.vec))
                  val addIds = addPairs.map(_._1).toSet
                  if (stored.exists(n => addIds(n.id) || delIds(n.id)))
                    // replacement or deletion: deterministic rebuild over
                    // the surviving set, new vector wins, deleted ids gone
                    GraphAnn.buildShard(shard,
                      stored.filterNot(n => addIds(n.id) || delIds(n.id))
                        .map(n => (n.id, n.vec)) ++ addPairs,
                      m, efConstruction, maxLevel)
                  else
                    GraphAnn.insertIntoShard(shard, stored, addPairs,
                      m, efConstruction, maxLevel)
              }
            }
          // which touched shards take the rebuild path: those where an
          // add OR tombstone id already exists in the stored shard
          // (driver-sized — ≤ numShards ints). Computed BEFORE the swap
          // replaces them.
          val rebuilt: Seq[Int] =
            if (existingShards.isEmpty) Seq.empty
            else spark.read.parquet(base)
              .filter(col("shard").isin(existingShards.map(Int.box): _*))
              .select(col("shard"), col("id"))
              .join(allRows.select("id"), Seq("id"), "left_semi")
              .select("shard").distinct()
              .collect().map(_.getInt(0)).sorted.toSeq
          val tmp = new Path(base + "__upserting")
          fs.delete(tmp, true)
          merged.toDF()
            .write.mode("overwrite").partitionBy("shard")
            .parquet(tmp.toString)
          swapBuckets(fs, base, tmp, touched, part = "shard")
          allRows.unpersist()
          // ---- size-triggered shard split (touched shards only) -------
          // ALL of a round's oversized shards split in ONE job: at
          // cluster scale a threshold crossing hits many shards in the
          // same epoch, and per-shard driver-looped jobs would be the
          // O(shards) planning defect all over again. Child dir names
          // never collide: a sibling name determines its parent
          // uniquely, and siblings of existing dirs don't exist yet by
          // the depth rule. Children still oversized (skewed parent)
          // split again next round — log-bounded.
          if (maxShardRows < Long.MaxValue) {
            val splits = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
            var pending: Seq[Int] = touched
            while (pending.nonEmpty) {
              val present = pending.filter(sh =>
                fs.exists(bucketPath(base, sh, part = "shard")))
              val over =
                if (present.isEmpty) Seq.empty[Int]
                else spark.read.parquet(base)
                  .filter(col("shard").isin(present.map(Int.box): _*))
                  .groupBy("shard").count()
                  .filter(col("count") > maxShardRows)
                  .select("shard").collect().map(_.getInt(0)).sorted.toSeq
              if (over.isEmpty) pending = Seq.empty
              else {
                val dirSet = GraphAnn.listShardDirIds(fs, base)
                val cmods = over.map(n => (n,
                  numShards << GraphAnn.shardDepth(n, numShards, dirSet)))
                // rehash each parent's rows at its doubled modulus and
                // rebuild every child executor-side — the same
                // deterministic from-scratch discipline as replacement
                val splitTmp = new Path(base + "__splitting")
                fs.delete(splitTmp, true)
                spark.read.parquet(base)
                  .filter(col("shard").isin(over.map(Int.box): _*))
                  .select(col("shard").cast("int").as("parent"),
                    col("id"), col("vec"))
                  .join(broadcast(cmods.toDF("parent", "cmod")), "parent")
                  .select(col("id"), col("vec"),
                    pmod(hash(col("id")), col("cmod") * 2)
                      .cast("int").as("shard"))
                  .repartition(2 * over.size, col("shard"))
                  .as[(Long, Seq[Double], Int)]
                  .mapPartitions { it =>
                    it.toArray.groupBy(_._3).iterator.flatMap {
                      case (sh, rows) =>
                        GraphAnn.buildShard(sh,
                          rows.map(r => (r._1, r._2.toArray)),
                          m, efConstruction, maxLevel)
                    }
                  }
                  .toDF()
                  .write.mode("overwrite").partitionBy("shard")
                  .parquet(splitTmp.toString)
                // per-parent commit protocol (see [[recoverShardSplits]]):
                // the sibling parks hidden first, the parent swap is the
                // commit point — every crash window rolls back to the
                // intact parent or forward to both children; rows never
                // vanish or duplicate
                val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
                cmods.foreach { case (n, c) =>
                  val freshN = new Path(s"$splitTmp/shard=$n")
                  val freshS = new Path(s"$splitTmp/shard=${n + c}")
                  // a degenerate hash (one empty child) skips the swap:
                  // the parent stays fat but correct, and re-attempting
                  // would reproduce the same halves — don't loop on it
                  if (fs.exists(freshN) && fs.exists(freshS)) {
                    val pendingSib = pendingShardPath(base, n + c)
                    fs.delete(pendingSib, true)
                    renameOrThrow(fs, freshS, pendingSib)
                    val aside = asidePath(base, n, part = "shard")
                    fs.delete(aside, true)
                    renameOrThrow(fs, bucketPath(base, n, part = "shard"),
                      aside)
                    renameOrThrow(fs, freshN,
                      bucketPath(base, n, part = "shard")) // commit point
                    renameOrThrow(fs, pendingSib,
                      bucketPath(base, n + c, part = "shard"))
                    fs.delete(aside, true)
                    done += ((n, n + c))
                  }
                }
                fs.delete(splitTmp, true)
                splits ++= done
                pending = done.toSeq.flatMap { case (n, s2) => Seq(n, s2) }
              }
            }
            if (splits.nonEmpty) onSplit(batchId, splits.toSeq)
          }
          // ---- size-triggered sibling MERGE (the split reversed) -------
          // After a heavy delete pass the shard set would otherwise stay
          // fragmented at its high-water mark — warm-serve cost O(dirs),
          // not O(rows). Two sibling LEAVES at the same depth whose
          // combined rows fit under `minShardRows` rebuild as ONE parent
          // under the extendible-hash dir naming (depth collapses by
          // one; routing and serving read the dir set, so no reader-side
          // coordination). Touched shards seed the candidates; merged
          // parents re-candidate within the batch (cascade, log-bounded).
          // Set minShardRows well under maxShardRows for hysteresis.
          if (minShardRows > 0L) {
            val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
            var cand: Seq[Int] = touched
            var continue = true
            while (continue) {
              val dirSet = GraphAnn.listShardDirIds(fs, base)
              // candidate pairs: a touched leaf at depth j ≥ 1 plus its
              // same-depth sibling — both must be LEAVES (neither split
              // deeper), else their own children must merge first
              val pairs = cand.flatMap { t =>
                if (!dirSet.contains(t)) None
                else {
                  val j = GraphAnn.shardDepth(t, numShards, dirSet)
                  if (j == 0) None
                  else {
                    val cmodP = numShards << (j - 1)
                    val p = t % cmodP
                    val high = p + cmodP
                    if (dirSet.contains(p) && dirSet.contains(high) &&
                        GraphAnn.shardDepth(p, numShards, dirSet) == j &&
                        GraphAnn.shardDepth(high, numShards, dirSet) == j)
                      Some((p, high))
                    else None
                  }
                }
              }.distinct
              if (pairs.isEmpty) continue = false
              else {
                val members = pairs.flatMap(pr => Seq(pr._1, pr._2))
                val counts = spark.read.parquet(base)
                  .filter(col("shard").isin(members.map(Int.box): _*))
                  .groupBy("shard").count()
                  .collect()
                  .map(r => r.getInt(0) -> r.getLong(1)).toMap
                val toMerge = pairs.filter { case (p, h) =>
                  counts.getOrElse(p, 0L) + counts.getOrElse(h, 0L) <=
                    minShardRows }
                if (toMerge.isEmpty) continue = false
                else {
                  // ALL of a round's merges rebuild in ONE job (the
                  // split-job rule): child rows regroup under the parent
                  // name, each parent rebuilt executor-side with the
                  // deterministic from-scratch discipline
                  val mergeTmp = new Path(base + "__merging")
                  fs.delete(mergeTmp, true)
                  val pmap = toMerge.flatMap { case (p, h) =>
                    Seq((p, p), (h, p)) }
                  spark.read.parquet(base)
                    .filter(col("shard").isin(
                      pmap.map(x => Int.box(x._1)): _*))
                    .select(col("shard").cast("int").as("child"),
                      col("id"), col("vec"))
                    .join(broadcast(pmap.toDF("child", "parent")), "child")
                    .select(col("id"), col("vec"),
                      col("parent").cast("int").as("shard"))
                    .repartition(toMerge.size, col("shard"))
                    .as[(Long, Seq[Double], Int)]
                    .mapPartitions { it =>
                      it.toArray.groupBy(_._3).iterator.flatMap {
                        case (sh, rows) =>
                          GraphAnn.buildShard(sh,
                            rows.map(r => (r._1, r._2.toArray)),
                            m, efConstruction, maxLevel)
                      }
                    }
                    .toDF()
                    .write.mode("overwrite").partitionBy("shard")
                    .parquet(mergeTmp.toString)
                  // per-pair commit protocol (see [[recoverShardMerges]]):
                  // fresh parent parks hidden, both children hide (high
                  // first), the parent rename is the commit point
                  val done =
                    scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
                  toMerge.foreach { case (p, h) =>
                    val fresh = new Path(s"$mergeTmp/shard=$p")
                    if (fs.exists(fresh)) {
                      val pend = mergePendingPath(base, p)
                      fs.delete(pend, true)
                      renameOrThrow(fs, fresh, pend)
                      val dropH = mergeDropPath(base, h)
                      fs.delete(dropH, true)
                      renameOrThrow(fs,
                        bucketPath(base, h, part = "shard"), dropH)
                      val dropP = mergeDropPath(base, p)
                      fs.delete(dropP, true)
                      renameOrThrow(fs,
                        bucketPath(base, p, part = "shard"), dropP)
                      renameOrThrow(fs, pend,
                        bucketPath(base, p, part = "shard")) // commit point
                      fs.delete(dropH, true)
                      fs.delete(dropP, true)
                      done += ((p, h))
                    }
                  }
                  fs.delete(mergeTmp, true)
                  merges ++= done
                  cand = done.toSeq.map(_._1)
                  if (done.isEmpty) continue = false
                }
              }
            }
            if (merges.nonEmpty) onMerge(batchId, merges.toSeq)
          }
          onBatch(batchId, nAdds, rebuilt)
        }
        ()
      }
      .start()
  }

  // ---- incremental collection build ----------------------------------

  /** Incremental index build: watch `srcDir` for new document parquet
    * files, compute doc features + a deterministic feature-hash embedding
    * (the external-model hook point — swap in a `mapInPandas`-style batch
    * encoder in production), append to the collection with exactly-once
    * file-sink checkpointing. The streaming analogue of
    * `vector_db.py:144-180`'s batch upsert loop. */
  def incrementalCollection(spark: SparkSession, srcDir: String,
                            indexDir: String, checkpointDir: String,
                            embedDim: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.sources.HrPipeline.featureHashEmbedding
    val schema = spark.read.parquet(srcDir).schema // pin from existing files
    spark.readStream.schema(schema).parquet(srcDir)
      .filter(col("doc_id").isNotNull && length(col("text")) > 0)
      .withColumn("content_hash", md5(col("text")))
      .withColumn("embedding", featureHashEmbedding(col("text"), embedDim))
      .writeStream
      .format("parquet")
      .option("path", indexDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }
}
