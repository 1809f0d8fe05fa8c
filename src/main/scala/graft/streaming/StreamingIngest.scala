package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming twin of the batch ingest path (SURVEY.md §2.10:
  * the reference is micro-batch via external checkpoints; the idiomatic
  * Spark expression of the same "process whatever has arrived, then stop"
  * contract is `readStream` + `Trigger.AvailableNow`, with Spark's own
  * seen-files tracking replacing the mtime checkpoint).
  */
object StreamingIngest {

  /** Streaming read of the events files with event time normalized to
    * `event_time` (TimestampType) + `ts_us` (epoch µs LongType),
    * whatever the files' physical ts encoding (int64 nanos vs
    * TIMESTAMP(µs) — see [[graft.sources.EventTime]]). The file stream
    * source requires a declared schema, so resolve the REAL one with a
    * batch footer read first instead of hard-coding an encoding the
    * producer may have changed. */
  def eventsStream(spark: SparkSession, dir: String,
      glob: String, maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema =
      spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    val tsType = fileSchema("ts").dataType
    val reader = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", glob)
    maxFilesPerTrigger.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n))
      .parquet(dir)
      .withColumn("event_time", graft.sources.EventTime.eventTimeExpr(tsType))
      .withColumn("ts_us", unix_micros(col("event_time")))
  }

  /** Drain an APPEND-mode streaming frame through the graft-lake
    * streaming sink and scan the committed table back: result delivery
    * stays DISTRIBUTED (executors write data files; the driver only
    * commits manifests). A `format("memory")` sink would accumulate
    * the whole result in driver memory — fine for a 6-row fixture,
    * a driver-OOM shape for a wide interval-join result at 100 TB. */
  private[graft] def drainToLake(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val base = java.nio.file.Files
      .createTempDirectory(s"graft_stream_$tag").toString
    val root = s"$base/t"
    graft.lake.LakeTable.create(spark, root, df.schema)
    val q = df.writeStream
      .outputMode(OutputMode.Append)
      .format("graft-lake")
      .option("path", root)
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.lake.LakeTable.load(spark, root).scan()
  }

  /** [[drainToLake]]'s COMPLETE-mode twin: each trigger's full result
    * replaces the lake table's content (one atomic overwrite commit per
    * micro-batch — the lake sink itself is append-only by contract, so
    * complete mode routes through foreachBatch). The scan after drain
    * is the LAST trigger's result, which under AvailableNow is the
    * complete aggregate. */
  private[graft] def drainCompleteToLake(df: DataFrame,
      tag: String): DataFrame = {
    val spark = df.sparkSession
    val base = java.nio.file.Files
      .createTempDirectory(s"graft_stream_$tag").toString
    val root = s"$base/t"
    val table = graft.lake.LakeTable.create(spark, root, df.schema)
    val q = df.writeStream
      .outputMode(OutputMode.Complete)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        table.overwrite(batch)
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    table.scan()
  }

  /** Streaming MOR UPSERT into a lake table — the continuous silver
    * layer (the streaming twin of the reference's batch
    * `MERGE INTO silver` step, `/root/reference/scripts/
    * bronze-silver.py:209-217`): the events fixture is split into
    * three ordered DROP files (`event_id % 3`, one row per user per
    * drop — the merge batch contract), streamed one file per trigger,
    * and each micro-batch MERGEs into a merge-on-read lake table via
    * the lake sink's `mergeKeys` option — per batch that costs one
    * data file + one equality-delete file, ZERO rewrites, whatever the
    * table size. `deleteWhen` routes 'error'-typed rows to CDC
    * deletes; `txnAppId` makes replayed batches exactly-once. The
    * final state is last-writer-wins per user over the drop sequence —
    * deterministic because drop order is pinned by mtime. */
  def streamingUpsert(spark: SparkSession, dir: String,
      glob: String = "events.parquet"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = java.nio.file.Files
      .createTempDirectory("graft_stream_upsert").toString
    val ev = graft.sources.EventTime.withTsUs(
        spark.read.option("pathGlobFilter", glob).parquet(dir))
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"), col("ts_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id").desc)
    val inDir = new java.io.File(s"$base/in"); inDir.mkdirs()
    (0 to 2).foreach { i =>
      val chunk = ev.where(col("event_id") % 3 === i)
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).drop("__rn")
      val tmp = s"$base/tmp$i"
      chunk.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(inDir, f"drop_$i%d.parquet")
      require(part.renameTo(dest), s"rename to $dest failed")
      // pin the drop ORDER: the file stream source batches oldest-
      // mtime-first under maxFilesPerTrigger
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val root = s"$base/t"
    graft.lake.LakeTable.create(spark, root, ev.schema,
      properties = Map(
        graft.lake.LakeTable.PROP_MERGE_MODE -> "merge-on-read"))
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/in")
      .writeStream
      .format("graft-lake")
      .option("path", root)
      .option("txnAppId", "stream_upsert")
      .option("mergeKeys", "user_id")
      .option("deleteWhen", "event_type = 'error'")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.lake.LakeTable.load(spark, root).scan()
  }

  /** Per-trigger PARTITION RESTATEMENT through the graft-lake sink
    * (`overwritePartitions=true`): drop 0 publishes the whole orders
    * table (5 partitions), drop 1 restates the '1-URGENT' partition
    * with doubled prices. mtime pins the trigger order; each trigger
    * dynamically overwrites exactly the partitions it carries under
    * the txn watermark (exactly-once on replay), so the final state is
    * last-restatement-wins per partition — the streaming twin of
    * q_replace_where, checked by the same SQL oracle. */
  def streamingRestate(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_stream_restate").toString
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val drops = Seq(
      orders,
      orders.where(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", col("o_totalprice") * 2))
    val inDir = new java.io.File(s"$base/in"); inDir.mkdirs()
    drops.zipWithIndex.foreach { case (d, i) =>
      val tmp = s"$base/tmp$i"
      d.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(inDir, f"drop_$i%d.parquet")
      require(part.renameTo(dest), s"rename to $dest failed")
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val root = s"$base/t"
    graft.lake.LakeTable.create(spark, root, orders.schema,
      partitionBy = Seq("o_orderpriority"))
    val q = spark.readStream.schema(orders.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$base/in")
      .writeStream
      .format("graft-lake")
      .option("path", root)
      .option("txnAppId", "stream_restate")
      .option("overwritePartitions", "true")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.lake.LakeTable.load(spark, root).scan()
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
  }

  /** Tail a lake table's COMMIT LOG as a stream
    * (`format("graft-lake")`, offsets = snapshot ids — see
    * GraftLakeStreamSource) and aggregate what was delivered: builds a
    * two-append table from the events fixture, drains it AvailableNow
    * through a restartable parquet sink, and aggregates the sink. The
    * result must equal the batch aggregate over the source — both
    * commits delivered exactly once. This is the medallion shape where
    * silver SUBSCRIBES to bronze instead of re-scanning it per run. */
  def lakeTailAggregate(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = java.nio.file.Files
      .createTempDirectory("graft_lake_tail").toString
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("event_type"), col("value"))
    val t = graft.lake.LakeTable.create(spark, s"$base/t", ev.schema)
    t.append(ev.where(col("event_id") % 2 === 0))
    t.append(ev.where(col("event_id") % 2 =!= 0))
    val q = spark.readStream.format("graft-lake").load(s"$base/t")
      .writeStream.format("parquet").option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(s"$base/out").groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))
  }

  /** Run a complete-mode streaming aggregation over the parquet files in
    * `dir` matching `glob` with Trigger.AvailableNow, blocking until
    * drained; returns the result as a batch DataFrame. (The file stream
    * source wants a directory — `pathGlobFilter` narrows to one table.)
    * Group/agg shape mirrors the batch oracle: per-event-type count +
    * value sum. */
  def availableNowAggregate(spark: SparkSession, dir: String,
      glob: String = "events.parquet"): DataFrame = {
    val stream = eventsStream(spark, dir, glob)
    val agg = stream.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    drainCompleteToLake(agg, "agg")
  }

  /** Watermarked event-time tumbling-window aggregation in APPEND mode:
    * only windows whose end is at or below the final watermark
    * (max event time − `watermarkDelay`) are emitted — the standard
    * late-data policy. Returns the emitted windows as a batch DataFrame
    * with epoch-µs window bounds (engine-portable for the oracle). */
  def windowedCounts(spark: SparkSession, dir: String,
      windowDuration: String = "1 hour",
      watermarkDelay: String = "1 hour",
      glob: String = "events.parquet"): DataFrame = {
    val stream = eventsStream(spark, dir, glob)
    val agg = stream
      .withWatermark("event_time", watermarkDelay)
      .groupBy(window(col("event_time"), windowDuration),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2)
        .as("total_value"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        unix_micros(col("window.end")).as("window_end_us"),
        col("event_type"), col("n"), col("total_value"))
    drainToLake(agg, "window")
  }

  /** Streaming exactly-once dedup (`dropDuplicatesWithinWatermark`):
    * the "same delivery arrives twice" ingest guard — an at-least-once
    * upstream (replayed file drop, redelivered queue segment) is
    * simulated by UNIONING two streaming reads of the same source; the
    * dedup state keeps one row per (user_id, event_type, ts) key and
    * drops the duplicate delivery. The watermark bounds state in a
    * continuous deployment: a key's row is held only until event time
    * passes watermarkDelay beyond it, so state is O(keys per watermark
    * window), never O(stream). Only the KEY columns are returned —
    * which physical duplicate survives is arrival-order-dependent, the
    * surviving key set is exact. */
  def streamingDedup(spark: SparkSession, dir: String,
      watermarkDelay: String = "1 hour",
      glob: String = "events.parquet"): DataFrame = {
    def delivery() = eventsStream(spark, dir, glob)
    val deduped = delivery().union(delivery())
      .withWatermark("event_time", watermarkDelay)
      // key on the µs event time (not raw ns): the dedup key should be
      // the same clock the watermark advances on
      .dropDuplicatesWithinWatermark("user_id", "event_type", "event_time")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("event_time")).as("ts_us"))
    drainToLake(deduped, "dedup")
  }

  /** Stream-static ENRICHMENT against a lake dimension (the streaming
    * lookup/SCD shape): each micro-batch joins the dimension's CURRENT
    * snapshot — `foreachBatch` re-scans the lake table per batch, so a
    * dim update between batches is visible to the next batch. A plain
    * `stream.join(dim.scan())` would pin the snapshot captured at
    * query start for the stream's whole lifetime; the per-batch
    * re-scan is what a continuously-enriching pipeline needs (and each
    * re-scan is manifest-planned: zero listing, pruned by the join's
    * pushed filters). Joined batches append to `outPath` parquet with
    * the batch id stamped; returns the drained result as a batch read.
    *
    * `keyExpr` derives the stream-side join key (e.g. a bucketing of
    * user_id) named as the dim's key column. */
  def enrichWithLakeDim(spark: SparkSession, dir: String,
      dim: graft.lake.LakeTable, keyExpr: org.apache.spark.sql.Column,
      keyName: String, outPath: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None,
      onBatch: Long => Unit = _ => ()): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema =
      spark.read.option("pathGlobFilter", glob).parquet(dir).schema
    val reader = spark.readStream.schema(fileSchema)
      .option("pathGlobFilter", glob)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(dir)
      .withColumn(keyName, keyExpr)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], batchId: Long) =>
        batch.join(dim.scan(), keyName)
          .withColumn("__batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
        onBatch(batchId)
        ()
      }
      .option("checkpointLocation", s"$outPath-ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outPath)
  }

  /** Stream-stream INTERVAL join (the attribution shape): each click
    * joins every purchase by the same user within
    * `[click, click + windowSeconds]`. Both sides carry event-time
    * watermarks — what bounds the join state in a continuous deployment
    * (Spark evicts buffered rows once the other side's watermark passes
    * the interval). With AvailableNow every in-batch match emits, so the
    * result is deterministic and equals the batch interval join. */
  /** `joinType = "left_outer"` adds the attribution REMAINDER: a click
    * whose interval the purchase-side watermark has provably passed
    * emits once with NULL purchase columns (Spark evicts its state in
    * a LATER micro-batch — feed multiple files with
    * `maxFilesPerTrigger` so the watermark advances across batches;
    * clicks still inside the watermark at drain stay buffered,
    * the standard outer-stream-join contract). */
  def intervalJoin(spark: SparkSession, dir: String,
      windowSeconds: Long, glob: String = "events.parquet",
      joinType: String = "inner",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    def side(eventType: String, prefix: String) =
      eventsStream(spark, dir, glob, maxFilesPerTrigger)
        .where(col("event_type") === eventType)
        .select(
          col("user_id").as(s"${prefix}_user"),
          col("event_id").as(s"${prefix}_id"),
          col("event_time").as(s"${prefix}_time"))
        .withWatermark(s"${prefix}_time", "1 hour")
    val clicks = side("click", "c")
    val purchases = side("purchase", "p")
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_time") >= col("c_time") &&
        col("p_time") <= col("c_time") + expr(
          s"INTERVAL $windowSeconds SECONDS"), joinType)
      .select(col("c_user").as("user_id"),
        col("c_id").as("click_id"), col("p_id").as("purchase_id"),
        unix_micros(col("c_time")).as("click_ts_us"),
        unix_micros(col("p_time")).as("purchase_ts_us"))
    drainToLake(joined, "ijoin")
  }

  /** Exactly-once streaming FAN-OUT to several lake tables: each
    * micro-batch routes through every `(table, transform)` and all the
    * routed writes publish as ONE multi-table transaction
    * ([[graft.lake.LakeCatalog.transactionWithId]]) keyed
    * `<appId>-<batchId>` — deterministic, so a batch replayed after a
    * crash anywhere (mid-stage, mid-publish, or between table commit
    * and streaming-offset commit) is exactly-once per table AND
    * atomic ACROSS tables: no replay can leave the bronze copy with a
    * batch its audit/stats twin is missing. The batch is persisted
    * once so the routes don't recompute the source. This is the
    * missing half of single-table `txnAppId` exactly-once — the same
    * watermark machinery, lifted to a table GROUP. */
  def fanoutExactlyOnce(stream: DataFrame, cat: graft.lake.LakeCatalog,
      ns: String, routes: Seq[(String, DataFrame => DataFrame)],
      appId: String, checkpoint: String): Unit = {
    require(routes.nonEmpty, "fanout needs at least one route")
    require(appId.nonEmpty && appId.matches("[A-Za-z0-9_-]+"),
      s"bad appId '$appId'")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        // versioned watermark (txn.<appId>, monotone batchId): one
        // per-table property UPDATED per batch, not one accreted per
        // batch — a month of micro-batches must not grow 43k snapshot
        // properties
        try cat.transactionVersioned(ns, appId, batchId) { txn =>
          routes.foreach { case (table, f) => txn.append(table, f(batch)) }
        } finally batch.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}

/** Arbitrary stateful processing: gap-based sessionization with
  * `flatMapGroupsWithState` — the streaming twin of
  * [[graft.operators.Sessionize]]. State per user = the open session;
  * an event farther than `gapSeconds` from the previous one closes and
  * emits the session. Sessions still open when the available data is
  * drained remain in state (they'd emit on the next trigger or via event-
  * time timeout in a continuous deployment — single-shot callers compare
  * against the batch sessionizer minus each user's last session).
  *
  * Memory bound: `flatMapGroupsWithState` hands each user's IN-BATCH
  * events as an unsorted iterator, and gap sessionization needs them in
  * time order, so the function materializes ONE user's ONE trigger's
  * events (`it.toSeq.sortBy`) in task memory — the standard pattern for
  * this API (Spark exposes no sorted-group iterator). The bound is
  * max-events-per-user-per-trigger, NOT per-user history (state carries
  * only the open session struct, O(1) per user) and not the trigger's
  * whole partition. A pathological hot user is therefore a
  * rate-limiting concern for trigger sizing: cap
  * `maxFilesPerTrigger`/`maxOffsetsPerTrigger` so the hottest key's
  * per-trigger volume fits a task — the same discipline any keyed
  * stateful streaming job at 100 TB/day needs. */
object StreamingSessionize {

  case class Event(event_id: Long, ts_us: Long, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long, total_value: Double)

  def sessionize(events: Dataset[Event], gapSeconds: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L

    def fn(user: Long, it: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val tsUs = e.ts_us
        cur match {
          case Some(s) if tsUs - s.end > gapUs =>
            out += Session(user, s.start, s.end, s.n, s.total)
            cur = Some(SessionState(tsUs, tsUs, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.start, math.max(s.end, tsUs),
              s.n + 1, s.total + e.value))
          case None =>
            cur = Some(SessionState(tsUs, tsUs, 1, e.value))
        }
      }
      cur.foreach(state.update)
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Gap sessionization that ALSO emits idle sessions via EVENT-TIME
    * TIMEOUT: a session whose gap has provably passed (watermark beyond
    * `session_end + gap`) emits without waiting for the user's next
    * event — the missing half of [[sessionize]], whose open sessions
    * otherwise sit in state forever for users who never return. This is
    * the continuous-deployment contract: every session eventually
    * emits, state stays O(open sessions), and the watermark delay is
    * the only added latency.
    *
    * Requires `events` to carry a watermark on an `event_time` column
    * (the caller attaches it — flatMapGroupsWithState needs the
    * watermark for both late-data policy and the timeout clock).
    * Timeouts are registered in ms (Spark's watermark precision) as
    * `floor(end_us/1000) + gap_ms`, guarded above the current watermark
    * as the API requires; a timeout fires when the watermark passes it
    * — the deterministic mirror a batch oracle can compute. */
  def sessionizeWithTimeout(events: Dataset[Event], gapSeconds: Long)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    val gapMs = gapSeconds * 1000L

    def fn(user: Long, it: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // idle long enough: the watermark proves no event can extend it
        val s = state.get
        state.remove()
        return Iterator(Session(user, s.start, s.end, s.n, s.total))
      }
      val sorted = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        val tsUs = e.ts_us
        cur match {
          case Some(s) if tsUs - s.end > gapUs =>
            out += Session(user, s.start, s.end, s.n, s.total)
            cur = Some(SessionState(tsUs, tsUs, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.start, math.max(s.end, tsUs),
              s.n + 1, s.total + e.value))
          case None =>
            cur = Some(SessionState(tsUs, tsUs, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(
          math.max(s.end / 1000L + gapMs,
            state.getCurrentWatermarkMs() + 1L))
      }
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** End-to-end streaming run over parquet with AvailableNow; returns the
    * emitted (closed) sessions as a batch DataFrame. */
  def run(spark: SparkSession, dir: String,
      gapSeconds: Long, glob: String = "events.parquet"): DataFrame = {
    import spark.implicits._
    val events = StreamingIngest.eventsStream(spark, dir, glob)
      .select($"event_id", $"ts_us", $"user_id", $"event_type", $"value")
      .as[Event]
    StreamingIngest.drainToLake(sessionize(events, gapSeconds).toDF(),
      "sessions")
  }

  /** [[run]]'s timeout-emitting twin: gap-closed sessions emit as they
    * close, and idle final sessions emit once the final watermark
    * (max event time − `watermarkDelay`) passes `end + gap`. Only
    * sessions still within the watermark horizon when the available
    * data drains remain in state. */
  def runWithTimeout(spark: SparkSession, dir: String, gapSeconds: Long,
      watermarkDelay: String = "1 hour",
      glob: String = "events.parquet"): DataFrame = {
    import spark.implicits._
    // event_time STAYS in the projection: the watermark attribute must
    // survive into the flatMapGroupsWithState child for Spark to accept
    // EventTimeTimeout (extra columns are fine for the typed view)
    val events = StreamingIngest.eventsStream(spark, dir, glob)
      .withWatermark("event_time", watermarkDelay)
      .select($"event_id", $"ts_us", $"user_id", $"event_type", $"value",
        $"event_time")
      .as[Event]
    StreamingIngest.drainToLake(
      sessionizeWithTimeout(events, gapSeconds).toDF(), "sessions_to")
  }
}
