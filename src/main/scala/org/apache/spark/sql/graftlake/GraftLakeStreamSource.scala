package org.apache.spark.sql.graftlake

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.lake.LakeTable

/** Structured Streaming source that TAILS a graft lake table —
  * `spark.readStream.format("graft-lake").load(root)` — the capability
  * Iceberg/Delta expose as streaming reads: a silver job can subscribe
  * to bronze's commits instead of re-scanning it per trigger
  * (reference shape: the incremental snapshot-range read the
  * bronze→silver job does per run, scripts/bronze-silver.py:149-152,
  * promoted to a continuous stream).
  *
  * Offsets are SNAPSHOT IDS — exactly-once delivery falls out of the
  * table's own commit log (each micro-batch is the half-open snapshot
  * range `(start, end]`; replays re-read the same immutable files).
  * Batches are served by [[LakeTable.incrementalScan]], so they ride
  * the manifest-backed FileIndex (per-file statuses and pruning from
  * the manifest, zero fs listing).
  *
  * Options:
  *  - `startingSnapshotId`: first batch starts AFTER this snapshot
  *    (default 0 = the full table history as the first batch).
  *  - `skipNonAppends`: `true` to silently skip snapshots that are not
  *    append-shaped (merge/delete/compact rewrite history — a tailing
  *    reader cannot replay them as inserts); default errors, matching
  *    Iceberg's streaming-read contract.
  *  - `readChangeFeed`: `true` to stream the ROW-LEVEL CHANGELOG
  *    instead of appended rows (≡ Delta's CDF streaming): each batch
  *    is `LakeTable.changes(start, end]` — every insert AND delete the
  *    range produced, tagged `_change_type` / `_commit_snapshot_id`,
  *    so merges/deletes/updates stream correctly instead of erroring.
  *    `lineage` (on a `write.row-lineage` table) additionally carries
  *    each row's `_row_id` and classifies COW-rewrite deltas as
  *    `update_preimage`/`update_postimage` — the full Delta-CDF change
  *    vocabulary, streamed.
  *  - `maxSnapshotsPerTrigger`: rate limit — at most this many table
  *    commits per micro-batch (≡ Delta's `maxFilesPerTrigger` /
  *    Iceberg's streaming rate limits, in this table's natural unit:
  *    one commit = one bounded append). Without it, a stream started
  *    at `startingSnapshotId = 0` on a year-old 100 TB table plans the
  *    ENTIRE history as micro-batch one; with it, the backfill drains
  *    in bounded steps and checkpoints progress between them. The cap
  *    is enforced in `latestOffset` (SupportsAdmissionControl — the
  *    engine hands over the last COMMITTED offset as the base, so
  *    restarts are checkpoint-exact), and Trigger.AvailableNow latches
  *    its target via SupportsTriggerAvailableNow so a capped drain
  *    still runs to completion (the FileStreamSource pattern).
  */
class GraftLakeStreamSource(
    sqlContext: SQLContext,
    root: String,
    options: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  private val table = LakeTable.load(sqlContext.sparkSession, root)
  private val startAfter =
    options.getOrElse("startingSnapshotId", "0").toLong
  private val skipNonAppends =
    options.getOrElse("skipNonAppends", "false").toBoolean
  private val changeFeedMode =
    GraftLakeStreamSource.changeFeedModeOf(options)
  private val changeFeed = changeFeedMode != "false"
  private val lineageFeed = changeFeedMode == "lineage"
  // fail at source creation, not at the first micro-batch — by then a
  // checkpoint already exists
  require(!lineageFeed ||
      table.properties.get(LakeTable.PROP_ROW_LINEAGE).contains("true"),
    s"readChangeFeed=lineage needs a ${LakeTable.PROP_ROW_LINEAGE} " +
      s"table — $root has no row lineage")
  private val maxSnapshots: Option[Long] =
    options.get("maxSnapshotsPerTrigger").map { v =>
      val n = v.toLong
      require(n > 0, s"maxSnapshotsPerTrigger must be positive, got $n")
      n
    }

  /** Trigger.AvailableNow target, latched at stream start (the
    * FileStreamSource pattern): implementing the trait keeps the
    * engine from wrapping this source in its latch-one-offset wrapper,
    * which would otherwise freeze a RATE-LIMITED first offset as the
    * run's entire target and end the drain after one capped batch.
    * Instead the head is pinned here and capped offsets advance toward
    * it trigger by trigger. */
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = table.currentSnapshotId

  override val schema: StructType =
    if (changeFeed) GraftLakeStreamSource.changeFeedSchema(table.schema,
      lineage = lineageFeed)
    else table.schema

  /** Admission-control offset resolution (what the engine calls for a
    * SupportsAdmissionControl source instead of [[getOffset]]): `start`
    * is the last COMMITTED end — authoritative, checkpoint-backed — so
    * the per-trigger cap advances from it with no source-side offset
    * bookkeeping, and a restart can never hand out a backwards offset. */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val head = availableNowTarget.orElse(table.currentSnapshotId)
    head match {
      case None => null // table has no commits yet
      case Some(h) =>
        val base = Option(start).map(_.json.trim.toLong)
          .getOrElse(startAfter)
        val capped = maxSnapshots.fold(h)(n => math.min(h, base + n))
        if (capped <= base) start else LongOffset(capped)
    }
  }

  override def getOffset: Option[Offset] =
    table.currentSnapshotId.map(LongOffset(_))

  // offsets arrive live (LongOffset) or replayed from the checkpoint
  // log (SerializedOffset); both json-print the bare snapshot id
  private def snapshotId(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(snapshotId).getOrElse(startAfter)
    val hi = snapshotId(end)
    // the stream's schema is fixed at source creation; a mid-stream
    // rename/drop would otherwise surface as a bare AnalysisException
    // from the select below, so name the actual failure first
    val now =
      if (changeFeed) GraftLakeStreamSource.changeFeedSchema(
        table.schema, lineage = lineageFeed)
      else table.schema
    val gone = schema.fieldNames.filterNot(now.fieldNames.toSet)
    if (gone.nonEmpty)
      throw new UnsupportedOperationException(
        s"graft-lake stream source at $root: the table's schema changed " +
          s"under a running stream — columns no longer present: " +
          s"${gone.mkString(", ")}. Restart the stream (new checkpoint " +
          "or drop these columns from downstream) to adopt the new schema.")
    val batch = (if (lineageFeed) table.changesWithLineage(lo, hi)
      else if (changeFeed) table.changes(lo, hi)
      else table.incrementalScan(lo, hi, skipNonAppends = skipNonAppends))
      .select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*) // stream schema is fixed at source creation
    // V1 contract: the returned frame must be marked streaming. The
    // standard source pattern — plan the batch read (manifest pruning
    // and all), hand its lazy RDD to a streaming-tagged frame.
    val cs = sqlContext.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      batch.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.toRdd,
      batch.schema, isStreaming = true)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftLakeStreamSource[$root]"
}

object GraftLakeStreamSource {
  import org.apache.spark.sql.types.{LongType, StringType, StructField}

  /** Single source of truth for the `readChangeFeed` option
    * vocabulary — the provider's schema resolution and the source
    * constructor must agree or the modes drift. */
  private[graftlake] def changeFeedModeOf(
      options: Map[String, String]): String = {
    val mode = options.getOrElse("readChangeFeed", "false")
      .toLowerCase(java.util.Locale.ROOT)
    require(Seq("false", "true", "lineage").contains(mode),
      s"readChangeFeed must be true|false|lineage, got '$mode'")
    mode
  }

  /** Table schema + the changelog tags [[LakeTable.changes]] emits
    * (plus `_row_id` in lineage mode, matching
    * [[LakeTable.changesWithLineage]]'s column order). */
  def changeFeedSchema(tableSchema: StructType,
      lineage: Boolean = false): StructType =
    StructType(tableSchema.fields ++
      (if (lineage) Seq(StructField(LakeTable.ROW_ID_COL, LongType))
       else Nil) ++ Seq(
      StructField(LakeTable.CHANGE_TYPE_COL, StringType, nullable = false),
      StructField(LakeTable.CHANGE_SNAP_COL, LongType, nullable = false)))
}

/** Streaming SINK into a lake table —
  * `df.writeStream.format("graft-lake").option("path", root)` — the
  * write-side twin of [[GraftLakeStreamSource]]. Each micro-batch is
  * one atomic append commit. With `txnAppId` set (any checkpoint-
  * stable id), appends ride [[LakeTable.appendOnce]]'s transaction
  * watermarks: a batch replayed after a crash between table commit and
  * streaming-offset commit finds its own (appId, batchId) watermark
  * and skips — EXACTLY-ONCE table content from the engine's
  * at-least-once replay. Without `txnAppId`: plain appends
  * (at-least-once on crash replay). Append output mode only — a lake
  * table is not a complete-mode materialized view. */
class GraftLakeSink(sqlContext: SQLContext, root: String,
    txnAppId: Option[String], mergeKeys: Seq[String] = Nil,
    deleteWhen: Option[String] = None,
    overwritePartitions: Boolean = false) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val cs = sqlContext.sparkSession.asInstanceOf[classic.SparkSession]
    // V1 sink contract: `data` is the streaming micro-batch frame —
    // re-wrap its planned RDD as a batch frame before handing it to
    // the batch write path (the ForeachBatchSink technique)
    val batch = cs.internalCreateDataFrame(
      data.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.toRdd,
      data.schema, isStreaming = false)
    val table = LakeTable.load(cs, root)
    val delCond = deleteWhen.map(org.apache.spark.sql.functions.expr)
    if (overwritePartitions) {
      // streaming RESTATEMENT: each micro-batch dynamically overwrites
      // exactly the identity partitions it carries — the per-trigger
      // partition re-publish shape (Spark's own file sink cannot do
      // dynamic overwrite under streaming). An empty trigger restates
      // nothing and is skipped outright.
      if (!batch.isEmpty) txnAppId match {
        case Some(app) => table.overwritePartitionsOnce(batch, app, batchId)
        case None => table.overwritePartitions(batch)
      }
      return
    }
    (mergeKeys, txnAppId) match {
      case (Nil, Some(app)) => table.appendOnce(batch, app, batchId)
      case (Nil, None) => table.append(batch)
      // streaming UPSERT: each micro-batch MERGEs on the keys (MOR
      // equality deletes — zero rewrites per trigger); with txnAppId
      // the merge rides the same watermark as appendOnce, so a
      // replayed batch is exactly-once
      case (keys, Some(app)) =>
        table.mergeOnce(batch, keys, app, batchId, delCond)
      case (keys, None) => table.merge(batch, keys, delCond)
    }
  }

  override def toString: String = s"GraftLakeSink[$root]"
}

/** `format("graft-lake")` registration (META-INF/services): streaming
  * source AND sink. The same name intentionally does NOT provide a
  * batch relation: batch reads go through
  * [[LakeTable.scan]]/LakeCatalog views, which already carry the
  * manifest-pruned read path. */
class GraftLakeSourceProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-lake source requires .load(<table root>) or option(\"path\")"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val t = LakeTable.load(sqlContext.sparkSession, rootOf(parameters))
      GraftLakeStreamSource.changeFeedModeOf(parameters) match {
        case "false" => t.schema
        case "true" => GraftLakeStreamSource.changeFeedSchema(t.schema)
        case "lineage" =>
          require(t.properties.get(LakeTable.PROP_ROW_LINEAGE)
              .contains("true"),
            s"readChangeFeed=lineage needs a " +
              s"${LakeTable.PROP_ROW_LINEAGE} table — " +
              s"${rootOf(parameters)} has no row lineage")
          GraftLakeStreamSource.changeFeedSchema(t.schema, lineage = true)
      }
    })

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new GraftLakeStreamSource(sqlContext, rootOf(parameters), parameters)

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-lake sink supports Append output mode only, got $outputMode")
    require(partitionColumns.isEmpty,
      "partitioning comes from the TABLE's spec — create the table " +
        "partitioned instead of passing partitionBy to the writer")
    // mergeKeys flips the sink from per-batch APPEND to per-batch
    // MERGE (upsert) on the named columns; deleteWhen (a SQL boolean
    // over the batch row) marks CDC delete rows — the streaming twin
    // of the reference's batch silver MERGE
    val keys = parameters.get("mergeKeys").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val delWhen = parameters.get("deleteWhen")
    require(keys.nonEmpty || delWhen.isEmpty,
      "deleteWhen requires mergeKeys (delete rows are keyed)")
    // overwritePartitions flips the sink to per-trigger dynamic
    // partition restatement — exclusive with the upsert options
    val restate = parameters.get("overwritePartitions")
      .exists(_.equalsIgnoreCase("true"))
    require(!restate || (keys.isEmpty && delWhen.isEmpty),
      "overwritePartitions is exclusive with mergeKeys/deleteWhen")
    new GraftLakeSink(sqlContext, rootOf(parameters),
      parameters.get("txnAppId"), keys, delWhen, restate)
  }
}
