package org.apache.spark.sql.graftlake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{classic, DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.lake.DeltaImport

/** STREAMING tail of a foreign Delta Lake table —
  * `spark.readStream.format("delta-tail").load(dir)` — without the
  * delta-spark jar: offsets are Delta LOG VERSIONS, each micro-batch
  * is [[DeltaImport.incrementalScan]] over the committed version range
  * (exactly the rows those versions added, partition columns
  * reconstructed from partitionValues). The streaming leg of the
  * mirror-consumption story: a table another system continuously
  * publishes (graft's own `publish_delta`, or any Delta writer)
  * streams into graft with the usual exactly-once sink contracts on
  * the write side.
  *
  * APPEND-ONLY logs only in the default mode, refused loudly
  * otherwise (a version that removes files makes "rows added"
  * ill-defined from adds alone). With `readChangeFeed=true` each
  * micro-batch is instead [[DeltaImport.changeScan]] — the spec's CDF
  * resolution: versions carrying `cdc` actions stream their
  * `_change_data` rows (with the writer's `_change_type`), versions
  * without them synthesize `insert`/`delete` rows from the
  * dataChange file actions — so a MERGE-heavy foreign table streams
  * row-level changes instead of failing the append-only gate. The
  * CDF schema appends `_change_type` + `_commit_version`.
  *
  * Options: `startingVersion` (exclusive lower bound, default −1 =
  * deliver everything ever added, version 0 included),
  * `maxVersionsPerTrigger` (admission control, same rate-limit shape
  * as the graft-lake source), `readChangeFeed`. Version discovery is
  * one log-dir listing per trigger — no state replay on the hot
  * path. */
class DeltaTailSource(
    sqlContext: SQLContext,
    dir: String,
    options: Map[String, String]) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  private val startAfter =
    options.getOrElse("startingVersion", "-1").toLong
  private val maxVersions: Option[Long] =
    options.get("maxVersionsPerTrigger").map { v =>
      val n = v.toLong
      require(n > 0, s"maxVersionsPerTrigger must be positive, got $n")
      n
    }

  private val cdf =
    options.getOrElse("readChangeFeed", "false").toBoolean

  // schema (and the reader-feature gates) latch at source creation
  override val schema: StructType =
    DeltaTailSource.schemaFor(sqlContext, dir, cdf)

  private def currentVersion: Long = {
    val logDir = new Path(dir, "_delta_log")
    val fs = logDir.getFileSystem(
      sqlContext.sparkSession.sessionState.newHadoopConf())
    val commitRe = """(\d{20})\.json""".r
    val vs = fs.listStatus(logDir).map(_.getPath.getName).collect {
      case commitRe(v) => v.toLong
    }
    require(vs.nonEmpty, s"$dir: no addressable Delta commits")
    vs.max
  }

  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(currentVersion)

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val head = availableNowTarget.getOrElse(currentVersion)
    val base = Option(start).map(_.json.trim.toLong).getOrElse(startAfter)
    val capped = maxVersions.fold(head)(n => math.min(head, base + n))
    if (capped <= base) start else LongOffset(capped)
  }

  override def getOffset: Option[Offset] = Some(LongOffset(currentVersion))

  private def versionOf(o: Offset): Long = o.json.trim.toLong

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(versionOf).getOrElse(startAfter)
    val hi = versionOf(end)
    val batch = (if (cdf)
        DeltaImport.changeScan(sqlContext.sparkSession, dir, lo, Some(hi))
      else DeltaImport.incrementalScan(
        sqlContext.sparkSession, dir, lo, Some(hi)))
      .select(schema.fieldNames
        .map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    val cs = sqlContext.sparkSession.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      batch.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.toRdd,
      batch.schema, isStreaming = true)
  }

  override def stop(): Unit = ()

  override def toString: String = s"DeltaTailSource[$dir]"
}

object DeltaTailSource {
  /** The stream schema: the table's, plus the CDF columns when
    * `readChangeFeed` is on. */
  private[graftlake] def schemaFor(sqlContext: SQLContext, dir: String,
      cdf: Boolean): StructType = {
    val base = DeltaImport.state(sqlContext.sparkSession, dir, None).schema
    if (!cdf) base
    else StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))
  }
}

class DeltaTailSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "delta-tail"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "delta-tail source requires .load(<delta table dir>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(DeltaTailSource.schemaFor(
      sqlContext, dirOf(parameters),
      parameters.getOrElse("readChangeFeed", "false").toBoolean)))

  override def createSource(sqlContext: SQLContext,
      metadataPath: String, schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new DeltaTailSource(sqlContext, dirOf(parameters), parameters)
}
