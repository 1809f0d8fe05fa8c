package graft.lake

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

/** One-way EXPORT of a graft table as a Delta Lake table
  * (https://github.com/delta-io/delta/blob/master/PROTOCOL.md): a
  * `_delta_log/` of versioned JSON commits any Delta-reading engine
  * (Spark+delta-spark, Trino, DuckDB's delta extension, delta-rs /
  * polars) can scan — the second half of the lakehouse-interop story
  * next to [[IcebergExport]]. Data files are referenced by ABSOLUTE
  * URI into the graft table's `data/` dir (the same zero-copy handoff
  * Delta itself uses for SHALLOW CLONE); the export directory holds
  * only the log.
  *
  * What each `add` action carries beyond the path: `partitionValues`
  * for identity-partitioned columns (graft's hive layout does not
  * store them in the data files — exactly Delta's own convention),
  * and a `stats` JSON of `numRecords` / `minValues` / `maxValues` /
  * `nullCount` re-encoded from the graft manifest's per-file bounds
  * and null counts, so a Delta reader data-skips as well as graft
  * does. String bounds are exact by construction (graft drops, never
  * truncates, over-long string stats), so no truncation-tie-breaker
  * handling is needed.
  *
  * Partition mapping: IDENTITY fields export as Delta partition
  * columns value-for-value. Non-identity transforms (bucket / day /
  * month / year / truncate) have no Delta-declarable equivalent —
  * those fields are simply NOT declared (their SOURCE columns live in
  * the data files, so every row reads back correctly; only
  * partition-level skipping degrades to the stats-based kind). This
  * is a documented downgrade, not a correctness risk — unlike
  * Iceberg's bucket case, where declaring the transform with the
  * wrong hash would mis-prune, an undeclared transform cannot.
  *
  * Scope (refused loudly otherwise):
  *   - outstanding MOR artifacts (equality / position deletes,
  *     deletion vectors): Delta expresses row-level deletes only via
  *     its own deletion-vector encoding (RoaringBitmap in puffin-like
  *     files, reader version 3) — re-encoding is out of scope;
  *     `compact()` first;
  *   - live files that predate a schema evolution (graft's name
  *     mapping ≙ Delta column mapping, which this export does not
  *     declare) — `compact()` rewrites them under the current schema.
  *
  * [[publish]] appends the current snapshot as version N+1 — adds for
  * new files, removes for dropped ones, O(delta) JSON — the
  * per-commit mirror cadence. Schema or partition drift is refused
  * (same policy as [[IcebergExport.publish]]): the exported history's
  * schema is frozen at first export; re-binding old versions would
  * change what time-travel reads return. [[checkpoint]] folds the log
  * into a spec-shaped parquet checkpoint + `_last_checkpoint`, so a
  * long-published mirror's readers replay O(1) files instead of
  * O(versions), and aged JSON commits become deletable.
  */
object DeltaExport {

  /** `txn.appId` under which each export/publish commit records the
    * source graft snapshot id. The spec requires checkpoints to carry
    * the latest `txn` per appId, so publish idempotence SURVIVES
    * checkpoint + aged-JSON cleanup — commitInfo (also written, for
    * human readers) does not. */
  private[lake] val PublishAppId = "graft-publish"

  private def pad(v: Long): String = f"$v%020d"

  /** An existing-log probe that SURVIVES log cleanup: after
    * [[checkpoint]] the aged JSON commits (version 0 included) are
    * deletable, so "is version-0 JSON present" would misclassify a
    * long-published mirror as a fresh directory and let [[export]]
    * rewrite version 0 as a new full snapshot — silently resetting
    * time travel and skipping every drift gate. ANY commit JSON or a
    * `_last_checkpoint` marks the directory as owned by a log. */
  private def hasLog(fs: org.apache.hadoop.fs.FileSystem,
      destDir: String): Boolean = {
    val logDir = new Path(destDir, "_delta_log")
    if (!fs.exists(logDir)) return false
    val commitRe = """\d{20}\.json""".r
    fs.listStatus(logDir).exists { s =>
      val n = s.getPath.getName
      n == "_last_checkpoint" || commitRe.matches(n)
    }
  }

  /** Export `table`'s current snapshot under `destDir` as Delta
    * version 0; returns the absolute path of the written commit JSON.
    * `atSnapshot` pins a RETAINED historical snapshot (time-travel
    * handoff). */
  def export(table: LakeTable, destDir: String,
      atSnapshot: Option[Long] = None): String = {
    val conf = table.spark.sessionState.newHadoopConf()
    val fs = new Path(destDir).getFileSystem(conf)
    require(!hasLog(fs, destDir),
      s"$destDir already holds a Delta log — publish() appends to it")
    writeVersion(table, destDir, atSnapshot, version = 0L,
      prevLive = Map.empty, withMeta = true)
  }

  /** CONTINUOUS publish: append the table's current snapshot to an
    * already-exported Delta table as version N+1 (adds for new files,
    * removes for dropped ones — O(delta) metadata). A fresh directory
    * degenerates to [[export]]; re-publishing the already-published
    * graft snapshot is an idempotent no-op. */
  def publish(table: LakeTable, destDir: String,
      atSnapshot: Option[Long] = None): String = {
    val conf = table.spark.sessionState.newHadoopConf()
    val fs = new Path(destDir).getFileSystem(conf)
    if (!hasLog(fs, destDir))
      return export(table, destDir, atSnapshot)
    val st = DeltaImport.state(table.spark, destDir, versionAsOf = None)
    val snap = snapOf(table, atSnapshot)
    if (st.graftSnapshotId.contains(snap.snapshotId))
      return new Path(destDir,
        s"_delta_log/${pad(st.version)}.json").toString
    // frozen-shape gates: same policy as the Iceberg publisher
    val sch = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    require(st.schema.json == sch.json,
      "schema drift since the last publish — the exported history's " +
        "schema is frozen at first export; export to a fresh directory")
    val identNow = PartitionSpec.parseAll(snap.partitionColumns)
      .filter(_.isIdentity).map(_.source)
    require(st.partitionColumns == identNow,
      "partition drift since the last publish — export to a fresh " +
        "directory")
    writeVersion(table, destDir, atSnapshot, version = st.version + 1,
      // canonical (encoded) key AND value: the remove action must name
      // the file with the same encoded string its add used
      prevLive = st.adds.map(a => DeltaImport.canonUri(a.uri) ->
        new Path(a.uri).toUri.toString).toMap,
      withMeta = false)
  }

  private def snapOf(table: LakeTable, atSnapshot: Option[Long]) =
    atSnapshot.map(table.snapshot).getOrElse(
      table.currentSnapshot.getOrElse(throw new IllegalStateException(
        "no committed snapshot to export")))

  private def writeVersion(table: LakeTable, destDir: String,
      atSnapshot: Option[Long], version: Long,
      prevLive: Map[String, String], withMeta: Boolean): String = {
    val snap = snapOf(table, atSnapshot)
    require(snap.deleteFiles.isEmpty && snap.posDeleteFiles.isEmpty &&
        snap.dvFiles.isEmpty,
      s"snapshot ${snap.snapshotId} carries merge-on-read delete " +
        "artifacts — Delta expresses row deletes only via its own " +
        "deletion-vector encoding (out of scope); compact() first")
    locally {
      val evolved = snap.liveFiles
        .filter(f => snap.fileRenames.getOrElse(f, Map.empty).nonEmpty)
      require(evolved.isEmpty,
        s"${evolved.size} live files predate a schema evolution and " +
          "read through graft's name mapping (≙ Delta column mapping, " +
          "not declared by this export) — compact() before export. " +
          s"First: ${evolved.take(3).mkString(", ")}")
    }
    val spark = table.spark
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(destDir).getFileSystem(conf)
    val tableFs = new Path(table.root).getFileSystem(conf)
    // the Delta PROTOCOL requires URL-encoded paths; Path.toUri is the
    // same encoder Spark's _metadata.file_path uses (space → %20,
    // hive-escaped '%' → %25, '+' literal), so hive-special partition
    // values round-trip exactly through the import's URI decoding
    def absUri(rel: String): String =
      tableFs.makeQualified(new Path(table.root, rel)).toUri.toString

    val sch = DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]
    val fields = PartitionSpec.parseAll(snap.partitionColumns)
    val identFields = fields.filter(_.isIdentity)
    val m = Snapshot.mapper

    val lines = Seq.newBuilder[String]
    locally { // commitInfo first (spec convention; readers ignore it)
      val ci = m.createObjectNode()
      val o = ci.putObject("commitInfo")
      o.put("timestamp", snap.timestampMs)
      o.put("operation", if (withMeta) "WRITE" else "REPLACE TABLE")
      o.putObject("operationParameters")
      o.put("graftSnapshotId", snap.snapshotId)
      lines += m.writeValueAsString(ci)
    }
    locally { // durable idempotence marker (survives log cleanup)
      val tx = m.createObjectNode()
      val o = tx.putObject("txn")
      o.put("appId", PublishAppId)
      o.put("version", snap.snapshotId)
      o.put("lastUpdated", snap.timestampMs)
      lines += m.writeValueAsString(tx)
    }
    if (withMeta) {
      val pr = m.createObjectNode()
      val p = pr.putObject("protocol")
      p.put("minReaderVersion", 1)
      p.put("minWriterVersion", 2)
      lines += m.writeValueAsString(pr)
      val md = m.createObjectNode()
      val o = md.putObject("metaData")
      o.put("id", java.util.UUID.nameUUIDFromBytes(
        table.root.getBytes(StandardCharsets.UTF_8)).toString)
      val fmt = o.putObject("format")
      fmt.put("provider", "parquet")
      fmt.putObject("options")
      o.put("schemaString", sch.json)
      val pc = o.putArray("partitionColumns")
      identFields.foreach(f => pc.add(f.source))
      val cfg = o.putObject("configuration")
      cfg.put("graft.table-root", table.root)
      o.put("createdTime", snap.timestampMs)
      lines += m.writeValueAsString(md)
    }

    // identity partition value from the hive path (the same parse the
    // Iceberg exporter uses — graft never stores identity values in
    // the data file)
    def partValueRaw(f: PartitionSpec.Field, rel: String): Option[String] = {
      val seg = rel.split('/').find(_.startsWith(f.dirName + "="))
        .map(_.substring(f.dirName.length + 1))
        .getOrElse(return None)
      val raw = FileStats.unescapePathSegment(seg)
      if (raw == "__HIVE_DEFAULT_PARTITION__") None else Some(raw)
    }

    // graft stat-domain string → the Delta stats JSON value for the
    // column type. None = no tested encoding → the column is omitted
    // (per-column stats are optional; readers keep the file).
    def statJson(o: ObjectNode, name: String, dt: DataType,
        v: String): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        o.put(name, v.toLong); true
      case BooleanType => o.put(name, v.toLong != 0L); true
      case FloatType | DoubleType =>
        val d = v.toDouble
        // NaN/Inf have no JSON literal — omit, never approximate
        if (java.lang.Double.isFinite(d)) { o.put(name, d); true }
        else false
      case StringType => o.put(name, v); true
      case DateType => // stat domain = epoch days
        o.put(name, java.time.LocalDate.ofEpochDay(v.toLong).toString)
        true
      case TimestampType => // stat domain = epoch micros, exact ISO-8601
        val micros = v.toLong
        val inst = java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)
        o.put(name, inst.toString); true
      case _ => false
    }

    val identSet = identFields.map(_.source).toSet
    val dataCols = sch.fields.filterNot(f => identSet(f.name))
    // absUri is ALREADY the canonical encoded form — canonUri takes
    // decoded/literal input only (Path keeps literals, so re-encoding
    // an encoded string would double-escape '%')
    val liveNow = snap.liveFiles.map(rel =>
      DeltaImport.normUri(absUri(rel)) -> rel).toMap
    val newRels = snap.liveFiles.filterNot(rel =>
      prevLive.contains(DeltaImport.normUri(absUri(rel))))
    val goneUris = prevLive.filterNot { case (norm, _) =>
      liveNow.contains(norm) }.values

    newRels.foreach { rel =>
      val info = snap.fileInfo.getOrElse(rel,
        throw new IllegalStateException(
          s"no size/row manifest info for $rel — legacy manifest; " +
            "rewrite (compact) before export"))
      val add = m.createObjectNode()
      val o = add.putObject("add")
      o.put("path", absUri(rel))
      val pv = o.putObject("partitionValues")
      identFields.foreach { f =>
        partValueRaw(f, rel) match {
          case Some(v) => pv.put(f.source, v)
          case None => pv.putNull(f.source)
        }
      }
      o.put("size", info.bytes)
      o.put("modificationTime", snap.timestampMs)
      o.put("dataChange", true)
      val fileStats = snap.fileStats.getOrElse(rel, Map.empty)
      val st = m.createObjectNode()
      st.put("numRecords", info.rows)
      val mins = st.putObject("minValues")
      val maxs = st.putObject("maxValues")
      val nulls = st.putObject("nullCount")
      dataCols.foreach { f =>
        fileStats.get(f.name).foreach { cs =>
          if (statJson(mins, f.name, f.dataType, cs.min))
            statJson(maxs, f.name, f.dataType, cs.max)
        }
        fileStats.get(FileStats.nullsKey(f.name)).foreach { cs =>
          nulls.put(f.name, cs.min.toLong)
        }
      }
      o.put("stats", m.writeValueAsString(st))
      lines += m.writeValueAsString(add)
    }
    goneUris.foreach { uri =>
      val rm = m.createObjectNode()
      val o = rm.putObject("remove")
      o.put("path", uri)
      o.put("deletionTimestamp", snap.timestampMs)
      o.put("dataChange", true)
      lines += m.writeValueAsString(rm)
    }

    val logDir = new Path(destDir, "_delta_log")
    fs.mkdirs(logDir)
    val commit = new Path(logDir, s"${pad(version)}.json")
    // exclusive create — two concurrent publishers of the same version
    // surface a conflict instead of silently overwriting history
    LakeTable.writeStringExclusive(fs, commit,
      lines.result().mkString("", "\n", "\n"))
    fs.makeQualified(commit).toString
  }

  /** Fold the log at `destDir` into a spec-shaped parquet CHECKPOINT
    * of the latest version (one row per action: protocol, metaData,
    * each live add) plus `_last_checkpoint`, after which readers
    * replay O(1) files and JSON commits ≤ the checkpoint version are
    * no longer needed for current-state reads. Returns the checkpoint
    * version. */
  def checkpoint(spark: org.apache.spark.sql.SparkSession,
      destDir: String): Long = {
    import org.apache.spark.sql.Row
    val st = DeltaImport.state(spark, destDir, versionAsOf = None)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(destDir).getFileSystem(conf)
    val m = Snapshot.mapper
    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val formatT = StructType(Seq(
      StructField("provider", StringType),
      StructField("options", MapType(StringType, StringType))))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format", formatT),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType,
        valueContainsNull = true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType),
      StructField("stats", StringType)))
    val removeT = StructType(Seq(
      StructField("path", StringType),
      StructField("deletionTimestamp", LongType),
      StructField("dataChange", BooleanType)))
    val txnT = StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))
    val ckptT = StructType(Seq(
      StructField("protocol", protocolT),
      StructField("metaData", metaT),
      StructField("add", addT),
      StructField("remove", removeT),
      StructField("txn", txnT)))
    // checkpoint paths MUST be the canonical URL-ENCODED form the JSON
    // commits use (AddFile.uri is the DECODED path the scan opens;
    // Path.toUri encodes exactly once) — a decoded path here would be
    // decoded AGAIN on replay and break every hive-special partition
    // value the first time state is seeded from a checkpoint
    def enc(uri: String): String = new Path(uri).toUri.toString
    val protoRow = Row(Row(st.minReaderVersion, st.minWriterVersion),
      null, null, null, null)
    val metaRow = Row(null, Row(st.metaId,
      Row("parquet", Map.empty[String, String]), st.schema.json,
      st.partitionColumns, st.configuration, st.createdTime),
      null, null, null)
    val addRows = st.adds.map(a => Row(null, null,
      Row(enc(a.uri), a.partitionValues.map { case (k, v) =>
        k -> v.orNull }, a.size, a.modificationTime, true,
        a.stats.orNull), null, null))
    // un-expired remove tombstones: the spec expects them (a VACUUM or
    // CDF consumer layered on the exported log reasons over recent
    // removes); expired ones age out of the checkpoint
    val retentionMs = spark.conf
      .getOption("spark.graft.delta.tombstone-retention-ms")
      .map(_.toLong).getOrElse(7L * 24 * 3600 * 1000)
    val cutoff = System.currentTimeMillis() - retentionMs
    val rmRows = st.tombstones.filter(_._2 >= cutoff)
      .map { case (uri, ts) =>
        Row(null, null, null, Row(enc(uri), ts, true), null) }
    val txnRows = st.txns.toSeq.map { case (app, v) =>
      Row(null, null, null, null, Row(app, v)) }
    val actionRows = protoRow +: metaRow +:
      (addRows ++ rmRows ++ txnRows)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(actionRows, 1), ckptT)
    val ckpt = new Path(destDir,
      s"_delta_log/${pad(st.version)}.checkpoint.parquet")
    val tmpDir = new Path(destDir, s"_delta_log/.ckpt-tmp-${st.version}")
    df.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
    val part = fs.listStatus(tmpDir).map(_.getPath)
      .find(p => p.getName.endsWith(".parquet")).getOrElse(
        throw new IllegalStateException("checkpoint write produced no file"))
    if (fs.exists(ckpt)) fs.delete(ckpt, false)
    fs.rename(part, ckpt)
    fs.delete(tmpDir, true)
    val lc = m.createObjectNode()
    lc.put("version", st.version)
    lc.put("size", actionRows.size.toLong)
    val lcP = new Path(destDir, "_delta_log/_last_checkpoint")
    val tmp = new Path(destDir, s"_delta_log/._last_checkpoint.tmp")
    // a crashed prior checkpoint may have left the temp behind — it is
    // never live state (readers only see _last_checkpoint), reclaim it
    if (fs.exists(tmp)) fs.delete(tmp, false)
    LakeTable.writeStringExclusive(fs, tmp, m.writeValueAsString(lc))
    if (fs.exists(lcP)) fs.delete(lcP, false)
    fs.rename(tmp, lcP)
    st.version
  }
}
