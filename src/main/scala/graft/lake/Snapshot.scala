package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import scala.jdk.CollectionConverters._

/** One committed version of a [[LakeTable]].
  *
  * Mirrors the information Iceberg keeps per snapshot that the reference
  * actually consumes (reference: scripts/bronze-silver.py:119,137,149-152 —
  * `.history`'s `snapshot_id`/`made_current_at` and the
  * start/end-snapshot-id incremental read): id, parent, wall-clock commit
  * time, the operation, and the file-level delta.
  *
  * `liveFiles` is the full manifest of data files visible at this version
  * (paths relative to the table root). In-memory the per-file state is
  * materialized; ON DISK it lives in immutable manifest chunk files
  * referenced by name from the snapshot JSON (see [[ManifestIO]] — the
  * Iceberg manifest-list shape), so a commit writes O(delta) metadata,
  * never O(table). `toJson`/`fromJson` here are the LEGACY inline format,
  * kept for reading tables written before the chunked layer.
  */
final case class Snapshot(
    snapshotId: Long,
    parentId: Option[Long],
    timestampMs: Long,
    operation: String, // create | append | overwrite | merge
    addedFiles: Seq[String],
    removedFiles: Seq[String],
    liveFiles: Seq[String],
    schemaJson: String,
    partitionColumns: Seq[String],
    properties: Map[String, String],
    /** Per-live-file column bounds (see [[FileStats]]) — what MERGE/DELETE
      * range-prune against before touching any data. Keyed by the same
      * root-relative path as `liveFiles`; absent file or column = unknown
      * bounds (conservatively scanned). */
    fileStats: Map[String, Map[String, ColStat]] = Map.empty,
    /** Schema-evolution name mapping: file → (current column name →
      * PHYSICAL column name as written in that file). Only files written
      * before a `renameColumn` carry entries, and only for the renamed
      * columns — absent file or column means the physical name equals the
      * current name. This is the name-mapped equivalent of Iceberg's
      * field-id indirection: renames stay metadata-only, no rewrite. */
    fileRenames: Map[String, Map[String, String]] = Map.empty,
    /** Data sequence number per live file = the snapshot id that added it
      * (≡ Iceberg's data sequence numbers). Equality deletes apply only
      * to files with a STRICTLY lower sequence, so a merge's own
      * after-image is never suppressed by its own delete file. Absent
      * file = 0 (pre-MOR legacy; every delete applies). */
    fileSeq: Map[String, Long] = Map.empty,
    /** Live equality-delete files (merge-on-read): each suppresses, from
      * every older data file, the rows whose key columns match any row in
      * the delete file. Cleared by compaction. */
    deleteFiles: Seq[DeleteFile] = Nil,
    /** Live position-delete files (merge-on-read, ≡ Iceberg v2 position
      * deletes): each is a Parquet file of (file_uri, pos) rows
      * suppressing row ordinal `pos` of the NAMED data file. No sequence
      * ordering is needed at read time — a position can only ever target
      * the immutable file it was captured from. Cleared by compaction
      * and overwrite (their rewrites drop the targeted files). */
    posDeleteFiles: Seq[PosDeleteFile] = Nil,
    /** Live DELETION-VECTOR artifacts (≡ Iceberg v3 deletion vectors /
      * Delta DVs): each is a Parquet file of (file STRING, dv
      * ARRAY<BIGINT>, n_deleted BIGINT) rows — one row per targeted
      * data file, `dv` a bitset over row ordinals packed 64/long
      * (bit p of word w set ⇔ ordinal w·64+p is deleted). Produced by
      * [[LakeTable.consolidateDeleteVectors]] folding the accumulated
      * position-delete files; readers pay ONE broadcast per-file
      * bitmap lookup however many delete commits history holds.
      * Cleared by full compaction and overwrite like position
      * deletes. */
    dvFiles: Seq[DvFile] = Nil,
    /** Per-live-file size and row count (≡ Iceberg's `file_size_in_bytes`
      * / `record_count` manifest fields) — what `.files`/`.partitions`
      * report and size-aware maintenance plans against. Absent file
      * (legacy manifest) = unknown. */
    fileInfo: Map[String, FileInfo] = Map.empty,
    /** Names of the immutable manifest CHUNK files (`metadata/m-*.json`)
      * whose entries back this snapshot's per-file state — the manifest
      * list (see [[ManifestIO]]). Empty for a snapshot parsed from the
      * legacy inline format (or not yet planned at commit time); the
      * per-file maps above are always fully materialized either way. */
    manifests: Seq[String] = Nil,
    /** Partition-spec id each live file was WRITTEN under (absent = 0,
      * the creation spec) — what lets a scan read files of different
      * layout eras with separate per-era scans (≡ Iceberg's per-file
      * spec-id after partition evolution). */
    fileSpec: Map[String, Long] = Map.empty,
    /** Registry of every partition spec this table has carried, id →
      * spec strings (≡ Iceberg's `partition-specs` list). Empty means
      * the table never evolved: the registry is {0 → partitionColumns}.
      * `partitionColumns` above always names the CURRENT spec
      * ([[currentSpecId]]) — the one new writes use. */
    partitionSpecs: Map[Long, Seq[String]] = Map.empty,
    currentSpecId: Long = 0L,
    /** Per-manifest-CHUNK column-bound summaries (chunk name → union of
      * its entries' bounds, a column present only when EVERY entry
      * records it; `__nulls__` pseudo-stats sum). What they buy: a
      * pruned scan can decide from the snapshot LIST alone which chunks
      * could hold matching files and materialize only those — capping
      * the O(live-files) driver cost of first materialization at 10⁸
      * files (≡ Iceberg's manifest-list partition summaries). Absent
      * chunk = unknown (conservatively loaded). */
    manifestSummaries: Map[String, Map[String, ColStat]] = Map.empty) {

  /** The spec registry with the never-evolved default folded in. */
  def specsOrDefault: Map[Long, Seq[String]] =
    if (partitionSpecs.isEmpty) Map(0L -> partitionColumns)
    else partitionSpecs

  def toJson: String = {
    val m = Snapshot.mapper
    val n: ObjectNode = m.createObjectNode()
    n.put("snapshot_id", snapshotId)
    parentId.foreach(p => n.put("parent_id", p))
    n.put("timestamp_ms", timestampMs)
    n.put("operation", operation)
    def arr(name: String, xs: Seq[String]): Unit = {
      val a = n.putArray(name); xs.foreach(a.add)
    }
    arr("added_files", addedFiles)
    arr("removed_files", removedFiles)
    arr("live_files", liveFiles)
    n.put("schema", schemaJson)
    arr("partition_columns", partitionColumns)
    val p = n.putObject("properties")
    properties.foreach { case (k, v) => p.put(k, v) }
    if (fileStats.nonEmpty) {
      val so = n.putObject("stats")
      // manifest order follows liveFiles for stable, diffable metadata
      liveFiles.foreach { f =>
        fileStats.get(f).filter(_.nonEmpty).foreach { cols =>
          val fo = so.putObject(f)
          cols.toSeq.sortBy(_._1).foreach { case (c, cs) =>
            val co = fo.putObject(c)
            co.put("min", cs.min)
            co.put("max", cs.max)
          }
        }
      }
    }
    if (fileRenames.nonEmpty) {
      val ro = n.putObject("renames")
      liveFiles.foreach { f =>
        fileRenames.get(f).filter(_.nonEmpty).foreach { cols =>
          val fo = ro.putObject(f)
          cols.toSeq.sortBy(_._1).foreach { case (cur, phys) =>
            fo.put(cur, phys)
          }
        }
      }
    }
    if (fileSeq.nonEmpty) {
      val qo = n.putObject("seq")
      liveFiles.foreach(f => fileSeq.get(f).foreach(s => qo.put(f, s)))
    }
    if (deleteFiles.nonEmpty) {
      val da = n.putArray("delete_files")
      deleteFiles.foreach { d =>
        val o = da.addObject()
        o.put("path", d.path)
        o.put("seq", d.seq)
        val ka = o.putArray("keys"); d.keys.foreach(ka.add)
        val pa = o.putArray("physical_keys"); d.physicalKeys.foreach(pa.add)
      }
    }
    if (posDeleteFiles.nonEmpty) {
      val pa = n.putArray("pos_delete_files")
      posDeleteFiles.foreach { d =>
        val o = pa.addObject()
        o.put("path", d.path)
        o.put("seq", d.seq)
      }
    }
    if (dvFiles.nonEmpty) {
      val va = n.putArray("dv_files")
      dvFiles.foreach { d =>
        val o = va.addObject()
        o.put("path", d.path)
        o.put("seq", d.seq)
        if (d.bytes > 0L) o.put("bytes", d.bytes)
      }
    }
    if (fileInfo.nonEmpty) {
      val io = n.putObject("file_info")
      liveFiles.foreach { f =>
        fileInfo.get(f).foreach { fi =>
          val o = io.putObject(f)
          o.put("bytes", fi.bytes)
          o.put("rows", fi.rows)
          fi.firstRowId.foreach(o.put("first_row_id", _))
        }
      }
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }
}

object Snapshot {
  private[lake] val mapper = new ObjectMapper()

  def fromJson(json: String): Snapshot = {
    val n = mapper.readTree(json)
    def arr(name: String): Seq[String] =
      n.path(name).elements().asScala.map(_.asText()).toSeq
    Snapshot(
      snapshotId = n.path("snapshot_id").asLong(),
      parentId =
        if (n.has("parent_id")) Some(n.path("parent_id").asLong()) else None,
      timestampMs = n.path("timestamp_ms").asLong(),
      operation = n.path("operation").asText(),
      addedFiles = arr("added_files"),
      removedFiles = arr("removed_files"),
      liveFiles = arr("live_files"),
      schemaJson = n.path("schema").asText(),
      partitionColumns = arr("partition_columns"),
      properties = n.path("properties").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap,
      fileStats =
        if (!n.has("stats")) Map.empty
        else n.path("stats").properties().asScala.map { fe =>
          fe.getKey -> fe.getValue.properties().asScala.map { ce =>
            ce.getKey -> ColStat(ce.getValue.path("min").asText(),
              ce.getValue.path("max").asText())
          }.toMap
        }.toMap,
      fileRenames =
        if (!n.has("renames")) Map.empty
        else n.path("renames").properties().asScala.map { fe =>
          fe.getKey -> fe.getValue.properties().asScala.map { ce =>
            ce.getKey -> ce.getValue.asText()
          }.toMap
        }.toMap,
      fileSeq =
        if (!n.has("seq")) Map.empty
        else n.path("seq").properties().asScala
          .map(e => e.getKey -> e.getValue.asLong()).toMap,
      deleteFiles =
        if (!n.has("delete_files")) Nil
        else n.path("delete_files").elements().asScala.map { o =>
          DeleteFile(
            o.path("path").asText(),
            o.path("seq").asLong(),
            o.path("keys").elements().asScala.map(_.asText()).toSeq,
            o.path("physical_keys").elements().asScala.map(_.asText()).toSeq)
        }.toSeq,
      posDeleteFiles =
        if (!n.has("pos_delete_files")) Nil
        else n.path("pos_delete_files").elements().asScala.map { o =>
          PosDeleteFile(o.path("path").asText(), o.path("seq").asLong())
        }.toSeq,
      dvFiles =
        if (!n.has("dv_files")) Nil
        else n.path("dv_files").elements().asScala.map { o =>
          DvFile(o.path("path").asText(), o.path("seq").asLong(),
            o.path("bytes").asLong())
        }.toSeq,
      fileInfo =
        if (!n.has("file_info")) Map.empty
        else n.path("file_info").properties().asScala.map { e =>
          e.getKey -> FileInfo(e.getValue.path("bytes").asLong(),
            e.getValue.path("rows").asLong(),
            if (e.getValue.hasNonNull("first_row_id"))
              Some(e.getValue.path("first_row_id").asLong()) else None)
        }.toMap
    )
  }
}

/** Size and row count of one data file (manifest bookkeeping).
  * `firstRowId` is row-lineage bookkeeping (Iceberg v3 shape): the
  * table-unique id of this file's first row — row N of the file is
  * `firstRowId + N` unless the file physically carries a `_row_id`
  * column (rewritten files do, preserving carried rows' original
  * ids). Assigned at commit from the `row.next-id` counter when the
  * table opts into `write.row-lineage`. */
final case class FileInfo(bytes: Long, rows: Long,
    firstRowId: Option[Long] = None)

/** Min/max of one column in one data file, encoded in the type-normalized
  * string domain defined by [[FileStats]]. */
final case class ColStat(min: String, max: String)

/** One equality-delete file (merge-on-read): a Parquet file of key rows
  * that suppresses matching rows in every data file with
  * `fileSeq < seq`. `keys` are the CURRENT logical column names (renamed
  * along with the table); `physicalKeys` are the names as written in the
  * file, fixed forever (same indirection as Snapshot.fileRenames). */
final case class DeleteFile(path: String, seq: Long, keys: Seq[String],
    physicalKeys: Seq[String])

/** One position-delete file (merge-on-read, ≡ Iceberg v2): a Parquet
  * file of (file_uri STRING, pos BIGINT) rows — `file_uri` is the target
  * data file's scan URI (as Spark's `_metadata.file_path` reports it),
  * `pos` the row ordinal within that physical file. `seq` records the
  * committing snapshot (bookkeeping only — positions bind to immutable
  * files, so application needs no sequence ordering). */
final case class PosDeleteFile(path: String, seq: Long)

/** One deletion-vector artifact (≡ Iceberg v3 DVs / Delta deletion
  * vectors, parquet-encoded): a Parquet file of
  * (file STRING, dv ARRAY<BIGINT>, n_deleted BIGINT) rows — one
  * compressed bitmap of deleted row ordinals PER data file, the fold
  * of every position delete accumulated against that file. `file` is
  * the target's table-relative path (`data/…`); `seq` records the
  * consolidating snapshot (bookkeeping only, like
  * [[PosDeleteFile.seq]]). `bytes` is the artifact's on-disk size,
  * recorded at commit so the read path can size-gate its broadcast
  * without a plan-time `getFileStatus`; 0 means unknown (a snapshot
  * written before the field existed) and falls back to a live stat. */
final case class DvFile(path: String, seq: Long, bytes: Long = 0L)
