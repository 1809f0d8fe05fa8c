package graft.lake

import com.fasterxml.jackson.databind.node.ObjectNode

import scala.jdk.CollectionConverters._

/** Manifest state of ONE live data file: everything the per-snapshot
  * metadata tracks per file, gathered so it can live in a manifest
  * CHUNK instead of inline in the snapshot JSON.
  *
  * Mirrors an Iceberg manifest entry (data file path + partition/stat
  * fields + sequence number); the reference's stack gets this layering
  * from Iceberg's format-version 2 (reference:
  * scripts/bronze-silver.py:197 sets `format-version=2`). */
final case class ManifestEntry(
    path: String,
    /** Data sequence number (snapshot id that added the file); 0 =
      * pre-MOR legacy (every equality delete applies). */
    seq: Long,
    /** Per-column min/max bounds in [[FileStats]]' normalized domain. */
    stats: Map[String, ColStat],
    /** current column name → physical as-written name (renames only). */
    renames: Map[String, String],
    /** Size/row-count; None = unknown (legacy manifest). */
    info: Option[FileInfo],
    /** Partition-spec id the file was written under (0 = creation
      * spec) — see [[Snapshot.fileSpec]]. */
    specId: Long = 0L)

/** Chunked manifest IO — the scalable commit-metadata layer.
  *
  * Why: serializing the ENTIRE live-file manifest into every snapshot
  * JSON is O(table) metadata written per commit — invisible at test
  * scale, the metadata layer's bottleneck at 100 TB (~10⁶ files ×
  * ~300 B of stats each ⇒ ~300 MB rewritten per append). Iceberg's
  * answer is manifest files + a manifest list that REUSES the parent
  * snapshot's manifests; this is the same shape:
  *
  *   - per-file state lives in immutable chunk files
  *     (`metadata/m-<uuid>.json`, ≤ [[ChunkTargetEntries]] entries);
  *   - each snapshot JSON carries only scalars, the commit's file
  *     DELTA, the (small) delete-file lists, and the NAMES of the
  *     chunks covering its live files;
  *   - a commit reuses every parent chunk whose entries are unchanged,
  *     rewrites (shrinks) only chunks that lost or changed entries
  *     (cost ≤ one chunk, never the table), and writes the added
  *     entries as fresh chunks — O(delta + affected chunks) metadata
  *     bytes per commit;
  *   - small chunks are folded together LSM-style by size class
  *     ([[MergeFanout]] per level) so N single-file appends settle into
  *     O(N/target + log N) chunks, with each fold writing at most
  *     [[ChunkTargetEntries]] entries — an amortized-constant tax that
  *     keeps snapshot loads from reading one chunk per historic commit.
  */
object ManifestIO {

  /** Max entries a planned chunk may hold (≈ Iceberg's manifest target
    * size). At ~300 B/entry a full chunk is ~150 KB of JSON. */
  val ChunkTargetEntries: Int = 512

  /** Size-class fanout for the small-chunk fold: when a class
    * [F^k, F^(k+1)) holds ≥ F chunks, the F smallest fold into one. */
  val MergeFanout: Int = 8

  /** Per-file manifest entries of snapshot `s`, in live-file order. */
  def entriesOf(s: Snapshot): Seq[ManifestEntry] =
    s.liveFiles.map { f =>
      ManifestEntry(f, s.fileSeq.getOrElse(f, 0L),
        s.fileStats.getOrElse(f, Map.empty),
        s.fileRenames.getOrElse(f, Map.empty).filter(_._2.nonEmpty),
        s.fileInfo.get(f),
        s.fileSpec.getOrElse(f, 0L))
    }

  /** Rebuild the snapshot's per-file maps from loaded chunk entries
    * (inverse of [[entriesOf]]); entry order defines live-file order. */
  def materialize(base: Snapshot, entries: Seq[ManifestEntry]): Snapshot =
    base.copy(
      liveFiles = entries.map(_.path),
      fileStats = entries.iterator
        .filter(_.stats.nonEmpty).map(e => e.path -> e.stats).toMap,
      fileRenames = entries.iterator
        .filter(_.renames.nonEmpty).map(e => e.path -> e.renames).toMap,
      fileSeq = entries.iterator
        .filter(_.seq != 0L).map(e => e.path -> e.seq).toMap,
      fileInfo = entries.iterator
        .flatMap(e => e.info.map(e.path -> _)).toMap,
      fileSpec = entries.iterator
        .filter(_.specId != 0L).map(e => e.path -> e.specId).toMap)

  /** Chunk-level commit plan: `reused` parent chunks carried by name,
    * `toWrite` entry groups needing fresh chunk files. */
  final case class Plan(reused: Seq[String], toWrite: Seq[Seq[ManifestEntry]])

  /** Append-shaped plan: the parent's chunks carry over by name (no
    * entry can have changed when nothing was removed or overridden) and
    * only the `added` entries are grouped into fresh chunks — O(delta)
    * planning, no per-entry equality scan. `load` resolves sizes and
    * entries for the fold only (cache-backed; at larger scale the entry
    * counts could ride in the snapshot list JSON instead). */
  def planAppend(parentManifests: Seq[String], added: Seq[ManifestEntry],
      load: String => Seq[ManifestEntry]): Plan =
    fold(Plan(parentManifests,
        added.grouped(ChunkTargetEntries).toVector),
      parentManifests.map(n => n -> load(n)).toMap)

  /** Plan the chunk set for `snap` given the reusable `candidates`
    * (parent's chunks, plus e.g. a rollback target's): a candidate is
    * reused verbatim iff every entry it holds is still exactly live in
    * `snap` and not already covered; survivors of partially-dead chunks
    * and brand-new entries are regrouped into fresh chunks; then the
    * size-class fold keeps the chunk count from growing one-per-commit. */
  def plan(snap: Snapshot,
      candidates: Seq[(String, Seq[ManifestEntry])]): Plan = {
    val target: Map[String, ManifestEntry] =
      entriesOf(snap).map(e => e.path -> e).toMap
    val covered = scala.collection.mutable.Set.empty[String]
    val reused = Vector.newBuilder[(String, Seq[ManifestEntry])]
    val carryOver = Vector.newBuilder[ManifestEntry]
    candidates.foreach { case (name, entries) =>
      val allValid = entries.nonEmpty && entries.forall(e =>
        !covered(e.path) && target.get(e.path).contains(e))
      if (allValid) {
        reused += (name -> entries)
        covered ++= entries.iterator.map(_.path)
      } else {
        // chunk lost/changed entries: keep its survivors, drop the rest
        val valid = entries.filter(e =>
          !covered(e.path) && target.get(e.path).contains(e))
        carryOver ++= valid
        covered ++= valid.iterator.map(_.path)
      }
    }
    val fresh = snap.liveFiles.filterNot(covered).map(target)
    val toWrite = (carryOver.result() ++ fresh)
      .grouped(ChunkTargetEntries).toVector
    fold(Plan(reused.result().map(_._1), toWrite),
      reused.result().toMap)
  }

  /** LSM-style small-chunk fold: repeatedly, if a size class
    * [F^k, F^(k+1)) holds ≥ F chunks and the F smallest fit in one
    * target-size chunk, fold them (a reused chunk entering a fold is
    * demoted to a rewrite). Each fold writes ≤ [[ChunkTargetEntries]]
    * entries, so per-commit metadata stays bounded by delta + a
    * constant; amortized over N commits the fold tax is O(log N). */
  private def fold(p: Plan,
      reusedEntries: Map[String, Seq[ManifestEntry]]): Plan = {
    // work list: Left(name) = reused on disk, Right(entries) = to write
    var work: Vector[Either[String, Seq[ManifestEntry]]] =
      p.reused.map(Left(_)).toVector ++ p.toWrite.map(Right(_))
    def sizeOf(c: Either[String, Seq[ManifestEntry]]): Int = c match {
      case Left(n) => reusedEntries(n).size
      case Right(es) => es.size
    }
    def entriesOfChunk(c: Either[String, Seq[ManifestEntry]]) = c match {
      case Left(n) => reusedEntries(n)
      case Right(es) => es
    }
    def sizeClass(n: Int): Int = {
      var k = 0; var bound = MergeFanout.toLong
      while (n >= bound) { k += 1; bound *= MergeFanout }
      k
    }
    var changed = true
    while (changed) {
      changed = false
      val byClass = work.zipWithIndex
        .filter { case (c, _) => sizeOf(c) < ChunkTargetEntries }
        .groupBy { case (c, _) => sizeClass(sizeOf(c)) }
      byClass.toSeq.sortBy(_._1).foreach { case (_, members) =>
        if (!changed && members.size >= MergeFanout) {
          val smallest = members.sortBy { case (c, _) => sizeOf(c) }
            .take(MergeFanout)
          if (smallest.map { case (c, _) => sizeOf(c) }.sum
              <= ChunkTargetEntries) {
            val idxs = smallest.map(_._2).toSet
            val merged = smallest.flatMap { case (c, _) => entriesOfChunk(c) }
            work = work.zipWithIndex
              .filterNot { case (_, i) => idxs(i) }.map(_._1) :+
              Right(merged.map(identity))
            changed = true
          }
        }
      }
    }
    Plan(work.collect { case Left(n) => n },
      work.collect { case Right(es) => es })
  }

  /** Chunk-level stat summary: the union of the chunk's entry bounds,
    * per column — the manifest-list-level index a pruned scan consults
    * BEFORE loading any chunk. A column appears only when EVERY entry
    * records bounds for it (a chunk hiding an unknown-bounds file must
    * stay conservatively loadable); `__nulls__` pseudo-stats sum
    * (IS NULL can skip a chunk only when its total null count is 0);
    * bloom and partition-dir pseudo-columns are omitted (chunk-level
    * union would be meaningless or unsound). */
  def summarize(entries: Seq[ManifestEntry],
      schema: org.apache.spark.sql.types.StructType)
      : Map[String, ColStat] = {
    if (entries.isEmpty || entries.exists(_.stats.isEmpty)) return Map.empty
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    val common = entries.map(_.stats.keySet).reduce(_ intersect _)
    common.iterator.flatMap { k =>
      if (FileStats.isNullsKey(k)) {
        val base = k.substring(FileStats.NullsPrefix.length)
        val counts = entries.map(e =>
          scala.util.Try(e.stats(k).min.toLong).toOption)
        if (!types.contains(base) || counts.exists(_.isEmpty)) None
        else {
          val s = counts.flatten.sum
          Some(k -> ColStat(s.toString, s.toString))
        }
      } else types.get(k) match {
        case Some(dt) if FileStats.supportsLiteralPruning(dt) =>
          try {
            val mn = entries.map(_.stats(k).min)
              .reduce((a, b) => if (FileStats.cmp(dt, a, b) <= 0) a else b)
            val mx = entries.map(_.stats(k).max)
              .reduce((a, b) => if (FileStats.cmp(dt, a, b) >= 0) a else b)
            Some(k -> ColStat(mn, mx))
          } catch { case _: Exception => None }
        case _ => None
      }
    }.toMap
  }

  // ------------------------------------------------------------------ codec

  /** Chunk file JSON: `{"entries": [{path, seq, stats, renames, bytes,
    * rows}, …]}`. Immutable once written; named `m-<uuid>.json`. */
  def chunkToJson(entries: Seq[ManifestEntry]): String = {
    val m = Snapshot.mapper
    val n = m.createObjectNode()
    val arr = n.putArray("entries")
    entries.foreach { e =>
      val o = arr.addObject()
      o.put("path", e.path)
      if (e.seq != 0L) o.put("seq", e.seq)
      if (e.stats.nonEmpty) {
        val so = o.putObject("stats")
        e.stats.toSeq.sortBy(_._1).foreach { case (c, cs) =>
          val co = so.putObject(c)
          co.put("min", cs.min); co.put("max", cs.max)
        }
      }
      if (e.renames.nonEmpty) {
        val ro = o.putObject("renames")
        e.renames.toSeq.sortBy(_._1).foreach { case (c, p) => ro.put(c, p) }
      }
      e.info.foreach { fi =>
        o.put("bytes", fi.bytes); o.put("rows", fi.rows)
        fi.firstRowId.foreach(o.put("first_row_id", _))
      }
      if (e.specId != 0L) o.put("spec", e.specId)
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  def chunkFromJson(json: String): Seq[ManifestEntry] = {
    val n = Snapshot.mapper.readTree(json)
    n.path("entries").elements().asScala.map { o =>
      ManifestEntry(
        path = o.path("path").asText(),
        seq = if (o.has("seq")) o.path("seq").asLong() else 0L,
        stats =
          if (!o.has("stats")) Map.empty
          else o.path("stats").properties().asScala.map { ce =>
            ce.getKey -> ColStat(ce.getValue.path("min").asText(),
              ce.getValue.path("max").asText())
          }.toMap,
        renames =
          if (!o.has("renames")) Map.empty
          else o.path("renames").properties().asScala
            .map(ce => ce.getKey -> ce.getValue.asText()).toMap,
        info =
          if (o.has("bytes"))
            Some(FileInfo(o.path("bytes").asLong(),
              o.path("rows").asLong(),
              if (o.hasNonNull("first_row_id"))
                Some(o.path("first_row_id").asLong()) else None))
          else None,
        specId = if (o.has("spec")) o.path("spec").asLong() else 0L)
    }.toSeq
  }

  /** Manifest-list snapshot JSON (`"manifests"` key marks the format;
    * legacy inline snapshots carry `"live_files"` instead): scalars,
    * the commit's file delta, chunk names, and the delete-file lists —
    * O(delta) bytes, never O(table).
    *
    * `inline` carries this commit's NEW delta chunks embedded in the
    * snapshot doc itself (named `iv<id>-<k>.json`) — one exclusive
    * create per commit instead of two, and the chunk rides the commit
    * point atomically (a lost race strands NOTHING on disk). An inline
    * chunk referenced past its host's expiry is promoted to a real
    * file of the same name by [[LakeTable.expireWhere]]. */
  def listToJson(s: Snapshot,
      inline: Map[String, Seq[ManifestEntry]] = Map.empty): String = {
    val m = Snapshot.mapper
    val n: ObjectNode = m.createObjectNode()
    if (inline.nonEmpty) {
      val io = n.putObject("inline_chunks")
      inline.toSeq.sortBy(_._1).foreach { case (name, entries) =>
        io.set[ObjectNode](name, m.readTree(chunkToJson(entries))
          .asInstanceOf[ObjectNode])
      }
    }
    n.put("snapshot_id", s.snapshotId)
    s.parentId.foreach(p => n.put("parent_id", p))
    n.put("timestamp_ms", s.timestampMs)
    n.put("operation", s.operation)
    def arr(name: String, xs: Seq[String]): Unit = {
      val a = n.putArray(name); xs.foreach(a.add)
    }
    arr("added_files", s.addedFiles)
    arr("removed_files", s.removedFiles)
    arr("manifests", s.manifests)
    n.put("schema", s.schemaJson)
    arr("partition_columns", s.partitionColumns)
    if (s.partitionSpecs.nonEmpty) {
      val so = n.putObject("partition_specs")
      s.partitionSpecs.toSeq.sortBy(_._1).foreach { case (id, cols) =>
        val a = so.putArray(id.toString); cols.foreach(a.add)
      }
    }
    if (s.currentSpecId != 0L) n.put("current_spec_id", s.currentSpecId)
    val p = n.putObject("properties")
    s.properties.foreach { case (k, v) => p.put(k, v) }
    if (s.deleteFiles.nonEmpty) {
      val da = n.putArray("delete_files")
      s.deleteFiles.foreach { d =>
        val o = da.addObject()
        o.put("path", d.path); o.put("seq", d.seq)
        val ka = o.putArray("keys"); d.keys.foreach(ka.add)
        val pa = o.putArray("physical_keys"); d.physicalKeys.foreach(pa.add)
      }
    }
    if (s.posDeleteFiles.nonEmpty) {
      val pa = n.putArray("pos_delete_files")
      s.posDeleteFiles.foreach { d =>
        val o = pa.addObject()
        o.put("path", d.path); o.put("seq", d.seq)
      }
    }
    if (s.dvFiles.nonEmpty) {
      val va = n.putArray("dv_files")
      s.dvFiles.foreach { d =>
        val o = va.addObject()
        o.put("path", d.path); o.put("seq", d.seq)
        if (d.bytes > 0L) o.put("bytes", d.bytes)
      }
    }
    if (s.manifestSummaries.nonEmpty) {
      val ms = n.putObject("manifest_summaries")
      s.manifestSummaries.toSeq.sortBy(_._1).foreach { case (name, cols) =>
        val co = ms.putObject(name)
        cols.toSeq.sortBy(_._1).foreach { case (c, cs) =>
          val o = co.putObject(c)
          o.put("min", cs.min); o.put("max", cs.max)
        }
      }
    }
    m.writerWithDefaultPrettyPrinter().writeValueAsString(n)
  }

  /** One embedded delta chunk of a snapshot doc (written by
    * [[listToJson]]'s `inline` map), or None if the doc doesn't carry
    * that name. */
  def inlineChunk(listJson: String, name: String)
      : Option[Seq[ManifestEntry]] = {
    val n = Snapshot.mapper.readTree(listJson).path("inline_chunks")
    if (!n.has(name)) None
    else Some(chunkFromJson(
      Snapshot.mapper.writeValueAsString(n.get(name))))
  }

  /** Every embedded delta chunk of a snapshot doc — loading a doc
    * pre-seeds the chunk cache with these so materializing it never
    * re-reads its own file. */
  def inlineChunksOf(listJson: String): Map[String, Seq[ManifestEntry]] = {
    val n = Snapshot.mapper.readTree(listJson).path("inline_chunks")
    n.properties().asScala.map(e =>
      e.getKey -> chunkFromJson(
        Snapshot.mapper.writeValueAsString(e.getValue))).toMap
  }

  /** Parse a snapshot JSON of EITHER format. For the manifest-list
    * format, `loadChunk` resolves chunk name → entries (callers route
    * through an immutable-chunk cache); legacy inline JSONs parse
    * without touching it. */
  def snapshotFromJson(json: String,
      loadChunk: String => Seq[ManifestEntry]): Snapshot =
    listSkeleton(json) match {
      case None => Snapshot.fromJson(json)
      case Some(skel) =>
        materialize(skel, loadChunks(skel.manifests, loadChunk))
    }

  /** Materialize only the named chunks of a skeleton — the pruned-scan
    * path: callers pass the chunk subset whose [[Snapshot
    * .manifestSummaries]] survive a predicate, and the partial snapshot
    * covers exactly the files those chunks hold. Correct ONLY for reads
    * whose predicate implied the skipped chunks are irrelevant; never
    * cached as the full snapshot. */
  def materializePartial(skel: Snapshot, names: Seq[String],
      loadChunk: String => Seq[ManifestEntry]): Snapshot =
    materialize(skel, loadChunks(names, loadChunk))

  /** Parse a manifest-list snapshot JSON WITHOUT loading any chunk:
    * every scalar field plus chunk names and summaries, with the
    * per-file maps left empty. None for a legacy inline JSON. */
  def listSkeleton(json: String): Option[Snapshot] = {
    val n = Snapshot.mapper.readTree(json)
    if (!n.has("manifests")) return None
    def arr(name: String): Seq[String] =
      n.path(name).elements().asScala.map(_.asText()).toSeq
    val manifests = arr("manifests")
    val skeleton = Snapshot(
      snapshotId = n.path("snapshot_id").asLong(),
      parentId =
        if (n.has("parent_id")) Some(n.path("parent_id").asLong()) else None,
      timestampMs = n.path("timestamp_ms").asLong(),
      operation = n.path("operation").asText(),
      addedFiles = arr("added_files"),
      removedFiles = arr("removed_files"),
      liveFiles = Nil,
      schemaJson = n.path("schema").asText(),
      partitionColumns = arr("partition_columns"),
      properties = n.path("properties").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap,
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
      manifests = manifests,
      partitionSpecs =
        if (!n.has("partition_specs")) Map.empty
        else n.path("partition_specs").properties().asScala.map { e =>
          e.getKey.toLong ->
            e.getValue.elements().asScala.map(_.asText()).toSeq
        }.toMap,
      currentSpecId =
        if (n.has("current_spec_id")) n.path("current_spec_id").asLong()
        else 0L,
      manifestSummaries =
        if (!n.has("manifest_summaries")) Map.empty
        else n.path("manifest_summaries").properties().asScala.map { e =>
          e.getKey -> e.getValue.properties().asScala.map { ce =>
            ce.getKey -> ColStat(ce.getValue.path("min").asText(),
              ce.getValue.path("max").asText())
          }.toMap
        }.toMap)
    Some(skeleton)
  }

  /** Fetch chunks with bounded parallelism, preserving order. Object
    * stores are latency-bound per GET: a 10⁶-file table is ~2k chunks,
    * which serial loading turns into minutes of driver wait; 16
    * concurrent fetches make it seconds. Single-chunk (and cache-warm)
    * loads skip the pool. */
  private def loadChunks(names: Seq[String],
      loadChunk: String => Seq[ManifestEntry]): Seq[ManifestEntry] = {
    if (names.sizeIs <= 1) return names.flatMap(loadChunk)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, names.size))
    try {
      names.map(n => pool.submit(
          new java.util.concurrent.Callable[Seq[ManifestEntry]] {
            def call(): Seq[ManifestEntry] = loadChunk(n)
          }))
        .flatMap(_.get())
    } finally pool.shutdown()
  }
}
