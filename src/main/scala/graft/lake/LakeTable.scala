package graft.lake

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftlake.GraftManifestFileIndex
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** A snapshot-versioned, partitioned, Parquet-backed table — the engine's
  * native reimplementation of the Iceberg capabilities the reference uses
  * (reference: scripts/raw-bronze.py:158-185, scripts/bronze-silver.py:115-217):
  *
  *   - atomic snapshot commits (versioned metadata + HEAD pointer swap),
  *   - append / create-or-replace writes with hive-style partitioning,
  *   - full scan of the current snapshot,
  *   - incremental scan of the rows appended in a snapshot-id range,
  *   - a `.history` metadata view,
  *   - MERGE (upsert) keyed on business columns — copy-on-write (rewrite
  *     matched files) or merge-on-read (equality-delete files + the
  *     after-image, zero rewrite) per the table's write.merge.mode /
  *     write.delete.mode properties (reference configures both:
  *     raw-bronze.py:161-172; runs COW: raw-bronze.py:207),
  *   - schema evolution (add/rename/drop column) as metadata-only
  *     commits, and VERSION/TIMESTAMP AS OF time travel.
  *
  * Scale design (targets a 1000-executor cluster / 100 TB, tested local):
  *   - All data movement is executor-side `DataFrame` reads/writes; the
  *     driver touches only file *names* (the manifest), never rows.
  *   - MERGE prunes to affected files by scanning ONLY the key columns
  *     (column-pruned Parquet scan + semi-join against the distinct source
  *     keys — AQE broadcasts the key set when small), then rewrites only
  *     the files that contain matched keys. Untouched files carry forward
  *     into the new snapshot unmodified.
  *   - Incremental scans read only the files added in the requested
  *     snapshot range — no re-scan of history (the reference's core trick,
  *     scripts/bronze-silver.py:149-152).
  *   - Commits are optimistic single-writer: exclusive-create of the new
  *     metadata file detects racing committers; HEAD swap is an atomic
  *     rename. (The reference's orchestration is strictly sequential,
  *     aws-step-function/step-function.json.)
  */
final class LakeTable private (
    val spark: SparkSession,
    val root: String) {

  import LakeTable._

  // sessionState.newHadoopConf() folds runtime `spark.conf.set("fs...")`
  // entries on top of the core conf (same resolution as Spark's sources)
  private val hconf = spark.sessionState.newHadoopConf()
  // session-wide, once: fixes the parquet-pushdown -0.0 equality hole
  // (see NormalizeZeroComparisonLiterals) for every scan in the session
  NormalizeZeroComparisonLiterals.ensure(spark)
  // metadata-only COUNT(*) rewrite for manifest-backed scans
  ManifestAggRule.ensure(spark)

  private val rootPath = new Path(root)
  private def fs: FileSystem = rootPath.getFileSystem(hconf)
  private val metaDir = new Path(rootPath, METADATA_DIR)
  private val dataDir = new Path(rootPath, DATA_DIR)
  private val headPath = new Path(metaDir, HEAD)

  // ---------------------------------------------------------------- metadata

  def currentSnapshotId: Option[Long] =
    readPointer(headPath).map(_.trim.toLong)

  /** Pointer swap/read protocol, selected per session (see
    * [[PointerStore]]): rename-based by default, generation files for
    * object stores without atomic rename. */
  private val pointerStore: PointerStore =
    PointerStore.forTable(spark, fs, rootPath.toUri, hconf)

  private def readPointer(p: Path): Option[String] = pointerStore.read(p)

  def snapshot(id: Long): Snapshot = {
    val p = new Path(metaDir, s"v$id.json")
    require(fs.exists(p),
      s"snapshot $id not found in $root (expired or never committed)")
    // Materialized-snapshot cache: a v<id>.json at-or-below HEAD is
    // immutable (commits only ever create NEW versions; the one file
    // that can be rewritten is a crashed commit's beyond-HEAD debris,
    // which is never cached). The existence check above still runs
    // first so an expired snapshot keeps failing after expiry. This
    // keeps the repeated `current` loads of a multi-step op from
    // re-materializing the per-file maps each time.
    val cached = snapCache.get(id)
    if (cached != null) return cached
    val json = readString(fs, p)
    // the doc's OWN inline chunks are in hand — seed the cache so
    // materializing it doesn't re-read the file per chunk (each seed
    // still counts as ONE cold chunk load for the pruning metric)
    ManifestIO.inlineChunksOf(json).foreach { case (n, e) =>
      if (chunkCache.putIfAbsent(n, e) == null)
        chunkLoads.incrementAndGet()
    }
    val s = ManifestIO.snapshotFromJson(json, loadChunk)
    if (currentSnapshotId.exists(id <= _)) {
      // coarse bound: the access pattern is HEAD plus a few historical
      // reads; wholesale clear keeps the cache O(1)-ish without LRU
      // bookkeeping on a long-lived writer's 10⁴ commits
      if (snapCache.size >= 64) snapCache.clear()
      snapCache.put(id, s)
    }
    s
  }

  private val snapCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Snapshot]()

  /** Skeleton load of one snapshot doc — scalars + file DELTA + chunk
    * names, per-file maps left EMPTY, zero chunk loads (see
    * [[ManifestIO.listSkeleton]]). What range planning (incremental
    * scan, stream tailing) needs per snapshot; callers that touch
    * per-file state must use [[snapshot]]. A cached full snapshot
    * serves as its own skeleton. */
  private def snapshotSkeleton(id: Long): Snapshot = {
    val full = snapCache.get(id)
    if (full != null) return full
    val c = skelCache.get(id)
    if (c != null) return c
    val p = new Path(metaDir, s"v$id.json")
    require(fs.exists(p),
      s"snapshot $id not found in $root (expired or never committed)")
    val json = readString(fs, p)
    val s = ManifestIO.listSkeleton(json).getOrElse(Snapshot.fromJson(json))
    if (currentSnapshotId.exists(id <= _)) {
      if (skelCache.size >= 256) skelCache.clear()
      skelCache.put(id, s)
    }
    s
  }

  private val skelCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Snapshot]()

  /** Manifest chunks are immutable once written (uuid-named, never
    * rewritten in place), so they cache safely across snapshot loads —
    * re-loading a snapshot re-reads only its small list JSON. */
  private val chunkCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[ManifestEntry]]()
  /** Cold chunk reads (cache misses) — observable by specs asserting
    * that summary-pruned scans load strictly fewer chunks. */
  private[lake] val chunkLoads = new java.util.concurrent.atomic.AtomicLong
  /** Inline delta chunks: `iv<hostVersion>-<k>.json`, embedded in their
    * host snapshot doc at commit (zero extra creates); a real file of
    * the same name exists only once expiry PROMOTED the chunk past its
    * host's death — the file, when present, wins. */
  private val InlineChunkRe = "^iv(\\d+)-\\d+\\.json$".r
  private def loadChunk(name: String): Seq[ManifestEntry] =
    chunkCache.computeIfAbsent(name, { n =>
      chunkLoads.incrementAndGet()
      val p = new Path(metaDir, n)
      n match {
        case InlineChunkRe(vid) if !fs.exists(p) =>
          ManifestIO.inlineChunk(
              readString(fs, new Path(metaDir, s"v$vid.json")), n)
            .getOrElse(throw new IllegalStateException(
              s"chunk $n absent from both $metaDir and v$vid.json"))
        case _ => ManifestIO.chunkFromJson(readString(fs, p))
      }
    })

  def currentSnapshot: Option[Snapshot] = currentSnapshotId.map(snapshot)

  private def current: Snapshot = currentSnapshot.getOrElse(
    throw new IllegalStateException(s"table $root has no committed snapshot"))

  def schema: StructType =
    DataType.fromJson(current.schemaJson).asInstanceOf[StructType]

  /** Partition SPEC strings as committed (identity column names and/or
    * transform specs like `bucket(8, key)` — see [[PartitionSpec]]). */
  def partitionColumns: Seq[String] = current.partitionColumns

  /** Source columns of the CURRENT spec's identity partition fields —
    * the columns dynamic partition overwrite replaces by. */
  def identityPartitionColumns: Seq[String] =
    partitionFields.filter(_.isIdentity).map(_.source)

  /** Hint-broadcast a driver-built ONE-ROW-PER-FILE frame, dropping
    * the hint above a byte bound (house rule: every explicit broadcast
    * hint is size-gated). These frames are path + a few fixed fields —
    * MBs at 10⁶ files — but a 10⁸-file table pushes past Spark's 8 GB
    * hint ceiling, so above `spark.graft.lake.filelist-broadcast-max-
    * bytes` (default 1 GB) the hint drops and Spark plans the join
    * freely (still one slim row per file on the shuffled side). */
  private def maybeBroadcastFileList(df: DataFrame,
      estBytes: Long): DataFrame = {
    val max = spark.conf
      .getOption("spark.graft.lake.filelist-broadcast-max-bytes")
      .map(_.toLong).getOrElse(1L << 30)
    if (estBytes <= max) broadcast(df) else df
  }

  /** Estimated broadcast bytes of one short row per file path. */
  private def fileListBytes(paths: Iterable[String]): Long =
    paths.iterator.map(64L + _.length * 2L).sum

  private def partitionFields: Seq[PartitionSpec.Field] =
    PartitionSpec.parseAll(current.partitionColumns)

  /** Source columns of the current AND every historical partition spec
    * — rename/drop must refuse all of them (old-era files recover the
    * column from their directory layout by name). */
  private def specSources: Set[String] =
    current.specsOrDefault.values.flatten.toSeq
      .flatMap(s => PartitionSpec.parseAll(Seq(s))).map(_.source).toSet

  def properties: Map[String, String] = current.properties

  /** All retained snapshots, oldest → newest (linear history; early
    * snapshots may have been removed by [[expireSnapshots]]). Metadata
    * files beyond HEAD are orphans of a crashed commit (written but
    * never made current) and are excluded. */
  def snapshots: Seq[Snapshot] = {
    if (!fs.exists(metaDir)) return Nil
    val head = currentSnapshotId.getOrElse(return Nil)
    val re = "^v(\\d+)\\.json$".r
    fs.listStatus(metaDir).toSeq
      .flatMap(s => s.getPath.getName match {
        case re(id) => Some(id.toLong)
        case _ => None
      })
      .filter(_ <= head)
      .sorted.map(snapshot)
  }

  /** Compact per-snapshot summaries for the metadata VIEWS (history /
    * snapshots): parsing N full `v<id>.json` files per query is
    * O(history) I/O — 1.2 s at 300 commits, tens of seconds at a
    * month of micro-batches — so summaries live in a single
    * `metadata/snaplog.json` CACHE. Snapshots are immutable, so cached
    * entries can never go stale; any reader reconciles the ids the
    * cache is missing (reads only THOSE v-jsons) and rewrites the
    * cache via write-to-temp + rename (best-effort: concurrent
    * writers both produce valid content, last rename wins, and a
    * reader that finds no cache just pays the reads it would have
    * paid anyway). Expired ids drop out at the next rewrite because
    * reconciliation starts from the live v-json listing. */
  def snapshotSummaries: Seq[LakeTable.SnapSummary] = {
    val head = currentSnapshotId.getOrElse(return Nil)
    val re = "^v(\\d+)\\.json$".r
    val ids = fs.listStatus(metaDir).toSeq
      .flatMap(_.getPath.getName match {
        case re(id) => Some(id.toLong)
        case _ => None
      })
      .filter(_ <= head).sorted
    val cached = readSnaplog()
    val missing = ids.filterNot(cached.contains)
    val fresh = missing.map { id =>
      val s = snapshot(id)
      id -> LakeTable.SnapSummary(s.snapshotId,
        s.parentId, s.timestampMs, s.operation,
        s.addedFiles.size.toLong, s.removedFiles.size.toLong,
        s.liveFiles.size.toLong)
    }.toMap
    val all = ids.map(id => cached.getOrElse(id, fresh(id)))
    if (missing.nonEmpty) writeSnaplog(all)
    all
  }

  private def snaplogPath = new Path(metaDir, "snaplog.json")

  private def readSnaplog(): Map[Long, LakeTable.SnapSummary] =
    try {
      if (!fs.exists(snaplogPath)) Map.empty
      else {
        val n = Snapshot.mapper.readTree(readString(fs, snaplogPath))
        n.path("entries").elements().asScala.map { e =>
          e.path("id").asLong() -> LakeTable.SnapSummary(
            e.path("id").asLong(),
            if (e.hasNonNull("parent")) Some(e.path("parent").asLong())
            else None,
            e.path("ts").asLong(), e.path("op").asText(),
            e.path("na").asLong(), e.path("nr").asLong(),
            e.path("nl").asLong())
        }.toMap
      }
    } catch { case _: Exception => Map.empty } // cache only — rebuild

  private def writeSnaplog(all: Seq[LakeTable.SnapSummary]): Unit =
    try {
      val m = Snapshot.mapper
      val rootN = m.createObjectNode()
      val arr = rootN.putArray("entries")
      all.foreach { s =>
        val e = arr.addObject()
        e.put("id", s.id)
        s.parentId.foreach(e.put("parent", _))
        e.put("ts", s.tsMs); e.put("op", s.op)
        e.put("na", s.nAdded); e.put("nr", s.nRemoved)
        e.put("nl", s.nLive)
      }
      val tmp = new Path(metaDir,
        s".snaplog-${UUID.randomUUID()}.json")
      writeStringExclusive(fs, tmp, m.writeValueAsString(rootN))
      fs.delete(snaplogPath, false)
      if (!fs.rename(tmp, snaplogPath)) fs.delete(tmp, false)
    } catch { case _: Exception => () } // cache only — never fail a read

  /** Metadata view ≡ Iceberg's `<table>.history`
    * (reference: scripts/bronze-silver.py:119,137). */
  def history: DataFrame = {
    val rows = snapshotSummaries.map { s =>
      Row(new java.sql.Timestamp(s.tsMs), s.id,
        s.parentId.map(Long.box).orNull, true, s.op)
    }
    val sch = StructType(Seq(
      StructField("made_current_at", TimestampType),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("parent_id", LongType),
      StructField("is_current_ancestor", BooleanType, nullable = false),
      StructField("operation", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), sch)
  }

  /** Metadata view ≡ Iceberg's `<table>.files`: one row per live data
    * file of the current snapshot — path, hive partition spec, data
    * sequence number, and the recorded per-column bounds (the manifest
    * information MERGE/DELETE prune against). Pure driver-side manifest
    * synthesis, zero data read — what an operator of a 100 TB table
    * inspects to see file layout, clustering, and prune-ability. */
  def files: DataFrame = {
    val snap = current
    // Executor-side manifest read: the chunk files ARE the table's file
    // inventory, so `.files` is a distributed JSON scan + explode — no
    // driver-side row materialization. At 10⁶ files that is a few
    // thousand chunk files read in parallel, not a 300 MB driver list.
    if (snap.manifests.isEmpty) return filesLegacy(snap)
    // file-backed chunks scan DISTRIBUTED as before; inline chunks
    // (small by the commit-path bound) parse driver-side from their
    // host docs and union in through the same JSON reader
    val (inline, backed) = snap.manifests.partition(n =>
      InlineChunkRe.matches(n) && !fs.exists(new Path(metaDir, n)))
    val backedDf =
      if (backed.isEmpty) None
      else Some(spark.read.option("multiLine", "true")
        .schema(CHUNK_READ_SCHEMA)
        .json(backed.map(n => new Path(metaDir, n).toString): _*))
    val inlineDf =
      if (inline.isEmpty) None
      else {
        val enc = org.apache.spark.sql.Encoders.STRING
        Some(spark.read.schema(CHUNK_READ_SCHEMA).json(
          spark.createDataset(inline.map(n =>
            ManifestIO.chunkToJson(loadChunk(n))))(enc)))
      }
    val parts = split(col("e.path"), "/")
    (backedDf.toSeq ++ inlineDf.toSeq).reduce(_ unionByName _)
      .select(explode(col("entries")).as("e"))
      .select(
        col("e.path").as("file_path"),
        // hive `col=value` segments between data/ and the file name
        array_join(slice(parts, lit(2), size(parts) - 2), "/")
          .as("partition"),
        coalesce(col("e.seq"), lit(0L)).as("seq"),
        col("e.bytes").as("size_bytes"),
        when(col("e.rows") >= 0, col("e.rows")).as("record_count"),
        // bloom/null-count pseudo-columns are pruning internals
        map_filter(coalesce(col("e.stats"), map().cast(BOUNDS_TYPE)),
          (k, _) => !k.startsWith(BloomStats.Prefix) &&
            !k.startsWith(FileStats.NullsPrefix)).as("bounds"))
  }

  /** Driver-side `.files` for tables still on the legacy inline
    * manifest (or empty tables — zero chunks to scan). */
  private def filesLegacy(snap: Snapshot): DataFrame = {
    val sch = StructType(Seq(
      StructField("file_path", StringType, nullable = false),
      StructField("partition", StringType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("size_bytes", LongType), // null = legacy manifest
      StructField("record_count", LongType),
      StructField("bounds", BOUNDS_TYPE, nullable = false)))
    val rows = snap.liveFiles.sorted.map { f =>
      val partition = f.split('/').drop(1).dropRight(1).mkString("/")
      val bounds = snap.fileStats.getOrElse(f, Map.empty)
        .filterNot { case (c, _) => FileStats.isInternalKey(c) }
        .map { case (c, cs) => c -> Row(cs.min, cs.max) }
      val fi = snap.fileInfo.get(f)
      Row(f, partition, snap.fileSeq.getOrElse(f, 0L),
        fi.map(i => Long.box(i.bytes)).orNull,
        fi.filter(_.rows >= 0).map(i => Long.box(i.rows)).orNull,
        bounds)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sch)
  }

  /** Metadata view ≡ Iceberg's `<table>.snapshots`: one row per retained
    * snapshot with its commit delta sizes. Driver-side, zero data read. */
  def snapshotsTable: DataFrame = {
    val sch = StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("parent_id", LongType),
      StructField("committed_at", TimestampType),
      StructField("operation", StringType),
      StructField("n_added_files", LongType, nullable = false),
      StructField("n_removed_files", LongType, nullable = false),
      StructField("n_live_files", LongType, nullable = false)))
    val rows = snapshotSummaries.map { s =>
      Row(s.id, s.parentId.map(Long.box).orNull,
        new java.sql.Timestamp(s.tsMs), s.op,
        s.nAdded, s.nRemoved, s.nLive)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sch)
  }

  /** Metadata view ≡ Iceberg's `<table>.partitions`: one row per live
    * hive partition with its file count and data-sequence range — the
    * operator's view of partition balance and compaction debt.
    * Driver-side manifest aggregation, zero data read. */
  def partitions: DataFrame = {
    // executor-side aggregation over the chunk-backed `.files` view —
    // a sum over null is kept null-propagating (a partition with ANY
    // file of unknown size/rows reports unknown totals, same contract
    // as the legacy driver synthesis)
    files.groupBy(col("partition")).agg(
      count(lit(1)).as("file_count"),
      min(col("seq")).as("min_seq"),
      max(col("seq")).as("max_seq"),
      when(count(col("size_bytes")) === count(lit(1)),
        sum(col("size_bytes"))).as("total_bytes"),
      when(count(col("record_count")) === count(lit(1)),
        sum(col("record_count"))).as("total_rows"))
  }

  /** Metadata view ≡ Iceberg's `<table>.refs`: the named snapshot
    * pointers (tags/branches). Driver-side, O(refs). */
  def refsTable: DataFrame = {
    val sch = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false)))
    val rows = refs.toSeq.sortBy(_._1).map { case (n, (tpe, id)) =>
      Row(n, tpe, id)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sch)
  }

  /** Metadata view ≡ Iceberg's `<table>.manifests`: one row per
    * manifest chunk of the current snapshot with its entry count —
    * the operator's view of metadata-layer health (chunk count should
    * track table size / fold policy, not commit count). Entry counts
    * come from the immutable-chunk cache; O(chunks) driver rows. */
  def manifestsTable: DataFrame = {
    val snap = current
    val sch = StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("entry_count", LongType, nullable = false)))
    val rows = snap.manifests.map(n =>
      Row(s"$METADATA_DIR/$n", loadChunk(n).size.toLong))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sch)
  }

  // ------------------------------------------------------------------- reads

  /** Full scan of the current snapshot (≡ reading the Iceberg table,
    * reference: scripts/bronze-silver.py:135). Filters/projections pushed
    * by Catalyst reach the Parquet scan as usual. */
  def scan(): DataFrame = readFiles(current.liveFiles)

  private[lake] def rowLineageEnabled: Boolean =
    properties.get(PROP_ROW_LINEAGE).contains("true")

  /** [[scan]] plus the stable `_row_id` lineage column (Iceberg v3
    * row lineage): ids are assigned ONCE at first commit — per-file
    * `first_row_id` blocks carved from the `row.next-id` counter, so
    * appends store NOTHING per row — and survive every COW rewrite
    * (merge/update/delete/compaction materialize the carried ids
    * physically in the rewritten files). An updated row keeps its id;
    * an inserted row gets a fresh one. MOR after-images are NEW rows
    * and get fresh ids (carrying would require reading the matched
    * target rows, which merge-on-read exists to avoid). Requires the
    * table to have been CREATED with `write.row-lineage=true`. */
  def scanWithLineage(): DataFrame = {
    require(rowLineageEnabled,
      s"table $root has no row lineage — create it with " +
        s"$PROP_ROW_LINEAGE=true")
    val base = current
    readFilesAs(base, base.liveFiles, withLineage = true)
  }

  /** Read `files` for a COW REWRITE: on a lineage table each row
    * carries its resolved `_row_id`, so [[writeDataFiles]] persists
    * the ids physically and the rewrite preserves them. */
  private def readFilesForRewrite(ctx: Snapshot,
      files: Seq[String]): DataFrame =
    readFilesAs(ctx, files, withLineage = rowLineageEnabled)

  /** RUNTIME-FILTERED scan for a key-equality join (≡ Iceberg/Delta
    * dynamic file pruning): before planning a `fact ⋈ dim` join, prune
    * this table's FILE LIST against the join side's actual key set —
    * per-file key bounds, hidden-partition transforms (a `bucket(N)`
    * table drops to the source keys' buckets), and per-file Bloom
    * filters all apply, via the same stack MERGE/DELETE use. Costs one
    * tiny agg over `source`'s keys (+ a capped hash collect when Blooms
    * exist) and a driver-side manifest walk — no table data is read.
    *
    * A dropped file provably contains NO row matching any source key, so
    * `scanForJoin(dim, keys).join(dim, keys)` ≡ `scan().join(dim, keys)`
    * — but on a 100 TB fact table with a selective dim the scan opens
    * only the matching sliver of files, the pruning Catalyst alone
    * cannot do (the dim's key set is a runtime value). Rows from kept
    * files still need the join itself to filter non-matching rows. */
  def scanForJoin(source: DataFrame, keys: Seq[String]): DataFrame = {
    val base = current
    readFilesAs(base, pruneByStats(base, source, keys))
  }

  /** Pruned scan: `predicate` both filters rows AND prunes the FILE LIST
    * driver-side against the manifest before Spark ever lists a file —
    * per-file column bounds, identity partition values, and bucket-hash
    * equality (hidden partitioning) all apply. This is the read-side
    * analogue of the MERGE/DELETE pruning: on a `bucket(N, key)` table,
    * `scan(col("key") === k)` opens 1/N of the files, which Catalyst
    * alone cannot do (the derived partition value is hidden from it).
    * Semantics are identical to `scan().where(predicate)`. */
  def scan(predicate: org.apache.spark.sql.Column): DataFrame = {
    val base = currentPrunedFor(predicate)
    readFilesAs(base, pruneByPredicate(base, predicate)).where(predicate)
  }

  /** HEAD snapshot for a predicate-pruned read, materializing only the
    * manifest chunks whose list-level summaries ([[Snapshot
    * .manifestSummaries]]) could hold a matching file. On a cold table
    * handle this caps the driver cost of a selective scan at
    * O(surviving chunks) instead of O(live files) — the 10⁸-file
    * analogue of Iceberg planning from manifest-list partition
    * summaries. Falls back to the fully-materialized snapshot when it
    * is already cached (free), the format predates summaries, or the
    * predicate does not analyze; a partial snapshot is never cached. */
  private def currentPrunedFor(
      predicate: org.apache.spark.sql.Column): Snapshot = {
    val id = currentSnapshotId.getOrElse(
      throw new IllegalStateException(
        s"table $root has no committed snapshot"))
    if (snapCache.get(id) != null) return snapshot(id)
    val p = new Path(metaDir, s"v$id.json")
    require(fs.exists(p),
      s"snapshot $id not found in $root (expired or never committed)")
    val json = readString(fs, p)
    ManifestIO.listSkeleton(json) match {
      case Some(skel) if skel.manifestSummaries.nonEmpty =>
        val sch = DataType.fromJson(skel.schemaJson).asInstanceOf[StructType]
        analyzedCond(predicate, sch) match {
          case Some(cond) =>
            val kept = PredicatePruning.candidateFiles(cond, sch,
              skel.manifests, skel.manifestSummaries)
            if (kept.sizeIs >= skel.manifests.size) snapshot(id)
            else ManifestIO.materializePartial(skel, kept, loadChunk)
          case None => snapshot(id)
        }
      case _ => snapshot(id)
    }
  }

  /** Exact row count. When every live file carries a manifest row count
    * and no equality/position deletes are outstanding, the answer comes
    * from the MANIFEST alone — O(live files) driver arithmetic, zero
    * data-file I/O, zero Spark jobs (≡ Iceberg answering `COUNT(*)`
    * from manifest `record_count`s). At 100 TB that is the difference
    * between a metadata lookup and a full-table scan for the most
    * common health probe a pipeline runs. Outstanding deletes (their
    * suppressed-row count is unknowable without reading them) or a
    * legacy manifest without row counts fall back to `scan().count()`. */
  def countRows(): Long = {
    val s = current
    val metadataExact = s.deleteFiles.isEmpty && s.posDeleteFiles.isEmpty &&
      s.dvFiles.isEmpty && s.liveFiles.forall(s.fileInfo.contains)
    if (metadataExact) s.liveFiles.map(s.fileInfo(_).rows).sum
    else scan().count()
  }

  /** Rows appended in snapshot range `(startExclusive, endInclusive]`
    * (≡ Iceberg incremental read, reference: scripts/bronze-silver.py:149-152).
    * Append-only ranges only, matching Iceberg's contract — a snapshot
    * produced by overwrite/merge in the range is an error. */
  def incrementalScan(startExclusive: Long, endInclusive: Long,
      skipNonAppends: Boolean = false): DataFrame = {
    require(endInclusive >= startExclusive,
      s"bad snapshot range ($startExclusive, $endInclusive]")
    // SKELETONS for the range (op + file delta, no per-file maps, no
    // chunk loads): the plan only needs each snapshot's addedFiles;
    // the one FULL materialization is the range-end context below.
    // A streaming tail at commit depth otherwise pays O(range × table)
    // doc+chunk parsing PER MICRO-BATCH for state it never reads.
    val all = ((startExclusive + 1) to endInclusive).map(snapshotSkeleton)
    // evolve-schema/evolve-spec commits add no data rows — they are
    // transparent to an incremental range (added files still read under
    // the current schema; spec eras are grouped per file)
    def appendShaped(s: Snapshot): Boolean =
      s.operation == "append" || s.operation == "create" ||
        s.operation == "add-files" || // an import adds, removes nothing
        s.operation == "evolve-schema" || s.operation == "evolve-spec" ||
        s.operation == "set-properties" || s.operation == "unset-properties"
    val snaps =
      if (skipNonAppends) all // non-append snapshots contribute no files
      else {
        all.find(!appendShaped(_)).foreach { s =>
          throw new UnsupportedOperationException(
            s"incremental scan over non-append snapshot ${s.snapshotId} " +
              s"(${s.operation}) — append-only ranges are supported, " +
              "matching Iceberg's incremental-read contract " +
              "(pass skipNonAppends=true to tail appends only)")
        }
        all
      }
    // end-of-range context: the added files are all live there, so its
    // schema and rename mappings are exactly the ones they carry.
    // With skipNonAppends, only files still live at range end are read
    // (a merge inside the range may have rewritten an earlier append's
    // file — its rows arrive via that file's replacement, or not at
    // all if deleted; tailing semantics, same as Iceberg's
    // streaming-skip-overwrite-snapshots).
    if (snaps.isEmpty) readFilesAs(current, Nil)
    else {
      val ctx = snapshot(snaps.last.snapshotId) // the ONE full load
      val added =
        if (!skipNonAppends) snaps.flatMap(_.addedFiles)
        else {
          val live = ctx.liveFiles.toSet
          snaps.filter(appendShaped).flatMap(_.addedFiles).filter(live)
        }
      readFilesAs(ctx, added)
    }
  }

  /** Row-level changelog of snapshot range `(startExclusive,
    * endInclusive]` (≡ Iceberg's `create_changelog_view` CDC read):
    * emits every row the range inserted or deleted, tagged with
    * `_change_type` ('insert' | 'delete') and `_commit_snapshot_id`.
    *
    * Per commit, cost ∝ its FILE DELTA, never table size: inserts =
    * rows of its added files EXCEPT ALL rows of its removed files
    * (byte-identical carried rows cancel — a COW rewrite's untouched
    * rows produce nothing), deletes = the reverse. A commit that adds
    * equality/position delete files — or removes them, as a rollback
    * can — additionally diffs the carried files' visibility in both
    * directions (suppressed pre-image rows as deletes, resurrected rows
    * as inserts) — the one case whose cost is the carried files' size,
    * same as Iceberg. `compact` is content-neutral by construction and
    * emits nothing; a schema-changing commit in range (evolve-schema, or
    * a rollback across an evolution) is rejected — a changelog needs one
    * row shape.
    */
  def changes(startExclusive: Long, endInclusive: Long): DataFrame =
    changesInternal(startExclusive, endInclusive, lineage = false)

  /** [[changes]] with ROW IDENTITY (requires `write.row-lineage`):
    * each change row carries its `_row_id`, and a COW rewrite's
    * modified rows are classified `update_preimage`/`update_postimage`
    * instead of an anonymous delete+insert pair — the Delta-CDF change
    * vocabulary, derivable only because the rewrite preserved ids.
    * Rows without ids (written pre-enablement) and MOR after-images
    * (new row identity by design) stay plain insert/delete. Cost: two
    * id-keyed semi/anti joins per commit over the commit's OWN delta —
    * still ∝ changed rows, never table size. */
  def changesWithLineage(startExclusive: Long,
      endInclusive: Long): DataFrame = {
    require(rowLineageEnabled,
      s"table $root has no row lineage — create it with " +
        s"$PROP_ROW_LINEAGE=true")
    changesInternal(startExclusive, endInclusive, lineage = true)
  }

  private def changesInternal(startExclusive: Long, endInclusive: Long,
      lineage: Boolean): DataFrame = {
    require(endInclusive >= startExclusive,
      s"bad snapshot range ($startExclusive, $endInclusive]")
    val snaps = ((startExclusive + 1) to endInclusive).map(snapshot)
    snaps.foreach { s =>
      val parentSchema = s.parentId.map(p => snapshot(p).schemaJson)
      if (parentSchema.exists(_ != s.schemaJson))
        throw new UnsupportedOperationException(
          s"changelog over schema-changing ${s.operation} snapshot " +
            s"${s.snapshotId} is not supported (one row shape per range)")
    }
    val sch = schema
    val outSchema = StructType(sch.fields ++
      (if (lineage) Seq(StructField(ROW_ID_COL, LongType)) else Nil) ++
      Seq(
        StructField(CHANGE_TYPE_COL, StringType, nullable = false),
        StructField(CHANGE_SNAP_COL, LongType, nullable = false)))
    def tag(df: DataFrame, tpe: String, id: Long): DataFrame =
      df.withColumn(CHANGE_TYPE_COL, lit(tpe))
        .withColumn(CHANGE_SNAP_COL, lit(id))
    // lineage classification by ID-KEYED JOIN: a row id on BOTH sides
    // of a commit's delta is the same row (the rewrite preserved its
    // id) — same content means CARRIED (emits nothing, the join's own
    // null-safe struct compare cancels it), different content means
    // update pre/post images; one-sided ids are genuine inserts /
    // deletes. One 8-byte-keyed full-outer join replaces the two
    // FULL-ROW-HASH set differences AND the id-partitioned window the
    // previous formulation paid (three wide shuffles → one slim one).
    // Id-less rows (pre-lineage files, MOR after-images — new row
    // identity by design) cannot key a join; they keep the
    // content-cancelling exceptAll pair over their own isNull subset,
    // which prunes to ~nothing on a lineage-from-birth table.
    def classify(post: DataFrame, pre: DataFrame,
        id: Long): Seq[DataFrame] = {
      val dataCols = post.columns.filter(_ != ROW_ID_COL).toSeq
      val img = struct(dataCols.map(col): _*)
      // variant admits no comparison (Spark pins it unorderable), so
      // the CHANGE TEST compares each variant-bearing column's
      // canonical JSON text; the carried image keeps original values.
      // Variant-free tables (the common case) compare the carried
      // image directly — shipping a second identical struct through
      // the join would double the shuffle width for nothing.
      val types = post.schema.fields.map(f => f.name -> f.dataType).toMap
      val needCmp = dataCols.exists(c =>
        LakeTable.containsVariant(types(c)))
      val imgCmp = struct(dataCols.map(c =>
        if (LakeTable.containsVariant(types(c))) to_json(col(c)).as(c)
        else col(c)): _*)
      def side(df: DataFrame, imgName: String,
          cmpName: String): DataFrame =
        df.where(col(ROW_ID_COL).isNotNull)
          .select(Seq(col(ROW_ID_COL), img.as(imgName)) ++
            (if (needCmp) Seq(imgCmp.as(cmpName)) else Nil): _*)
      val p = side(post, "__graft_post", "__graft_postc")
      val q = side(pre, "__graft_pre", "__graft_prec")
      val changed = p.join(q, Seq(ROW_ID_COL), "full_outer")
        .where(
          if (needCmp) !(col("__graft_postc") <=> col("__graft_prec"))
          else !(col("__graft_post") <=> col("__graft_pre")))
      // each surviving id yields its present sides in one pass
      val rows = changed.select(col(ROW_ID_COL), explode(array(
          when(col("__graft_post").isNotNull, struct(
            col("__graft_post").as("img"),
            when(col("__graft_pre").isNotNull,
              lit("update_postimage")).otherwise(lit("insert"))
              .as("t"))),
          when(col("__graft_pre").isNotNull, struct(
            col("__graft_pre").as("img"),
            when(col("__graft_post").isNotNull,
              lit("update_preimage")).otherwise(lit("delete"))
              .as("t"))))).as("__graft_e"))
        .where(col("__graft_e").isNotNull)
        .select(dataCols.map(c =>
            col("__graft_e.img").getField(c).as(c)) ++ Seq(
          col(ROW_ID_COL),
          col("__graft_e.t").as(CHANGE_TYPE_COL),
          lit(id).as(CHANGE_SNAP_COL)): _*)
      val postNull = post.where(col(ROW_ID_COL).isNull)
      val preNull = pre.where(col(ROW_ID_COL).isNull)
      Seq(rows,
        tag(LakeTable.exceptAllVariantSafe(postNull, preNull),
          "insert", id),
        tag(LakeTable.exceptAllVariantSafe(preNull, postNull),
          "delete", id))
    }
    val parts = snaps.filter(s =>
      s.operation != "compact" && s.operation != "create").flatMap { s =>
      val prev = snapshot(s.parentId.get)
      val post = readFilesAs(s, s.addedFiles, withLineage = lineage)
      val pre = readFilesAs(prev, s.removedFiles, withLineage = lineage)
      // the exceptAll pair cancels rows a rewrite carried over; a
      // one-sided commit (pure append / metadata delete) has nothing
      // to cancel — skip the two set-difference shuffles entirely
      // (what makes an append-heavy changelog consumer like the
      // incremental-MV refresh scan-speed instead of shuffle-bound)
      val base =
        if (s.removedFiles.isEmpty) Seq(tag(post, "insert", s.snapshotId))
        else if (s.addedFiles.isEmpty) Seq(tag(pre, "delete", s.snapshotId))
        else if (lineage)
          classify(post, pre, s.snapshotId)
        else Seq(
          tag(LakeTable.exceptAllVariantSafe(post, pre),
            "insert", s.snapshotId),
          tag(LakeTable.exceptAllVariantSafe(pre, post),
            "delete", s.snapshotId))
      // a changed delete STATE alters carried files' visibility with no
      // file delta: diff it in both directions — added delete artifacts
      // suppress pre-image rows (deletes), removed ones (rollback)
      // resurrect rows (inserts). After-image files are s.addedFiles —
      // excluded here, so an upsert's own inserts are not re-counted.
      val deleteStateChanged =
        s.deleteFiles != prev.deleteFiles ||
          s.posDeleteFiles != prev.posDeleteFiles ||
          s.dvFiles != prev.dvFiles
      if (!deleteStateChanged) base
      else {
        val carried = s.liveFiles.intersect(prev.liveFiles)
        val before = readFilesAs(prev, carried, withLineage = lineage)
        val after = readFilesAs(s, carried, withLineage = lineage)
        base ++ Seq(
          tag(LakeTable.exceptAllVariantSafe(before, after),
            "delete", s.snapshotId),
          tag(LakeTable.exceptAllVariantSafe(after, before),
            "insert", s.snapshotId))
      }
    }
    if (parts.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    else parts.reduce(_ unionByName _)
  }

  /** Time travel: full scan of the table as of `snapshotId`
    * (≡ Iceberg `VERSION AS OF` / `snapshot-id` read option). Snapshot
    * metadata is immutable, so this is just a manifest lookup — no data
    * movement until an action runs. Reads with THAT snapshot's schema
    * (pre-evolution travel sees pre-evolution columns). */
  def scanAt(snapshotId: Long): DataFrame = {
    val s = snapshot(snapshotId)
    readFilesAs(s, s.liveFiles)
  }

  /** Time travel by wall-clock: the snapshot current AS OF `tsMillis`
    * (≡ Iceberg `TIMESTAMP AS OF` — a `.history`/`made_current_at`
    * manifest lookup, reference: scripts/bronze-silver.py:119,137). */
  def scanAtTimestamp(tsMillis: Long): DataFrame = {
    val s = snapshots.filter(_.timestampMs <= tsMillis).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"no snapshot of $root made current at or before $tsMillis"))
    readFilesAs(s, s.liveFiles)
  }

  // ---------------------------------------------------------- named refs

  /** Named snapshot refs (≡ Iceberg branches/tags, the retention
    * feature of the reference's format-version-2 stack): a TAG is an
    * immutable pointer, a BRANCH a movable one ([[updateRef]]).
    * Ref'd snapshots — and transitively their files and manifest
    * chunks — are PROTECTED from [[expireSnapshots]] until the ref is
    * dropped, and readable by name via `scanRef` / SQL
    * `VERSION AS OF 'name'`. Stored in `metadata/refs.json`, swapped
    * atomically (tmp + rename); ref edits are last-writer-wins —
    * they never race data commits, which touch only HEAD. */
  def refs: Map[String, (String, Long)] = {
    val body = readPointer(refsPath).getOrElse(return Map.empty)
    val n = Snapshot.mapper.readTree(body)
    n.properties().asScala.map { e =>
      e.getKey -> (e.getValue.path("type").asText(),
        e.getValue.path("snapshot_id").asLong())
    }.toMap
  }

  /** Cheap change stamp for HEAD-PRESERVING metadata mutations — ref
    * edits (create_tag / create_branch / drop_ref) rewrite refs.json
    * without moving HEAD, and expire_snapshots deletes v<id>.json
    * files (direct children of the metadata dir, so the dir mtime
    * bumps). The catalog's view-registration ledger keys on this in
    * addition to HEAD so `t_refs` / `t_snapshots` / `t_history` temp
    * views never serve pre-mutation state from cache. Content hash of
    * refs (one small read) + the v*.json population (count and max id
    * from one directory listing): mtime granularity is 1 s on many
    * filesystems, so an expire within the same tick as the last view
    * registration would be invisible to an mtime stamp — the version-
    * file census changes on EVERY commit or expire regardless of
    * clock resolution. Two fs calls, cross-process visible. */
  def metadataStamp: (Long, Long) = {
    val vs =
      try fs.listStatus(metaDir).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .flatMap(n => scala.util.Try(
          n.stripPrefix("v").stripSuffix(".json").toLong).toOption)
      catch { case _: java.io.IOException => Seq.empty[Long] }
    (refs.hashCode.toLong,
      if (vs.isEmpty) 0L else vs.size.toLong * 1000003L + vs.max)
  }

  def createTag(name: String, snapshotId: Long): Unit =
    putRef(name, "tag", snapshotId, replace = false)

  def createBranch(name: String, snapshotId: Long): Unit =
    putRef(name, "branch", snapshotId, replace = false)

  /** Move a BRANCH to a new snapshot (tags are immutable). */
  def updateRef(name: String, snapshotId: Long): Unit = {
    val cur = refs.getOrElse(name,
      throw new IllegalArgumentException(s"no ref $name on $root"))
    require(cur._1 == "branch", s"ref $name is a tag (immutable)")
    putRef(name, "branch", snapshotId, replace = true)
  }

  def dropRef(name: String): Unit = writeRefs(refs - name)

  /** Scan the snapshot a named ref points at. */
  def scanRef(name: String): DataFrame =
    scanAt(refs.getOrElse(name, throw new IllegalArgumentException(
      s"no ref $name on $root"))._2)

  private def putRef(name: String, tpe: String, snapshotId: Long,
      replace: Boolean): Unit = {
    require(name.nonEmpty && !name.forall(_.isDigit),
      s"bad ref name '$name' (all-digit names collide with version ids)")
    val cur = refs
    require(replace || !cur.contains(name),
      s"ref $name already exists on $root")
    snapshot(snapshotId) // throws if the target is expired/unknown
    writeRefs(cur + (name -> (tpe, snapshotId)))
  }

  private def writeRefs(rs: Map[String, (String, Long)]): Unit = {
    val m = Snapshot.mapper
    val n = m.createObjectNode()
    rs.toSeq.sortBy(_._1).foreach { case (name, (tpe, id)) =>
      val o = n.putObject(name)
      o.put("type", tpe); o.put("snapshot_id", id)
    }
    pointerStore.write(refsPath,
      m.writerWithDefaultPrettyPrinter().writeValueAsString(n))
  }

  private def refsPath = new Path(metaDir, REFS)

  // ------------------------------------------ write-audit-publish (WAP)

  private def stagedDir = new Path(metaDir, "staged")
  private def stagedPath(wapId: String) = new Path(stagedDir, s"$wapId.json")

  /** Stage an append WITHOUT committing it (≡ Iceberg's write-audit-
    * publish: `wap.id` staging + cherry-pick): data files are written
    * and their manifest entries parked under `metadata/staged/<wapId>
    * .json`, invisible to every reader until [[publishStaged]] commits
    * them — a file-level cherry-pick, zero data rewrite — or
    * [[discardStaged]] drops them. Audit the parked rows with
    * [[scanStaged]]. Staged files are protected from
    * [[removeOrphanFiles]]; publish refuses if the schema or partition
    * spec evolved since staging (the parked files were written under
    * the old layout — re-stage instead). */
  def stageAppend(df: DataFrame, wapId: String): Unit = {
    require(wapId.nonEmpty && wapId.matches("[A-Za-z0-9._-]+"),
      s"bad wap id '$wapId'")
    require(!fs.exists(stagedPath(wapId)),
      s"staged changeset $wapId already exists on $root")
    val base = current
    val WriteResult(added, stats, info) =
      writeDataFiles(distributeForWrite(alignToSchema(df)))
    val entries = added.map(f => ManifestEntry(f, 0L,
      stats.getOrElse(f, Map.empty), Map.empty, info.get(f),
      base.currentSpecId))
    val m = Snapshot.mapper
    val n = m.createObjectNode()
    n.put("schema_json", base.schemaJson)
    n.put("spec_id", base.currentSpecId)
    n.set[com.fasterxml.jackson.databind.JsonNode]("chunk",
      m.readTree(ManifestIO.chunkToJson(entries)))
    fs.mkdirs(stagedDir)
    writeStringExclusive(fs, stagedPath(wapId), m.writeValueAsString(n))
  }

  /** Ids of every staged-but-unpublished changeset. */
  def stagedIds: Seq[String] = {
    if (!fs.exists(stagedDir)) return Nil
    fs.listStatus(stagedDir).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json")).sorted
  }

  /** (schemaJson, specId, entries, sources). `sources` is non-empty
    * only for `add_files` IMPORT markers: dest rel-path → absolute
    * source path of the rename that carried the file in. */
  private def readStaged(wapId: String)
      : (String, Long, Seq[ManifestEntry], Map[String, String]) = {
    require(fs.exists(stagedPath(wapId)),
      s"no staged changeset $wapId on $root")
    val m = Snapshot.mapper
    val n = m.readTree(readString(fs, stagedPath(wapId)))
    val sources = Option(n.get("sources")).map { s =>
      s.properties().asScala.map(e => e.getKey -> e.getValue.asText())
        .toMap
    }.getOrElse(Map.empty)
    (n.path("schema_json").asText(), n.path("spec_id").asLong(),
      ManifestIO.chunkFromJson(m.writeValueAsString(n.get("chunk"))),
      sources)
  }

  /** The parked rows of a staged changeset (for auditing). */
  def scanStaged(wapId: String): DataFrame = {
    val (schemaJson, _, entries, _) = readStaged(wapId)
    require(schemaJson == current.schemaJson,
      s"staged changeset $wapId predates a schema evolution — " +
        "discard and re-stage")
    readFilesAs(current, entries.map(_.path))
  }

  /** Every table-relative data path RETAINED HISTORY has ever seen:
    * the head's live set plus each retained snapshot's added and
    * removed lists. The committed-ness test for import-marker recovery
    * — a path in this set reached the table by a real commit, even if
    * a later COW rewrite or compaction removed it from the live set
    * (its file may still exist on disk until expiry, so "dest exists"
    * proves nothing and "not live" does NOT mean "never committed"). */
  private def historyPaths: Set[String] = {
    val snaps = snapshots
    (current.liveFiles.iterator ++
      snaps.iterator.flatMap(s => s.addedFiles.iterator ++
        s.removedFiles.iterator)).toSet
  }

  /** Commit a staged changeset: its already-written files join the table
    * as a normal append (declaratively retry-safe like [[append]] — the
    * files are fresh, every interleaved same-layout commit commutes).
    *
    * For an `add_files` IMPORT marker (crash recovery), the move is
    * completed first: any entry whose dest file is missing is renamed
    * in from its recorded source — the manifest must never commit a
    * path that does not exist. A marker whose entries already appear
    * in RETAINED HISTORY (crash between the import's commit and its
    * marker cleanup — even if a later rewrite removed them from the
    * live set) only clears the marker — never double-adds or
    * resurrects. A marker whose entries appear partially (possible
    * only once expiry has dropped the import commit itself) is
    * ambiguous: recovery refuses rather than guess. The fully-expired
    * marker (entries in NO retained history — indistinguishable by
    * file state from a fresh pre-commit crash, whose recovery must
    * stay automatic) cannot arise: [[expireWhere]] clears committed
    * imports' markers before destroying their history evidence. */
  def publishStaged(wapId: String): Long = {
    val (schemaJson, specId, entries, sources) = readStaged(wapId)
    if (sources.nonEmpty) {
      val seen = historyPaths
      val seenN = entries.count(e => seen(e.path))
      if (seenN == entries.size) {
        fs.delete(stagedPath(wapId), false)
        return current.snapshotId
      }
      require(seenN == 0, s"import $wapId: $seenN/${entries.size} " +
        "entries already appear in retained history — the import " +
        "committed and was partially expired/rewritten; refusing to " +
        "re-commit (clear the marker manually after auditing)")
      entries.foreach { e =>
        val dest = new Path(rootPath, e.path)
        if (!fs.exists(dest)) {
          val src = new Path(sources.getOrElse(e.path,
            throw new IllegalStateException(
              s"import $wapId: no recorded source for ${e.path}")))
          require(fs.exists(src),
            s"import $wapId: ${e.path} missing at both $dest and $src")
          fs.mkdirs(dest.getParent)
          if (!fs.rename(src, dest))
            throw new java.io.IOException(s"rename $src -> $dest failed")
        }
      }
    }
    val added = entries.map(_.path)
    val stats = entries.filter(_.stats.nonEmpty)
      .map(e => e.path -> e.stats).toMap
    val info = entries.flatMap(e => e.info.map(e.path -> _)).toMap
    val id = commitWithRetry(current)() { b =>
      require(b.schemaJson == schemaJson && b.currentSpecId == specId,
        s"staged changeset $wapId predates a schema or partition-spec " +
          "evolution — discard and re-stage")
      commit(b, "append", added = added, removed = Nil,
        live = b.liveFiles ++ added, addedStats = stats, addedInfo = info)
    }
    fs.delete(stagedPath(wapId), false)
    id
  }

  /** Drop a staged changeset and its parked data files.
    *
    * An `add_files` IMPORT marker's dest files are the ONLY copy (they
    * arrived by rename, not copy) — discard moves them BACK to their
    * recorded source paths instead of deleting. A marker whose entries
    * already appear in RETAINED HISTORY (crash after the import's
    * commit — including entries a later rewrite removed from the live
    * set but whose files time travel still reads) only clears the
    * marker: the files belong to the table now, and renaming them out
    * would break reads of the snapshots that reference them. */
  def discardStaged(wapId: String): Unit = {
    val (_, _, entries, sources) = readStaged(wapId)
    if (sources.nonEmpty) {
      val seen = historyPaths
      val seenPaths = entries.map(_.path).filter(seen)
      if (seenPaths.nonEmpty) {
        require(seenPaths.size == entries.size, s"import $wapId is " +
          s"partially committed (${seenPaths.size}/${entries.size} " +
          "entries in retained history) — refusing discard; " +
          "publish_staged to recover")
        fs.delete(stagedPath(wapId), false)
        return
      }
      entries.foreach { e =>
        val dest = new Path(rootPath, e.path)
        if (fs.exists(dest)) {
          val src = new Path(sources.getOrElse(e.path,
            throw new IllegalStateException(
              s"import $wapId: no recorded source for ${e.path}")))
          fs.mkdirs(src.getParent)
          if (!fs.rename(dest, src))
            throw new java.io.IOException(s"rename $dest -> $src failed")
        }
      }
    } else deleteAll(entries.map(e => new Path(rootPath, e.path)))
    fs.delete(stagedPath(wapId), false)
  }

  // ------------------------------------------------- staging branches

  /** Append-only STAGING BRANCHES on the WAP parking machinery —
    * Iceberg's audit-branch workflow (`spark.wap.branch`): each
    * [[appendToBranch]] parks one changeset in the branch's namespace,
    * so the branch accumulates an ordered series of audited appends
    * that table readers never see; [[fastForwardBranch]] publishes the
    * WHOLE series as ONE atomic commit (all files land in a single
    * snapshot — downstream incremental consumers see one batch);
    * [[discardBranch]] drops everything parked. [[scanBranch]] previews
    * table ∪ parked changesets — exactly what the table will read
    * after the fast-forward. Branch-side row-level ops (merge/delete
    * over parked state) are out of scope by design: stage, audit,
    * publish-or-discard. Distinct from the named snapshot REFS
    * ([[createBranch]]): a ref is a movable pointer over committed
    * history; a staging branch holds uncommitted future state. */
  private def branchPrefix(name: String) = s"b.$name."

  /** Park `df` as the branch's next changeset; returns the changeset
    * id. Ordinals are allocated optimistically — a racing writer's
    * collision on the exclusive create retries with the next slot. */
  def appendToBranch(name: String, df: DataFrame): String = {
    require(name.nonEmpty && name.matches("[A-Za-z0-9_-]+"),
      s"bad branch name '$name'")
    var attempt = 0
    while (attempt < 50) {
      val next = branchChangesets(name)
        .flatMap(id => scala.util.Try(
          id.stripPrefix(branchPrefix(name)).toLong).toOption)
        .maxOption.getOrElse(0L) + 1
      val id = f"b.$name.$next%06d"
      try { stageAppend(df, id); return id }
      catch {
        // lost the ordinal race (pre-check or exclusive create):
        // re-list and take the next slot
        case _: IllegalArgumentException => attempt += 1
        case _: java.io.IOException => attempt += 1
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"branch $name changeset allocation contended beyond 50 attempts")
  }

  /** The branch's parked changeset ids, in publish order. */
  def branchChangesets(name: String): Seq[String] =
    stagedIds.filter(_.startsWith(branchPrefix(name))).sorted

  /** Preview: the table as it will read after [[fastForwardBranch]]. */
  def scanBranch(name: String): DataFrame =
    branchChangesets(name).foldLeft(scan())(
      (acc, id) => acc.unionByName(scanStaged(id)))

  /** Publish every parked changeset of the branch in ONE atomic append
    * commit and clear the branch. Like [[publishStaged]], refuses if
    * any changeset predates a schema or partition-spec evolution.
    *
    * `txn` (appId, version) makes the publish IDEMPOTENT on the same
    * `txn.$appId` watermark as [[appendOnce]]: a replay that finds its
    * watermark already committed only clears leftover staged markers —
    * the roll-forward contract the catalog's multi-table transaction
    * recovery relies on (a crash between this commit and the staged-
    * file cleanup must not double-publish on recovery). */
  def fastForwardBranch(name: String,
      txn: Option[(String, Long)] = None,
      dropProperties: Snapshot => Set[String] = _ => Set.empty): Long = {
    val ids = branchChangesets(name)
    def watermarked(s: Snapshot): Boolean = txn.exists { case (app, v) =>
      s.properties.get(s"txn.$app").exists(_.toLong >= v) ||
        // pre-versioned watermark format (txn.ctxn-<app>-<v>): a batch
        // committed by the old per-batch-id scheme must still skip on
        // an upgrade-spanning replay
        s.properties.contains(s"txn.ctxn-$app-$v")
    }
    val base = current
    if (watermarked(base)) {
      ids.foreach(i => fs.delete(stagedPath(i), false))
      return base.snapshotId
    }
    require(ids.nonEmpty, s"no staged changesets on branch $name on $root")
    val loaded = ids.map(readStaged)
    val entries = loaded.flatMap(_._3)
    val added = entries.map(_.path)
    val stats = entries.filter(_.stats.nonEmpty)
      .map(e => e.path -> e.stats).toMap
    val info = entries.flatMap(e => e.info.map(e.path -> _)).toMap
    val id = commitWithRetry(base)() { b =>
      if (watermarked(b)) b.snapshotId
      else {
        loaded.foreach { case (schemaJson, specId, _, _) =>
          require(b.schemaJson == schemaJson && b.currentSpecId == specId,
            s"branch $name predates a schema or partition-spec " +
              "evolution — discard and re-stage")
        }
        // dropProperties is evaluated per attempt against the snapshot
        // actually being committed on — the caller's staleness decision
        // sees the properties as of the commit base, never a stale view
        val drops = dropProperties(b)
        commit(b, "append", added = added, removed = Nil,
          live = b.liveFiles ++ added, addedStats = stats,
          addedInfo = info,
          propertiesOverride =
            if (txn.isEmpty && drops.isEmpty) None
            else Some((b.properties -- drops) ++ txn.map {
              // ad-hoc (ctxn-) watermarks record the PUBLISHING snapshot
              // id instead of the constant version 1: any id satisfies
              // the >= 1 skip check, and the stamp lets the catalog GC
              // only watermarks older than a replay grace window instead
              // of on the very next publish (bounded accretion WITHOUT
              // destroying a recent crash-retry's idempotence)
              case (app, _) if app.startsWith("ctxn-") =>
                s"txn.$app" -> (b.snapshotId + 1).toString
              case (app, v) => s"txn.$app" -> v.toString
            }))
      }
    }
    ids.foreach(i => fs.delete(stagedPath(i), false))
    id
  }

  /** Drop every parked changeset of the branch (files included). */
  def discardBranch(name: String): Unit =
    branchChangesets(name).foreach(discardStaged)

  private def readFiles(relFiles: Seq[String]): DataFrame =
    readFilesAs(current, relFiles)

  /** Like [[readFiles]] but with each row's source file attached as
    * FILE_COL — the column must be added INSIDE each single-source scan
    * (input_file_name() is undefined above the MOR anti-join). */
  private def readFilesWithName(relFiles: Seq[String]): DataFrame =
    readFilesAs(current, relFiles, withName = true)

  /** Read `relFiles` under snapshot `ctx`'s schema, applying its
    * equality-delete and position-delete files (merge-on-read). Files
    * written before a column rename are read with their PHYSICAL
    * (as-written) names via `ctx.fileRenames` and aliased back — one
    * scan per distinct (mapping, delete-era) group, unioned; the common
    * no-rename/no-delete case stays a single scan.
    *
    * Equality-delete semantics (≡ Iceberg equality deletes + data
    * sequence numbers): delete file i (1-based in seq order) suppresses
    * matching key rows from every data file whose sequence precedes it —
    * i.e. whose era (count of deletes at-or-before its sequence) is < i.
    * A merge's own after-image shares the delete's sequence, so it is
    * never self-suppressed.
    *
    * Position-delete semantics (≡ Iceberg v2): a (file_uri, pos) row
    * suppresses exactly row ordinal `pos` of the named file — applied
    * via `_metadata.file_path` / `_metadata.row_index` (stable against
    * file splits) with one anti-join over the unioned delete set, which
    * AQE broadcasts when small.
    *
    * With `withPos` the result additionally carries PFILE_COL /
    * PIDX_COL — each surviving row's scan URI and row ordinal (what the
    * MOR predicate DELETE/UPDATE capture as new position deletes). */
  private def readFilesAs(ctx: Snapshot, relFiles: Seq[String],
      withName: Boolean = false, withPos: Boolean = false,
      withLineage: Boolean = false): DataFrame = {
    val sch = DataType.fromJson(ctx.schemaJson).asInstanceOf[StructType]
    if (relFiles.isEmpty) {
      val out =
        if (!withLineage) sch
        else StructType(sch.fields :+ StructField(ROW_ID_COL, LongType))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], out)
    }
    val dels = ctx.deleteFiles.sortBy(_.seq)
    val needPos = withPos || withLineage || ctx.posDeleteFiles.nonEmpty ||
      ctx.dvFiles.nonEmpty
    def era(f: String): Int = {
      val s = ctx.fileSeq.getOrElse(f, 0L)
      dels.count(_.seq <= s)
    }
    // group additionally by partition-spec era: files of different
    // layouts (hive dirs present/absent/differently shaped) cannot
    // share one scan — Spark's partition discovery would see
    // conflicting directory structures
    val groups = relFiles.groupBy(f =>
      (ctx.fileRenames.getOrElse(f, Map.empty[String, String]),
        if (dels.isEmpty) 0 else era(f),
        ctx.fileSpec.getOrElse(f, 0L)))
    val parts = groups.toSeq.map { case ((mapping, e, _), files) =>
      // default-column metadata stays OUT of the physical scan schema:
      // the default is applied by THIS layer's projection below —
      // leaving EXISTS_DEFAULT on the scan schema would wake Spark's
      // own per-file default resolution (a re-parse per scan and a
      // second opinion on semantics we already own)
      val stripDefaults = (f: StructField) =>
        if (!f.metadata.contains(LakeTable.ExistsDefaultKey) &&
            !f.metadata.contains(LakeTable.CurrentDefaultKey)) f
        else f.copy(metadata = {
          val mb = new MetadataBuilder().withMetadata(f.metadata)
          mb.remove(LakeTable.ExistsDefaultKey)
          mb.remove(LakeTable.CurrentDefaultKey)
          mb.build()
        })
      val physSchema = StructType(sch.fields.map(f =>
        stripDefaults(f.copy(name = mapping.getOrElse(f.name, f.name)))) ++
        // lineage: declare the physical _row_id column — REWRITTEN
        // files carry it (preserved ids), any other file reads null
        // and resolves to first_row_id + position downstream
        (if (withLineage) Seq(StructField(ROW_ID_COL, LongType)) else Nil))
      val cols = sch.fields.map { f =>
        val phys = mapping.getOrElse(f.name, f.name)
        // a column added AFTER these files were written projects its
        // declared EXISTS_DEFAULT (constant-folded — zero per-row
        // cost); without one, the reserved absent name reads NULL.
        // Files that physically carry the column are untouched — an
        // explicitly written NULL stays NULL.
        LakeTable.defaultSqlOf(f, LakeTable.ExistsDefaultKey) match {
          case Some(sql) if phys.startsWith(ABSENT_PREFIX) =>
            expr(sql).cast(f.dataType).as(f.name)
          case _ => col(phys).as(f.name)
        }
      }.toSeq ++
        (if (withLineage) Seq(col(ROW_ID_COL)) else Nil) ++
        (if (withName) Seq(input_file_name().as(FILE_COL)) else Nil) ++
        (if (needPos) Seq(col("_metadata.file_path").as(PFILE_COL),
          col("_metadata.row_index").as(PIDX_COL)) else Nil)
      val part = prunedParquetScan(ctx, files, physSchema, sch, mapping,
          specId = ctx.fileSpec.getOrElse(files.head, 0L))
        .select(cols: _*) // stable column order + current names
      if (dels.isEmpty) part else part.withColumn(ERA_COL, lit(e))
    }
    val data = parts.reduce(_ unionByName _)
    val eqApplied =
      if (dels.isEmpty) data
      else {
        // one anti-join per distinct key set (the delete-key DataFrames
        // are tiny relative to data and broadcast under AQE)
        var df = data
        dels.zipWithIndex.groupBy(_._1.keys).foreach { case (keys, group) =>
          val delDF = group.map { case (d, i) =>
            spark.read.parquet(new Path(rootPath, d.path).toString)
              .select(d.physicalKeys.zip(keys).map { case (p, k) =>
                col(p).as(s"__graft_del_$k")
              }.toIndexedSeq: _*)
              .withColumn(DERA_COL, lit(i + 1))
          }.reduce(_ unionByName _)
          val cond = keys.map(k => col(k) === col(s"__graft_del_$k"))
            .reduce(_ && _) && col(ERA_COL) < col(DERA_COL)
          df = df.join(delDF, cond, "left_anti")
        }
        df.drop(ERA_COL)
      }
    // Captured file URIs are ABSOLUTE (that's what _metadata
    // .file_path yields), but the table can MOVE after capture
    // (ALTER TABLE … RENAME TO, a warehouse relocation) — so delete
    // application matches on the table-RELATIVE tail instead. The
    // `data/` boundary is unambiguous: hive partition dirs always
    // carry '=', so no other path segment is the bare word `data`,
    // and the greedy prefix pins the LAST such segment even when
    // the warehouse path itself contains /data/.
    def relTail(c: org.apache.spark.sql.Column) =
      regexp_extract(c, "^(?:.*/)?(data/.+)$", 1)
    // every position-delete artifact shares ONE schema — read them as
    // a single multi-path scan with that schema declared, not N
    // unioned per-file reads each paying plan-time footer inference
    // (at delete-commit depth the N-union shape made every scan's
    // PLANNING cost O(outstanding artifacts) driver footer opens)
    val posDeleteSchema = StructType(Seq(
      StructField(POS_FILE_FIELD, StringType),
      StructField(POS_POS_FIELD, LongType)))
    val posApplied =
      if (ctx.posDeleteFiles.isEmpty) eqApplied
      else {
        val pd = spark.read.schema(posDeleteSchema)
          .parquet(ctx.posDeleteFiles
            .map(p => new Path(rootPath, p.path).toString): _*)
          .select(relTail(col(POS_FILE_FIELD)).as(s"__graft_pd_file"),
            col(POS_POS_FIELD).as(s"__graft_pd_pos"))
        eqApplied.join(pd,
          relTail(col(PFILE_COL)) === col("__graft_pd_file") &&
            col(PIDX_COL) === col("__graft_pd_pos"),
          "left_anti")
      }
    val dvApplied =
      if (ctx.dvFiles.isEmpty) posApplied
      else {
        // deletion vectors: ONE row per targeted data file (its packed
        // ordinal bitset), applied as a map-side bit test — no
        // per-deleted-row join keys, so read cost is independent of
        // how many rows history has deleted. A row survives unless its
        // file has a vector AND its ordinal's bit is set; `get()` is
        // null-safe past the bitmap's tail (bits beyond the last set
        // word were never set).
        val dv = spark.read.schema(StructType(Seq(
            StructField(DV_FILE_FIELD, StringType),
            StructField(DV_BITS_FIELD, ArrayType(LongType)))))
          .parquet(ctx.dvFiles
            .map(d => new Path(rootPath, d.path).toString): _*)
          .select(col(DV_FILE_FIELD).as("__graft_dv_file"),
            col(DV_BITS_FIELD).as("__graft_dv_words"))
        // Broadcast bound: each row is bytes ∝ target file's rows / 8
        // (~125 KB for a 10⁶-row file), so a delete pattern touching
        // ~60k+ such files pushes the hint past Spark's 8 GB broadcast
        // ceiling and materializes on the driver first. The artifact
        // size was recorded at consolidation time (DvFile.bytes; a
        // live stat covers pre-field snapshots); above the gate —
        // `spark.graft.lake.dv-broadcast-max-bytes`, default 1 GB —
        // fall back to a plain shuffled join keyed on the file tail
        // (still one slim row per file), same results either way.
        val dvBytes = ctx.dvFiles.map { d =>
          if (d.bytes > 0L) d.bytes
          else fs.getFileStatus(new Path(rootPath, d.path)).getLen
        }.sum
        val dvMax = spark.conf
          .getOption("spark.graft.lake.dv-broadcast-max-bytes")
          .map(_.toLong).getOrElse(1L << 30)
        val dvHinted = if (dvBytes <= dvMax) broadcast(dv) else dv
        posApplied
          .join(dvHinted,
            relTail(col(PFILE_COL)) === col("__graft_dv_file"), "left")
          .where(col("__graft_dv_words").isNull || coalesce(
            expr(s"(shiftright(get(__graft_dv_words, " +
              s"CAST($PIDX_COL / 64 AS INT)), " +
              s"CAST($PIDX_COL % 64 AS INT)) & 1) = 0"),
            lit(true)))
          .drop("__graft_dv_file", "__graft_dv_words")
      }
    val lineageResolved =
      if (!withLineage) dvApplied
      else {
        // resolve each row's id: the physical column wins (rewritten
        // files preserved their carried ids there), else
        // first_row_id + position — the Iceberg v3 resolution rule.
        // The (file → first_row_id) map is bounded by the PLANNED
        // files and broadcast; matching is on the table-relative tail
        // (same move-proof rule as position deletes above).
        val wanted = relFiles.toSet
        val firsts = ctx.fileInfo.toSeq.collect {
          case (f, fi) if wanted(f) && fi.firstRowId.isDefined =>
            Row(f, fi.firstRowId.get)
        }
        val fdf = spark.createDataFrame(
          spark.sparkContext.parallelize(firsts, 1),
          StructType(Seq(
            StructField("__graft_first_file", StringType, nullable = false),
            StructField("__graft_first_id", LongType, nullable = false))))
        dvApplied
          .join(maybeBroadcastFileList(fdf,
            fileListBytes(firsts.map(_.getString(0)))),
            regexp_extract(col(PFILE_COL), "^(?:.*/)?(data/.+)$", 1) ===
              col("__graft_first_file"), "left")
          .withColumn(ROW_ID_COL, coalesce(col(ROW_ID_COL),
            col("__graft_first_id") + col(PIDX_COL)))
          .drop("__graft_first_file", "__graft_first_id")
      }
    if (needPos && !withPos) lineageResolved.drop(PFILE_COL, PIDX_COL)
    else lineageResolved
  }

  // ------------------------------------------------------------------ writes

  /** Append-only write (≡ reference K1, scripts/raw-bronze.py:180-182).
    *
    * With a `write.sort.order` table property (≡ Iceberg's sort orders),
    * the batch is range-repartitioned on the sort columns first, so each
    * data file covers a DISJOINT range and the per-file min/max stats
    * make key-range pruning surgical — one extra shuffle per append, the
    * documented cost of a sorted table. */
  def append(df: DataFrame): Long =
    labeled("append")(appendInternal(df, None))

  /** Idempotent append (≡ Delta's `txnAppId`/`txnVersion` writer
    * option, the standard `foreachBatch` exactly-once pattern): the
    * highest committed `version` per `appId` rides the snapshot
    * properties, and an append whose version is at or below the
    * recorded watermark is a NO-OP. A streaming sink passing its
    * (checkpoint-stable) query id and micro-batch id gets exactly-once
    * table content out of the source's at-least-once replay: a batch
    * replayed after a crash between table commit and streaming-offset
    * commit finds its own watermark and skips. Versions must be
    * monotone per appId (micro-batch ids are). */
  def appendOnce(df: DataFrame, appId: String, version: Long): Long =
    labeled("appendOnce")(appendInternal(df, Some((appId, version))))

  private def appendInternal(df: DataFrame,
      txn: Option[(String, Long)]): Long = {
    autoEvolveFor(df)
    val base = current
    def watermarked(s: Snapshot): Boolean = txn.exists { case (app, v) =>
      s.properties.get(s"txn.$app").exists(_.toLong >= v)
    }
    if (watermarked(base)) return base.snapshotId
    val aligned = alignToSchema(df)
    val clustered = sortOrderColumns match {
      case Nil => distributeForWrite(aligned)
      case cols => aligned.repartitionByRange(cols.map(col): _*)
    }
    val WriteResult(added, stats, info) = writeDataFiles(clustered)
    // adding fresh files commutes with ANY interleaved commit that kept
    // the schema and partition spec our files were written under —
    // append, merge, delete, compact all operate on *other* files, and
    // our files' new (higher) sequence outranks every outstanding
    // equality delete
    commitWithRetry(base)() { b =>
      // re-check the watermark against the REBASED head: if the racer
      // was this very batch's replay, skip rather than double-append
      // (the just-written files become orphans for maintenance)
      if (watermarked(b)) b.snapshotId
      else commit(b, "append", added = added, removed = Nil,
        live = b.liveFiles ++ added, addedStats = stats, addedInfo = info,
        propertiesOverride = txn.map { case (app, v) =>
          b.properties + (s"txn.$app" -> v.toString)
        })
    }
  }

  /** Import EXISTING Parquet files into the table WITHOUT rewriting
    * them (≡ Iceberg's `add_files` / `migrate` taking ownership): each
    * file is schema-gated, constraint-checked, MOVED under `data/`
    * (renames — zero data copy, O(files) metadata ops however large
    * the files), footer-profiled for stats/pruning, and committed as
    * ONE append. The table owns the files afterward: expiry and
    * orphan tooling apply, exactly the ownership Iceberg's `migrate`
    * establishes. The source layout is preserved under an import-
    * scoped directory, so a hive layout matching the table's IDENTITY
    * partition spec keeps partition pruning; hidden-transform specs
    * are refused (their dirs cannot be derived from external layouts).
    * Returns (snapshot id, files added).
    * Reference: the `add_files` half of the Iceberg procedure surface
    * the reference delegates to its Iceberg runtime jar
    * (local-notebooks/s3tablebuckets.ipynb drives tables only through
    * that jar's SQL). */
  def addFiles(srcDir: String): (Long, Int) = {
    val src = new Path(srcDir)
    require(fs.exists(src), s"no such directory $srcDir")
    // importing the table's own files would rename live data out from
    // under the manifests (and a source CONTAINING the table would
    // list its live files as import candidates) — refuse both shapes
    val srcQ = fs.makeQualified(src).toString.stripSuffix("/")
    val rootQ = fs.makeQualified(rootPath).toString.stripSuffix("/")
    require(!(srcQ + "/").startsWith(rootQ + "/") &&
        !(rootQ + "/").startsWith(srcQ + "/"),
      s"add_files source $srcDir overlaps the table directory $rootQ")
    val files = LakeTable.timed("af.list")(listParquet(fs, src))
    require(files.nonEmpty, s"no parquet files under $srcDir")
    val base = LakeTable.timed("af.current")(current)
    val sch = schema
    val fields = partitionFields
    require(fields.forall(_.isIdentity),
      "add_files needs an unpartitioned or identity-partitioned " +
        "table — hidden-transform partition dirs cannot be derived " +
        "from an external layout")
    val idCols = fields.map(_.source).toSet
    // schema gate: file CONTENT must carry exactly the non-partition
    // table columns with matching types (identity partition values
    // live in the hive dirs, stripped from content like native
    // writes); spark's dir-inferred partition types are ignored — the
    // read path parses dir strings itself
    val rels = files.map(f => relativePath(src, f))
    fields.foreach { fld =>
      val missing = rels.filterNot(
        _.split('/').exists(_.startsWith(fld.dirName + "=")))
      require(missing.isEmpty,
        s"files lack a ${fld.dirName}= partition dir: " +
          missing.take(3).mkString(", "))
    }
    // unpartitioned: read the explicit FILE list (any source nesting
    // works — no partition discovery involved). Identity-partitioned:
    // a clean hive layout under src is required, so the basePath read
    // discovers the partition dirs (and constraint checks see their
    // values).
    def sourceRead(schemaOpt: Option[StructType]) = {
      val r0 = spark.read.option("mergeSchema", "true")
      val r = schemaOpt.map(r0.schema).getOrElse(r0)
      if (fields.isEmpty) r.parquet(files.map(_.toString): _*)
      else r.option("basePath", src.toString).parquet(src.toString)
    }
    val expect = sch.fields.filterNot(f => idCols(f.name))
      .map(f => f.name -> f.dataType).toMap
    // schema gating happens PER FOOTER in the stats pass below (name
    // presence AND Spark-converted type against the table schema) —
    // no driver-side Spark inference job; at commit depth that
    // distributed read dominated the whole import (commit-depth smoke:
    // ~146 ms/commit, almost all schema inference). Only declared
    // write constraints still need a real row read.
    if (hasWriteConstraints)
      enforceWriteConstraints(sourceRead(Some(sch)))
    // destination layout: hive partition segments + a uniquified file
    // name ONLY — an arbitrary source dir could contain a segment
    // literally named `data`, which would break the move-proof
    // `data/`-boundary rule lineage resolution and position deletes
    // key on (and two imports of one layout would collide on it)
    val importId = s"import-${UUID.randomUUID().toString.take(8)}"
    val destRels = rels.zipWithIndex.map { case (r, i) =>
      val segs = r.split('/')
      val hive = segs.dropRight(1).filter(_.contains('='))
      ((importId +: hive) :+ s"part-$i-${segs.last}").mkString("/")
    }
    // profile stats from the SOURCE footers (byte-identical after the
    // rename), keyed by destination path, and PARK the import as a
    // staged changeset BEFORE any file moves: staged entries are
    // orphan-cleanup-protected, so a crash mid-import can never lose
    // the only copy of the data — every file is at src or dest, the
    // dest side shielded; `publish_staged`/`discard_staged` recover.
    val statsMap = new java.util.concurrent.ConcurrentHashMap[
      String, Map[String, ColStat]]()
    val infoMap = new java.util.concurrent.ConcurrentHashMap[
      String, FileInfo]()
    // per-file schema gate, in the same pass that opens every footer
    // anyway: every footer must carry every non-partition table column
    // (a missing column would read back as silent NULLs after import —
    // merged inference can't see it) AT the table's Spark type (a
    // per-file conflict must refuse, not coerce) — or the import fails
    // before any rename
    val schemaErrs =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // built ONCE on the session thread: the SQLConf-driven converter
    // captures the session's parquet type flags; parallelStream worker
    // threads have no active session to resolve them from
    val schemaConverter = new org.apache.spark.sql.execution
      .datasources.parquet.ParquetToSparkSchemaConverter(
        spark.sessionState.conf)
    LakeTable.timed("af.footers") {
    files.zip(destRels).toList.asJava.parallelStream().forEach {
      case (f, r) =>
        val key = s"$DATA_DIR/$r"
        // ONE footer open per file yields the schema gate's Spark
        // types AND the manifest stats/row count together
        scala.util.Try(FileStats.footerProfile(hconf, f, schemaConverter,
            sch, fields, key)) match {
          case scala.util.Success((fileSch, st, rows)) =>
            val have = fileSch.fields.map(x => x.name -> x.dataType).toMap
            expect.toSeq.sortBy(_._1).foreach { case (n, dt) =>
              have.get(n) match {
                case None => schemaErrs.add(s"$f lacks $n")
                case Some(got) if got != dt => schemaErrs.add(
                  s"$f: column $n is ${got.simpleString}, table has " +
                    dt.simpleString)
                case _ => ()
              }
            }
            // symmetric gate: a footer field the table does not know
            // would silently VANISH on every scan (the read path
            // projects the table schema) — refuse rather than import
            // data the table can never return. Partition-source
            // columns are allowed in content (external writers often
            // keep them alongside the hive dirs).
            (have.keySet -- expect.keySet -- idCols).toSeq.sorted
              .foreach(n => schemaErrs.add(
                s"$f carries $n, which the table schema lacks"))
            if (st.nonEmpty) statsMap.put(key, st)
            infoMap.put(key, FileInfo(fs.getFileStatus(f).getLen, rows))
          case scala.util.Failure(e) =>
            schemaErrs.add(s"$f: unreadable parquet footer " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage})")
        }
    }
    }
    require(schemaErrs.isEmpty,
      "add_files refused — file schemas do not match the table: " +
        schemaErrs.asScala.toSeq.sorted.take(5).mkString("; "))
    val added = destRels.map(r => s"$DATA_DIR/$r")
    val entries = added.map(k => ManifestEntry(k, 0L,
      statsMap.getOrDefault(k, Map.empty), Map.empty,
      Some(infoMap.get(k)), base.currentSpecId))
    val m = Snapshot.mapper
    val marker = m.createObjectNode()
    marker.put("schema_json", base.schemaJson)
    marker.put("spec_id", base.currentSpecId)
    marker.set[com.fasterxml.jackson.databind.JsonNode]("chunk",
      m.readTree(ManifestIO.chunkToJson(entries)))
    // dest → source map: files arrive by RENAME, so after a crash each
    // one exists at exactly one of the two paths — recovery
    // (publish_staged / discard_staged) must know the other endpoint to
    // complete or undo the move instead of committing ghosts or
    // deleting the only copy
    val srcNode = marker.putObject("sources")
    files.zip(destRels).foreach { case (f, r) =>
      srcNode.put(s"$DATA_DIR/$r", fs.makeQualified(f).toString)
    }
    LakeTable.timed("af.marker") {
      fs.mkdirs(stagedDir)
      writeStringExclusive(fs, stagedPath(importId),
        m.writeValueAsString(marker))
    }
    LakeTable.timed("af.rename") {
      files.zip(destRels).foreach { case (f, r) =>
        val dest = new Path(dataDir, r)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(f, dest))
          throw new java.io.IOException(s"rename $f -> $dest failed")
      }
    }
    val snap = LakeTable.timed("af.commit")(commitWithRetry(base)() { b =>
      commit(b, "add-files", added = added, removed = Nil,
        live = b.liveFiles ++ added,
        addedStats = statsMap.asScala.toMap,
        addedInfo = infoMap.asScala.toMap)
    })
    LakeTable.timed("af.unmark")(
      fs.delete(stagedPath(importId), false))
    (snap, added.size)
  }

  /** Optimistic-retry loop (≡ Iceberg's commit retries): run
    * `attempt(base)`; on a lost race re-read HEAD and re-attempt against
    * it — committing the ALREADY-written artifacts, never re-running the
    * job that produced them. Retry is refused (conflict surfaced) when
    * the interleaved commits evolved the schema or partition spec our
    * artifacts were written under, or when the op-specific `canRetry`
    * says the new base invalidates them. Rewriting ops (COW
    * merge/delete/update, compact) do NOT use this: their outputs are
    * derived from the old base's data and must be recomputed. */
  private def commitWithRetry(base: Snapshot)(
      canRetry: (Snapshot, Snapshot) => Boolean = (_, _) => true)(
      attempt: Snapshot => Long): Long = {
    var b = base
    var n = 0
    while (true) {
      try return attempt(b)
      catch {
        case e: java.util.ConcurrentModificationException =>
          n += 1
          val nb = current
          val headMoved = nb.snapshotId != b.snapshotId
          if (n >= MAX_COMMIT_ATTEMPTS || !headMoved ||
              nb.schemaJson != base.schemaJson ||
              nb.partitionColumns != base.partitionColumns ||
              !canRetry(base, nb)) throw e
          b = nb
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Test seam: invoked between an op's artifact write and its commit
    * attempt — lets a spec deterministically interleave a racing
    * commit. No-op in production. */
  private[lake] var beforeCommitHook: () => Unit = () => ()

  /** Whole-operation conflict retry for COPY-ON-WRITE rewrites (merge,
    * mergeClauses, delete, deleteByKeys, update). A rewrite's outputs
    * derive from the base snapshot's DATA, so a lost commit race can't
    * reuse the already-written artifacts the way [[commitWithRetry]]
    * does for appends — the only sound retry is to RECOMPUTE the whole
    * op against the new HEAD, which is exactly a serial re-execution
    * after the winning commit (serializable by construction; the
    * source/predicate re-evaluates, idempotence watermarks re-check,
    * MOR position ordinals re-capture). Opt-in via table property
    * `commit.conflict-mode=recompute` (≡ Iceberg's commit retries on
    * row-level ops); the default `fail` surfaces the
    * ConcurrentModificationException so the caller decides — either
    * way the loser NEVER silently drops the winner's effect. Each
    * attempt re-reads HEAD from the pointer store, so this is safe
    * across real process boundaries (see CrossProcessConflictSpec).
    * Files written by a lost attempt become orphans for maintenance
    * (same note as appendInternal's rebased retry). */
  /** Tag every Spark job a table operation submits with a readable
    * description (`graft.<op>`) — the optimization guide's "label your
    * jobs": attribution in the UI / listeners without touching plans.
    * Restores the caller's description on exit so nested ops and user
    * labels survive. */
  private def labeled[T](op: String)(f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(s"graft.$op")
    try f finally sc.setJobDescription(prev)
  }

  private def rewriteWithRetry(op: () => Long): Long = {
    var n = 0
    while (true) {
      try return op()
      catch {
        case e: java.util.ConcurrentModificationException =>
          n += 1
          if (n >= MAX_COMMIT_ATTEMPTS ||
              !properties.get(LakeTable.PROP_CONFLICT_MODE)
                .contains("recompute")) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Ingest-path write distribution (≡ Iceberg's
    * `write.distribution-mode=hash`): cluster rows by the table's
    * partition expressions before a partitioned append/overwrite, so
    * each hive partition is written by ~one task instead of EVERY task
    * — without it, a 1000-task ingest into 500 partitions strands up
    * to 500k tiny files per commit (the small-files problem compaction
    * then has to clean up). Opt-in (`none` default): the shuffle is a
    * real cost, and un-partitioned tables or pre-clustered ingests
    * don't need it. Sort-ordered tables already range-cluster, and
    * rewriting ops (merge/compact) keep their own partitioning. */
  private def distributeForWrite(df: DataFrame): DataFrame = {
    val fields = partitionFields
    if (fields.isEmpty ||
        !properties.get(PROP_DISTRIBUTION_MODE).contains("hash")) df
    else {
      val types = schema.fields.map(f => f.name -> f.dataType).toMap
      df.repartition(fields.map(f => f.expr(types(f.source))): _*)
    }
  }

  /** Columns of the `write.sort.order` property that exist in the
    * current schema (comma-separated; unknown names are ignored so a
    * schema evolution can't wedge writes). */
  private def sortOrderColumns: Seq[String] =
    properties.get(PROP_SORT_ORDER).toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
      .filter(schema.fieldNames.contains)

  /** Replace all data (≡ reference K2, scripts/raw-bronze.py:183-185).
    * Outstanding MOR delete files are dropped with the data they applied
    * to (same as [[compact]]): the new snapshot starts delete-free, so
    * readers never pay a can't-match anti-join against a retired era and
    * expireSnapshots can reclaim the delete files. */
  def overwrite(df: DataFrame): Long = labeled("overwrite") {
    autoEvolveFor(df)
    val base = current
    val WriteResult(added, stats, info) =
      writeDataFiles(distributeForWrite(alignToSchema(df)))
    commit(base, "overwrite", added = added, removed = base.liveFiles,
      live = added, addedStats = stats, addedInfo = info, deletesOverride = Some(Nil),
      posDeletesOverride = Some(Nil), dvOverride = Some(Nil))
  }

  /** Predicate-scoped overwrite (≡ Delta `replaceWhere` / Iceberg's
    * `OverwriteFiles` with a row filter): atomically replace exactly
    * the rows matching `predicate` with `df`'s rows — ONE commit, so a
    * reader never observes the region half-swapped and time travel
    * keeps the pre-swap state. Every incoming row must satisfy
    * `predicate`, checked against the STAGED bytes before any commit
    * (Delta's constraint-checked contract; validating the input plan
    * instead would let a non-deterministic batch publish rows the
    * check never saw — a violating batch would silently leak rows out
    * of the replaced region). The delete side
    * reuses the COW DELETE machinery: stats-pruned candidates, files
    * fully covered by the proof drop as pure metadata, only straddling
    * files rewrite (their non-matching rows carry over with
    * outstanding MOR deletes folded). A partition-sync on a 100 TB
    * table thus rewrites nothing and swaps file lists driver-side. */
  def overwriteWhere(df: DataFrame,
      predicate: org.apache.spark.sql.Column): Long =
    labeled("overwriteWhere")(
      rewriteWithRetry(() => overwriteWhereImpl(df, predicate, None)))

  private def overwriteWhereImpl(df: DataFrame,
      predicate: org.apache.spark.sql.Column,
      txn: Option[(String, Long)]): Long = {
    autoEvolveFor(df)
    val base = current
    // exactly-once replay guard (same `txn.<app>` watermark as
    // appendOnce/mergeOnce): a replayed restatement batch skips
    if (txn.exists { case (app, v) =>
        base.properties.get(s"txn.$app").exists(_.toLong >= v) })
      return base.snapshotId
    val aligned = alignToSchema(df)
    // write the replacement batch FIRST, then leak-check WHAT WAS
    // WRITTEN (same rationale as enforceWriteConstraints: the input
    // plan may be non-deterministic, so validating it and then
    // re-evaluating it for the write could publish rows the check
    // never saw). A violation throws before any commit — the written
    // files are unreferenced orphans for maintenance, the table state
    // untouched.
    val WriteResult(addedNew, statsN, infoN) =
      writeDataFiles(distributeForWrite(aligned))
    if (addedNew.nonEmpty) {
      val written = spark.read
        .option("basePath", new Path(rootPath, "data").toString)
        .schema(schema)
        .parquet(addedNew.map(f => new Path(rootPath, f).toString): _*)
      val violating = written.where(!coalesce(predicate, lit(false)))
        .limit(1).count()
      require(violating == 0L,
        s"overwriteWhere: the replacement batch contains rows that do " +
          s"not satisfy the predicate ($predicate) — they would leak " +
          "outside the replaced region; widen the predicate or filter " +
          "the batch")
    }
    // delete side (COW semantics regardless of delete-mode: an
    // overwrite is a rewrite op, like Delta's replaceWhere)
    val candidates = pruneByPredicate(base, predicate)
    val covered = analyzedCond(predicate)
      .map(c => fullyCovered(base, c, candidates)).getOrElse(Nil)
    val rest = candidates.diff(covered)
    val affected =
      if (rest.isEmpty) Nil
      else readFilesWithName(rest)
        .where(predicate)
        .select(FILE_COL).distinct()
        .collect().map(r => relativize(r.getString(0))).toSeq
    val WriteResult(addedSurv, statsS, infoS) =
      if (affected.isEmpty) WriteResult(Nil, Map.empty, Map.empty)
      else writeDataFiles(readFilesForRewrite(base, affected)
        .where(!coalesce(predicate, lit(false))))
    val removed = covered ++ affected
    val added = addedSurv ++ addedNew
    commit(base, "overwrite-where", added = added, removed = removed,
      live = base.liveFiles.diff(removed) ++ added,
      addedStats = statsS ++ statsN, addedInfo = infoS ++ infoN,
      propertiesOverride = txn.map { case (app, v) =>
        base.properties + (s"txn.$app" -> v.toString)
      })
  }

  /** Dynamic partition overwrite (≡ Iceberg `INSERT OVERWRITE` in
    * dynamic mode / Spark's `partitionOverwriteMode=dynamic`): replace
    * exactly the identity partitions PRESENT in `df`, leave every
    * other partition untouched — the daily-restatement write shape.
    * Implemented as [[overwriteWhere]] over the batch's distinct
    * partition tuples (one tiny distinct over the batch), so the
    * replaced partitions drop as metadata and nothing rewrites. The
    * tuple count is capped: beyond it the predicate tree stops being a
    * sane plan, and a batch restating that much of the table should
    * say so explicitly with overwriteWhere/overwrite. */
  def overwritePartitions(df: DataFrame): Long =
    labeled("overwritePartitions")(
      rewriteWithRetry(() => overwritePartitionsImpl(df, None)))

  /** Streaming twin of [[overwritePartitions]] (the per-trigger
    * restatement sink): rides the same `txn.<appId>` watermark as
    * [[appendOnce]]/[[mergeOnce]], so a crash-replayed micro-batch
    * restates nothing twice — exactly-once table content from
    * at-least-once replay. */
  def overwritePartitionsOnce(df: DataFrame, appId: String,
      version: Long): Long =
    labeled("overwritePartitionsOnce")(rewriteWithRetry(() =>
      overwritePartitionsImpl(df, Some((appId, version)))))

  private def overwritePartitionsImpl(df: DataFrame,
      txn: Option[(String, Long)]): Long = {
    val fields = partitionFields
    require(fields.nonEmpty,
      "overwritePartitions requires a partitioned table " +
        "(use overwrite/overwriteWhere on an unpartitioned table)")
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    // every field's transform must invert to a source condition:
    // identity = equality, day/month/year/truncate = the source range
    // whose derived value is the partition's — bucket (a hash) and
    // truncate-on-string cannot, and are refused up front
    fields.foreach(f => require(
      f.inverseCond(types(f.source), protoValue(types(f.source)))
        .isDefined,
      s"overwritePartitions cannot invert transform ${f.spec} — " +
        "use overwriteWhere with an explicit predicate"))
    // replay guard BEFORE the distinct job: a watermarked replay skips
    // without touching the batch at all
    val base = current
    if (txn.exists { case (app, v) =>
        base.properties.get(s"txn.$app").exists(_.toLong >= v) })
      return base.snapshotId
    val aligned = alignToSchema(df)
    val tuples = aligned
      .select(fields.map(f =>
        f.expr(types(f.source)).as(f.dirName)): _*)
      .distinct().limit(1001).collect()
    require(tuples.length <= 1000,
      "overwritePartitions: batch touches more than 1000 distinct " +
        "partitions — use overwriteWhere with an explicit predicate")
    require(tuples.nonEmpty, "overwritePartitions: empty batch")
    val predicate = tuples.map { t =>
      fields.zipWithIndex.map { case (f, i) =>
        f.inverseCond(types(f.source),
          if (t.isNullAt(i)) null else t.get(i)).get
      }.reduce(_ && _)
    }.reduce(_ || _)
    overwriteWhereImpl(aligned, predicate, txn)
  }

  /** A representative non-null derived value for probing a transform's
    * invertibility before any job runs (the probe value itself is
    * discarded). */
  private def protoValue(sourceType: org.apache.spark.sql.types.DataType)
      : Any = sourceType match {
    case org.apache.spark.sql.types.StringType => "x"
    case _ => 0L
  }

  /** Copy-on-write MERGE: upsert `source` into this table keyed on `keys`
    * — `WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN INSERT *`
    * (≡ reference K6/J1, scripts/bronze-silver.py:209-217,254-269; key
    * reconstructed as the dedup partition key, see SURVEY.md §2.4).
    *
    * Caller is responsible for the source being deduped to ≤1 row per key
    * (the reference always dedups first via the ROW_NUMBER window —
    * scripts/bronze-silver.py:258-266); rows with a null key never match
    * and are treated as inserts (SQL join semantics).
    */
  def merge(source: DataFrame, keys: Seq[String]): Long =
    merge(source, keys, None)

  /** CDC-shaped MERGE: `deleteWhen` marks source rows as deletions —
    * `WHEN MATCHED AND <cond> THEN DELETE` (the single-statement form
    * of the reference's Op = 'D' CDC handling, which its pipeline
    * spells as a separate keyed delete — SURVEY.md §2.2 K6 note). The
    * condition is evaluated against the RAW source (it may reference
    * source-only columns like a CDC Op column, which schema alignment
    * would drop); a null condition counts as not-deleted. Delete rows
    * whose key matches nothing are no-ops; a deduped batch has each
    * key either deleting or upserting, never both (same caller
    * contract as the upsert form). */
  def merge(source: DataFrame, keys: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column]): Long =
    merge(source, keys, deleteWhen, None)

  /** Full-sync MERGE: the upsert (plus optional CDC `deleteWhen`)
    * extended with `WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE`
    * — target rows whose key matches NO source row (and that satisfy
    * `dropUnmatchedWhen`, `lit(true)` for unconditional) are dropped.
    * The canonical use is a dimension refresh from a full snapshot:
    * rows absent from today's extract disappear from the table in the
    * same commit that upserts the rest.
    *
    * Cost note (inherent to the semantics, same as Iceberg/Delta): the
    * drop scope is every file that may hold a cond-satisfying row — an
    * UNCONDITIONAL sync rewrites cond-matched files table-wide under
    * COW. Scope it with a condition (e.g. the partition being synced)
    * so stats pruning can narrow the rewrite; under merge-on-read the
    * sync costs one key+cond column scan and zero rewrites. The cond is
    * evaluated against TARGET rows (bare column names). */
  def merge(source: DataFrame, keys: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column],
      dropUnmatchedWhen: Option[org.apache.spark.sql.Column]): Long =
    merge(source, keys, deleteWhen, dropUnmatchedWhen, Map.empty, None)

  /** [[merge]] with `extraProperties` recorded atomically IN the merge
    * commit (the incremental-maintenance watermark contract, same as
    * [[mergeClauses]]) and an optional `txn` exactly-once watermark —
    * what lets a maintainer whose after-image is fully source-computable
    * (e.g. [[ScdDimension]]) ride the STAR merge and therefore the
    * zero-rewrite merge-on-read path, which clause-merges cannot. */
  def merge(source: DataFrame, keys: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column],
      dropUnmatchedWhen: Option[org.apache.spark.sql.Column],
      extraProperties: Map[String, String],
      txn: Option[(String, Long)]): Long =
    labeled("merge")(rewriteWithRetry(() =>
      mergeImpl(source, keys, deleteWhen, dropUnmatchedWhen,
        extraProperties, txn)))

  private def mergeImpl(source: DataFrame, keys: Seq[String],
      deleteWhen: Option[org.apache.spark.sql.Column],
      dropUnmatchedWhen: Option[org.apache.spark.sql.Column],
      extraProperties: Map[String, String] = Map.empty,
      txn: Option[(String, Long)] = None): Long = {
    autoEvolveFor(source)
    val base = current
    // replayed exactly-once batch: the watermark re-check also runs on
    // the rebased head inside mergeMor / on rewriteWithRetry re-runs
    if (txn.exists { case (app, v) =>
        base.properties.get(s"txn.$app").exists(_.toLong >= v) })
      return base.snapshotId
    def mergedProps: Option[Map[String, String]] =
      if (extraProperties.isEmpty && txn.isEmpty) None
      else Some(base.properties ++ extraProperties ++
        txn.map { case (app, v) => s"txn.$app" -> v.toString })
    // split on the delete condition BEFORE alignment drops CDC columns
    val delCond = deleteWhen.map(c => coalesce(c, lit(false)))
    val deleteKeys = delCond.map(c =>
      source.where(c).select(keys.map(col): _*).na.drop().distinct())
    val src = alignToSchema(
      delCond.map(c => source.where(not(c))).getOrElse(source))
    if (base.liveFiles.isEmpty) {
      if (extraProperties.isEmpty && txn.isEmpty) return append(src)
      val WriteResult(added0, stats0, info0) = writeDataFiles(
        distributeForWrite(src))
      return commit(base, "merge", added = added0, removed = Nil,
        live = base.liveFiles ++ added0, addedStats = stats0,
        addedInfo = info0, propertiesOverride = mergedProps)
    }
    if (properties.get(PROP_MERGE_MODE).contains("merge-on-read"))
      return mergeMor(base, src, keys, deleteKeys, dropUnmatchedWhen,
        txn, extraProperties)

    // 1) Affected-file pruning, two stages:
    //    (a) manifest-stats range intersection — driver-only, touches ZERO
    //        data; at 100 TB this is what keeps a merge's cost proportional
    //        to the key range it touches, not to table size;
    //    (b) key-columns-only scan of the surviving files, semi-joined with
    //        the distinct source keys (column-pruned Parquet scan; AQE
    //        broadcasts the key set when small).
    //    Both stages run over upsert AND delete keys.
    val srcKeys = src.select(keys.map(col): _*).distinct()
    val allKeys = deleteKeys match {
      case Some(d) => srcKeys.unionByName(d).distinct()
      case None => srcKeys
    }
    val candidates = pruneByStats(base, allKeys, keys)
    val keyAffected =
      if (candidates.isEmpty) Nil
      else readFilesWithName(candidates)
        .select((keys.map(col) :+ col(FILE_COL)): _*)
        .join(allKeys, keys, "left_semi")
        .select(FILE_COL).distinct()
        .collect().map(r => relativize(r.getString(0))).toSeq
    // NOT MATCHED BY SOURCE widens the rewrite to files that may hold a
    // cond-satisfying row with a key absent from the source: stats-prune
    // by the condition first, then a locating scan (cond columns + keys
    // only — Catalyst prunes the read schema) anti-joined on the keys
    val dropCond = dropUnmatchedWhen.map(c => coalesce(c, lit(false)))
    val dropAffected = dropCond match {
      case None => Nil
      case Some(c) =>
        val scope = pruneByPredicate(base, c)
        if (scope.isEmpty) Nil
        else readFilesWithName(scope)
          .where(c)
          .join(allKeys, keys, "left_anti")
          .select(FILE_COL).distinct()
          .collect().map(r => relativize(r.getString(0))).toSeq
    }
    val affected = (keyAffected ++ dropAffected).distinct

    if (affected.isEmpty) {
      // pure-insert batch: nothing to rewrite (deletes matched nothing)
      val WriteResult(added, stats, info) = writeDataFiles(src)
      return commit(base, "merge", added = added, removed = Nil,
        live = base.liveFiles ++ added, addedStats = stats,
        addedInfo = info, propertiesOverride = mergedProps)
    }

    // 2) Rewrite ONLY the affected files: full-outer join with the source;
    //    a matched row takes every source column (UPDATE SET *), an
    //    unmatched target row is carried through, an unmatched source row
    //    is an insert; rows keyed by a delete row are dropped last.
    val cols = schema.fieldNames.toSeq
    // the drop flag is computed on the TARGET plan before the join so
    // the condition's bare column names can never be join-ambiguous
    val dropMark = "__graft_drop_mark"
    val lineage = rowLineageEnabled
    val tgt = readFilesForRewrite(base, affected)
      .withColumn(dropMark, dropCond.getOrElse(lit(false)))
      .alias("t")
    val s = src.withColumn(SRC_MARK, lit(1)).alias("s")
    // plain equality (NOT null-safe): a null key never matches, so
    // null-key source rows are inserts and null-key target rows carry
    // through — consistent with the semi-join pruning above and the
    // documented contract
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val merged = tgt.join(s, cond, "full_outer")
      // NOT MATCHED BY SOURCE: an unmatched target row flagged by the
      // cond drops; matched and source-only rows always pass (the mark
      // is null on source-only rows — coalesce keeps them)
      .where(col(SRC_MARK).isNotNull ||
        !coalesce(col(dropMark), lit(false)))
      .select(cols.map { c =>
        when(col(SRC_MARK).isNotNull, col(s"s.$c"))
          .otherwise(col(s"t.$c")).as(c)
      } ++
        // lineage: a matched row is an UPDATE and keeps the target's
        // id; a source-only row is an insert — its t._row_id is null
        // from the full-outer join and commit assigns it fresh
        (if (lineage) Seq(col(s"t.$ROW_ID_COL").as(ROW_ID_COL))
         else Nil): _*)
    val result = deleteKeys match {
      case Some(d) => merged.join(d, keys, "left_anti")
      case None => merged
    }

    val WriteResult(added, stats, info) = writeDataFiles(result)
    commit(base, "merge", added = added, removed = affected,
      live = base.liveFiles.diff(affected) ++ added, addedStats = stats,
      addedInfo = info, propertiesOverride = mergedProps)
  }

  /** Merge-on-read MERGE (≡ the `write.merge.mode=merge-on-read`
    * capability the reference configures, scripts/raw-bronze.py:166-172):
    * write the after-image as new data files plus ONE equality-delete
    * file of the source keys — ZERO reads or rewrites of existing data.
    * Cost is O(source) regardless of table size; readers pay the
    * anti-join until [[compact]] folds the deletes in. The after-image
    * shares the delete's sequence number, so it is never
    * self-suppressed; null-key source rows are pure inserts (their keys
    * are excluded from the delete file), matching the COW contract. */
  private def mergeMor(base: Snapshot, src: DataFrame,
      keys: Seq[String], extraDeleteKeys: Option[DataFrame] = None,
      dropUnmatchedWhen: Option[org.apache.spark.sql.Column] = None,
      txn: Option[(String, Long)] = None,
      extraProperties: Map[String, String] = Map.empty): Long = {
    val WriteResult(added, stats, info) = writeDataFiles(src)
    // one equality-delete file covers upserts (replaced by the
    // after-image) AND CDC delete rows (no after-image at all)
    val srcDelKeys = src.select(keys.map(col): _*).distinct().na.drop()
    val cdcKeys = extraDeleteKeys match {
      case Some(d) => srcDelKeys.unionByName(d).distinct()
      case None => srcDelKeys
    }
    // NOT MATCHED BY SOURCE under MOR: ONE key+cond column scan of the
    // live table (Catalyst prunes the read schema) finds target keys
    // absent from the source; they join the same equality-delete file —
    // a full-table sync still rewrites ZERO data files
    val delKeys = dropUnmatchedWhen match {
      case None => cdcKeys
      case Some(c) =>
        val unmatched = readFilesAs(base, base.liveFiles)
          .where(coalesce(c, lit(false)))
          .select(keys.map(col): _*).na.drop().distinct()
          .join(cdcKeys, keys, "left_anti")
        cdcKeys.unionByName(unmatched).distinct()
    }
    val delPaths = writeDeleteFiles(delKeys)
    // retry-safe against any same-schema interleaving: the re-based
    // delete file's new sequence suppresses matching keys in EVERY
    // current data file (including a racer's fresh appends — exactly
    // the declarative upsert contract), and the after-image outranks it
    commitWithRetry(base)() { b =>
      // a replayed exactly-once batch racing its own earlier success:
      // re-check the watermark on the REBASED head and skip rather
      // than double-merge (the just-written files become orphans for
      // maintenance, same as the append path)
      if (txn.exists { case (app, v) =>
          b.properties.get(s"txn.$app").exists(_.toLong >= v) })
        b.snapshotId
      else {
        val seq = b.snapshotId + 1
        commit(b, "merge", added = added, removed = Nil,
          live = b.liveFiles ++ added, addedStats = stats, addedInfo = info,
          deletesOverride = Some(b.deleteFiles ++
            delPaths.map(p => DeleteFile(p, seq, keys, keys))),
          propertiesOverride =
            if (txn.isEmpty && extraProperties.isEmpty) None
            else Some(b.properties ++ extraProperties ++
              txn.map { case (app, v) => s"txn.$app" -> v.toString }))
      }
    }
  }

  /** Exactly-once streaming MERGE (the write-side contract behind the
    * lake streaming sink's `mergeKeys` option): [[merge]]'s upsert +
    * CDC-delete semantics guarded by the same `txn.<appId>` snapshot
    * watermark as [[appendOnce]] — a micro-batch replayed after a
    * crash between table commit and streaming-offset commit finds its
    * own (appId, batchId) watermark and skips. Merge-on-read tables
    * only: per-batch COW would rewrite data files every trigger, while
    * the MOR path costs one data file + one equality-delete file per
    * batch regardless of table size — the only merge shape that
    * survives a continuous 100-TB silver layer. */
  def mergeOnce(source: DataFrame, keys: Seq[String], appId: String,
      version: Long,
      deleteWhen: Option[org.apache.spark.sql.Column] = None): Long = {
    require(properties.get(PROP_MERGE_MODE).contains("merge-on-read"),
      s"mergeOnce needs $PROP_MERGE_MODE=merge-on-read — a per-batch " +
        "COW rewrite is not a streaming-viable plan")
    autoEvolveFor(source)
    val base = current
    if (base.properties.get(s"txn.$appId").exists(_.toLong >= version))
      return base.snapshotId
    val delCond = deleteWhen.map(c => coalesce(c, lit(false)))
    val deleteKeys = delCond.map(c =>
      source.where(c).select(keys.map(col): _*).na.drop().distinct())
    val src = alignToSchema(
      delCond.map(c => source.where(not(c))).getOrElse(source))
    mergeMor(base, src, keys, deleteKeys, None,
      txn = Some(appId -> version))
  }

  /** General MERGE with per-clause conditions and assignments — the
    * full Iceberg-Spark surface beyond the reference's star-only text:
    * `WHEN MATCHED [AND c] THEN UPDATE SET col = expr, … | DELETE`,
    * `WHEN NOT MATCHED [AND c] THEN INSERT (cols) VALUES (exprs)`,
    * `WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE … | DELETE`,
    * each list evaluated FIRST-MATCH-WINS (Spark semantics).
    *
    * Name resolution contract (the SQL front-end pre-resolves to it):
    * `matched` / `notMatched` conditions and values reference the
    * joined plan — target columns as `t.<col>`, source columns as
    * `s.<col>`. `notMatchedBySource` clauses are evaluated on the
    * TARGET plan BEFORE the join (no source row exists) and use BARE
    * target column names. Assignment keys are bare target column
    * names; columns a matched/NMBS update leaves unassigned keep their
    * target value, columns an insert leaves unassigned become null.
    *
    * Scale shape (identical to the star merge): affected files =
    * stats-pruned ∩ key-semi-join for the matched side, plus a
    * cond-pruned anti-join scan for the NMBS side; only those files
    * rewrite. A matched row no clause applies to carries through.
    * Same caller contract as [[merge]]: the source is deduped to ≤1
    * row per key. COW only — a merge-on-read table takes the star
    * paths; general assignments must read matched rows to compute the
    * after-image, so MOR would save nothing here. */
  def mergeClauses(source: DataFrame, keys: Seq[String],
      matched: Seq[MergeWhen], notMatched: Seq[MergeWhen],
      notMatchedBySource: Seq[MergeWhen] = Nil,
      extraProperties: Map[String, String] = Map.empty,
      txn: Option[(String, Long)] = None): Long =
    labeled("mergeClauses")(rewriteWithRetry(() =>
      mergeClausesImpl(source, keys, matched,
        notMatched, notMatchedBySource, extraProperties, txn)))

  private def mergeClausesImpl(source: DataFrame, keys: Seq[String],
      matched: Seq[MergeWhen], notMatched: Seq[MergeWhen],
      notMatchedBySource: Seq[MergeWhen],
      extraProperties: Map[String, String],
      txn: Option[(String, Long)]): Long = {
    // extraProperties land IN the merge's own commit — a watermark
    // recorded atomically with the change it describes (the
    // incremental-MV refresh contract: no crash window where the delta
    // applied but its source snapshot wasn't recorded, or vice versa).
    // `txn` is the appendOnce idempotence contract for merges: a
    // replayed (appId, version) at or below the recorded watermark is
    // a no-op — what makes a foreachBatch delta-merge exactly-once.
    def txnWatermarked(s: Snapshot): Boolean = txn.exists {
      case (app, v) =>
        s.properties.get(s"txn.$app").exists(_.toLong >= v)
    }
    if (txn.nonEmpty) {
      val b = current
      if (txnWatermarked(b)) return b.snapshotId
    }
    val txnProps = txn.map { case (app, v) =>
      s"txn.$app" -> v.toString }.toMap
    def propsFor(b: Snapshot): Option[Map[String, String]] =
      if (extraProperties.isEmpty && txnProps.isEmpty) None
      else Some(b.properties ++ extraProperties ++ txnProps)
    val fields = schema.fieldNames.toSeq
    def normName(n: String): String =
      fields.find(_.equalsIgnoreCase(n)).getOrElse(throw
        new IllegalArgumentException(s"MERGE assigns unknown column $n"))
    def normAssigns(w: MergeWhen): MergeWhen =
      w.copy(assignments = w.assignments.map(_.map { case (k, v) =>
        normName(k) -> v }))
    val m = matched.map(normAssigns)
    val nm = notMatched.map(normAssigns)
    val nmbs = notMatchedBySource.map(normAssigns)
    require(nm.forall(_.assignments.nonEmpty),
      "WHEN NOT MATCHED supports only INSERT")
    val base = current
    // index-of-first-applying-clause cascade; when() treats a null
    // condition as not-applying, matching SQL's WHEN … AND semantics
    def firstIdx(clauses: Seq[MergeWhen]): Column =
      clauses.zipWithIndex.foldRight(lit(-1)) { case ((w, i), rest) =>
        when(w.condition.getOrElse(lit(true)), lit(i)).otherwise(rest)
      }
    // keep the row unless the first applying clause is a DELETE
    def keepFor(clauses: Seq[MergeWhen], idx: Column): Column =
      clauses.zipWithIndex.filter(_._1.assignments.isEmpty) match {
        case Nil => lit(true)
        case dels => !dels.map { case (_, i) => idx === lit(i) }
          .reduce(_ || _)
      }
    // per-column value under a clause cascade: CASE idx WHEN i THEN
    // assigned-or-default … ELSE default
    def valueFor(clauses: Seq[MergeWhen], idx: Column, c: String,
        default: Column): Column =
      clauses.zipWithIndex.foldRight(default) { case ((w, i), rest) =>
        val v = w.assignments.flatMap(_.get(c)).getOrElse(default)
        when(idx === lit(i), v).otherwise(rest)
      }

    if (base.liveFiles.isEmpty) {
      // every source row is NOT MATCHED: run the insert cascade alone
      val s = source.alias("s")
      val idx = firstIdx(nm)
      val inserted = s.where(idx =!= -1).select(fields.map { c =>
        valueFor(nm, idx, c, lit(null))
          .cast(schema(c).dataType).as(c)
      }: _*)
      if (extraProperties.isEmpty && txn.isEmpty) return append(inserted)
      val WriteResult(added, stats, info) =
        writeDataFiles(distributeForWrite(alignToSchema(inserted)))
      return commitWithRetry(base)() { b =>
        // re-check the txn watermark against the snapshot actually
        // being committed on — the up-front check is check-then-act;
        // a concurrent replay of the same (appId, version) landing
        // between it and this commit must turn this attempt into a
        // no-op, not a double-apply
        if (txnWatermarked(b)) b.snapshotId
        else commit(b, "merge", added = added, removed = Nil,
          live = b.liveFiles ++ added, addedStats = stats,
          addedInfo = info, propertiesOverride = propsFor(b))
      }
    }

    // affected files: (a) any file that may hold a source key —
    // manifest-stats pruning then a key-columns-only locating scan;
    // (b) for NMBS clauses, files that may hold a cond-satisfying row
    // whose key is absent from the source
    val srcKeys = source.select(keys.map(col): _*).distinct()
    val candidates = pruneByStats(base, srcKeys, keys)
    val keyAffected =
      if (candidates.isEmpty) Nil
      else readFilesWithName(candidates)
        .select((keys.map(col) :+ col(FILE_COL)): _*)
        .join(srcKeys, keys, "left_semi")
        .select(FILE_COL).distinct()
        .collect().map(r => relativize(r.getString(0))).toSeq
    val nmbsCond = nmbs match {
      case Nil => None
      case ws => Some(ws.map(w =>
        coalesce(w.condition.getOrElse(lit(true)), lit(false)))
        .reduce(_ || _))
    }
    val nmbsAffected = nmbsCond match {
      case None => Nil
      case Some(c) =>
        val scope = pruneByPredicate(base, c)
        if (scope.isEmpty) Nil
        else readFilesWithName(scope)
          .where(c)
          .join(srcKeys, keys, "left_anti")
          .select(FILE_COL).distinct()
          .collect().map(r => relativize(r.getString(0))).toSeq
    }
    val affected = (keyAffected ++ nmbsAffected).distinct

    if (affected.isEmpty) {
      val s = source.alias("s")
      val idx = firstIdx(nm)
      val inserted = s.where(idx =!= -1).select(fields.map { c =>
        valueFor(nm, idx, c, lit(null))
          .cast(schema(c).dataType).as(c)
      }: _*)
      val WriteResult(added, stats, info) = writeDataFiles(inserted)
      return commit(base, "merge", added = added, removed = Nil,
        live = base.liveFiles ++ added, addedStats = stats,
        addedInfo = info, propertiesOverride = propsFor(base))
    }

    // NMBS clauses see only the target: compute their clause index and
    // assigned values on the pre-join plan, where bare names resolve
    val nmbsIdxCol = "__graft_nmbs_idx"
    val nmbsVal = (i: Int, c: String) => s"__graft_nmbs_${i}_$c"
    val nmbsAssignedCols: Seq[(Int, String)] = nmbs.zipWithIndex.flatMap {
      case (w, i) => w.assignments.toSeq.flatMap(_.keys).map(c => (i, c))
    }
    val clauseLineage = rowLineageEnabled
    val tgtBase = readFilesForRewrite(base, affected)
      .withColumn(TGT_MARK, lit(1))
      .withColumn(nmbsIdxCol,
        if (nmbs.isEmpty) lit(-1) else firstIdx(nmbs))
    val tgtPre = nmbsAssignedCols.foldLeft(tgtBase) { case (df, (i, c)) =>
      df.withColumn(nmbsVal(i, c),
        nmbs(i).assignments.flatMap(_.get(c)).get)
    }
    val tgt = tgtPre.alias("t")
    val s = source.withColumn(SRC_MARK, lit(1)).alias("s")
    val cond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    val joined = tgt.join(s, cond, "full_outer")

    val isMatched = col(s"t.$TGT_MARK").isNotNull &&
      col(SRC_MARK).isNotNull
    val isSrcOnly = col(s"t.$TGT_MARK").isNull
    val mIdx = firstIdx(m)
    val iIdx = firstIdx(nm)
    val nIdx = col(s"t.$nmbsIdxCol")
    val nmbsKeep = nmbs.zipWithIndex.filter(_._1.assignments.isEmpty) match {
      case Nil => lit(true)
      case dels => !dels.map { case (_, i) => nIdx === lit(i) }
        .reduce(_ || _)
    }
    def nmbsValueFor(c: String): Column =
      nmbs.zipWithIndex.foldRight(col(s"t.$c")) { case ((w, i), rest) =>
        if (w.assignments.exists(_.contains(c)))
          when(nIdx === lit(i), col(s"t.${nmbsVal(i, c)}")).otherwise(rest)
        else rest
      }

    val keep =
      (isMatched && keepFor(m, mIdx)) ||
      (isSrcOnly && iIdx =!= -1) ||
      (!isMatched && !isSrcOnly && nmbsKeep)
    val result = joined.where(keep).select(fields.map { c =>
      when(isMatched, valueFor(m, mIdx, c, col(s"t.$c")))
        .when(isSrcOnly, valueFor(nm, iIdx, c, lit(null)))
        .otherwise(nmbsValueFor(c))
        .cast(schema(c).dataType).as(c)
    } ++
      // lineage: matched/NMBS-updated rows keep the target id;
      // source-only inserts are null → assigned fresh at commit
      (if (clauseLineage) Seq(col(s"t.$ROW_ID_COL").as(ROW_ID_COL))
       else Nil): _*)

    val WriteResult(added, stats, info) = writeDataFiles(result)
    commit(base, "merge", added = added, removed = affected,
      live = base.liveFiles.diff(affected) ++ added,
      addedStats = stats, addedInfo = info,
      propertiesOverride = propsFor(base))
  }

  /** Stats-based candidate pruning for key-equality operations: a file
    * whose recorded [min, max] for ANY key column is disjoint from the
    * source's key range cannot contain a matching row. Files or columns
    * without recorded bounds are conservatively kept; an unsupported key
    * type disables pruning entirely. Costs one tiny agg over the source's
    * key columns and a driver-side manifest walk — no table data is read. */
  private[lake] def pruneByStats(base: Snapshot, src: DataFrame,
      keys: Seq[String]): Seq[String] = {
    val ranged = pruneByKeyBounds(base, src, keys)
    val parted =
      if (ranged.isEmpty) ranged
      else pruneByPartitionTransforms(base, src, keys, ranged)
    if (parted.isEmpty) parted
    else pruneByBloom(base, src, keys, parted)
  }

  /** Bloom pruning for key-equality ops (see [[BloomStats]]): when
    * candidate files carry `__bloom__<key>` filters and the DISTINCT
    * source key set is small enough to collect (its hashes — two longs
    * per key column via one tiny agg, never the values), drop every
    * candidate whose filters exclude ALL source keys. This is what
    * range bounds cannot do on an unsorted ingest where every file
    * spans the whole key domain. Files without filters (or any
    * filterless tested column) are conservatively kept; a too-large
    * source skips the phase entirely. */
  private def pruneByBloom(base: Snapshot, src: DataFrame,
      keys: Seq[String], candidates: Seq[String]): Seq[String] = {
    val withBloom = candidates.filter(f =>
      base.fileStats.get(f).exists(st =>
        keys.exists(k => st.contains(BloomStats.statKey(k)))))
    if (withBloom.isEmpty) return candidates
    BloomStats.sourceKeyHashes(src, keys) match {
      case None => candidates // unbounded source: bounds pruning stands
      case Some(hashes) =>
        val excluded = withBloom.filter { f =>
          val st = base.fileStats(f)
          val filters = keys.map(k =>
            st.get(BloomStats.statKey(k)).map(cs =>
              BloomStats.decode(cs.min)))
          !hashes.exists(row => BloomStats.mightContain(filters, row))
        }.toSet
        candidates.filterNot(excluded)
    }
  }

  private def pruneByKeyBounds(base: Snapshot, src: DataFrame,
      keys: Seq[String]): Seq[String] = {
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    if (!keys.forall(k => FileStats.supportsPruning(types(k))))
      return base.liveFiles
    if (base.fileStats.isEmpty) return base.liveFiles
    val aggs = keys.flatMap { k =>
      val e = FileStats.boundExpr(k, types(k))
      Seq(min(e).as(s"__min_$k"), max(e).as(s"__max_$k"))
    }
    val row = src.agg(aggs.head, aggs.tail: _*).head()
    val bounds = keys.zipWithIndex.map { case (k, i) =>
      val mn = row.get(2 * i)
      val mx = row.get(2 * i + 1)
      // a key column with zero non-null source values matches nothing
      // (plain-equality contract): no file can be affected
      if (mn == null || mx == null) return Nil
      // widen ±0.0 on FP keys (Spark join equality: 0.0 == -0.0), same
      // as the file-side encoding in FileStats.fpBounds
      types(k) match {
        case FloatType | DoubleType =>
          val lo = mn.asInstanceOf[Double]
          val hi = mx.asInstanceOf[Double]
          k -> (((if (lo == 0.0) -0.0 else lo).toString,
            (if (hi == 0.0) 0.0 else hi).toString))
        case _ => k -> ((mn.toString, mx.toString))
      }
    }.toMap
    base.liveFiles.filter { f =>
      base.fileStats.get(f).forall { st =>
        keys.forall { k =>
          st.get(k).forall { cs =>
            val (sMin, sMax) = bounds(k)
            FileStats.rangesOverlap(types(k), cs.min, cs.max, sMin, sMax)
          }
        }
      }
    }
  }

  /** Hidden-partition pruning for key-equality ops: when a key column is
    * the SOURCE of a partition transform, intersect each candidate
    * file's recorded derived point-stat with the source's derived
    * values — set-membership for bucket (≤ N distinct values, one tiny
    * distinct over the source keys), range intersection for the
    * monotone time/truncate transforms. This is what keeps a MERGE on a
    * `bucket(N, key)` table reading N-th of the table with NO sort
    * order. Files without the stat are conservatively kept. */
  private def pruneByPartitionTransforms(base: Snapshot, src: DataFrame,
      keys: Seq[String], candidates: Seq[String]): Seq[String] = {
    if (base.fileStats.isEmpty) return candidates
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    val fields = partitionFields
      .filter(f => !f.isIdentity && keys.contains(f.source))
    if (fields.isEmpty) return candidates
    var files = candidates
    fields.foreach { f =>
      val dt = f.statType(types(f.source))
      val expr = f.expr(types(f.source))
      f.transform match {
        case PartitionSpec.Bucket(_) | PartitionSpec.BucketIceberg(_) =>
          // null source keys never match (plain-equality contract) —
          // exclude them BEFORE deriving (bucket(null) is a real bucket)
          val vals = src.where(col(f.source).isNotNull)
            .select(expr.as("__graft_bval")).distinct()
            .collect().map(_.getLong(0)).toSet
          files = files.filter { file =>
            base.fileStats.get(file).flatMap(_.get(f.dirName)) match {
              case Some(cs) => vals.contains(cs.min.toLong)
              case None => true
            }
          }
        case _ => // monotone transform: derived range intersection
          val row = src.agg(min(expr), max(expr)).head()
          if (!row.isNullAt(0)) {
            val (mn, mx) =
              if (dt == StringType) (row.getString(0), row.getString(1))
              else (row.getLong(0).toString, row.getLong(1).toString)
            files = files.filter { file =>
              base.fileStats.get(file).flatMap(_.get(f.dirName)) match {
                case Some(cs) =>
                  FileStats.rangesOverlap(dt, cs.min, cs.max, mn, mx)
                case None => true
              }
            }
          }
      }
    }
    files
  }

  /** Key-based copy-on-write DELETE: remove every row whose key appears
    * in `keys` (a DataFrame carrying the key columns) — the CDC-delete
    * primitive. Same affected-file pruning as [[merge]]: a key-column-
    * only scan semi-joined with the distinct keys locates the files to
    * rewrite; the rewrite anti-joins them away. Null keys never match. */
  def deleteByKeys(keys: DataFrame, keyCols: Seq[String]): Long =
    labeled("deleteByKeys")(
      rewriteWithRetry(() => deleteByKeysImpl(keys, keyCols)))

  private def deleteByKeysImpl(keys: DataFrame,
      keyCols: Seq[String]): Long = {
    val base = current
    if (base.liveFiles.isEmpty) return base.snapshotId
    if (properties.get(PROP_DELETE_MODE).contains("merge-on-read")) {
      // MOR: commit just the equality-delete file — no scan, no rewrite
      val types = schema.fields.map(f => f.name -> f.dataType).toMap
      val k = keys
        .select(keyCols.map(c => col(c).cast(types(c)).as(c)): _*)
        .distinct().na.drop()
      if (k.isEmpty) return base.snapshotId
      val delPaths = writeDeleteFiles(k)
      // retry-safe like mergeMor: "delete these keys" is declarative —
      // the re-based sequence applies it to a racer's fresh rows too
      return commitWithRetry(base)() { b =>
        val seq = b.snapshotId + 1
        commit(b, "delete", added = Nil, removed = Nil,
          live = b.liveFiles,
          deletesOverride = Some(b.deleteFiles ++
            delPaths.map(p => DeleteFile(p, seq, keyCols, keyCols))))
      }
    }
    val k = keys.select(keyCols.map(col): _*).distinct()
    val candidates = pruneByStats(base, k, keyCols)
    if (candidates.isEmpty) return base.snapshotId
    val affected = readFilesWithName(candidates)
      .select((keyCols.map(col) :+ col(FILE_COL)): _*)
      .join(k, keyCols, "left_semi")
      .select(FILE_COL).distinct()
      .collect().map(r => relativize(r.getString(0))).toSeq
    if (affected.isEmpty) return base.snapshotId
    val kept = readFilesForRewrite(base, affected)
      .join(k, keyCols, "left_anti")
    val WriteResult(added, stats, info) = writeDataFiles(kept)
    commit(base, "delete", added = added, removed = affected,
      live = base.liveFiles.diff(affected) ++ added, addedStats = stats, addedInfo = info)
  }

  /** Copy-on-write DELETE: rewrite only the files containing rows that
    * match `predicate`, keeping their non-matching rows; untouched files
    * carry forward by manifest reference (same pruning shape as MERGE —
    * the scan that locates affected files reads only the predicate's
    * columns). ≡ the `write.delete.mode=copy-on-write` capability the
    * reference configures (scripts/raw-bronze.py:161-165).
    *
    * With `write.delete.mode=merge-on-read` the delete instead commits
    * POSITION-delete files (≡ Iceberg v2): the locating scan captures
    * each matching row's (file, row-ordinal) — ZERO data rewrite; readers
    * anti-join the positions until [[compact]] folds them in. */
  def delete(predicate: org.apache.spark.sql.Column): Long =
    labeled("delete")(rewriteWithRetry(() => deleteImpl(predicate)))

  private def deleteImpl(predicate: org.apache.spark.sql.Column): Long = {
    val base = current
    if (base.liveFiles.isEmpty) return base.snapshotId
    if (properties.get(PROP_DELETE_MODE).contains("merge-on-read"))
      return morDeleteByPredicate(base, predicate)
    // manifest-stats pruning first (driver-only, zero data read): a
    // partition-equality or range predicate narrows the locating scan to
    // the files whose recorded bounds can satisfy it — at 100 TB the
    // difference between a full-table predicate-column scan per DELETE
    // and one proportional to the touched key range
    val candidates = pruneByPredicate(base, predicate)
    if (candidates.isEmpty) return base.snapshotId
    // metadata delete (≡ Iceberg): files whose stats PROVE every row
    // matches drop from the manifest with zero data I/O — a retention
    // `DELETE WHERE ts < cutoff` on a time-sorted table is a pure
    // metadata commit. Only files the proof can't cover are scanned
    // and rewritten.
    val covered = analyzedCond(predicate)
      .map(c => fullyCovered(base, c, candidates)).getOrElse(Nil)
    val rest = candidates.diff(covered)
    val affected =
      if (rest.isEmpty) Nil
      else readFilesWithName(rest)
        .where(predicate)
        .select(FILE_COL).distinct()
        .collect().map(r => relativize(r.getString(0))).toSeq
    if (covered.isEmpty && affected.isEmpty) return base.snapshotId
    // keep rows where the predicate is NOT TRUE (false or null) — SQL
    // DELETE only removes rows where it evaluates to true
    val WriteResult(added, stats, info) =
      if (affected.isEmpty) WriteResult(Nil, Map.empty, Map.empty)
      else writeDataFiles(readFilesForRewrite(base, affected)
        .where(!coalesce(predicate, lit(false))))
    val removed = covered ++ affected
    commit(base, "delete", added = added, removed = removed,
      live = base.liveFiles.diff(removed) ++ added, addedStats = stats,
      addedInfo = info)
  }

  /** Merge-on-read predicate DELETE via position-delete files: the
    * stats-pruned locating scan (predicate columns only) captures each
    * matching live row's (scan URI, row ordinal); the commit adds ONE
    * tiny delete artifact and rewrites nothing. Cost ∝ matched rows —
    * at 100 TB a predicate delete touches no data files at all. Rows
    * already suppressed (equality or position) are not re-captured. */
  private def morDeleteByPredicate(base: Snapshot,
      predicate: org.apache.spark.sql.Column): Long = {
    val candidates = pruneByPredicate(base, predicate)
    if (candidates.isEmpty) return base.snapshotId
    // metadata delete applies under MOR too — and is even better than a
    // position-delete artifact: a fully-covered file leaves the
    // manifest outright (no per-row capture, no anti-join for readers).
    // Suppressed-row caveat: rows of a covered file already hidden by
    // outstanding deletes match the predicate like every other row
    // (allRowsMatch is a per-FILE proof), so dropping the file changes
    // nothing they'd produce.
    val covered = analyzedCond(predicate)
      .map(c => fullyCovered(base, c, candidates)).getOrElse(Nil)
    val rest = candidates.diff(covered)
    val delPaths =
      if (rest.isEmpty) Nil
      else {
        val positions = readFilesAs(base, rest, withPos = true)
          .where(predicate)
          .select(col(PFILE_COL).as(POS_FILE_FIELD),
            col(PIDX_COL).as(POS_POS_FIELD))
        if (positions.isEmpty) Nil else writeDeleteFiles(positions)
      }
    if (covered.isEmpty && delPaths.isEmpty) return base.snapshotId
    // retry-safe iff every file we captured positions from is STILL live
    // (a racing compact/rewrite would have re-homed the matching rows);
    // a racer's pure appends serialize AFTER this delete, untouched
    commitWithRetry(base)(posRetrySafe) { b =>
      val seq = b.snapshotId + 1
      commit(b, "delete", added = Nil, removed = covered,
        live = b.liveFiles.diff(covered),
        posDeletesOverride = Some(b.posDeleteFiles ++
          delPaths.map(p => PosDeleteFile(p, seq))))
    }
  }

  /** Convert every outstanding EQUALITY delete into position deletes
    * (≡ the equality→position rewrite inside Iceberg's delete
    * maintenance): a merge-on-read table that accumulated N delete
    * eras pays ONE broadcast position anti-join on reads afterwards
    * instead of one equality anti-join per era — the MOR
    * read-amplification dial. Suppressed positions are computed by the
    * SAME read path that serves queries (positions-after-pos-deletes
    * anti-joined with positions-after-all-deletes), so sequence
    * semantics — a merge's after-image outranking its own delete —
    * are inherited, never re-implemented. Only files an equality
    * delete can still touch (era < delete count) are scanned. */
  def convertEqualityDeletes(): Long = {
    val base = current
    val dels = base.deleteFiles
    if (dels.isEmpty) return base.snapshotId
    def era(f: String): Int = {
      val s = base.fileSeq.getOrElse(f, 0L)
      dels.count(_.seq <= s)
    }
    val candidates = base.liveFiles.filter(f => era(f) < dels.size)
    val delPaths =
      if (candidates.isEmpty) Nil
      else {
        val noEq = base.copy(deleteFiles = Nil)
        val afterPos = readFilesAs(noEq, candidates, withPos = true)
          .select(col(PFILE_COL), col(PIDX_COL))
        val surviving = readFilesAs(base, candidates, withPos = true)
          .select(col(PFILE_COL), col(PIDX_COL))
        val suppressed = afterPos.except(surviving)
          .select(col(PFILE_COL).as(POS_FILE_FIELD),
            col(PIDX_COL).as(POS_POS_FIELD))
        if (suppressed.isEmpty) Nil else writeDeleteFiles(suppressed)
      }
    commitWithRetry(base)(posRetrySafe) { b =>
      val seq = b.snapshotId + 1
      // clear only the deletes we CONVERTED — a racing merge may have
      // added new equality deletes after our base, and wiping those
      // would un-delete its rows
      val newer = b.deleteFiles.filterNot(dels.toSet)
      commit(b, "rewrite-deletes", added = Nil, removed = Nil,
        live = b.liveFiles, deletesOverride = Some(newer),
        posDeletesOverride = Some(b.posDeleteFiles ++
          delPaths.map(p => PosDeleteFile(p, seq))))
    }
  }

  /** Position-delete commits may retry only while every data file of the
    * ORIGINAL base is still live — a racer that removed files (compact,
    * COW rewrite) may have re-homed the very rows our captured ordinals
    * target. */
  private val posRetrySafe: (Snapshot, Snapshot) => Boolean =
    (old, nb) => old.liveFiles.toSet.subsetOf(nb.liveFiles.toSet)

  /** Consolidate the accumulated position-delete files (plus any prior
    * deletion vectors) into ONE deletion-vector artifact — a parquet
    * file holding one packed ordinal BITSET per targeted data file
    * (≡ Iceberg v3's deletion vectors / Delta DVs, the v2→v3 delete
    * representation change). What it buys at depth: a MOR table that
    * accumulated thousands of predicate-delete commits otherwise pays,
    * on EVERY read, one parquet open per delete artifact plus an
    * anti-join keyed by every deleted row; after consolidation reads
    * pay one broadcast row per touched data file and a map-side bit
    * test — read amplification flat no matter how many delete commits
    * history holds. Entries for no-longer-live files are dropped
    * (their rows are gone with their files). Content is IDENTICAL
    * before and after — this is maintenance, like
    * [[convertEqualityDeletes]], and composes with it (equality →
    * positions → vectors). New position deletes committed afterwards
    * accumulate again until the next consolidation; reads apply both.
    * Wired into `CALL system.maintain` via
    * `maintenance.consolidate-dv=true`. */
  def consolidateDeleteVectors(): Long = {
    val base = current
    // nothing to fold: no loose position files and at most one vector
    if (base.posDeleteFiles.isEmpty && base.dvFiles.size <= 1)
      return base.snapshotId
    val spark0 = spark
    import spark0.implicits._
    def relTailCol(c: org.apache.spark.sql.Column) =
      regexp_extract(c, "^(?:.*/)?(data/.+)$", 1)
    val posPairs =
      if (base.posDeleteFiles.isEmpty) None
      else Some(spark.read.schema(StructType(Seq(
          StructField(POS_FILE_FIELD, StringType),
          StructField(POS_POS_FIELD, LongType))))
        .parquet(base.posDeleteFiles
          .map(p => new Path(rootPath, p.path).toString): _*)
        .select(relTailCol(col(POS_FILE_FIELD)).as("f"),
          col(POS_POS_FIELD).cast("long").as("p")))
    val dvPairs =
      if (base.dvFiles.isEmpty) None
      else Some(spark.read.schema(StructType(Seq(
          StructField(DV_FILE_FIELD, StringType),
          StructField(DV_BITS_FIELD, ArrayType(LongType)))))
        .parquet(base.dvFiles
          .map(d => new Path(rootPath, d.path).toString): _*)
        .select(col(DV_FILE_FIELD).as("f"),
          posexplode(col(DV_BITS_FIELD)).as(Seq("w", "word")))
        .select(col("f"), col("w"),
          explode(expr(
            "filter(sequence(0, 63), b -> (shiftright(word, b) & 1) = 1)"))
            .as("b"))
        .select(col("f"), (col("w") * 64 + col("b")).cast("long").as("p")))
    val live = spark.createDataset(base.liveFiles).toDF("f")
    val pairs = (posPairs.toSeq ++ dvPairs.toSeq)
      .reduce(_ unionByName _)
      .join(maybeBroadcastFileList(live,
        fileListBytes(base.liveFiles)), Seq("f"), "left_semi")
    // one bitset per file, built per group (a maintenance pass — the
    // read path never runs this); ordinals are bounded by the file's
    // row count, so the bitset is bytes ∝ file rows / 8 at worst
    val dvRows = pairs.as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (f, it) =>
        val bs = new java.util.BitSet()
        it.foreach { case (_, p) =>
          require(p <= Int.MaxValue, s"row ordinal $p out of bitset range")
          bs.set(p.toInt)
        }
        (f, bs.toLongArray.toSeq, bs.cardinality().toLong)
      }
      .toDF(DV_FILE_FIELD, DV_BITS_FIELD, "n_deleted")
    val delPaths = writeDvFiles(dvRows)
    commitWithRetry(base)(posRetrySafe) { b =>
      val seq = b.snapshotId + 1
      // keep only position deletes a racer added AFTER our base —
      // everything in the base set is folded into the vector
      val newer = b.posDeleteFiles.filterNot(base.posDeleteFiles.toSet)
      commit(b, "rewrite-deletes", added = Nil, removed = Nil,
        live = b.liveFiles,
        posDeletesOverride = Some(newer),
        dvOverride = Some(delPaths.map { case (p, sz) =>
          DvFile(p, seq, sz) }))
    }
  }

  /** Copy-on-write UPDATE: `SET col = expr` for rows matching
    * `predicate`, file-pruned exactly like [[delete]]. ≡ the
    * `write.update.mode=copy-on-write` capability the reference
    * configures (scripts/raw-bronze.py:161-165).
    *
    * With `write.update.mode=merge-on-read` the update instead commits
    * position-delete files for the matched rows plus their updated
    * after-image as new data files (≡ Iceberg v2 MOR UPDATE = position
    * delete + insert) — zero rewrite of existing files. */
  def update(predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Long =
    labeled("update")(
      rewriteWithRetry(() => updateImpl(predicate, assignments)))

  private def updateImpl(predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Long = {
    val bad = assignments.keySet.diff(schema.fieldNames.toSet)
    require(bad.isEmpty, s"unknown columns in SET: ${bad.mkString(", ")}")
    val base = current
    if (base.liveFiles.isEmpty) return base.snapshotId
    if (properties.get(PROP_UPDATE_MODE).contains("merge-on-read"))
      return morUpdateByPredicate(base, predicate, assignments)
    // same manifest-stats pruning as [[delete]]
    val candidates = pruneByPredicate(base, predicate)
    if (candidates.isEmpty) return base.snapshotId
    val affected = readFilesWithName(candidates)
      .where(predicate)
      .select(FILE_COL).distinct()
      .collect().map(r => relativize(r.getString(0))).toSeq
    if (affected.isEmpty) return base.snapshotId
    val sch = schema
    val rewritten = readFilesForRewrite(base, affected)
      .select((sch.fields.map { f =>
        assignments.get(f.name) match {
          case Some(e) =>
            when(predicate, e.cast(f.dataType)).otherwise(col(f.name))
              .as(f.name)
          case None => col(f.name)
        }
      }.toIndexedSeq ++
        // lineage: an UPDATE keeps every row's id
        (if (rowLineageEnabled) Seq(col(ROW_ID_COL)) else Nil)): _*)
    val WriteResult(added, stats, info) = writeDataFiles(rewritten)
    commit(base, "update", added = added, removed = affected,
      live = base.liveFiles.diff(affected) ++ added, addedStats = stats, addedInfo = info)
  }

  /** Merge-on-read predicate UPDATE: position-delete the matched rows
    * and append their updated after-image — no rewrite of existing
    * files. The after-image lands in NEW files the position deletes
    * cannot name, so it is never self-suppressed; its fresh sequence
    * also outranks every outstanding equality delete. Both passes scan
    * the same immutable pruned files with the same plan, so the captured
    * ordinals and the after-image rows agree deterministically. */
  private def morUpdateByPredicate(base: Snapshot,
      predicate: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): Long = {
    val candidates = pruneByPredicate(base, predicate)
    if (candidates.isEmpty) return base.snapshotId
    val matched = readFilesAs(base, candidates, withPos = true)
      .where(predicate)
    if (matched.isEmpty) return base.snapshotId
    val positions = matched
      .select(col(PFILE_COL).as(POS_FILE_FIELD),
        col(PIDX_COL).as(POS_POS_FIELD))
    val sch = schema
    val after = matched.select(sch.fields.map { f =>
      assignments.get(f.name) match {
        case Some(e) => e.cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    }.toIndexedSeq: _*)
    val delPaths = writeDeleteFiles(positions)
    val WriteResult(added, stats, info) = writeDataFiles(after)
    // same retry window as morDeleteByPredicate (captured ordinals must
    // still be live); the after-image is new files, racer-independent
    commitWithRetry(base)(posRetrySafe) { b =>
      val seq = b.snapshotId + 1
      commit(b, "update", added = added, removed = Nil,
        live = b.liveFiles ++ added, addedStats = stats, addedInfo = info,
        posDeletesOverride = Some(b.posDeleteFiles ++
          delPaths.map(p => PosDeleteFile(p, seq))))
    }
  }

  // ------------------------------------------------ CHECK constraints

  /** Declared CHECK constraints: name → condition SQL. Stored as table
    * properties under `constraints.<name>` (Delta's scheme) so they
    * version with the table, travel through SHOW TBLPROPERTIES /
    * SHOW CREATE TABLE, and need no manifest format change. */
  def checkConstraints: Map[String, String] =
    properties.collect {
      case (k, v) if k.startsWith(LakeTable.ConstraintPrefix) =>
        k.stripPrefix(LakeTable.ConstraintPrefix) -> v
    }

  /** ≡ `ALTER TABLE … ADD CONSTRAINT name CHECK (cond)`: validates the
    * EXISTING data first (one pruned probe for a violating row — the
    * add fails if any current row breaks the rule), then records the
    * constraint as a metadata-only property commit. Every subsequent
    * data write re-validates what it writes (see
    * [[enforceWriteConstraints]]). NULL results violate, like Delta:
    * a constraint must evaluate TRUE. */
  def addCheckConstraint(name: String, conditionSql: String): Long = {
    require(!checkConstraints.contains(name),
      s"constraint $name already exists")
    val bad = scan()
      .where(!coalesce(expr(conditionSql), lit(false))).limit(1).collect()
    require(bad.isEmpty,
      s"cannot add CHECK constraint $name ($conditionSql): existing row " +
        s"violates it: ${bad.headOption.fold("")(_.toString)}")
    setProperties(Map(LakeTable.ConstraintPrefix + name -> conditionSql))
  }

  /** ≡ `ALTER TABLE … DROP CONSTRAINT [IF EXISTS] name`. */
  def dropCheckConstraint(name: String, ifExists: Boolean = false): Long = {
    if (!checkConstraints.contains(name)) {
      require(ifExists, s"no constraint $name")
      return current.snapshotId
    }
    unsetProperties(Seq(LakeTable.ConstraintPrefix + name))
  }

  /** Column names a constraint's condition references (for the
    * drop/rename-column guards). */
  private def constraintRefs(conditionSql: String): Set[String] =
    spark.sessionState.sqlParser.parseExpression(conditionSql).collect {
      case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        ua.nameParts.head
    }.toSet

  /** Refuse schema changes that would orphan a constraint. */
  private def requireNoConstraintOn(colName: String, op: String): Unit =
    checkConstraints.foreach { case (n, sql) =>
      require(!constraintRefs(sql).contains(colName),
        s"cannot $op column $colName: CHECK constraint $n ($sql) " +
          "references it — drop the constraint first")
    }

  /** Whether any write-time rule is active (used to skip the staged-file
    * validation read entirely on unconstrained tables). */
  private def hasWriteConstraints: Boolean =
    checkConstraints.nonEmpty ||
      properties.get(LakeTable.PropEnforceNotNull).contains("true")

  /** One violation probe over the STAGED files of a write — CHECK
    * constraints (must evaluate TRUE — NULL violates) and, when the
    * table opts in with `write.enforce-not-null=true`, the schema's
    * non-nullable columns — all in a single job; the first offending
    * rule is named in the error. NOT NULL is OPT-IN because Scala
    * tuple/case-class-derived schemas over-declare non-nullability and
    * this engine's read path deliberately treats every file as
    * nullable (a file CAN hold nulls regardless of declarations); only
    * a table that explicitly asks gets writes rejected over it. Tables
    * without constraints pay NOTHING (no job). Runs on every data
    * write — ingest, merge/update rewrites, compaction folds — over the
    * parquet the write just staged, BEFORE any file is renamed live: the
    * validated rows are byte-for-byte the rows a commit would publish,
    * so the guarantee holds even for non-deterministic inputs
    * (rand()/uuid()/re-read sources), and a constrained write pays one
    * pushdown-pruned columnar read of the delta instead of a second full
    * evaluation of its input plan. */
  private def enforceWriteConstraints(df: DataFrame): Unit = {
    val checks = checkConstraints.toSeq.sortBy(_._1)
    val notNull =
      if (!properties.get(LakeTable.PropEnforceNotNull).contains("true")) Nil
      else schema.fields.filter(!_.nullable).map(_.name)
        .filter(df.columns.contains).toSeq
    if (checks.isEmpty && notNull.isEmpty) return
    val conds = checks.map { case (n, sql) =>
      (s"CHECK constraint $n ($sql)", !coalesce(expr(sql), lit(false)))
    } ++ notNull.map(c => (s"NOT NULL column $c", col(c).isNull))
    val label = conds.tail.foldLeft(
      when(conds.head._2, lit(conds.head._1))) {
      case (acc, (n, c)) => acc.when(c, lit(n))
    }
    val bad = df.where(conds.map(_._2).reduce(_ || _))
      .select(label.as("rule")).limit(1).collect()
    if (bad.nonEmpty) throw new IllegalStateException(
      s"write rejected: a row violates ${bad.head.getString(0)}")
  }

  /** Metadata-only table-property update (≡ `ALTER TABLE … SET
    * TBLPROPERTIES`): properties steer FUTURE operations (merge/delete
    * modes, codec, sort order, distribution) — no data is touched, and
    * time travel sees each era's own properties. */
  def setProperties(props: Map[String, String]): Long = {
    val base = current
    require(!(props.get(LakeTable.PROP_ROW_LINEAGE).contains("true") &&
        schema.fieldNames.contains(LakeTable.ROW_ID_COL)),
      s"cannot enable ${LakeTable.PROP_ROW_LINEAGE}: the schema already " +
        s"has a user column named ${LakeTable.ROW_ID_COL} (reserved)")
    commit(base, "set-properties", added = Nil, removed = Nil,
      live = base.liveFiles,
      propertiesOverride = Some(base.properties ++ props))
  }

  /** ≡ `ANALYZE TABLE … COMPUTE STATISTICS [NOSCAN]`: records
    * table-level stats (row count, total bytes, the analyzed snapshot)
    * as table properties in one metadata commit. Because the manifest
    * already carries exact per-file row counts, even the "scan" flavor
    * is metadata-only here — O(live files) driver work, zero data I/O —
    * unless row-level deletes are pending (then one count over the
    * MOR-applied scan). Readable via `SHOW TBLPROPERTIES` /
    * `DESCRIBE EXTENDED` / the `.stats` keys. */
  def analyze(): Long = {
    val s = current
    val bytes = s.liveFiles.flatMap(s.fileInfo.get).map(_.bytes).sum
    setProperties(Map(
      LakeTable.PROP_STATS_ROWS -> countRows().toString,
      LakeTable.PROP_STATS_BYTES -> bytes.toString,
      LakeTable.PROP_STATS_SNAPSHOT -> s.snapshotId.toString))
  }

  /** ≡ `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS c1, …`: one
    * aggregate pass over the table computing, per column, the distinct
    * count, null count, and min/max (rendered as strings), stored as
    * `stats.col.<name>.{ndv,nulls,min,max}` properties alongside the
    * table-level stats — the CBO-shaped summary an engine or a human
    * reads before picking join orders.
    *
    * `exact = true` (default) uses `count_distinct` — one shuffle of
    * distinct values per column, the price of an exact NDV and fine as
    * an occasional maintenance action. At the 100 TB scale pass
    * `exact = false` for `approx_count_distinct` (HyperLogLog++,
    * map-side partials only — the same single-pass shape Spark's own
    * ANALYZE uses). */
  def analyzeColumns(cols: Seq[String], exact: Boolean = true): Long = {
    val sch = schema
    val bad = cols.filterNot(sch.fieldNames.contains)
    require(bad.isEmpty, s"no such column(s): ${bad.mkString(", ")}")
    val nonScalar = cols.filter(c => !LakeTable.isScalarType(sch(c).dataType))
    require(nonScalar.isEmpty,
      s"FOR COLUMNS needs scalar-typed columns, got: " +
        nonScalar.map(c => s"$c: ${sch(c).dataType.simpleString}")
          .mkString(", "))
    val s = current
    val df = scan()
    val aggs = cols.flatMap { c =>
      Seq(
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__ndv_$c"),
        count(when(col(c).isNull, 1)).as(s"__nulls_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def str(field: String): Option[String] = {
      val i = row.fieldIndex(field)
      if (row.isNullAt(i)) None else Some(row.get(i).toString)
    }
    val colProps = cols.flatMap { c =>
      Seq(s"stats.col.$c.ndv" -> str(s"__ndv_$c").getOrElse("0"),
        s"stats.col.$c.nulls" -> str(s"__nulls_$c").getOrElse("0")) ++
        str(s"__min_$c").map(v => s"stats.col.$c.min" -> v) ++
        str(s"__max_$c").map(v => s"stats.col.$c.max" -> v)
    }
    val bytes = s.liveFiles.flatMap(s.fileInfo.get).map(_.bytes).sum
    setProperties(colProps.toMap ++ Map(
      LakeTable.PROP_STATS_ROWS -> str("__rows").getOrElse("0"),
      LakeTable.PROP_STATS_BYTES -> bytes.toString,
      LakeTable.PROP_STATS_SNAPSHOT -> s.snapshotId.toString))
  }

  /** ≡ `ALTER TABLE … UNSET TBLPROPERTIES`. */
  def unsetProperties(keys: Seq[String]): Long = {
    val base = current
    commit(base, "unset-properties", added = Nil, removed = Nil,
      live = base.liveFiles,
      propertiesOverride = Some(base.properties -- keys))
  }

  /** Partition evolution (≡ Iceberg `ALTER TABLE … [ADD|DROP|REPLACE]
    * PARTITION FIELD`): switch FUTURE writes to `partitionBy` without
    * rewriting a byte of history. A metadata-only commit registers the
    * new spec and makes it current; every existing file keeps the spec
    * id it was written under, and scans read each layout era with its
    * own per-era sub-scan (same union shape as rename eras). MERGE /
    * DELETE pruning degrades gracefully across eras: a file's recorded
    * partition point-stats are keyed by ITS spec's derived names, so
    * old-era files simply aren't partition-pruned by the new spec's
    * transforms (bounds pruning still applies). [[compact]] rewrites
    * under the current spec — the lazy migration path. */
  def evolvePartitionSpec(partitionBy: Seq[String]): Long = {
    val base = current
    if (partitionBy == base.partitionColumns) return base.snapshotId
    validateSpec(schema, partitionBy)
    val registry = base.specsOrDefault
    // reuse an already-registered identical spec's id (evolve A→B→A
    // keeps era grouping minimal); otherwise mint the next id
    val newId = registry.find(_._2 == partitionBy).map(_._1)
      .getOrElse(registry.keys.max + 1L)
    commit(base, "evolve-spec", added = Nil, removed = Nil,
      live = base.liveFiles,
      specChange = Some((partitionBy, newId,
        registry + (newId -> partitionBy))))
  }

  // -------------------------------------------------------- schema evolution

  /** Add a nullable column (metadata-only commit, ≡ Iceberg
    * `ALTER TABLE … ADD COLUMN`): existing files read NULL for it —
    * or the column's DEFAULT, when one is declared — and new writes
    * carry it.
    *
    * Every pre-existing live file gets a name mapping to a reserved
    * never-written physical name. This guarantees Iceberg's field-id
    * semantics with two birds: (a) a file that happens to carry dead
    * bytes under `name` (dropColumn + re-add) reads NULL instead of
    * silently resurrecting the old data; (b) re-adding a name that is
    * still some file's PHYSICAL name after a rename (rename v→w, add v)
    * cannot collide in the per-file physical schema.
    *
    * `defaultSql` (≡ Iceberg v3 initial-defaults / Delta
    * `ALTER TABLE … ADD COLUMN … DEFAULT`): a constant, deterministic
    * SQL expression stored in the field's metadata under Spark's own
    * default-column keys (`EXISTS_DEFAULT` = what pre-existing rows
    * read, `CURRENT_DEFAULT` = what future writes fill for the column
    * when absent). Zero rewrite in both directions: old files project
    * the expression at scan time; new files that carry the column read
    * their written values verbatim (an explicit NULL written after the
    * add stays NULL — default is NOT a read-time coalesce). */
  def addColumn(name: String, dataType: DataType,
      nullable: Boolean = true, defaultSql: Option[String] = None): Long = {
    val base = current
    val sch = schema
    require(!sch.fieldNames.contains(name), s"column $name already exists")
    require(!(rowLineageEnabled && name == LakeTable.ROW_ID_COL),
      s"column name ${LakeTable.ROW_ID_COL} is reserved on a " +
        s"${LakeTable.PROP_ROW_LINEAGE}=true table")
    require(nullable,
      "new columns must be nullable: existing files carry no values")
    val metadata = defaultSql match {
      case None => Metadata.empty
      case Some(sql) =>
        // validate once at DDL time: parses, evaluates as a constant
        // (no input row), is deterministic, and casts to the column
        // type — then read-time re-evaluation is exactly this value
        val df = spark.range(1)
          .select(expr(sql).cast(dataType).as("__graft_default"))
        require(df.queryExecution.analyzed.expressions
            .forall(_.deterministic),
          s"DEFAULT for $name must be deterministic: $sql")
        df.collect() // fails here, not mid-scan, on a bad expression
        new MetadataBuilder()
          .putString(LakeTable.ExistsDefaultKey, sql)
          .putString(LakeTable.CurrentDefaultKey, sql)
          .build()
    }
    val newSchema = StructType(sch.fields :+
      StructField(name, dataType, nullable, metadata))
    val absent = ABSENT_PREFIX + name
    val renames = base.liveFiles.map { f =>
      f -> (base.fileRenames.getOrElse(f, Map.empty) + (name -> absent))
    }.toMap
    commit(base, "evolve-schema", added = Nil, removed = Nil,
      live = base.liveFiles, schemaJson = Some(newSchema.json),
      renamesOverride = Some(renames))
  }

  /** Rename a column (metadata-only commit, ≡ Iceberg
    * `ALTER TABLE … RENAME COLUMN`): no data rewrite — files written
    * under the old name are tracked in the manifest's name mapping and
    * read back aliased (the name-mapped equivalent of Iceberg's
    * field-id indirection). Partition columns can't be renamed (their
    * name is baked into the hive directory layout). */
  def renameColumn(oldName: String, newName: String): Long = {
    val base = current
    val sch = schema
    require(sch.fieldNames.contains(oldName), s"no column $oldName")
    require(!sch.fieldNames.contains(newName),
      s"column $newName already exists")
    require(!(rowLineageEnabled && newName == LakeTable.ROW_ID_COL),
      s"column name ${LakeTable.ROW_ID_COL} is reserved on a " +
        s"${LakeTable.PROP_ROW_LINEAGE}=true table")
    requireNoConstraintOn(oldName, "rename")
    require(!specSources.contains(oldName),
      s"cannot rename partition source column $oldName " +
        "(baked into the hive directory layout of some spec era)")
    val newSchema = StructType(sch.fields.map(f =>
      if (f.name == oldName) f.copy(name = newName) else f))
    // every pre-rename live file now maps newName -> its physical name
    val renames = base.liveFiles.map { f =>
      val em = base.fileRenames.getOrElse(f, Map.empty)
      val phys = em.getOrElse(oldName, oldName)
      f -> ((em - oldName) + (newName -> phys))
    }.toMap
    // stats and delete-file logical keys follow the column — including
    // the per-column pseudo-stats (null counts, bloom filters)
    def rekey(c: String): String =
      if (c == oldName) newName
      else if (c == FileStats.nullsKey(oldName)) FileStats.nullsKey(newName)
      else if (c == FileStats.sumKey(oldName)) FileStats.sumKey(newName)
      else if (c == BloomStats.statKey(oldName)) BloomStats.statKey(newName)
      else c
    val stats = base.fileStats.map { case (f, cols) =>
      f -> cols.map { case (c, cs) => rekey(c) -> cs }
    }
    val dels = base.deleteFiles.map(d => d.copy(
      keys = d.keys.map(k => if (k == oldName) newName else k)))
    commit(base, "evolve-schema", added = Nil, removed = Nil,
      live = base.liveFiles, schemaJson = Some(newSchema.json),
      statsOverride = Some(stats), renamesOverride = Some(renames),
      deletesOverride = Some(dels))
  }

  /** Widen a column's type in place (metadata-only commit, ≡ Iceberg
    * `ALTER TABLE … ALTER COLUMN … TYPE …` type promotion): no data
    * rewrite — Spark 4's vectorized parquet reader upcasts the narrow
    * as-written values to the requested wide type at scan time
    * (verified on this runtime: int32→long/double, float→double,
    * decimal precision/scale growth, date→timestamp_ntz), so files of
    * every era share one scan under the wide schema. Only lossless
    * promotions are accepted ([[LakeTable.canWiden]]); anything else
    * would need a full rewrite and is refused.
    *
    * Stats bookkeeping across the widen:
    *  - min/max bounds KEEP: integral stats are stored as decimal
    *    strings (re-parse exactly under the wide type) and float
    *    bounds are stored as their EXACT double widenings
    *    (FileStats.fpBounds) — except date→timestamp_ntz, whose stat
    *    domain changes (epoch days → wall-clock micros), so those
    *    bounds are dropped.
    *  - per-column Bloom pseudo-stats DROP: Spark's XxHash64 hashes
    *    int and long domains differently, so probing a wide-typed
    *    literal against a narrow-domain filter would false-negative
    *    and wrongly prune live files. New files rebuild Bloom filters
    *    in the wide domain.
    * Partition source columns can't change type — their value encoding
    * is baked into the hive directory names of some spec era. */
  def widenColumnType(name: String, to: DataType): Long = {
    val base = current
    val sch = schema
    val f = sch.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name"))
    if (f.dataType == to) return base.snapshotId
    require(LakeTable.canWiden(f.dataType, to),
      s"cannot alter column $name: ${f.dataType.simpleString} -> " +
        s"${to.simpleString} is not a lossless widening (a narrowing " +
        "or cross-domain change needs a rewrite)")
    require(!specSources.contains(name),
      s"cannot change the type of partition source column $name " +
        "(its value encoding is baked into the hive directory layout)")
    val newSchema = StructType(sch.fields.map(x =>
      if (x.name == name) x.copy(dataType = to) else x))
    val dropBounds = f.dataType == DateType // stat domain changes
    // a sum stat survives only integral→integral widening (the Spark
    // sum result type stays LongType); widening into the FP domain
    // changes sum semantics to an order-dependent double fold
    val dropSum = !FileStats.supportsExactSum(to)
    val stats = base.fileStats.map { case (fl, cols) =>
      fl -> (cols - BloomStats.statKey(name) --
        (if (dropBounds) Seq(name) else Nil) --
        (if (dropSum) Seq(FileStats.sumKey(name)) else Nil))
    }.filter(_._2.nonEmpty)
    commit(base, "evolve-schema", added = Nil, removed = Nil,
      live = base.liveFiles, schemaJson = Some(newSchema.json),
      statsOverride = Some(stats))
  }

  /** Drop a column (metadata-only commit, ≡ Iceberg
    * `ALTER TABLE … DROP COLUMN`): data files keep the bytes; reads just
    * stop projecting them. Stats and name mappings for the column are
    * stripped so a later re-add (same Parquet type) starts clean. */
  def dropColumn(name: String): Long = {
    val base = current
    val sch = schema
    require(sch.fieldNames.contains(name), s"no column $name")
    requireNoConstraintOn(name, "drop")
    require(!specSources.contains(name),
      s"cannot drop partition source column $name " +
        "(of the current or a historical spec era)")
    require(sch.fields.length > 1, "cannot drop the last column")
    val newSchema = StructType(sch.fields.filterNot(_.name == name))
    val stats = base.fileStats
      .map { case (f, cols) => f -> (cols - name -
        FileStats.nullsKey(name) - FileStats.sumKey(name) -
        BloomStats.statKey(name)) }
      .filter(_._2.nonEmpty)
    val renames = base.fileRenames
      .map { case (f, m) => f -> (m - name) }
    commit(base, "evolve-schema", added = Nil, removed = Nil,
      live = base.liveFiles, schemaJson = Some(newSchema.json),
      statsOverride = Some(stats), renamesOverride = Some(renames))
  }

  /** Manifest-stats pruning for a `Column` predicate: analyze it against
    * an empty relation with the table schema (resolving attributes,
    * inserting coercion casts, and making literal-only subtrees — e.g.
    * `to_timestamp('…')` — foldable), then intersect the resolved
    * condition with the per-file bounds. Any failure → no pruning. */
  /** Parquet scan over `relFiles` planned from the MANIFEST (see
    * [[GraftManifestFileIndex]]): file statuses come from per-file
    * manifest sizes — ZERO filesystem listing at plan time — and
    * Catalyst's pushed-down data filters prune files against per-file
    * column bounds, hidden bucket-partition hashes, and per-file Bloom
    * filters before a single task is planned. Every read path (SQL
    * text over registered views, DataFrame ops, MERGE source scans,
    * time travel) inherits manifest pruning with no graft-specific
    * API. Legacy manifest entries without a recorded size (and staged
    * WAP files, not yet committed) fall back to one `getFileStatus`. */
  private def prunedParquetScan(ctx: Snapshot, relFiles: Seq[String],
      physSchema: StructType, logicalSchema: StructType,
      mapping: Map[String, String], specId: Long = 0L): DataFrame = {
    val statuses = relFiles.map { f =>
      val p = fs.makeQualified(new Path(rootPath, f))
      ctx.fileInfo.get(f) match {
        case Some(fi) =>
          new FileStatus(fi.bytes, false, 1, DefaultBlockSize, 0L, p)
        case None => fs.getFileStatus(p)
      }
    }
    // claim a real BucketSpec when this era is partitioned by exactly
    // one bucket transform and EVERY file carries a parseable Spark
    // bucket-id suffix: the scan then reports
    // HashPartitioning(source, N) — the exact partitioning Spark's own
    // bucketed tables report, because the write derived the bucket with
    // Spark's own bucket-id function — and joins/aggregations on the
    // source column skip the table-side shuffle. Files from older
    // (pre-suffix or differently-specced) eras make the claim
    // impossible and fall back to a plain scan, never a wrong one.
    val bucketSpec = {
      import org.apache.spark.sql.execution.datasources.BucketingUtils
      val eraFields = PartitionSpec.parseAll(
        ctx.specsOrDefault.getOrElse(specId, Nil))
      eraFields.collect {
        case f @ PartitionSpec.Field(_, PartitionSpec.Bucket(n), _) =>
          (f, n)
      } match {
        case Seq((f, n)) =>
          val phys = mapping.getOrElse(f.source, f.source)
          val allNamed = statuses.forall(st =>
            BucketingUtils.getBucketId(st.getPath.getName)
              .exists(id => id >= 0 && id < n))
          if (allNamed && !phys.startsWith(ABSENT_PREFIX))
            Some(org.apache.spark.sql.catalyst.catalog.BucketSpec(
              n, Seq(phys), Nil))
          else None
        case _ => None
      }
    }
    // pushed filters arrive in this era's PHYSICAL names; the manifest
    // keys stats (and bucket sources) by CURRENT LOGICAL names —
    // rename commits rekey them. Translate attributes back before the
    // stats lookup so pre-rename files still prune.
    val inv = mapping.map(_.swap)
    val pruner: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => (Path => Boolean) = { filters =>
      if (ctx.fileStats.isEmpty) _ => true
      else {
        import org.apache.spark.sql.catalyst.expressions.{
          And, AttributeReference}
        val cond = filters.reduce(And(_, _)).transform {
          case a: AttributeReference if inv.contains(a.name) =>
            a.withName(inv(a.name))
        }
        val kept = pruneByLiteralBloom(ctx, cond,
          pruneBucketsByPredicate(ctx, cond,
            PredicatePruning.candidateFiles(cond, logicalSchema, relFiles,
              ctx.fileStats))).toSet
        p => kept(relativePath(rootPath, p))
      }
    }
    // exact relation row count from manifest footer counts (None if
    // any file predates row-count recording) — lets a bare COUNT(*)
    // answer from metadata (ManifestAggRule); delete anti-joins
    // above this relation block that rewrite by plan shape, so MOR
    // state can never leak into the fast path
    val knownRows =
      if (relFiles.forall(ctx.fileInfo.contains))
        Some(relFiles.map(ctx.fileInfo(_).rows).sum)
      else None
    // proven per-column facts for the metadata MIN/MAX/count(col) legs
    // of ManifestAggRule — a LAZY fold (cost ∝ files × cols, paid only
    // by plans the rule can actually rewrite). Bounds are proven iff
    // EVERY planned file either reports footer bounds for the column
    // or is proven all-null (recorded null count == the file's row
    // count, or an empty file); the non-null count is proven iff every
    // file reports a null count (Σ rows − nulls). One unprovable file
    // drops that fact, independently per fact. Keys are this era's
    // PHYSICAL names (the relation's attributes) — stats are held
    // under current logical names.
    val knownProofs: () => Map[String, ColumnProof] = () =>
      if (knownRows.isEmpty) Map.empty
      else logicalSchema.fields.iterator.flatMap { fld =>
        val wantBounds = ManifestAggRule.exactStatType(fld.dataType)
        var mn: String = null
        var mx: String = null
        var any = false
        var boundsOk = wantBounds
        var nonNull = 0L
        var nonNullOk = true
        var sumAcc = BigInt(0)
        var sumOk = FileStats.supportsExactSum(fld.dataType)
        relFiles.foreach { f =>
          val st = ctx.fileStats.getOrElse(f, Map.empty)
          val rows = ctx.fileInfo(f).rows
          val nulls = st.get(FileStats.nullsKey(fld.name))
            .map(_.min.toLong)
          if (boundsOk) st.get(fld.name) match {
            case Some(cs) =>
              if (!any) { mn = cs.min; mx = cs.max; any = true }
              else {
                if (FileStats.cmp(fld.dataType, cs.min, mn) < 0) mn = cs.min
                if (FileStats.cmp(fld.dataType, cs.max, mx) > 0) mx = cs.max
              }
            case None =>
              if (!(rows == 0L || nulls.contains(rows))) boundsOk = false
          }
          if (nonNullOk) nulls match {
            case Some(n) => nonNull += rows - n
            case None => if (rows != 0L) nonNullOk = false
          }
          if (sumOk) st.get(FileStats.sumKey(fld.name)) match {
            case Some(cs) => sumAcc += BigInt(cs.min)
            // all-null / empty files contribute zero even without the
            // stat (written before write.agg.columns was set)
            case None =>
              if (!(rows == 0L || nulls.contains(rows))) sumOk = false
          }
        }
        if (boundsOk && any &&
          !ManifestAggRule.exactFoldedBounds(fld.dataType, mn, mx))
          boundsOk = false
        if (!boundsOk && !nonNullOk && !sumOk) None
        else Some(mapping.getOrElse(fld.name, fld.name) -> ColumnProof(
          if (boundsOk) Some(if (any) Some((mn, mx)) else None) else None,
          if (nonNullOk) Some(nonNull) else None,
          if (sumOk) Some(sumAcc) else None))
      }.toMap
    // per-file facts for the GROUPED metadata rewrite (lazy, same
    // provenance as the folds above): physical-name keyed bounds /
    // all-null proofs / null counts per planned file
    def factsOf(f: String): FileFacts = {
      val st = ctx.fileStats.getOrElse(f, Map.empty)
      val rows = ctx.fileInfo(f).rows
      val cols = logicalSchema.fields.iterator.map { fld =>
        val nulls = st.get(FileStats.nullsKey(fld.name))
          .map(_.min.toLong)
        mapping.getOrElse(fld.name, fld.name) -> ColFacts(
          if (ManifestAggRule.exactStatType(fld.dataType))
            st.get(fld.name).map(cs => (cs.min, cs.max))
          else None,
          rows == 0L || nulls.contains(rows),
          nulls,
          if (FileStats.supportsExactSum(fld.dataType))
            st.get(FileStats.sumKey(fld.name)).map(cs => BigInt(cs.min))
          else None)
      }.toMap
      FileFacts(rows, cols)
    }
    val knownFacts: () => Option[Seq[FileFacts]] = () =>
      if (knownRows.isEmpty) None
      else Some(relFiles.map(factsOf))
    // FILTERED facts for `SELECT min/max/count … WHERE cond`
    // (ManifestAggRule's filtered leg): the manifest proves the split
    // when every file candidateFiles keeps is ALL-MATCH by the same
    // per-file prover metadata-only DELETE trusts (bounds + null
    // counts, [[PredicatePruning.allRowsMatch]]) — files it drops
    // provably hold no match, so the aggregate over the kept files'
    // facts is exact. One unprovable candidate → None (normal scan).
    // Identity-partitioned files satisfy equality conditions on the
    // partition column by construction (dir point-stat, zero nulls).
    val knownFilteredFacts: org.apache.spark.sql.catalyst.expressions
        .Expression => Option[Seq[FileFacts]] = cond =>
      if (knownRows.isEmpty || ctx.fileStats.isEmpty) None
      else {
        import org.apache.spark.sql.catalyst.expressions.AttributeReference
        val logicalCond = cond.transform {
          case a: AttributeReference if inv.contains(a.name) =>
            a.withName(inv(a.name))
        }
        val types = logicalSchema.fields
          .map(f => f.name -> f.dataType).toMap
        // candidateFiles keeps a file it merely lacks bounds for (e.g.
        // a NULL-partition dir has no bounds on the partition column);
        // the dual noneMatch proof discards those it can PROVE
        // matchless (all-null column vs a comparison) before the
        // all-match requirement is applied to what remains
        val kept = PredicatePruning.candidateFiles(logicalCond,
            logicalSchema, relFiles, ctx.fileStats)
          .filterNot(f => ctx.fileStats.get(f).exists(fs =>
            PredicatePruning.noneMatch(logicalCond, fs, types,
              Some(ctx.fileInfo(f).rows))))
        val proven = kept.forall(f =>
          ctx.fileStats.get(f).exists(fs =>
            PredicatePruning.allRowsMatch(logicalCond, fs, types,
              Some(ctx.fileInfo(f).rows))))
        if (proven) Some(kept.map(factsOf)) else None
      }
    GraftManifestFileIndex.dataFrame(spark,
      Map("basePath" -> dataDir.toString), physSchema, statuses, pruner,
      bucketSpec, knownRows, knownProofs, knownFacts, knownFilteredFacts)
  }

  /** Bloom pruning for pushed literal equalities (the read-side twin of
    * [[pruneByBloom]]'s keyed-source form): a top-level `col = literal`
    * conjunct evaluates the literal's xxhash64 pair driver-side with
    * the SAME expressions the write path used ([[BloomStats.hashCols]])
    * and drops candidate files whose stored `__bloom__col` filter
    * provably lacks the value. Type-mismatched literals (an implicit
    * cast survived between the filter and the column) are skipped —
    * their hash would be of the wrong domain. */
  private def pruneByLiteralBloom(base: Snapshot,
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      candidates: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{
      And, AttributeReference, EqualTo, In, Literal, XxHash64}
    if (base.fileStats.isEmpty) return candidates
    def conjuncts(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
      e match {
        case And(l, r) => conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
    var files = candidates
    // IN semantics: keep the file iff ANY listed value might be present
    def prune(a: AttributeReference, ls: Seq[Literal]): Unit = {
      if (ls.isEmpty ||
        ls.exists(l => l.value == null || l.dataType != a.dataType)) return
      if (!files.exists(f => base.fileStats.get(f)
          .exists(_.contains(BloomStats.statKey(a.name))))) return
      val hashes = ls.map { l =>
        (new XxHash64(Seq(l)).eval(null).asInstanceOf[Long],
          new XxHash64(Seq(Literal("graft-bloom"), l))
            .eval(null).asInstanceOf[Long])
      }
      files = files.filter { f =>
        base.fileStats.get(f).flatMap(_.get(BloomStats.statKey(a.name)))
          match {
            case Some(cs) =>
              val filter = Seq(Some(BloomStats.decode(cs.min)))
              hashes.exists { case (h1, h2) =>
                BloomStats.mightContain(filter, Array(h1, h2))
              }
            case None => true
          }
      }
    }
    conjuncts(cond).foreach {
      case EqualTo(a: AttributeReference, l: Literal) => prune(a, Seq(l))
      case EqualTo(l: Literal, a: AttributeReference) => prune(a, Seq(l))
      case In(a: AttributeReference, vs)
          if vs.forall(_.isInstanceOf[Literal]) =>
        prune(a, vs.map(_.asInstanceOf[Literal]))
      case _ =>
    }
    files
  }

  /** `predicate` ANALYZED against the table schema (attributes
    * resolved, coercion casts inserted, literal-only subtrees
    * foldable); None when analysis fails. */
  private def analyzedCond(predicate: org.apache.spark.sql.Column)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    analyzedCond(predicate, schema)

  /** Variant taking the schema explicitly — the pruned-scan path works
    * from a snapshot SKELETON and must not trigger the full `current`
    * materialization that the `schema` accessor implies. */
  private def analyzedCond(predicate: org.apache.spark.sql.Column,
      sch: StructType)
      : Option[org.apache.spark.sql.catalyst.expressions.Expression] =
    scala.util.Try {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sch)
        .where(predicate).queryExecution.analyzed
        .collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }
    }.toOption.flatten

  /** Files of `candidates` whose manifest stats PROVE every row matches
    * the analyzed condition — droppable from the manifest with zero
    * data I/O (see [[PredicatePruning.allRowsMatch]]). */
  private def fullyCovered(base: Snapshot,
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      candidates: Seq[String]): Seq[String] = {
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    candidates.filter { f =>
      base.fileStats.get(f).exists(fs =>
        PredicatePruning.allRowsMatch(cond, fs, types,
          base.fileInfo.get(f).map(_.rows)))
    }
  }

  private[lake] def pruneByPredicate(base: Snapshot,
      predicate: org.apache.spark.sql.Column): Seq[String] = {
    if (base.fileStats.isEmpty) return base.liveFiles
    // schema from the SNAPSHOT, not the `schema` accessor: the pruned
    // scan path hands in a partially-materialized snapshot and must not
    // force a full `current` load (it would defeat the chunk skipping)
    val sch = DataType.fromJson(base.schemaJson).asInstanceOf[StructType]
    val cond = analyzedCond(predicate, sch)
    cond match {
      case Some(c) =>
        pruneBucketsByPredicate(base, c,
          PredicatePruning.candidateFiles(c, sch, base.liveFiles,
            base.fileStats))
      case None => base.liveFiles
    }
  }

  /** Bucket-partition pruning for predicates: a top-level
    * `source = literal` / `source IN (literals)` conjunct on a
    * `bucket(N, source)` table keeps only the files of the literals'
    * buckets — the hash is evaluated driver-side with the SAME
    * murmur3 bucket-id expression the write derived the directory
    * from (Spark's own, seed 42). (The
    * monotone transforms need nothing here: their source columns are
    * stored in the data files, so footer stats already range-prune.) */
  private def pruneBucketsByPredicate(base: Snapshot,
      cond: org.apache.spark.sql.catalyst.expressions.Expression,
      candidates: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{
      And, AttributeReference, EqualTo, Expression, In, Literal, Murmur3Hash}
    if (base.fileStats.isEmpty) return candidates
    // base's own spec, not `partitionFields` — see pruneByPredicate's
    // schema note (the partial-snapshot path must stay current-free)
    val bucketFields = PartitionSpec.parseAll(base.partitionColumns)
      .filter(_.isBucketLike)
    if (bucketFields.isEmpty) return candidates
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    var files = candidates
    def prune(name: String, lits: Seq[Literal]): Unit =
      bucketFields.find(_.source == name).foreach { f =>
        val vals = lits.filter(_.value != null).map { l =>
          f.transform match {
            case PartitionSpec.Bucket(n) =>
              // Spark's bucket-id function (murmur3 seed 42) — MUST
              // match Field.expr's write-side pmod(hash(col), n)
              val h = new Murmur3Hash(Seq(l)).eval(null).asInstanceOf[Int]
              java.lang.Math.floorMod(h, n).toLong
            case PartitionSpec.BucketIceberg(n) =>
              // the ICEBERG bucket hash — matches Field.expr's
              // write-side IcebergBucketId (and any external Iceberg
              // reader pruning the exported spec)
              IcebergBucketHash
                .bucketValue(l.value, l.dataType, n).toLong
            case other => throw new IllegalStateException(
              s"non-bucket transform $other in bucket pruning")
          }
        }.toSet
        if (lits.forall(_.value != null)) // null literals match nothing anyway
          files = files.filter { file =>
            base.fileStats.get(file).flatMap(_.get(f.dirName)) match {
              case Some(cs) => vals.contains(cs.min.toLong)
              case None => true
            }
          }
      }
    conjuncts(cond).foreach {
      case EqualTo(a: AttributeReference, l: Literal) => prune(a.name, Seq(l))
      case EqualTo(l: Literal, a: AttributeReference) => prune(a.name, Seq(l))
      case In(a: AttributeReference, vs)
          if vs.forall(_.isInstanceOf[Literal]) =>
        prune(a.name, vs.map(_.asInstanceOf[Literal]))
      case _ => ()
    }
    files
  }

  /** Metadata-only manifest compaction (≡ Iceberg's
    * `rewrite_manifests`): regroup EVERY manifest entry into fresh
    * full-size chunks, path-sorted so hive partition directories land
    * contiguously — no data file moves, one commit. Two reasons to
    * run it: (1) heavy churn (many selective rewrites) leaves more,
    * smaller chunks than the incremental LSM fold alone repacks;
    * (2) interleaved multi-partition ingest leaves each chunk spanning
    * many partitions, so per-chunk summaries prune nothing — after the
    * path-sort, a partition-selective scan materializes only that
    * partition's chunks. Cost: O(live entries) driver work + rewriting
    * every chunk file once; at 10⁸ files schedule it like any other
    * maintenance pass. */
  def rewriteManifests(): Long =
    commitWithRetry(current)() { b =>
      commit(b, "rewrite-manifests", added = Nil, removed = Nil,
        live = b.liveFiles, rechunk = true)
    }

  /** Bin-pack compaction: rewrite the current data into at most
    * `targetFilesPerPartition` files per hive partition (small-file
    * compaction — the maintenance operation an ingest-heavy lakehouse
    * schedules; content-identical, new snapshot). A salt column spreads
    * each partition's rows across up to `target` shuffle buckets, so no
    * single task ever funnels the whole table. */
  def compact(targetFilesPerPartition: Int = 1): Long =
    compact(targetFilesPerPartition, Nil)

  /** Compaction with multi-dimensional clustering (≡ Iceberg/Delta
    * `OPTIMIZE ... ZORDER BY`): rows are range-distributed and sorted by
    * the Z-VALUE (bit-interleaved rank) of the `clusterBy` columns, so
    * each rewritten file covers a narrow range of EVERY cluster column
    * at once and the manifest min/max stats prune multi-column
    * predicates that a single-column sort order cannot serve. The
    * per-column 16-bit rank is normalized against the global bounds
    * (one tiny agg over data the rewrite reads anyway); columns must be
    * numeric/date/timestamp/boolean (stat-domain orderable). Content is
    * identical; only layout changes. */
  /** Size-aware binpack compaction (≡ Iceberg `rewrite_data_files`
    * binpack): coalesce SMALL files toward `targetFileBytes` outputs
    * and leave right-sized files untouched — at 100 TB the difference
    * between a maintenance pass that rewrites the whole table and one
    * whose write amplification is bounded by the small-file fraction.
    *
    * Candidate selection is pure MANIFEST arithmetic (fileInfo bytes —
    * zero fs calls): live files under `targetFileBytes`, grouped by
    * partition directory + spec era (files of different hive layouts
    * can't share an output), greedy-packed into bins of roughly
    * `targetFileBytes`; only bins holding >= 2 files rewrite (each to
    * ONE output via a source-file-keyed repartition). Groups with
    * fewer than `minInputFiles` candidates are left alone. Files with
    * no recorded size (legacy manifests) are skipped, conservatively.
    *
    * Outstanding deletes stay correct WITHOUT a full fold: rewritten
    * rows are read through the delete set, and the new files' commit
    * sequence outranks every existing delete so nothing re-suppresses
    * them; untouched files keep their sequence and their deletes;
    * stale position-delete rows naming removed files match nothing. */
  def binPack(targetFileBytes: Long, minInputFiles: Int = 2): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(minInputFiles >= 2,
      "minInputFiles < 2 would rewrite lone files for nothing")
    val base = current
    val smalls = base.liveFiles
      .flatMap(f => base.fileInfo.get(f).map(f -> _.bytes))
      .filter(_._2 < targetFileBytes)
    val groups = smalls.groupBy { case (f, _) =>
      (f.take(f.lastIndexOf('/') + 1), base.fileSpec.getOrElse(f, 0L))
    }
    // on a sort-ordered table, bins are formed in RANGE order (files
    // ordered by their recorded min bound of the leading sort column,
    // not by path): disjoint input ranges then pack into contiguous,
    // still-disjoint output ranges, preserving single-file pruning
    val sortCols = sortOrderColumns
    val binOrder: Seq[(String, Long)] => Seq[(String, Long)] =
      sortCols.headOption.flatMap { c =>
        schema.fields.find(_.name == c).map { f =>
          // total order (strict weak ordering for TimSort): stat-less
          // files (e.g. written before a sort-column rename) sort first
          // among themselves by path, stat-bearing files by min bound
          // with a path tie-break — a partial sortWith here can throw
          // "Comparison method violates its general contract!"
          val ord = new Ordering[(String, Long)] {
            private def minOf(p: String): Option[String] =
              base.fileStats.get(p).flatMap(_.get(c))
                .flatMap(s => Option(s.min))
            def compare(x: (String, Long), y: (String, Long)): Int =
              (minOf(x._1), minOf(y._1)) match {
                case (Some(a), Some(b)) =>
                  val cv = FileStats.cmp(f.dataType, a, b)
                  if (cv != 0) cv else x._1.compareTo(y._1)
                case (None, None) => x._1.compareTo(y._1)
                case (None, _) => -1
                case (_, None) => 1
              }
          }
          (files: Seq[(String, Long)]) => files.sorted(ord)
        }
      }.getOrElse((files: Seq[(String, Long)]) => files.sortBy(_._1))
    val bins = Seq.newBuilder[Seq[String]]
    groups.toSeq.sortBy(_._1._1).foreach { case (_, files) =>
      if (files.size >= minInputFiles) {
        var cur = List.empty[String]
        var bytes = 0L
        def flush(): Unit = {
          if (cur.sizeIs >= 2) bins += cur.reverse
          cur = Nil; bytes = 0L
        }
        binOrder(files).foreach { case (f, b) =>
          if (cur.nonEmpty && bytes + b > targetFileBytes) flush()
          cur ::= f; bytes += b
        }
        flush()
      }
    }
    val packed = bins.result()
    if (packed.isEmpty) return base.snapshotId
    val rewritten = packed.flatten
    // bin id per source file. Matching key is the bare fs PATH — the
    // scan's input_file_name() spells the scheme as `file:///root/…`
    // while Hadoop Path.toString spells `file:/root/…`, so both sides
    // normalize to the scheme-less path before the join.
    val spark0 = spark
    import spark0.implicits._
    val pathBins = packed.zipWithIndex.flatMap { case (fls, i) =>
      fls.map(f =>
        fs.makeQualified(new Path(rootPath, f)).toUri.getPath -> i)
    }.toDF("__graft_path", "__graft_bin")
    // bins are a packing heuristic: a hash collision can co-locate two
    // bins in one task, which only makes an output file larger (and
    // dynamic partitioning still splits cross-dir rows) — the size
    // target is advisory, correctness never depends on it. On a
    // sort-ordered table the distribution is RANGE on (bin, sort
    // cols) + an in-partition sort instead: bins were formed in range
    // order, so every output file is a contiguous slice of the global
    // sort — bounds stay disjoint and pruning stays single-file.
    val joined = readFilesAs(base, rewritten, withName = true,
        withLineage = rowLineageEnabled)
      .withColumn("__graft_path",
        regexp_replace(col(FILE_COL), "^[A-Za-z0-9+.-]+:/+", "/"))
      .join(maybeBroadcastFileList(pathBins,
        fileListBytes(rewritten)), Seq("__graft_path"))
    val data = (if (sortCols.isEmpty)
        joined.repartition(packed.size, col("__graft_bin"))
      else {
        val order = col("__graft_bin") +: sortCols.map(col)
        joined.repartitionByRange(packed.size, order: _*)
          .sortWithinPartitions(order: _*)
      }).drop(FILE_COL, "__graft_path", "__graft_bin")
    val WriteResult(added, stats, info) = writeDataFiles(data)
    // row-conservation guard (manifest arithmetic, no extra job): with
    // no deletes outstanding the rewrite must carry EXACTLY the input
    // rows — a path-normalization miss in the bin join would otherwise
    // silently drop whole files
    if (base.deleteFiles.isEmpty && base.posDeleteFiles.isEmpty &&
        base.dvFiles.isEmpty) {
      val expectRows = rewritten.flatMap(base.fileInfo.get).map(_.rows).sum
      val gotRows = info.values.map(_.rows).sum
      require(gotRows == expectRows,
        s"binPack aborted before commit: rewrite carries $gotRows rows " +
          s"of $expectRows read — refusing to lose data")
    }
    val keep = base.liveFiles.filterNot(rewritten.toSet)
    commit(base, "compact", added = added, removed = rewritten,
      live = keep ++ added, addedStats = stats, addedInfo = info)
  }

  /** Predicate-scoped compaction (≡ Iceberg
    * `rewrite_data_files(where => …)` / Delta `OPTIMIZE t WHERE …`):
    * coalesce ONLY the files the predicate selects via MANIFEST
    * pruning (per-file bounds, identity partition values, hidden
    * bucket hashes) — at 100 TB the maintenance pass rewrites one
    * partition's files, not the table. Selection is file-granular and
    * layout-only: every row of a selected file rewrites (content
    * identical — the predicate scopes, it does not filter), groups
    * never cross partition dirs or spec eras, and groups already at or
    * under `targetFilesPerPartition` files stay put. Outstanding
    * deletes stay correct exactly as in [[binPack]]: rewritten rows
    * are read THROUGH the delete set and the new files' sequence
    * outranks every existing delete; untouched files keep their delete
    * state (only a FULL [[compact]] clears delete files). */
  def compactWhere(predicate: Column,
      targetFilesPerPartition: Int = 1): Long = {
    require(targetFilesPerPartition >= 1, "target must be >= 1")
    val base = current
    if (base.liveFiles.isEmpty) return base.snapshotId
    val cands = pruneByPredicate(base, predicate)
    val groups = cands.groupBy(f => (f.take(f.lastIndexOf('/') + 1),
        base.fileSpec.getOrElse(f, 0L)))
      .filter(_._2.size > targetFilesPerPartition)
    val rewritten = groups.values.flatten.toSeq.sorted
    if (rewritten.isEmpty) return base.snapshotId
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    val salt = "__graft_compact_salt"
    val numParts = math.max(1L,
      groups.size.toLong * targetFilesPerPartition).min(100000L).toInt
    // deterministic content-hash salt — same retry-safety bar as
    // [[compact]]'s (a re-salted retry must place rows identically)
    val data = readFilesForRewrite(base, rewritten)
      .withColumn(salt, pmod(xxhash64(schema.fields.map(f =>
          LakeTable.comparableCol(f.name, f.dataType)).toIndexedSeq: _*),
        lit(targetFilesPerPartition)))
      .repartition(numParts,
        (partitionFields.map(f => f.expr(types(f.source))) :+
          col(salt)): _*)
      .drop(salt)
    val WriteResult(added, stats, info) = writeDataFiles(data)
    // row-conservation guard, manifest arithmetic (see binPack) —
    // only provable when nothing suppresses rows and counts are known
    if (base.deleteFiles.isEmpty && base.posDeleteFiles.isEmpty &&
        base.dvFiles.isEmpty &&
        rewritten.forall(base.fileInfo.contains)) {
      val expectRows = rewritten.map(base.fileInfo(_).rows).sum
      val gotRows = info.values.map(_.rows).sum
      require(gotRows == expectRows,
        s"compactWhere aborted before commit: rewrite carries $gotRows " +
          s"rows of $expectRows read — refusing to lose data")
    }
    val keep = base.liveFiles.filterNot(rewritten.toSet)
    commit(base, "compact", added = added, removed = rewritten,
      live = keep ++ added, addedStats = stats, addedInfo = info)
  }

  def compact(targetFilesPerPartition: Int,
      clusterBy: Seq[String]): Long = {
    require(targetFilesPerPartition >= 1, "target must be >= 1")
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    clusterBy.foreach { c =>
      require(types.contains(c), s"no column $c to cluster by")
      require(types(c) != StringType && FileStats.supportsPruning(types(c)),
        s"cannot Z-order on ${types(c)} column $c (needs a numeric-" +
          "orderable stat domain)")
    }
    val base = current
    if (base.liveFiles.isEmpty) return base.snapshotId
    val salt = "__graft_compact_salt"
    val all = readFilesForRewrite(base, base.liveFiles)
    // partition expressions: identity columns directly, transformed
    // fields via their derived expression (same value the write derives)
    val partExprs = partitionFields.map(f =>
      f.expr(types(f.source)).as(f.dirName))
    // explicit numPartitions: an expression-only repartition would be
    // AQE-coalesced back into few partitions, defeating the file target
    val nHivePartitions =
      if (partExprs.isEmpty) 1L
      else all.select(partExprs: _*).distinct().count()
    val numParts = math.max(1L,
      nHivePartitions * targetFilesPerPartition).min(100000L).toInt
    val data =
      if (clusterBy.nonEmpty) {
        // Z-order: one agg for the global bounds, then range-distribute
        // + sort by the interleaved rank. Range boundaries are sampled
        // ONCE on the driver and broadcast, so task retries place every
        // row identically (same retry-safety bar as the hash salt).
        val zcol = "__graft_zvalue"
        val encs = clusterBy.map(c => FileStats.boundExpr(c, types(c))
          .cast(DoubleType))
        val aggs = encs.flatMap(e => Seq(min(e), max(e)))
        val row = all.agg(aggs.head, aggs.tail: _*).head()
        val ranks = encs.zipWithIndex.map { case (e, i) =>
          val mn = Option(row.get(2 * i)).fold(0.0)(_.asInstanceOf[Double])
          val mx = Option(row.get(2 * i + 1))
            .fold(0.0)(_.asInstanceOf[Double])
          val norm =
            if (mx > mn) (e - lit(mn)) / lit(mx - mn) * lit(65535.0)
            else lit(0.0)
          // nulls sort first (rank 0), like a NULLS FIRST sort order
          coalesce(norm, lit(0.0)).cast(LongType)
        }
        val k = ranks.size
        val z = (0 until 16).flatMap { bit =>
          ranks.zipWithIndex.map { case (r, j) =>
            shiftleft(shiftright(r, bit).bitwiseAND(lit(1L)), bit * k + j)
          }
        }.reduce(_ + _) // disjoint bit positions: + == bitwise OR
        all.withColumn(zcol, z)
          .repartitionByRange(numParts, (partExprs :+ col(zcol)): _*)
          .sortWithinPartitions((partExprs :+ col(zcol)): _*)
          .drop(zcol)
      } else if (sortOrderColumns.nonEmpty) {
        // SORT-ORDER-AWARE rewrite (≡ Iceberg's sort-order-preserving
        // rewrite_data_files): a sort-ordered table's read-side
        // pruning depends on per-file bounds staying DISJOINT — the
        // hash-salt path below would shuffle the clustering away and
        // widen every rewritten file's range to the whole domain,
        // degrading post-compaction merge/filter pruning from
        // one-file to all-files. Range-distribute + sort by the
        // declared order instead (boundaries sampled once on the
        // driver — same retry-determinism bar as the Z-order path).
        val sc = sortOrderColumns.map(col)
        all.repartitionByRange(numParts, (partExprs ++ sc): _*)
          .sortWithinPartitions((partExprs ++ sc): _*)
      } else {
        // salt must be DETERMINISTIC per row (content hash, not
        // monotonically_increasing_id): a retried map task re-salting
        // rows differently than its first attempt would duplicate/lose
        // rows across reducers — and compact retires the only correct copy
        all
          .withColumn(salt, pmod(xxhash64(schema.fields.map(f =>
              LakeTable.comparableCol(f.name, f.dataType))
              .toIndexedSeq: _*),
            lit(targetFilesPerPartition)))
          .repartition(numParts,
            (partitionFields.map(f => f.expr(types(f.source))) :+
              col(salt)): _*)
          .drop(salt)
      }
    val WriteResult(added, stats, info) = writeDataFiles(data)
    // compaction folds outstanding equality AND position deletes into
    // the rewrite (readFiles applied both) — the new snapshot starts
    // delete-free
    commit(base, "compact", added = added, removed = base.liveFiles,
      live = added, addedStats = stats, addedInfo = info, deletesOverride = Some(Nil),
      posDeletesOverride = Some(Nil), dvOverride = Some(Nil))
  }

  /** Expire snapshots older than the latest `keepLast`, deleting their
    * metadata and any data file no longer referenced by a retained
    * snapshot (≡ Iceberg `expire_snapshots` maintenance). Incremental
    * scans can no longer start before the oldest retained snapshot. */
  def expireSnapshots(keepLast: Int): Unit = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val head = currentSnapshotId.getOrElse(return)
    val cutoff = head - keepLast // expire ids <= cutoff
    if (cutoff < 1) return
    expireWhere(_.snapshotId <= cutoff)
  }

  /** Expire every non-HEAD snapshot whose commit time is before
    * `cutoffTsMs` (≡ Iceberg `expire_snapshots(older_than => ts)`) —
    * the retention-window spelling maintenance jobs schedule. */
  def expireSnapshotsOlderThan(cutoffTsMs: Long): Unit = {
    val head = currentSnapshotId.getOrElse(return)
    expireWhere(s => s.timestampMs < cutoffTsMs && s.snapshotId != head)
  }

  private def expireWhere(shouldExpire: Snapshot => Boolean): Unit = {
    // iterate only RETAINED metadata — earlier expiries already removed
    // their files, so a plain id range would trip snapshot()'s existence
    // check. Snapshots pinned by a named ref (tag/branch) are protected
    // regardless of age, transitively keeping their files and chunks.
    val refIds = refs.values.map(_._2).toSet
    val (expired, kept) = snapshots.partition(s =>
      shouldExpire(s) && !refIds(s.snapshotId))
    // Expiry destroys the committed-ness evidence import-marker
    // recovery rides on ([[historyPaths]]): a marker lingering past
    // the expiry of every snapshot that referenced its committed
    // entries would make a later publish_staged re-commit the files —
    // a silent double-add whenever the entry files still physically
    // exist (e.g. a prior expiry crashed mid-delete). Clear such
    // markers NOW, while the evidence still exists: a marker entry
    // appearing ANYWHERE in history (retained or expiring) proves the
    // import committed — import dest paths carry a fresh UUID, so
    // nothing else can have put them there. Fresh-crash markers
    // (never committed; entries in no history) are untouched, keeping
    // their recovery automatic. Runs BEFORE any deletion, so a crash
    // leaves either full evidence or a cleared marker, never the
    // ambiguous middle state.
    if (expired.nonEmpty) {
      val allHist = (kept.iterator ++ expired.iterator)
        .flatMap(s => s.liveFiles.iterator ++ s.addedFiles.iterator ++
          s.removedFiles.iterator).toSet
      stagedIds.filter(_.startsWith("import-")).foreach { id =>
        val (_, _, entries, sources) = readStaged(id)
        if (sources.nonEmpty && entries.exists(e => allHist(e.path)))
          fs.delete(stagedPath(id), false)
      }
    }
    val keptFiles = kept.flatMap(_.liveFiles).toSet
    val keptDeletes = kept.flatMap(s =>
      s.deleteFiles.map(_.path) ++ s.posDeleteFiles.map(_.path) ++
        s.dvFiles.map(_.path)).toSet
    // manifest chunks are shared across snapshots by name — reclaim only
    // those no retained snapshot references
    val keptChunks = kept.flatMap(_.manifests).toSet
    // inline chunks hosted by an EXPIRING doc but referenced by a kept
    // snapshot must outlive their host: promote each to a real file of
    // the SAME NAME before any deletion. loadChunk prefers the file, so
    // a crash between promote and doc-delete just leaves two identical
    // copies; a re-run skips the already-promoted ones.
    if (expired.nonEmpty) {
      val expiredIds = expired.map(_.snapshotId).toSet
      keptChunks.toSeq.sorted.foreach {
        case n @ InlineChunkRe(vid) if expiredIds(vid.toLong) =>
          val p = new Path(metaDir, n)
          if (!fs.exists(p))
            writeStringExclusive(fs, p,
              ManifestIO.chunkToJson(loadChunk(n)))
        case _ => ()
      }
    }
    val doomedChunks = expired.flatMap(_.manifests).distinct
      .filterNot(keptChunks)
    doomedChunks.foreach(chunkCache.remove)
    val doomed: Seq[Path] =
      expired.flatMap(s => s.liveFiles.filterNot(keptFiles)).distinct
        .map(f => new Path(rootPath, f)) ++
      expired.flatMap(s =>
          s.deleteFiles.map(_.path) ++ s.posDeleteFiles.map(_.path) ++
            s.dvFiles.map(_.path))
        .distinct.filterNot(keptDeletes).map(f => new Path(rootPath, f)) ++
      doomedChunks.map(n => new Path(metaDir, n)) ++
      expired.map(s => new Path(metaDir, s"v${s.snapshotId}.json"))
    deleteAll(doomed)
  }

  /** Bounded-parallel fs deletes: maintenance against an object store is
    * latency-bound per call, so a serial driver loop over a 10⁵-file
    * expiry is hours at ~50 ms/RTT; 32 concurrent deletes make it
    * minutes. FileSystem implementations are thread-safe for delete. */
  private def deleteAll(paths: Seq[Path]): Unit = {
    if (paths.isEmpty) return
    if (paths.size == 1) { fs.delete(paths.head, false); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(32, paths.size))
    try {
      paths.map(p => pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = fs.delete(p, false)
      })).foreach(_.get())
    } finally pool.shutdown()
  }

  /** Roll the table back to `snapshotId` (≡ Iceberg
    * `rollback_to_snapshot`): commits a NEW snapshot restoring the
    * target's full state — data files, schema, renames, sequences, and
    * delete files. History is preserved (nothing is deleted), so the
    * rollback itself can be rolled back; a later [[expireSnapshots]]
    * reclaims the rolled-past data as usual. Driver-side manifest copy,
    * zero data movement. */
  def rollbackTo(snapshotId: Long): Long = {
    val base = current
    require(snapshotId <= base.snapshotId,
      s"cannot roll forward to $snapshotId (HEAD ${base.snapshotId})")
    if (snapshotId == base.snapshotId) return base.snapshotId
    val target = snapshot(snapshotId) // throws if expired
    commit(base, "rollback",
      added = target.liveFiles.diff(base.liveFiles),
      removed = base.liveFiles.diff(target.liveFiles),
      live = target.liveFiles,
      schemaJson = Some(target.schemaJson),
      statsOverride = Some(target.fileStats),
      renamesOverride = Some(target.fileRenames),
      deletesOverride = Some(target.deleteFiles),
      posDeletesOverride = Some(target.posDeleteFiles),
      dvOverride = Some(target.dvFiles),
      seqOverride = Some(target.fileSeq),
      infoOverride = Some(target.fileInfo),
      // the restored state is exactly the target's → its chunks are
      // reused verbatim and the rollback writes ~zero chunk bytes
      reuseChunksFrom = Seq(target),
      // restore the target's partition spec too (keep every spec both
      // eras know — expired-spec files may still exist elsewhere)
      specChange = Some((target.partitionColumns, target.currentSpecId,
        base.specsOrDefault ++ target.specsOrDefault)),
      fileSpecOverride = Some(target.fileSpec))
  }

  /** Delete files under `data/` and `deletes/` referenced by NO retained
    * snapshot and older than `olderThanMs` (≡ Iceberg
    * `remove_orphan_files`): debris of writers that died between the
    * staging move and their commit. The age gate keeps a LIVE writer's
    * freshly-moved files safe — never run with a small threshold while
    * writes are in flight. Returns the root-relative paths removed. */
  /** Consistency AUDIT of the current snapshot (≙ a lake `fsck`): one
    * row per check — `(check, ok, detail)`. The metadata level costs
    * zero data I/O (existence + recorded-size probes against the
    * manifest, O(live files) driver/fs calls); `deep = true` adds a
    * per-file ROW-COUNT recount (one grouped scan) compared against
    * the manifest's recorded rows — the check that catches a data file
    * swapped or truncated without its footer breaking. The operational
    * tool a 100 TB deployment runs after a storage incident, before
    * trusting metadata-only answers again. */
  def verifyTable(deep: Boolean = false): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    val base = current
    def head(xs: Seq[String]): String = xs.take(5).mkString(", ") +
      (if (xs.size > 5) s", … ${xs.size} total" else "")

    val missing = base.liveFiles.filterNot(f =>
      fs.exists(new Path(rootPath, f)))
    val sizeBad = base.liveFiles.filter { f =>
      base.fileInfo.get(f).exists { fi =>
        val p = new Path(rootPath, f)
        fs.exists(p) && fs.getFileStatus(p).getLen != fi.bytes
      }
    }
    val delMissing =
      (base.deleteFiles.map(_.path) ++ base.posDeleteFiles.map(_.path) ++
        base.dvFiles.map(_.path))
        .filterNot(f => fs.exists(new Path(rootPath, f)))

    var rows = Seq(
      ("files_exist", missing.isEmpty,
        if (missing.isEmpty) s"${base.liveFiles.size} live files"
        else s"missing: ${head(missing)}"),
      ("file_sizes", sizeBad.isEmpty,
        if (sizeBad.isEmpty) "recorded bytes match the filesystem"
        else s"size mismatch: ${head(sizeBad)}"),
      ("delete_files_exist", delMissing.isEmpty,
        if (delMissing.isEmpty)
          s"${base.deleteFiles.size + base.posDeleteFiles.size +
            base.dvFiles.size} artifacts"
        else s"missing: ${head(delMissing)}"))

    if (deep) {
      // recount only files that exist (missing ones already reported);
      // RAW parquet reads — recorded rows are pre-MOR-delete counts
      val present = base.liveFiles.filterNot(missing.contains)
      val counted =
        if (present.isEmpty) Map.empty[String, Long]
        else spark.read
          .parquet(present.map(f => new Path(rootPath, f).toString): _*)
          .select(col("_metadata.file_path").as("f"))
          .groupBy(col("f")).agg(count(lit(1)).as("n"))
          .collect()
          .map(r => relativize(r.getString(0)) -> r.getLong(1)).toMap
      val rowBad = present.filter { f =>
        base.fileInfo.get(f).exists(_.rows != counted.getOrElse(f, 0L))
      }
      rows = rows :+ (("row_counts", rowBad.isEmpty,
        if (rowBad.isEmpty)
          s"${counted.values.sum} rows across ${present.size} files"
        else s"recount mismatch: ${head(rowBad)}"))

      // stats audit (footer reads only, no data I/O): re-collect each
      // file's footer bounds + null counts with the SAME code path the
      // write used and compare to the manifest — a file REPLACED in
      // place with matching size and row count would still answer
      // pruning decisions with stale bounds, the corruption mode the
      // size/rowcount probes cannot see. Renamed- or old-spec-era
      // files are skipped (their physical footer names differ by
      // design); comparison is over keys both sides report, minus
      // bloom pseudo-columns (computed post-collect).
      val sch = schema
      val fields = partitionFields
      val statsBad = present.filter { f =>
        base.fileStats.get(f).exists { recorded =>
          // absent fileSpec entry = era 0 (same default the read path
          // uses), NOT current era — a legacy file in an evolved table
          // must be skipped, not audited under the wrong spec
          val skip = base.fileRenames.get(f).exists(_.nonEmpty) ||
            base.fileSpec.getOrElse(f, 0L) != base.currentSpecId
          !skip && scala.util.Try {
            val (actual, _) = FileStats.collect(hconf,
              new Path(rootPath, f), sch, fields, f)
            recorded.keys
              .filterNot(k => BloomStats.isBloomKey(k) ||
                FileStats.isSumKey(k)) // sums come from a data pass,
                                       // not the footer collector
              .exists(k => actual.get(k).exists(_ != recorded(k)))
          }.getOrElse(false)
        }
      }
      rows = rows :+ (("file_stats", statsBad.isEmpty,
        if (statsBad.isEmpty)
          "recorded bounds/null counts match the footers"
        else s"stale stats: ${head(statsBad)}"))
    }
    rows.toDF("check", "ok", "detail")
  }

  /** Run this table's DECLARED maintenance policy in one call — the
    * nightly-job surface (`CALL system.maintain('t')`): each
    * `maintenance.*` table property, when present, drives one action,
    * so the schedule lives WITH the table instead of in every
    * operator's cron. Order: Z-order rewrite and small-file binpack
    * first (their retired inputs become expirable history), then
    * snapshot expiry, then orphan cleanup. Returns (action, detail)
    * per action run. */
  def maintain(): Seq[(String, String)] = {
    val props = properties
    val out = Seq.newBuilder[(String, String)]
    props.get(PROP_MAINT_ZORDER_COLUMNS).foreach { cs =>
      val cols = cs.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val snap = compact(1, cols)
      out += ("rewrite_data_files" ->
        s"zorder=${cols.mkString(",")} snapshot=$snap")
    }
    props.get(PROP_MAINT_BINPACK_BYTES).foreach { b =>
      val snap = binPack(b.toLong)
      out += ("rewrite_small_files" ->
        s"target-bytes=$b snapshot=$snap")
    }
    props.get(PROP_MAINT_CONSOLIDATE_DV).filter(_ == "true").foreach { _ =>
      val snap = consolidateDeleteVectors()
      out += ("consolidate_delete_vectors" -> s"snapshot=$snap")
    }
    props.get(PROP_MAINT_EXPIRE_KEEP).foreach { k =>
      expireSnapshots(k.toInt)
      out += ("expire_snapshots" -> s"keep-last=$k")
    }
    props.get(PROP_MAINT_EXPIRE_AGE_MS).foreach { a =>
      expireSnapshotsOlderThan(System.currentTimeMillis() - a.toLong)
      out += ("expire_snapshots_older_than" -> s"max-age-ms=$a")
    }
    props.get(PROP_MAINT_ORPHAN_AGE_MS).foreach { a =>
      val n = removeOrphanFiles(a.toLong).size
      out += ("remove_orphan_files" -> s"removed=$n")
    }
    // mirror publishes LAST: they hand off the post-maintenance state
    // (compacted files, folded deletes — the exporters refuse MOR
    // artifacts, so consolidation/compaction above is what makes a
    // delete-bearing table publishable at all)
    props.get(LakeTable.PROP_MAINT_PUBLISH_ICEBERG).foreach { dir =>
      out += ("publish_iceberg" -> IcebergExport.publish(this, dir))
    }
    props.get(LakeTable.PROP_MAINT_PUBLISH_DELTA).foreach { dir =>
      out += ("publish_delta" -> DeltaExport.publish(this, dir))
    }
    props.get(LakeTable.PROP_MAINT_PUBLISH_UNIFORM).foreach { dir =>
      out += ("publish_iceberg" -> IcebergExport.publish(this, dir))
      out += ("publish_delta" -> DeltaExport.publish(this, dir))
    }
    out.result()
  }

  def removeOrphanFiles(olderThanMs: Long = 3600000L): Seq[String] = {
    val retained = snapshots
    // staged-but-unpublished WAP changesets reference real data files
    // that no snapshot knows about yet — they are parked, not orphaned
    val staged = stagedIds.flatMap(id => readStaged(id)._3.map(_.path))
    val referenced = (retained.flatMap(s =>
      s.liveFiles ++ s.addedFiles ++ s.removedFiles ++
        s.deleteFiles.map(_.path) ++ s.posDeleteFiles.map(_.path) ++
        s.dvFiles.map(_.path)) ++
      staged).toSet
    val referencedChunks = retained.flatMap(_.manifests).toSet
    val cutoff = System.currentTimeMillis() - olderThanMs
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    Seq(dataDir, new Path(rootPath, DELETES_DIR)).foreach { dir =>
      if (fs.exists(dir)) {
        val it = fs.listFiles(dir, true)
        while (it.hasNext) {
          val f = it.next()
          val rel = relativePath(rootPath, f.getPath)
          if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
              !referenced(rel) && f.getModificationTime < cutoff)
            removed += rel
        }
      }
    }
    // manifest chunks stranded by a lost race or crashed commit: named
    // m-<uuid>.json, referenced by no RETAINED snapshot (a beyond-HEAD
    // crashed commit's JSON is itself dead — commit() reclaims it on the
    // next attempt of that version, never reusing its chunks)
    if (fs.exists(metaDir)) {
      fs.listStatus(metaDir).foreach { st =>
        val name = st.getPath.getName
        if (st.isFile && name.endsWith(".json") &&
            (name.startsWith("m-") ||
              InlineChunkRe.matches(name)) && // promoted-then-stranded
            !referencedChunks(name) && st.getModificationTime < cutoff) {
          chunkCache.remove(name)
          removed += s"$METADATA_DIR/$name"
        }
        // snaplog temps stranded by a failed cache rename (writeSnaplog
        // only deletes its own temp on ITS failure branch; a crash
        // between write and rename leaves the file) — nothing ever
        // references them, so age is the only gate
        if (st.isFile && name.startsWith(".snaplog-") &&
            name.endsWith(".json") && st.getModificationTime < cutoff)
          removed += s"$METADATA_DIR/$name"
      }
    }
    deleteAll(removed.toSeq.map(r => new Path(rootPath, r)))
    removed.toSeq
  }

  def drop(): Unit = fs.delete(rootPath, true)

  // ---------------------------------------------------------------- internal

  /** With `write.schema.auto-evolve=true`, source columns the table
    * lacks are ADDED (nullable, one metadata-only evolve-schema commit
    * each) before the write — ≡ Delta's `mergeSchema`/`autoMerge`
    * write option. Runs BEFORE the write captures its base snapshot,
    * so the data commit lands on the evolved schema instead of
    * tripping the retry loop's evolution refusal. Off by default: with
    * it on, a producer's typo'd column silently becomes table schema —
    * and a CDC pipeline's bookkeeping columns (Op, etc.) would too, so
    * CDC callers should pre-drop them or leave this off. */
  /** Column-name key under the session's resolution rules —
    * `spark.sql.caseSensitive` is false by default, so `ID` and `id`
    * are the SAME column and schema matching must agree with the
    * analyzer, or auto-evolve would add a case-duplicate column and
    * make every later read ambiguous. */
  private def resolveKey(name: String): String =
    if (spark.conf.get("spark.sql.caseSensitive", "false").toBoolean) name
    else name.toLowerCase(java.util.Locale.ROOT)

  private def autoEvolveFor(df: DataFrame): Unit = {
    if (!properties.get(PROP_AUTO_EVOLVE).contains("true")) return
    evolveSchemaFor(df)
  }

  /** Evolve THIS table's schema to accommodate `df`'s: source columns
    * the table lacks are added (nullable, metadata-only commits) and
    * table columns a wider source type arrives for are widened. The
    * unconditional core of the `write.schema.auto-evolve` property and
    * of SQL `MERGE WITH SCHEMA EVOLUTION`, where the statement itself
    * is the opt-in. */
  def evolveSchemaFor(df: DataFrame): Unit = {
    val byKey = schema.fields.map(f => resolveKey(f.name) -> f).toMap
    df.schema.fields.foreach { f =>
      byKey.get(resolveKey(f.name)) match {
        case None => addColumn(f.name, f.dataType, nullable = true)
        case Some(g) if g.dataType != f.dataType &&
            LakeTable.canWiden(g.dataType, f.dataType) =>
          // source arrived WIDER than the table column (e.g. long into
          // an int column): widen the table rather than letting
          // alignToSchema's narrowing cast corrupt out-of-range values
          widenColumnType(g.name, f.dataType)
        case _ => // same type, or a narrower/unrelated source type:
          // alignToSchema's cast to the table type handles it
      }
    }
  }

  private def alignToSchema(df: DataFrame): DataFrame = {
    val want = schema
    val have: Map[String, String] =
      df.columns.map(n => resolveKey(n) -> n).toMap
    // columns the source lacks (e.g. added by addColumn after the
    // writer was built) fill with their declared CURRENT_DEFAULT, else
    // NULL — Iceberg's write behavior; missing non-nullable columns
    // without a default are still an error
    val missing = want.fields.filterNot(f => have.contains(resolveKey(f.name)))
    val missingRequired = missing.filterNot(f => f.nullable ||
      LakeTable.defaultSqlOf(f, LakeTable.CurrentDefaultKey).isDefined)
    require(missingRequired.isEmpty,
      "source is missing non-nullable table columns: " +
        missingRequired.map(_.name).mkString(", "))
    df.select(want.fields.map { f =>
      have.get(resolveKey(f.name)) match {
        // select by the SOURCE spelling, emit under the TABLE spelling
        case Some(src) => col(src).cast(f.dataType).as(f.name)
        case None =>
          LakeTable.defaultSqlOf(f, LakeTable.CurrentDefaultKey) match {
            case Some(sql) => expr(sql).cast(f.dataType).as(f.name)
            case None => lit(null).cast(f.dataType).as(f.name)
          }
      }
    }.toIndexedSeq: _*)
  }

  /** Write df's rows as new Parquet data files (hive-partitioned when the
    * table has a partition spec) via a staging dir, then move each file
    * under data/. Returns the table-root-relative paths of the new files
    * plus their per-column bounds (read from the fresh Parquet footers —
    * cost ∝ commit size, see [[FileStats]]). File names carry Spark's task
    * UUIDs — unique across commits. */
  private def writeDataFiles(df: DataFrame): WriteResult = labeled("write") {
    val staging = new Path(rootPath, s".staging-${UUID.randomUUID()}")
    val conf = df.sparkSession.conf
    val tsTypeKey = "spark.sql.parquet.outputTimestampType"
    val priorTsType = conf.getOption(tsTypeKey)
    try {
      // INT96 timestamps carry no usable Parquet stats; micros do, and are
      // the modern representation every reader (incl. DuckDB) understands.
      // Restored below — the shared session's unrelated Parquet writes
      // must not silently change encoding.
      conf.set(tsTypeKey, "TIMESTAMP_MICROS")
      // local (in-partition) sort keeps every write path's file ranges
      // as tight as its partitioning allows — appends add the global
      // range-repartition, rewrites/compaction keep their own
      // partitioning and still benefit
      val sorted = sortOrderColumns match {
        case Nil => df
        case cols => df.sortWithinPartitions(cols.map(col): _*)
      }
      val codec = properties.getOrElse(PROP_COMPRESSION, "snappy")
      val sch = schema
      val fields = partitionFields
      // hidden partitioning: derive the transform columns map-side; the
      // hive write moves them into the directory layout (partitionBy
      // strips them from file content), so data files keep the SOURCE
      // column and readers never see the derived one
      val types = sch.fields.map(f => f.name -> f.dataType).toMap
      val derived = fields.filterNot(_.isIdentity).foldLeft(sorted) {
        (df, f) => df.withColumn(f.dirName, f.expr(types(f.source)))
      }
      var w = derived.write.mode("overwrite").option("compression", codec)
        // staging is private and validated below (footer profile +
        // optional constraint re-read) before any file goes live, so the
        // committer's job-level atomicity is redundant here: v2 task
        // commits skip the second rename pass and no _SUCCESS marker is
        // written (one fewer fs op per write; listParquet never read it)
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      if (fields.nonEmpty)
        w = w.partitionBy(fields.map(_.dirName): _*)
      LakeTable.timed("w.parquet")(w.parquet(staging.toString))
      // validate what was actually WRITTEN (staging is still disposable —
      // a violation throws here and `finally` deletes it, so no live file
      // can ever hold a violating row). Identity partition columns live
      // in the hive dirs; supplying the table schema casts them back.
      if (hasWriteConstraints) {
        val readSchema = org.apache.spark.sql.types.StructType(
          sch.fields.filter(f => df.columns.contains(f.name)))
        enforceWriteConstraints(
          spark.read.option("basePath", staging.toString)
            .schema(readSchema).parquet(staging.toString))
      }
      val files = LakeTable.timed("w.list")(listParquet(fs, staging))
      // rename serially (cheap metadata ops; size captured from the
      // same status call), then read the footers in parallel — each
      // open is independent driver-side I/O, and a large
      // compact/overwrite commit would otherwise pay O(files) serial reads
      // single-bucket-field tables name their data files with Spark's
      // `_NNNNN` bucket-id suffix (parsed from the hive bucket dir the
      // hash-derived write placed them in) — the read side can then
      // claim a real BucketSpec and scans become bucketed
      // (storage-partitioned joins/aggs on the source column)
      val bucketDir: Option[String] = fields.collect {
        case fld if fld.transform.isInstanceOf[PartitionSpec.Bucket] =>
          fld.dirName
      } match {
        case Seq(one) => Some(one + "=")
        case _ => None
      }
      def withBucketSuffix(rel: String): String = bucketDir match {
        case None => rel
        case Some(prefix) =>
          val id = rel.split('/').collectFirst {
            case seg if seg.startsWith(prefix) => seg.stripPrefix(prefix)
          }.flatMap(v => scala.util.Try(v.toInt).toOption)
          id match {
            case Some(b) =>
              val slash = rel.lastIndexOf('/')
              val (dir, name) = rel.splitAt(slash + 1)
              val suffix = org.apache.spark.sql.execution.datasources
                .BucketingUtils.bucketIdToString(b)
              val dot = name.indexOf('.')
              if (dot < 0) dir + name + suffix
              else dir + name.substring(0, dot) + suffix + name.substring(dot)
            case None => rel
          }
      }
      val moved = LakeTable.timed("w.rename")(files.map { f =>
        val rel = withBucketSuffix(relativePath(staging, f))
        val dest = new Path(dataDir, rel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(f, dest))
          throw new java.io.IOException(s"rename $f -> $dest failed")
        (s"$DATA_DIR/$rel", dest, fs.getFileStatus(dest).getLen)
      })
      val statsMap =
        new java.util.concurrent.ConcurrentHashMap[String, Map[String, ColStat]]()
      val infoMap =
        new java.util.concurrent.ConcurrentHashMap[String, FileInfo]()
      LakeTable.timed("w.stats")(
        moved.toList.asJava.parallelStream().forEach { case (key, dest, len) =>
          val (st, rows) = FileStats.collect(hconf, dest, sch, fields, key)
          if (st.nonEmpty) statsMap.put(key, st)
          infoMap.put(key, FileInfo(len, rows))
        })
      // per-file Bloom filters (opt-in, one distributed pass over the
      // fresh files per column) ride the stats map as __bloom__ pseudo-
      // columns — see BloomStats
      val bloomCols = properties.get(PROP_BLOOM_COLUMNS).toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
        .filter(sch.fieldNames.contains)
      if (bloomCols.nonEmpty && moved.nonEmpty) {
        val mBits = properties.get(PROP_BLOOM_BITS).map(_.toInt)
          .getOrElse(BloomStats.DefaultBits)
        BloomStats.build(spark, moved.map(_._2.toString),
            dataDir.toString, sch, bloomCols, mBits)
          .foreach { case (abs, blooms) =>
            val key = relativize(abs)
            statsMap.put(key,
              statsMap.getOrDefault(key, Map.empty) ++ blooms)
          }
      }
      // per-file EXACT sums (opt-in, integral columns): the metadata-
      // SUM leg of ManifestAggRule — one column-pruned pass over the
      // fresh files, same cost shape as the Bloom pass above. Identity
      // partition columns live in the hive dirs (not in file content)
      // and are excluded; their per-file sums would be value × rows,
      // derivable but out of scope.
      val aggCols = properties.get(PROP_AGG_COLUMNS).toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
        .filter(c => sch.fieldNames.contains(c) &&
          FileStats.supportsExactSum(sch(c).dataType) &&
          !fields.exists(f => f.isIdentity && f.source == c))
      if (aggCols.nonEmpty && moved.nonEmpty) {
        val byKey = FileStats.collectSums(spark,
            moved.map(_._2.toString), dataDir.toString, sch, aggCols)
          .map { case (abs, m) => relativize(abs) -> m }
        val zeros = aggCols.map(n =>
          FileStats.sumKey(n) -> ColStat("0", "0")).toMap
        moved.foreach { case (key, _, _) =>
          statsMap.put(key, statsMap.getOrDefault(key, Map.empty) ++
            byKey.getOrElse(key, zeros))
        }
      }
      WriteResult(moved.map(_._1), statsMap.asScala.toMap,
        infoMap.asScala.toMap)
    } finally {
      fs.delete(staging, true)
      priorTsType match {
        case Some(v) => conf.set(tsTypeKey, v)
        case None => conf.unset(tsTypeKey)
      }
    }
  }

  /** Write an equality-delete key file (tiny: distinct keys only) under
    * `deletes/`; returns root-relative paths. */
  private def writeDeleteFiles(keysDf: DataFrame): Seq[String] = {
    val staging = new Path(rootPath, s".staging-${UUID.randomUUID()}")
    try {
      keysDf.write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(staging.toString)
      val files = LakeTable.timed("w.list")(listParquet(fs, staging))
      val delDir = new Path(rootPath, DELETES_DIR)
      fs.mkdirs(delDir)
      files.map { f =>
        val dest = new Path(delDir, f.getName)
        if (!fs.rename(f, dest))
          throw new java.io.IOException(s"rename $f -> $dest failed")
        s"$DELETES_DIR/${f.getName}"
      }
    } finally fs.delete(staging, true)
  }

  /** Write ONE deletion-vector artifact under `deletes/` (dv-*.parquet);
    * returns root-relative paths (a single element — the whole vector
    * set is one tiny file: one row per targeted data file). */
  /** Writes the consolidated deletion-vector parquet and returns each
    * artifact's (table-relative path, on-disk bytes) — the size is
    * recorded in [[DvFile]] so the read path can size-gate its
    * broadcast without a plan-time stat. */
  private def writeDvFiles(dvDf: DataFrame): Seq[(String, Long)] = {
    val staging = new Path(rootPath, s".staging-${UUID.randomUUID()}")
    try {
      dvDf.coalesce(1).write.mode("overwrite")
        .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        .parquet(staging.toString)
      val files = LakeTable.timed("w.list")(listParquet(fs, staging))
      val delDir = new Path(rootPath, DELETES_DIR)
      fs.mkdirs(delDir)
      files.map { f =>
        val dest = new Path(delDir, s"dv-${f.getName}")
        if (!fs.rename(f, dest))
          throw new java.io.IOException(s"rename $f -> $dest failed")
        (s"$DELETES_DIR/${dest.getName}", fs.getFileStatus(dest).getLen)
      }
    } finally fs.delete(staging, true)
  }

  /** `input_file_name()` URI → table-root-relative path. Works on the
    * DECODED filesystem path (partition values may contain spaces etc.;
    * the URI form would leave literal %XX in the stored manifest and
    * break the re-read). */
  private def relativize(inputFileName: String): String = {
    val decoded =
      try {
        val uri = new java.net.URI(inputFileName)
        if (uri.getScheme != null) uri.getPath else inputFileName
      } catch { case _: java.net.URISyntaxException => inputFileName }
    val base = fs.makeQualified(dataDir).toUri.getPath.stripSuffix("/")
    require(decoded.startsWith(base + "/"),
      s"file $decoded not under table data dir $base")
    DATA_DIR + decoded.substring(base.length)
  }

  private def commit(base: Snapshot, op: String, added: Seq[String],
      removed: Seq[String], live: Seq[String],
      addedStats: Map[String, Map[String, ColStat]] = Map.empty,
      schemaJson: Option[String] = None,
      statsOverride: Option[Map[String, Map[String, ColStat]]] = None,
      renamesOverride: Option[Map[String, Map[String, String]]] = None,
      deletesOverride: Option[Seq[DeleteFile]] = None,
      posDeletesOverride: Option[Seq[PosDeleteFile]] = None,
      dvOverride: Option[Seq[DvFile]] = None,
      seqOverride: Option[Map[String, Long]] = None,
      addedInfo: Map[String, FileInfo] = Map.empty,
      infoOverride: Option[Map[String, FileInfo]] = None,
      reuseChunksFrom: Seq[Snapshot] = Nil,
      specChange: Option[(Seq[String], Long, Map[Long, Seq[String]])] = None,
      fileSpecOverride: Option[Map[String, Long]] = None,
      propertiesOverride: Option[Map[String, String]] = None,
      rechunk: Boolean = false): Long = {
    // the test seam fires between an op's artifact write and THIS
    // commit attempt (per attempt — specs interleave racing commits
    // deterministically on COW rewrite paths too, not just appends)
    beforeCommitHook()
    val id = base.snapshotId + 1
    // Append-shaped commits (nothing removed, no per-file overrides —
    // append, MOR merge/delete/update) keep every base entry live, so
    // the carried maps concatenate in O(delta) instead of re-filtering
    // O(table); the chunk plan below skips the equality scan for the
    // same reason.
    val appendShaped = removed.isEmpty && statsOverride.isEmpty &&
      renamesOverride.isEmpty && seqOverride.isEmpty &&
      infoOverride.isEmpty && reuseChunksFrom.isEmpty &&
      fileSpecOverride.isEmpty &&
      live.length == base.liveFiles.length + added.length &&
      // a legacy inline base has files but no chunks — the slow path
      // chunks its whole carried state (the upgrade commit)
      (base.manifests.nonEmpty || base.liveFiles.isEmpty)
    lazy val liveSet = live.toSet
    val stats = statsOverride.getOrElse(
      if (appendShaped) base.fileStats ++ addedStats
      else base.fileStats.filter { case (f, _) => liveSet(f) } ++ addedStats)
    val renames =
      if (appendShaped) base.fileRenames
      else renamesOverride.getOrElse(base.fileRenames)
        .filter { case (f, m) => liveSet(f) && m.nonEmpty }
    val seqs = seqOverride.getOrElse(
      (if (appendShaped) base.fileSeq
       else base.fileSeq.filter { case (f, _) => liveSet(f) }) ++
        added.map(_ -> id))
    val dels = deletesOverride.getOrElse(base.deleteFiles)
    val pdels = posDeletesOverride.getOrElse(base.posDeleteFiles)
    val dvs = dvOverride.getOrElse(base.dvFiles)
    val finfo0 = infoOverride.getOrElse(
      if (appendShaped) base.fileInfo ++ addedInfo
      else base.fileInfo.filter { case (f, _) => liveSet(f) } ++ addedInfo)
    // row lineage: every added file gets a first_row_id block carved
    // from the row.next-id counter IN THIS COMMIT (no crash window —
    // ids and counter land atomically with the files); path-sorted so
    // assignment is deterministic within the commit
    val props0 = propertiesOverride.getOrElse(base.properties)
    val (finfo, props1) =
      if (!props0.get(PROP_ROW_LINEAGE).contains("true") || added.isEmpty)
        (finfo0, props0)
      else {
        var next = props0.get(PROP_NEXT_ROW_ID).map(_.toLong).getOrElse(0L)
        val assigned = added.sorted.flatMap { f =>
          finfo0.get(f).filter(_.firstRowId.isEmpty).map { fi =>
            val entry = f -> fi.copy(firstRowId = Some(next))
            next += fi.rows
            entry
          }
        }
        (finfo0 ++ assigned, props0 + (PROP_NEXT_ROW_ID -> next.toString))
      }
    // partition-spec bookkeeping: new files carry the committing spec
    // id; an evolve-spec commit swaps the current spec + registry
    val (pcols, curSpec, specs) = specChange.getOrElse(
      (base.partitionColumns, base.currentSpecId, base.partitionSpecs))
    val addedSpec =
      if (base.currentSpecId == 0L) Nil
      else added.map(_ -> base.currentSpecId)
    val fspec = fileSpecOverride.getOrElse(
      (if (appendShaped) base.fileSpec
       else base.fileSpec.filter { case (f, _) => liveSet(f) }) ++ addedSpec)
    val snap0 = Snapshot(id, Some(base.snapshotId), System.currentTimeMillis(),
      op, added, removed, live, schemaJson.getOrElse(base.schemaJson),
      pcols, props1, stats, renames,
      seqs, dels, pdels, dvFiles = dvs, fileInfo = finfo,
      fileSpec = fspec, partitionSpecs = specs,
      currentSpecId = curSpec)
    // Chunk the per-file state (see ManifestIO): reuse every parent
    // chunk whose entries are unchanged (rollback additionally offers
    // its target's chunks), write only the delta. Chunks are written
    // BEFORE the snapshot JSON's exclusive create — a lost race or
    // crash strands only uuid-named orphans that maintenance reclaims.
    //
    val planned = LakeTable.timed("c.plan") {
      if (rechunk)
        // forced full re-chunk (rewriteManifests): ignore every parent
        // chunk and regroup ALL entries path-sorted, so hive partition
        // dirs land contiguously and chunk summaries come out tight
        ManifestIO.Plan(Nil, ManifestIO.entriesOf(snap0).sortBy(_.path)
          .grouped(ManifestIO.ChunkTargetEntries).toVector)
      else if (appendShaped)
        ManifestIO.planAppend(base.manifests,
          added.map(f => ManifestEntry(f, seqs.getOrElse(f, 0L),
            stats.getOrElse(f, Map.empty),
            renames.getOrElse(f, Map.empty).filter(_._2.nonEmpty),
            finfo.get(f), fspec.getOrElse(f, 0L))),
          loadChunk)
      else {
        val candidateNames =
          (base.manifests ++ reuseChunksFrom.flatMap(_.manifests)).distinct
        ManifestIO.plan(snap0, candidateNames.map(n => n -> loadChunk(n)))
      }
    }
    // SMALL delta chunks EMBED in the snapshot doc (see
    // ManifestIO.listToJson's `inline` doc): the doc's exclusive
    // create carries them atomically — one fewer fsynced create per
    // commit in the high-frequency small-commit regime, and a lost
    // race or crash strands no orphan chunk file. LARGE chunks (bulk
    // appends, LSM fold outputs — the long-lived artifacts) stay real
    // files so the distributed `.files`/`.partitions` manifest scan
    // keeps its executor-side property: inline content is bounded by
    // the fold invariant to the small size classes. Expiry promotes
    // any still-referenced inline chunk to a real file before its
    // host doc dies.
    val inlined = scala.collection.mutable.Map
      .empty[String, Seq[ManifestEntry]]
    val newChunks = LakeTable.timed("c.chunkwrite")(
      planned.toWrite.zipWithIndex.map { case (entries, k) =>
        if (entries.size <= LakeTable.INLINE_CHUNK_MAX_ENTRIES) {
          val name = s"iv$id-$k.json"
          inlined(name) = entries
          chunkCache.put(name, entries)
          name
        } else {
          val name = s"m-${UUID.randomUUID()}.json"
          writeStringExclusive(fs, new Path(metaDir, name),
            ManifestIO.chunkToJson(entries))
          chunkCache.put(name, entries)
          name
        }
      })
    // chunk-level summaries for the manifest list: reused chunks carry
    // the parent's summary forward (O(1), no chunk read on the warm
    // path), fresh chunks summarize their own entries (O(delta))
    val listSchema = DataType.fromJson(snap0.schemaJson)
      .asInstanceOf[StructType]
    val parentSums = base.manifestSummaries
    val summaries: Map[String, Map[String, ColStat]] =
      LakeTable.timed("c.summaries")(
        (planned.reused.map(n => n -> parentSums.getOrElse(n,
            ManifestIO.summarize(loadChunk(n), listSchema))) ++
          newChunks.zip(planned.toWrite).map { case (n, es) =>
            n -> ManifestIO.summarize(es, listSchema) }).toMap)
    val snap = snap0.copy(manifests = planned.reused ++ newChunks,
      manifestSummaries = summaries)
    // a losing racer's inline chunks exist ONLY in our cache — purge
    // them so a rebase never reads our content under the winner's
    // same-named chunk; file-backed ones are deleted like before
    def dropNewChunks(): Unit = newChunks.foreach { n =>
      chunkCache.remove(n)
      if (n.startsWith("m-")) fs.delete(new Path(metaDir, n), false)
    }
    // crash recovery: a v<id>.json left by a commit that died before its
    // HEAD swap (HEAD still == our base) is an orphan — remove it, or the
    // table could never commit again. Age-gated so a LIVE racing writer's
    // freshly-written file is never mistaken for one (racers collide
    // within ms and lose via the exclusive create; a crashed commit is
    // retried much later).
    val metaPath = new Path(metaDir, s"v$id.json")
    LakeTable.timed("c.orphancheck") {
      if (fs.exists(metaPath) && currentSnapshotId.contains(base.snapshotId)
          && System.currentTimeMillis() -
            fs.getFileStatus(metaPath).getModificationTime > ORPHAN_GRACE_MS)
        fs.delete(metaPath, false)
    }
    // optimistic concurrency: exclusive create of v<id>.json fails if a
    // racing writer committed the same version first. Normalize the
    // already-exists failure to ConcurrentModificationException, so
    // every losing racer sees ONE exception type (and [[append]] can
    // retry on it).
    val metaJson = ManifestIO.listToJson(snap, inlined.toMap)
    try LakeTable.timed("c.vjson")(
      writeStringExclusive(fs, metaPath, metaJson))
    catch {
      case e: java.io.IOException if fs.exists(metaPath) =>
        // lost the exclusive create: the winner's HEAD swap may still
        // be IN FLIGHT (a real cross-process window — the winner is
        // between create and swap for milliseconds of wall time), so
        // HEAD alone can't distinguish "lost the race" from "storage
        // trouble". The surviving v<id>.json IS the evidence. Ride the
        // swap out briefly so the retry loop observes the moved HEAD
        // and rebases; if HEAD never moves (winner crashed mid-swap),
        // the age-gated orphan recovery above unblocks a later attempt.
        dropNewChunks()
        val deadline = System.nanoTime() + 5_000_000_000L
        var sleep = 2L
        while (currentSnapshotId.contains(base.snapshotId) &&
            System.nanoTime() < deadline) {
          Thread.sleep(sleep)
          sleep = math.min(sleep * 2, 100L)
        }
        throw new java.util.ConcurrentModificationException(
          s"table $root: version $id was committed by a racing writer " +
            s"(${e.getMessage})")
      case e: java.io.IOException
          if !currentSnapshotId.contains(base.snapshotId) =>
        dropNewChunks()
        throw new java.util.ConcurrentModificationException(
          s"table $root HEAD moved past ${base.snapshotId} before " +
            s"commit of $id (${e.getMessage})")
      case e: Throwable =>
        dropNewChunks(); throw e
    }
    val now = LakeTable.timed("c.headcheck")(currentSnapshotId)
    if (!now.contains(base.snapshotId)) {
      // clean our metadata only while it is still beyond HEAD — if HEAD
      // reached id, the file may be the winner's current snapshot
      if (now.exists(_ < id)) { fs.delete(metaPath, false); dropNewChunks() }
      throw new java.util.ConcurrentModificationException(
        s"table $root HEAD moved to $now during commit of $id")
    }
    LakeTable.timed("c.head")(writeHead(id))
    // POST-SWAP OWNERSHIP CHECK: the age-gated orphan reclaim above
    // can — if THIS writer stalled past ORPHAN_GRACE_MS between its
    // v-file write and here — have deleted our v<id>.json and
    // re-claimed the ordinal for another writer; both of us then swap
    // HEAD to the same id and OUR commit would silently vanish while
    // we report success (the one lost-commit window in the protocol).
    // Reading the id back closes it: after OUR swap no further reclaim
    // of this ordinal is possible (reclaim requires HEAD == base), so
    // a mismatch proves the reclaim happened and this commit must
    // surface the lost race for the retry loop to re-commit; the
    // reclaimer's commit is exactly the file at HEAD, so nothing is
    // torn. The read-back is one just-written (page-warm) metadata
    // file per commit.
    // Only a SUCCESSFUL read returning DIFFERENT content is reclaim
    // evidence. A transient IO failure here must NOT be treated as
    // reclaim: the swap already succeeded, so dropNewChunks() would
    // delete m-* chunks the live HEAD references (corruption) and the
    // CME would make the retry loop re-commit already-committed rows.
    // Retry the read briefly; if it keeps failing, propagate the IO
    // error with the chunks intact (the commit may well be live).
    val backJson = LakeTable.timed("c.ownership") {
      var last: Throwable = null
      var got: String = null
      var attempt = 0
      while (got == null && attempt < 3) {
        try got = readString(fs, metaPath)
        catch {
          case e: java.io.IOException =>
            last = e; attempt += 1
            if (attempt < 3) Thread.sleep(5L << attempt)
        }
      }
      if (got == null) throw new java.io.IOException(
        s"table $root: post-swap ownership read-back of v$id failed " +
          "after the HEAD swap succeeded — the commit may be live; " +
          "verify before retrying", last)
      got
    }
    if (backJson != metaJson) {
      dropNewChunks()
      throw new java.util.ConcurrentModificationException(
        s"table $root: version $id was reclaimed by a racing writer " +
          "while this commit was stalled (post-swap ownership check)")
    }
    id
  }

  private def writeHead(id: Long): Unit =
    pointerStore.write(headPath, id.toString)
}

/** One `WHEN` clause of a general MERGE ([[LakeTable.mergeClauses]]):
  * `condition` is the optional `AND <cond>` guard (absent = always
  * applies), `assignments` maps bare target column names to value
  * expressions for UPDATE/INSERT, or is None for DELETE. */
case class MergeWhen(condition: Option[org.apache.spark.sql.Column],
    assignments: Option[Map[String, org.apache.spark.sql.Column]])

object LakeTable {

  /** Commit-path micro-timers (ScaleSmoke `commit-depth` profiling —
    * off by default, one atomic read per section when disabled). */
  private[graft] val timersEnabled =
    new java.util.concurrent.atomic.AtomicBoolean(false)
  private[graft] val timers = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()
  @inline private[graft] def timed[T](label: String)(f: => T): T =
    if (!timersEnabled.get) f
    else {
      val t0 = System.nanoTime()
      try f finally timers.computeIfAbsent(label,
          _ => new java.util.concurrent.atomic.AtomicLong)
        .addAndGet(System.nanoTime() - t0)
    }

  /** One snapshot's metadata-view summary (see
    * [[LakeTable.snapshotSummaries]]): everything `.history` /
    * `.snapshots` render, ~100 bytes instead of the full manifest
    * state. */
  final case class SnapSummary(id: Long, parentId: Option[Long],
      tsMs: Long, op: String, nAdded: Long, nRemoved: Long,
      nLive: Long)
  /** Lossless type promotions the parquet vectorized reader upcasts
    * natively at scan time (Spark 4.x type widening; each pair probed
    * on this runtime). long→double is NOT here: longs above 2^53 lose
    * precision. The matrix mirrors Iceberg's allowed schema
    * promotions, plus the int→double / date→timestamp_ntz pairs the
    * Spark 4 reader additionally supports. */
  def canWiden(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType)            => true
    case (IntegerType, LongType)                        => true
    // every int32 value is exact in a double (2^31 < 2^53)
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (FloatType, DoubleType)                        => true
    case (a: DecimalType, b: DecimalType) =>
      // value-preserving iff integral digits don't shrink and the
      // scale doesn't shrink (reader pads added scale with zeros)
      b.scale >= a.scale && (b.precision - b.scale) >= (a.precision - a.scale)
    case (DateType, TimestampNTZType)                   => true
    case _                                              => false
  }

  /** Spark's own default-column field-metadata keys
    * (`ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY` /
    * `EXISTS_DEFAULT_…`) — stored under the same names so the schema
    * JSON round-trips Spark-idiomatically. EXISTS = what rows written
    * BEFORE the column existed read; CURRENT = what future writes fill
    * when the column is absent from the batch. */
  val CurrentDefaultKey = "CURRENT_DEFAULT"
  val ExistsDefaultKey = "EXISTS_DEFAULT"

  /** Table-property prefix for CHECK constraints (Delta's scheme). */
  val ConstraintPrefix = "constraints."

  /** Opt-in NOT NULL write enforcement (see enforceWriteConstraints). */
  val PropEnforceNotNull = "write.enforce-not-null"

  /** The stored default SQL under `key` for field `f`, if any. */
  private[lake] def defaultSqlOf(f: StructField, key: String): Option[String] =
    if (f.metadata.contains(key)) Some(f.metadata.getString(key)) else None

  /** Scalar (non-nested) type — what ANALYZE … FOR COLUMNS can
    * summarize with min/max/ndv. */
  private[lake] def isScalarType(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case NullType | CalendarIntervalType => false
    case _ => true
  }

  val METADATA_DIR = "metadata"
  /** Largest delta chunk embedded in its snapshot doc instead of a
    * file of its own (see commit()'s chunk-write step): small enough
    * that the inline share of the manifest stays in the LSM fold's
    * small size classes — the distributed `.files` scan keeps reading
    * the big chunks executor-side — while the dominant high-frequency
    * commit shapes (single-file appends, MOR delete artifacts,
    * checkpoint bumps) pay zero chunk creates. */
  val INLINE_CHUNK_MAX_ENTRIES = 64
  /** Nominal block size for manifest-built [[FileStatus]]es (local
    * split planning uses maxPartitionBytes, not this). */
  private val DefaultBlockSize: Long = 128L * 1024 * 1024
  val DATA_DIR = "data"
  val DELETES_DIR = "deletes"
  val HEAD = "HEAD"
  val REFS = "refs.json"
  /** Bounds-map type of the `.files` metadata view. */
  private val BOUNDS_TYPE = MapType(StringType,
    StructType(Seq(StructField("min", StringType),
      StructField("max", StringType))))
  /** Read schema for manifest chunk JSONs (executor-side `.files` scan;
    * mirrors [[ManifestIO.chunkToJson]] minus `renames`, which no
    * metadata view reports). */
  private val CHUNK_READ_SCHEMA = StructType(Seq(
    StructField("entries", ArrayType(StructType(Seq(
      StructField("path", StringType),
      StructField("seq", LongType),
      StructField("stats", BOUNDS_TYPE),
      StructField("bytes", LongType),
      StructField("rows", LongType)))))))
  val PROP_COMPRESSION = "write.parquet.compression-codec"
  /** Comma-separated sort columns (≡ Iceberg sort orders): appends
    * range-cluster on them so per-file stats ranges are disjoint. */
  val PROP_SORT_ORDER = "write.sort.order"
  val PROP_MERGE_MODE = "write.merge.mode"
  /** `none` (default) | `hash` — see distributeForWrite. */
  val PROP_DISTRIBUTION_MODE = "write.distribution-mode"
  val PROP_DELETE_MODE = "write.delete.mode"
  val PROP_UPDATE_MODE = "write.update.mode"
  /** `fail` (default) | `recompute` — whether a COW rewrite losing a
    * commit race re-executes against the new HEAD (serial schedule)
    * or surfaces the ConcurrentModificationException. */
  val PROP_CONFLICT_MODE = "commit.conflict-mode"
  val PROP_AUTO_EVOLVE = "write.schema.auto-evolve"
  /** Comma-separated columns to build per-file Bloom filters for (see
    * [[BloomStats]]); empty/absent = none. */
  /** Opt-in row lineage (Iceberg v3 shape): `write.row-lineage=true`
    * (set at CREATE — rows written before enablement have no ids). */
  val PROP_ROW_LINEAGE = "write.row-lineage"
  /** Row-lineage id counter: the next unassigned row id. Advanced by
    * every commit's added row count (rewrites included — carried rows
    * leave their fresh slots unused, like Iceberg's next-row-id). */
  val PROP_NEXT_ROW_ID = "row.next-id"
  /** Lineage column [[LakeTable.scanWithLineage]] exposes; physically
    * present only in REWRITTEN files (null there = row inserted by the
    * rewrite, resolved to first_row_id + position). */
  val ROW_ID_COL = "_row_id"

  /** Declared maintenance policy (see [[LakeTable.maintain]]): each
    * property present enables one action of `CALL system.maintain`. */
  val PROP_MAINT_ZORDER_COLUMNS = "maintenance.zorder.columns"
  val PROP_MAINT_CONSOLIDATE_DV = "maintenance.consolidate-dv"
  val PROP_MAINT_BINPACK_BYTES = "maintenance.binpack.target-bytes"
  val PROP_MAINT_EXPIRE_KEEP = "maintenance.expire.keep-last"
  val PROP_MAINT_EXPIRE_AGE_MS = "maintenance.expire.max-age-ms"
  val PROP_MAINT_ORPHAN_AGE_MS = "maintenance.orphans.min-age-ms"
  /** Mirror-publish policies: each maintain() run appends the current
    * snapshot to the named interop directory (Iceberg metadata / Delta
    * log / both side by side) — the nightly handoff travels with the
    * table like every other policy. Idempotent when HEAD is already
    * published. */
  val PROP_MAINT_PUBLISH_ICEBERG = "maintenance.publish-iceberg"
  val PROP_MAINT_PUBLISH_DELTA = "maintenance.publish-delta"
  val PROP_MAINT_PUBLISH_UNIFORM = "maintenance.publish-uniform"
  /** "true" ⇒ Delta publishes also PRODUCE Change Data Feed: spec cdc
    * actions + `_change_data/` files derived from the table's own
    * changelog, so a delta-spark consumer can `readChangeFeed` the
    * mirror. Non-insert ranges must publish PER COMMIT (continuous
    * mode) — see [[DeltaExport]]. */
  val PROP_PUBLISH_CDF = "publish.delta.change-data-feed"

  val PROP_BLOOM_COLUMNS = "write.bloom.columns"
  /** Comma list of INTEGRAL columns whose exact per-file sums are
    * recorded at write (`__sum__` pseudo-stats) — enables
    * ManifestAggRule's metadata-only SUM leg. */
  val PROP_AGG_COLUMNS = "write.agg.columns"
  /** Filter size in bits (default [[BloomStats.DefaultBits]]). */
  val PROP_BLOOM_BITS = "write.bloom.bits"
  val PROP_FORMAT_VERSION = "format-version"
  /** ANALYZE TABLE output (see [[LakeTable.analyze]]). */
  val PROP_STATS_ROWS = "stats.num_rows"
  val PROP_STATS_BYTES = "stats.size_bytes"
  val PROP_STATS_SNAPSHOT = "stats.analyzed_snapshot"
  /** Min age before a beyond-HEAD metadata file counts as a crashed
    * commit's orphan (see commit()). MUST stay well above the losing
    * racer's 5 s HEAD-swap ride-out: at parity, an impatient loser's
    * retry reclaims the ordinal of a winner stalled barely past 5 s
    * between its v-file write and HEAD swap — both then swap HEAD to
    * the same id and one commit vanishes (observed once under double
    * co-tenant load, round 17; the post-swap ownership check in
    * commit() now also detects the reclaim, and this margin makes it
    * need a full 60 s driver stall first). */
  val ORPHAN_GRACE_MS: Long = 60000L
  /** Max optimistic commit attempts for retry-safe ops (append). */
  val MAX_COMMIT_ATTEMPTS: Int = 5
  private val FILE_COL = "__graft_file"
  private val SRC_MARK = "__graft_is_src"
  private val TGT_MARK = "__graft_is_tgt"
  private val ERA_COL = "__graft_era"
  private val DERA_COL = "__graft_del_era"
  /** Row-provenance columns a position-aware scan carries (from
    * `_metadata.file_path` / `_metadata.row_index`). */
  private val PFILE_COL = "__graft_pos_file"
  private val PIDX_COL = "__graft_pos_idx"
  /** Column names INSIDE a position-delete Parquet file (≡ Iceberg's
    * position-delete schema `file_path`, `pos`). Package-visible so
    * [[IcebergExport]] can re-encode the artifacts spec-conformantly. */
  private[lake] val POS_FILE_FIELD = "file_uri"
  private[lake] val POS_POS_FIELD = "pos"
  // deletion-vector artifact columns: target file (table-relative) and
  // its deleted-ordinal bitset packed 64 ordinals per long
  private[lake] val DV_FILE_FIELD = "file"
  private[lake] val DV_BITS_FIELD = "dv"
  /** Changelog output columns (≡ Iceberg's `_change_type` etc.). */
  val CHANGE_TYPE_COL = "_change_type"
  val CHANGE_SNAP_COL = "_commit_snapshot_id"

  /** Result of one data-file write: root-relative paths, per-file column
    * bounds, and per-file size/row-count manifest info. */
  private[lake] final case class WriteResult(
      files: Seq[String],
      stats: Map[String, Map[String, ColStat]],
      info: Map[String, FileInfo])
  /** Physical-name prefix guaranteed never to be written by this engine:
    * addColumn maps the new column here for pre-existing files, so they
    * read NULL even if they carry dead bytes under the same name. */
  private val ABSENT_PREFIX = "__graft_absent_"

  /** Spark pins VariantType unorderable: no hash, no comparison, no
    * set operations. Wherever the engine hashes or set-differences a
    * ROW IMAGE, each variant-bearing column substitutes its canonical
    * JSON text (value-equal variants serialize identically). */
  private[lake] def containsVariant(dt: DataType): Boolean = dt match {
    case VariantType => true
    case s: StructType => s.fields.exists(f => containsVariant(f.dataType))
    case ArrayType(e, _) => containsVariant(e)
    case MapType(k, v, _) => containsVariant(k) || containsVariant(v)
    case _ => false
  }

  /** The hashable/comparable projection of a column: variant-bearing
    * columns become their JSON text, everything else passes through.
    * Comparison-only callers (salts, change tests) never restore. */
  private[lake] def comparableCol(name: String, dt: DataType): Column =
    if (containsVariant(dt)) to_json(col(name)) else col(name)

  /** `a.exceptAll(b)` with TOP-LEVEL variant columns carried through
    * as JSON text and parsed back after the set op (value-exact:
    * parse_json ∘ to_json is the identity on variant values, and SQL
    * NULL vs variant JSON-null survives — to_json maps them to NULL
    * vs "null"). A variant NESTED inside a struct/array/map has no
    * column-level inverse here and refuses loudly rather than
    * returning a silently re-typed frame. */
  private[lake] def exceptAllVariantSafe(a: DataFrame,
      b: DataFrame): DataFrame = {
    val sch = a.schema
    val vf = sch.fields.filter(f => containsVariant(f.dataType))
    if (vf.isEmpty) return a.exceptAll(b)
    vf.foreach(f => require(f.dataType == VariantType,
      s"column ${f.name}: a variant nested inside " +
        s"${f.dataType.simpleString} cannot ride a set-difference " +
        "(no lossless restore) — restructure the column or use a " +
        "row-lineage table, whose change classification never " +
        "set-differences full rows"))
    def j(df: DataFrame) = df.select(sch.fields.map(f =>
      if (f.dataType == VariantType) to_json(col(f.name)).as(f.name)
      else col(f.name)).toIndexedSeq: _*)
    j(a).exceptAll(j(b)).select(sch.fields.map(f =>
      if (f.dataType == VariantType) parse_json(col(f.name)).as(f.name)
      else col(f.name)).toIndexedSeq: _*)
  }

  /** Partition-spec validation shared by create and evolve:
    * entries are identity column names or transform specs
    * ("bucket(8, key)", "day(ts)", … — see [[PartitionSpec]]). */
  private[lake] def validateSpec(schema: StructType,
      partitionBy: Seq[String]): Unit =
    PartitionSpec.parseAll(partitionBy).foreach { f =>
      require(schema.fieldNames.contains(f.source),
        s"partition source column ${f.source} not in schema")
      require(f.validFor(schema(f.source).dataType),
        s"partition transform '${f.spec}' not applicable to " +
          s"${schema(f.source).dataType.simpleString} ${f.source}")
      require(f.isIdentity || !schema.fieldNames.contains(f.dirName),
        s"derived partition name ${f.dirName} collides with a column")
    }

  def exists(spark: SparkSession, root: String): Boolean =
    // resolved through the session's pointer store: a generation-store
    // table has no literal HEAD file, only HEAD.gen-<n> entries
    new LakeTable(spark, root).currentSnapshotId.isDefined

  /** DDL create with an explicit schema (≡ reference K5,
    * scripts/bronze-silver.py:171-207): commits an empty `create`
    * snapshot v1 carrying schema + partition spec + properties. */
  def create(spark: SparkSession, root: String, schema: StructType,
      partitionBy: Seq[String] = Nil,
      properties: Map[String, String] = Map.empty): LakeTable = {
    require(!exists(spark, root), s"table $root already exists")
    validateSpec(schema, partitionBy)
    // the lineage column is engine-assigned; a user column of the same
    // name would duplicate in every lineage projection and COW rewrite
    require(!properties.get(PROP_ROW_LINEAGE).contains("true") ||
        !schema.fieldNames.contains(ROW_ID_COL),
      s"column name $ROW_ID_COL is reserved on a $PROP_ROW_LINEAGE=true " +
        "table (engine-assigned row lineage)")
    val t = new LakeTable(spark, root)
    val fs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(root, METADATA_DIR))
    fs.mkdirs(new Path(root, DATA_DIR))
    val snap = Snapshot(1L, None, System.currentTimeMillis(), "create",
      Nil, Nil, Nil, schema.json, partitionBy, properties)
    writeStringExclusive(fs, new Path(root, s"$METADATA_DIR/v1.json"),
      ManifestIO.listToJson(snap))
    t.writeHead(1L)
    t
  }

  def load(spark: SparkSession, root: String): LakeTable = {
    require(exists(spark, root), s"no lake table at $root")
    new LakeTable(spark, root)
  }

  /** Create-if-absent then overwrite with df's data (≡ reference's
    * first-run `mode("overwrite").saveAsTable`, scripts/raw-bronze.py:183-185). */
  def createOrReplace(spark: SparkSession, root: String, df: DataFrame,
      partitionBy: Seq[String] = Nil,
      properties: Map[String, String] = Map.empty): LakeTable = {
    val t =
      if (exists(spark, root)) load(spark, root)
      else create(spark, root, df.schema, partitionBy, properties)
    t.overwrite(df)
    t
  }

  // ------------------------------------------------------------- fs helpers

  private[graft] def readString(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private[graft] def writeStringExclusive(fs: FileSystem, p: Path,
      s: String): Unit = {
    val out = fs.create(p, false) // overwrite=false → exclusive
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private[lake] def listParquet(fs: FileSystem, dir: Path): Seq[Path] = {
    val it = fs.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        buf += f.getPath
    }
    buf.toSeq
  }

  private[lake] def relativePath(base: Path, child: Path): String = {
    val bs = base.toUri.getPath.stripSuffix("/")
    val cs = child.toUri.getPath
    require(cs.startsWith(bs + "/"), s"$child not under $base")
    cs.substring(bs.length + 1)
  }
}
