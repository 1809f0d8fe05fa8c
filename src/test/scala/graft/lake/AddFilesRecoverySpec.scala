package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `addFiles` crash safety and per-file validation: the import moves
  * files by RENAME, so a crash anywhere leaves each file at exactly one
  * of (source, dest) — recovery via `publish_staged` must complete the
  * move before committing (a manifest must never reference a ghost
  * path) and `discard_staged` must move files BACK (deleting the dest
  * would destroy the only copy). Plus the per-footer column gate:
  * merged schema inference cannot see a single file that merely LACKS
  * a table column. */
class AddFilesRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private case class Fixture(cat: LakeCatalog, lt: LakeTable, ext: String)

  /** Table with 50 committed rows + 3 external files (ids 51..100). */
  private def fixture(tag: String): Fixture = {
    val wh = TestSpark.tmpDir(s"addrec-$tag")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("ns")
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(df.where($"id" <= 50))
    val ext = TestSpark.tmpDir(s"addrec-$tag-ext")
    df.where($"id" > 50).repartition(3).write
      .mode("overwrite").parquet(ext)
    Fixture(cat, lt, ext)
  }

  /** Abort addFiles between its renames and its commit (the crash
    * window recovery exists for); returns the orphaned import id. */
  private def crashImport(f: Fixture): String = {
    f.lt.beforeCommitHook =
      () => throw new RuntimeException("boom-before-commit")
    try intercept[RuntimeException](f.lt.addFiles(f.ext))
    finally f.lt.beforeCommitHook = () => ()
    val ids = f.lt.stagedIds.filter(_.startsWith("import-"))
    assert(ids.size == 1, s"expected one orphaned import, got $ids")
    // crash state: files moved, marker parked, nothing committed
    assert(LakeTable.listParquet(fs(f.ext), new Path(f.ext)).isEmpty)
    assert(f.lt.scan().count() == 50)
    ids.head
  }

  test("per-file footer gate: a file lacking a table column is refused") {
    val wh = TestSpark.tmpDir("addrec-hetero")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("ns")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    val lt = cat.loadTable("ns", "t")
    val ext = TestSpark.tmpDir("addrec-hetero-ext")
    // one COMPLETE file and one file missing `v`: merged inference
    // unions to (id, v), so only the per-footer check can catch the
    // incomplete file (whose rows would read back as silent NULLs)
    df.coalesce(1).write.parquet(s"$ext/full")
    Seq(Tuple1(9L)).toDF("id").coalesce(1).write.parquet(s"$ext/partial")
    val e = intercept[IllegalArgumentException](lt.addFiles(ext))
    assert(e.getMessage.contains("lacks v"), e.getMessage)
    // atomic refusal: no commit, both source files untouched
    assert(lt.scan().count() == 0)
    assert(LakeTable.listParquet(fs(ext), new Path(ext)).size == 2)
    assert(lt.stagedIds.isEmpty)
  }

  test("per-file footer gate: a file with an EXTRA column is refused") {
    val wh = TestSpark.tmpDir("addrec-extra")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("ns")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    val lt = cat.loadTable("ns", "t")
    val ext = TestSpark.tmpDir("addrec-extra-ext")
    // a file carrying a column the table lacks: scans project the
    // table schema, so the extra column would silently vanish —
    // import must refuse, not swallow
    df.withColumn("extra", lit(7)).coalesce(1).write
      .mode("overwrite").parquet(ext)
    val e = intercept[IllegalArgumentException](lt.addFiles(ext))
    assert(e.getMessage.contains("carries extra"), e.getMessage)
    assert(lt.scan().count() == 0)
    assert(lt.stagedIds.isEmpty)
  }

  test("crash before commit: publish_staged completes the import") {
    val f = fixture("pub")
    val id = crashImport(f)
    f.lt.publishStaged(id)
    assert(f.lt.stagedIds.isEmpty)
    assert(f.lt.scan().count() == 100)
    assert(f.lt.scan().agg(sum($"id")).head().getLong(0) == 5050L)
  }

  test("crash before commit: discard_staged moves files BACK to source") {
    val f = fixture("disc")
    val id = crashImport(f)
    f.lt.discardStaged(id)
    assert(f.lt.stagedIds.isEmpty)
    assert(f.lt.scan().count() == 50) // table unchanged
    // the only copies are back where they came from…
    assert(LakeTable.listParquet(fs(f.ext), new Path(f.ext)).size == 3)
    // …and re-importing them round-trips cleanly
    val (_, n) = f.lt.addFiles(f.ext)
    assert(n == 3)
    assert(f.lt.scan().agg(sum($"id")).head().getLong(0) == 5050L)
  }

  test("crash mid-rename: publish completes outstanding renames") {
    val f = fixture("mid")
    val id = crashImport(f)
    // roll ONE dest file back to its source path to simulate a crash
    // midway through the rename loop (dest name is part-<i>-<orig>)
    val hfs = fs(f.lt.root)
    val dest = LakeTable
      .listParquet(hfs, new Path(f.lt.root, "data"))
      .filter(_.toString.contains("/import-")).head
    val orig = dest.getName.replaceFirst("^part-\\d+-", "")
    assert(hfs.rename(dest, new Path(f.ext, orig)))
    f.lt.publishStaged(id)
    assert(f.lt.scan().count() == 100)
    assert(f.lt.scan().agg(sum($"id")).head().getLong(0) == 5050L)
    assert(LakeTable.listParquet(fs(f.ext), new Path(f.ext)).isEmpty)
  }

  test("crash after commit: leftover marker never double-publishes") {
    val f = fixture("post")
    val id = crashImport(f)
    // keep a copy of the marker, publish, then restore the copy —
    // the exact state of a crash between commit and marker cleanup
    val hfs = fs(f.lt.root)
    val marker = new Path(f.lt.root, s"metadata/staged/$id.json")
    val body = LakeTable.readString(hfs, marker)
    val snap = f.lt.publishStaged(id)
    assert(f.lt.scan().count() == 100)
    LakeTable.writeStringExclusive(hfs, marker, body)
    // publish: detects every entry already live → clears marker only
    assert(f.lt.publishStaged(id) == snap)
    assert(f.lt.currentSnapshotId.contains(snap)) // no second commit
    assert(f.lt.scan().count() == 100)
    assert(f.lt.stagedIds.isEmpty)
    // discard on a committed import likewise only clears the marker
    LakeTable.writeStringExclusive(hfs, marker, body)
    f.lt.discardStaged(id)
    assert(f.lt.scan().count() == 100)
    assert(f.lt.stagedIds.isEmpty)
  }

  test("expiry clears a stale marker of a COMMITTED import before " +
      "destroying its history evidence — no later double-add") {
    val f = fixture("expire")
    val id = crashImport(f)
    val hfs = fs(f.lt.root)
    val marker = new Path(f.lt.root, s"metadata/staged/$id.json")
    val body = LakeTable.readString(hfs, marker)
    f.lt.publishStaged(id)
    assert(f.lt.scan().count() == 100)
    // rewrite the imported rows out of the live set, then restore the
    // stale marker and expire everything but HEAD: once the import
    // snapshot is expired, historyPaths loses the committed-ness
    // evidence — so expiry itself must clear the marker first
    f.lt.delete($"id" > 50)
    LakeTable.writeStringExclusive(hfs, marker, body)
    f.lt.expireSnapshots(keepLast = 1)
    assert(f.lt.stagedIds.isEmpty,
      "expiry must clear the committed import's stale marker")
    assert(f.lt.scan().count() == 50)
    // and had the marker somehow survived, publish now refuses (gone)
    intercept[IllegalArgumentException](f.lt.publishStaged(id))
    assert(f.lt.scan().count() == 50)
  }

  test("expiry leaves a FRESH-crash marker (never committed) alone — " +
      "its automatic recovery still works afterwards") {
    val f = fixture("expire-fresh")
    val id = crashImport(f)
    // unrelated churn + expiry while the uncommitted marker lingers
    f.lt.append(Seq((101L, "v101")).toDF("id", "v"))
    f.lt.expireSnapshots(keepLast = 1)
    assert(f.lt.stagedIds == Seq(id),
      "an uncommitted import marker must survive expiry")
    f.lt.publishStaged(id)
    assert(f.lt.scan().count() == 101)
    assert(f.lt.scan().agg(sum($"id")).head().getLong(0) == 5050L + 101L)
  }

  test("marker outliving a COW rewrite: recovery consults history, " +
      "not the live set") {
    val f = fixture("rewrite")
    val id = crashImport(f)
    val hfs = fs(f.lt.root)
    val marker = new Path(f.lt.root, s"metadata/staged/$id.json")
    val body = LakeTable.readString(hfs, marker)
    val importSnap = f.lt.publishStaged(id)
    // a later COW delete rewrites/removes imported entries from the
    // LIVE set while their files still exist on disk (no expiry yet) —
    // the exact state where a live-set committed-ness test lies
    f.lt.delete($"id" > 90)
    val head = f.lt.currentSnapshotId.get
    assert(f.lt.scan().count() == 90)
    // publish with the stale marker restored: every entry is in
    // retained HISTORY → clear the marker, never re-commit (the old
    // live-set test would have re-added all 3 files: +10 resurrected
    // rows and 40 duplicated ones)
    LakeTable.writeStringExclusive(hfs, marker, body)
    f.lt.publishStaged(id)
    assert(f.lt.currentSnapshotId.contains(head)) // no new commit
    assert(f.lt.scan().count() == 90)
    assert(f.lt.stagedIds.isEmpty)
    // discard with the stale marker restored: files are referenced by
    // retained snapshots → clear the marker only; time travel to the
    // import snapshot must keep reading all 100 rows
    LakeTable.writeStringExclusive(hfs, marker, body)
    f.lt.discardStaged(id)
    assert(f.lt.stagedIds.isEmpty)
    assert(f.lt.scan().count() == 90)
    assert(f.lt.scanAt(importSnap).count() == 100)
  }
}
