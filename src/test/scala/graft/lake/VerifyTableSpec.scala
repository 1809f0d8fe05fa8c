package graft.lake

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** verifyTable: the lake fsck — metadata-level existence/size probes,
  * deep per-file row recount, corruption actually detected. */
class VerifyTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(tag: String) = {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir(tag) + "/t",
      df.schema)
    t.append(df.where($"id" <= 50))
    t.append(df.where($"id" > 50))
    t
  }

  private def checks(t: LakeTable, deep: Boolean) =
    t.verifyTable(deep).collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getString(2)))
      .toMap

  test("a healthy table passes every check, shallow and deep") {
    val t = fresh("vt-ok")
    val shallow = checks(t, deep = false)
    assert(shallow.keySet ==
      Set("files_exist", "file_sizes", "delete_files_exist"))
    assert(shallow.values.forall(_._1), shallow.toString)
    val deep = checks(t, deep = true)
    assert(deep("row_counts")._1, deep.toString)
    assert(deep("row_counts")._2.contains("100 rows"))
  }

  test("a deleted data file fails files_exist") {
    val t = fresh("vt-gone")
    val fs = new Path(t.root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val victim = t.currentSnapshot.get.liveFiles.head
    fs.delete(new Path(new Path(t.root), victim), false)
    val got = checks(t, deep = true)
    assert(!got("files_exist")._1)
    assert(got("files_exist")._2.contains("missing"))
    // the surviving files still recount clean
    assert(got("row_counts")._1, got.toString)
  }

  test("MOR delete artifacts are audited; a missing one is detected") {
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("vt-mor") + "/t",
      df.schema, properties = Map(
        LakeTable.PROP_MERGE_MODE -> "merge-on-read",
        LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    t.append(df)
    t.merge(Seq((1L, "V1"), (2L, "V2")).toDF("id", "v"), Seq("id"))
    val snap = t.currentSnapshot.get
    assert(snap.deleteFiles.nonEmpty, "expected an equality-delete file")
    val ok = checks(t, deep = true)
    assert(ok.values.forall(_._1), ok.toString)
    assert(ok("delete_files_exist")._2.contains(
      s"${snap.deleteFiles.size + snap.posDeleteFiles.size} artifacts"))
    // remove a delete artifact: the audit must flag it
    val fs = new Path(t.root).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.delete(new Path(new Path(t.root), snap.deleteFiles.head.path),
      false)
    val bad = checks(t, deep = false)
    assert(!bad("delete_files_exist")._1, bad.toString)
    assert(bad("files_exist")._1) // data files themselves intact
  }

  test("a truncated file fails file_sizes; CALL surface works") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("vt-sql"))
    cat.createNamespace("ns")
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    val t = cat.loadTable("ns", "t")
    t.append(df)
    val fs = new Path(t.root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val victim = new Path(new Path(t.root),
      t.currentSnapshot.get.liveFiles.head)
    // overwrite with garbage of a different length
    val out = fs.create(victim, true)
    out.write("not parquet".getBytes); out.close()
    val got = cat.sql("ns", "CALL system.verify_table('t')")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("files_exist")) // still present
    assert(!got("file_sizes")) // but the wrong bytes
  }

  test("deep stats audit catches an in-place swap the other probes miss") {
    // the nastiest corruption mode: a live file REPLACED by another
    // valid parquet file with the SAME byte length and SAME row count
    // but different values — existence, size, and recount all pass;
    // only the footer-bounds audit sees the manifest's stats are stale
    val df = (1L to 100L).map(i => (i, i * 10L)).toDF("id", "x")
    val t = LakeTable.create(spark, TestSpark.tmpDir("vt-swap") + "/t",
      df.schema)
    t.append(df.where($"id" <= 50).coalesce(1))
    // a decoy table whose single file has the same schema and row
    // count but a shifted value range
    val decoy = LakeTable.create(spark,
      TestSpark.tmpDir("vt-swap-decoy") + "/t", df.schema)
    decoy.append(df.where($"id" > 50).coalesce(1))
    val fs = new Path(t.root).getFileSystem(
      spark.sessionState.newHadoopConf())
    val victim = new Path(new Path(t.root),
      t.currentSnapshot.get.liveFiles.head)
    val donor = new Path(new Path(decoy.root),
      decoy.currentSnapshot.get.liveFiles.head)
    val in = fs.open(donor)
    val bytes = new Array[Byte](fs.getFileStatus(donor).getLen.toInt)
    in.readFully(bytes); in.close()
    val out = fs.create(victim, true)
    out.write(bytes); out.close()
    val got = checks(t, deep = true)
    assert(got("files_exist")._1)
    assert(got("row_counts")._1, got.toString) // same 50 rows — passes
    assert(!got("file_stats")._1, got.toString) // bounds don't match
    assert(got("file_stats")._2.contains("stale stats"))
  }

  test("deep stats audit passes a healthy evolved table") {
    // renamed columns and added columns must not false-positive: the
    // audit skips renamed-era files and compares only shared keys
    val df = (1L to 40L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("vt-audit-ok") + "/t",
      df.schema)
    t.append(df)
    t.renameColumn("v", "w")
    t.append((41L to 60L).map(i => (i, s"v$i")).toDF("id", "w"))
    t.addColumn("z", org.apache.spark.sql.types.LongType)
    t.append((61L to 70L).map(i => (i, s"v$i", i * 2))
      .toDF("id", "w", "z"))
    val got = checks(t, deep = true)
    assert(got("file_stats")._1, got.toString)
    assert(got("row_counts")._1, got.toString)
  }
}
