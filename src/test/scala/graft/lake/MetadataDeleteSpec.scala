package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata-only DELETE (≡ Iceberg's metadata delete): files whose
  * per-file stats PROVE every row matches the predicate drop from the
  * manifest with zero data I/O — the pattern that makes a retention
  * `DELETE WHERE ts < cutoff` free at 100 TB. Null counts ride the
  * stats map as `__nulls__` pseudo-stats; a file that might hold a
  * NULL in the predicate column is never dropped whole (a NULL row
  * fails every comparison and must survive the delete). */
class MetadataDeleteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def threeRangeFiles(root: String) = {
    val t = LakeTable.create(spark, root,
      Seq((1L, "v")).toDF("ts", "v").schema)
    (0 until 3).foreach { b =>
      t.append(((b * 100L + 1) to (b * 100L + 100))
        .map(i => (i, s"r$i")).toDF("ts", "v").coalesce(1))
    }
    t
  }

  test("COW: fully-covered files drop with zero files written") {
    val t = threeRangeFiles(TestSpark.tmpDir("metadel") + "/t")
    val before = t.currentSnapshot.get
    t.delete($"ts" <= 100L) // exactly file 1's range
    val snap = t.currentSnapshot.get
    assert(snap.operation == "delete")
    assert(snap.addedFiles.isEmpty, "metadata delete must write nothing")
    assert(snap.removedFiles.size == 1)
    assert(t.scan().count() == 200)
    assert(t.scan().agg(min($"ts")).as[Long].head() == 101L)
    assert(before.liveFiles.size - snap.liveFiles.size == 1)
  }

  test("COW: straddling predicate drops covered, rewrites the rest") {
    val t = threeRangeFiles(TestSpark.tmpDir("metadel2") + "/t")
    t.delete($"ts" < 150L) // file 1 fully, file 2 partially
    val snap = t.currentSnapshot.get
    assert(snap.removedFiles.size == 2) // covered + rewritten
    assert(snap.addedFiles.size == 1) // file 2's kept half only
    assert(t.scan().count() == 151)
    assert(t.scan().agg(min($"ts")).as[Long].head() == 150L)
  }

  test("nulls block the whole-file proof; null rows survive") {
    val root = TestSpark.tmpDir("metadel-null") + "/t"
    val t = LakeTable.create(spark, root,
      Seq((Option(1L), "v")).toDF("ts", "v").schema)
    t.append(Seq((Option(1L), "a"), (Option(2L), "b"),
      (Option.empty[Long], "nullrow")).toDF("ts", "v").coalesce(1))
    t.delete($"ts" <= 2L) // bounds [1,2] fully covered — but a null rides
    val snap = t.currentSnapshot.get
    assert(snap.addedFiles.size == 1, "null row forces a rewrite")
    assert(t.scan().select("v").as[String].collect().toSeq ==
      Seq("nullrow"))
  }

  test("IS NULL delete: all-null file drops metadata-only, zero-null file untouched") {
    val root = TestSpark.tmpDir("metadel-isnull") + "/t"
    val t = LakeTable.create(spark, root,
      Seq((Option(1L), "v")).toDF("ts", "v").schema)
    t.append(Seq((Option(1L), "a"), (Option(2L), "b"))
      .toDF("ts", "v").coalesce(1))
    t.append(Seq((Option.empty[Long], "n1"), (Option.empty[Long], "n2"))
      .toDF("ts", "v").coalesce(1))
    t.delete($"ts".isNull)
    val snap = t.currentSnapshot.get
    assert(snap.addedFiles.isEmpty, "all-null file should drop whole")
    assert(snap.removedFiles.size == 1)
    assert(t.scan().select("v").as[String].collect().toSet ==
      Set("a", "b"))
  }

  test("MOR: covered file leaves the manifest, no delete artifact") {
    val root = TestSpark.tmpDir("metadel-mor") + "/t"
    val t = LakeTable.create(spark, root,
      Seq((1L, "v")).toDF("ts", "v").schema,
      properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    (0 until 2).foreach { b =>
      t.append(((b * 100L + 1) to (b * 100L + 100))
        .map(i => (i, s"r$i")).toDF("ts", "v").coalesce(1))
    }
    t.delete($"ts" <= 100L)
    val snap = t.currentSnapshot.get
    assert(snap.posDeleteFiles.isEmpty,
      "fully-covered MOR delete needs no position-delete artifact")
    assert(snap.removedFiles.size == 1)
    assert(t.scan().count() == 100)
    // straddling the remaining file: position deletes, no file drop
    t.delete($"ts" <= 150L)
    val snap2 = t.currentSnapshot.get
    assert(snap2.removedFiles.isEmpty)
    assert(snap2.posDeleteFiles.size == 1)
    assert(t.scan().count() == 50) // rows 151..200 survive
  }

  test("TRUNCATE TABLE: pure metadata commit, time travel preserved") {
    val base = TestSpark.tmpDir("metadel-trunc")
    val cat = new LakeCatalog(spark, base)
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t = cat.createTable("ns", "tt", df.schema)
    t.append(df.coalesce(1))
    val preTruncate = t.currentSnapshotId.get
    cat.sql("ns", "TRUNCATE TABLE tt")
    val snap = t.currentSnapshot.get
    assert(snap.operation == "delete")
    assert(snap.addedFiles.isEmpty, "truncate must write nothing")
    assert(snap.removedFiles.size == 1)
    assert(t.scan().count() == 0)
    // nothing was deleted from disk — history replays
    assert(t.scanAt(preTruncate).count() == 2)
  }

  test("identity-partitioned: dropping a whole partition is metadata-only") {
    val root = TestSpark.tmpDir("metadel-part") + "/t"
    val df = Seq((1L, "a", "x"), (2L, "a", "y"), (3L, "b", "z"))
      .toDF("id", "p", "v")
    val t = LakeTable.create(spark, root, df.schema, Seq("p"))
    t.append(df)
    t.delete($"p" === "a")
    val snap = t.currentSnapshot.get
    assert(snap.addedFiles.isEmpty,
      "partition-drop delete must be metadata-only")
    assert(t.scan().select("v").as[String].collect().toSeq == Seq("z"))
  }
}
