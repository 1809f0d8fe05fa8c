package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata-only COUNT(*): with a fully-informed manifest and no
  * outstanding deletes the count is driver arithmetic over manifest
  * record counts — zero data I/O; any delete state falls back to the
  * scan count and stays exact. */
class CountRowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("count comes from the manifest and matches the scan") {
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("cnt") + "/t",
      df.schema)
    t.append(df.repartition(3))
    t.append(df.where($"id" <= 10).repartition(2))
    // manifest carries row counts for every live file -> metadata path
    val snap = t.currentSnapshot.get
    assert(snap.liveFiles.forall(snap.fileInfo.contains))
    assert(t.countRows() == 510L)
    assert(t.countRows() == t.scan().count())
  }

  test("outstanding MOR deletes fall back to an exact scan count") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("cnt-mor") + "/t",
      df.schema, properties = Map(
        LakeTable.PROP_MERGE_MODE -> "merge-on-read",
        LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    t.append(df)
    t.deleteByKeys(Seq(1L, 2L, 3L).toDF("id"), Seq("id"))
    assert(t.currentSnapshot.get.deleteFiles.nonEmpty)
    assert(t.countRows() == 97L)
    // compaction folds the deletes in -> metadata path again
    t.compact()
    val snap = t.currentSnapshot.get
    assert(snap.deleteFiles.isEmpty)
    assert(t.countRows() == 97L)
  }

  test("COW delete keeps the metadata path (no delete files)") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("cnt-cow") + "/t",
      df.schema)
    t.append(df)
    t.delete(col("id") > 90)
    val snap = t.currentSnapshot.get
    assert(snap.deleteFiles.isEmpty && snap.posDeleteFiles.isEmpty)
    assert(t.countRows() == 90L)
  }
}
