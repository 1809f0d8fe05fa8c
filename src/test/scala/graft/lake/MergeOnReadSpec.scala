package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Merge-on-read execution (≡ the write.merge.mode / write.delete.mode =
  * merge-on-read capability the reference configures,
  * scripts/raw-bronze.py:161-172): MERGE/DELETE commit equality-delete
  * files plus the after-image and never rewrite existing data; readers
  * apply the deletes; compaction folds them in. */
class MergeOnReadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val morProps = Map(
    LakeTable.PROP_MERGE_MODE -> "merge-on-read",
    LakeTable.PROP_DELETE_MODE -> "merge-on-read")

  private def morTable(root: String) = {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema,
      properties = morProps)
    t.append(df.repartition(2))
    t
  }

  test("MOR merge: zero rewrite, correct upsert semantics") {
    val t = morTable(TestSpark.tmpDir("mor") + "/t")
    val before = t.currentSnapshot.get.liveFiles.toSet
    t.merge(Seq((10L, "UPD"), (200L, "INS")).toDF("id", "v"), Seq("id"))
    val snap = t.currentSnapshot.get
    assert(snap.removedFiles.isEmpty)
    assert(before.subsetOf(snap.liveFiles.toSet))
    assert(snap.deleteFiles.size >= 1)
    val got = t.scan()
    assert(got.count() == 101)
    assert(got.where($"id" === 10L).select("v").as[String].collect()
      .toSeq == Seq("UPD"))
    assert(got.where($"id" === 200L).count() == 1)
  }

  test("MOR merge equals COW merge row-for-row") {
    val src = Seq((5L, "U5"), (50L, "U50"), (500L, "I500"))
      .toDF("id", "v")
    val mor = morTable(TestSpark.tmpDir("mor-eq") + "/t")
    mor.merge(src, Seq("id"))
    val cowRoot = TestSpark.tmpDir("cow-eq") + "/t"
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val cow = LakeTable.create(spark, cowRoot, df.schema)
    cow.append(df.repartition(2))
    cow.merge(src, Seq("id"))
    assert(mor.scan().orderBy("id").collect().toSeq ==
      cow.scan().orderBy("id").collect().toSeq)
  }

  test("chained MOR merges: later merges supersede earlier after-images") {
    val t = morTable(TestSpark.tmpDir("mor-chain") + "/t")
    t.merge(Seq((1L, "gen1")).toDF("id", "v"), Seq("id"))
    t.merge(Seq((1L, "gen2")).toDF("id", "v"), Seq("id"))
    t.merge(Seq((1L, "gen3")).toDF("id", "v"), Seq("id"))
    val got = t.scan().where($"id" === 1L).select("v").as[String].collect()
    assert(got.toSeq == Seq("gen3"))
    assert(t.scan().count() == 100)
  }

  test("MOR deleteByKeys: no rewrite, keys gone, null keys ignored") {
    val t = morTable(TestSpark.tmpDir("mor-del") + "/t")
    val before = t.currentSnapshot.get.liveFiles.toSet
    t.deleteByKeys(
      Seq(Some(3L), Some(7L), Option.empty[Long]).toDF("id"), Seq("id"))
    val snap = t.currentSnapshot.get
    assert(snap.liveFiles.toSet == before)
    assert(snap.operation == "delete")
    assert(t.scan().count() == 98)
    assert(t.scan().where($"id".isin(3L, 7L)).count() == 0)
  }

  test("compact folds deletes in and clears them") {
    val t = morTable(TestSpark.tmpDir("mor-compact") + "/t")
    t.merge(Seq((10L, "UPD")).toDF("id", "v"), Seq("id"))
    t.deleteByKeys(Seq(20L).toDF("id"), Seq("id"))
    val expected = t.scan().orderBy("id").collect().toSeq
    t.compact()
    val snap = t.currentSnapshot.get
    assert(snap.deleteFiles.isEmpty, "compact must clear delete files")
    assert(t.scan().orderBy("id").collect().toSeq == expected)
    assert(t.scan().count() == 99)
  }

  test("time travel sees the delete state of the target snapshot") {
    val t = morTable(TestSpark.tmpDir("mor-tt") + "/t")
    val sAppend = t.currentSnapshotId.get
    t.merge(Seq((10L, "UPD")).toDF("id", "v"), Seq("id"))
    // before the merge: original value, 100 rows
    val old = t.scanAt(sAppend)
    assert(old.count() == 100)
    assert(old.where($"id" === 10L).select("v").as[String].collect()
      .toSeq == Seq("v10"))
  }

  test("COW update on a table with outstanding MOR deletes does not resurrect") {
    val root = TestSpark.tmpDir("mor-mixed") + "/t"
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    // delete mode MOR, update stays COW
    val t = LakeTable.create(spark, root, df.schema,
      properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    t.append(df.repartition(1))
    t.deleteByKeys(Seq(5L).toDF("id"), Seq("id"))
    assert(t.scan().count() == 49)
    // COW update rewrites the (only) file; the MOR-deleted row must not
    // come back even though the rewritten file has a NEWER sequence
    t.update($"id" === 6L, Map("v" -> lit("SIX")))
    assert(t.scan().count() == 49, "MOR-deleted row resurrected by rewrite")
    assert(t.scan().where($"id" === 5L).count() == 0)
    assert(t.scan().where($"v" === "SIX").count() == 1)
  }

  test("rename of a delete-key column keeps deletes applying") {
    val root = TestSpark.tmpDir("mor-rename") + "/t"
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema, properties = morProps)
    t.append(df)
    t.deleteByKeys(Seq(4L).toDF("id"), Seq("id"))
    t.renameColumn("id", "ident")
    assert(t.scan().count() == 19)
    assert(t.scan().where($"ident" === 4L).count() == 0)
    // and a post-rename MOR merge keyed on the new name works
    t.merge(Seq((4L, "back")).toDF("ident", "v"), Seq("ident"))
    assert(t.scan().where($"ident" === 4L).select("v").as[String]
      .collect().toSeq == Seq("back"))
  }

  test("incremental scan still rejects MOR merge commits in range") {
    val t = morTable(TestSpark.tmpDir("mor-inc") + "/t")
    val s1 = t.currentSnapshotId.get
    val s2 = t.merge(Seq((1L, "x")).toDF("id", "v"), Seq("id"))
    intercept[UnsupportedOperationException](t.incrementalScan(s1, s2))
  }
}
