package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Staging branches (the audit-branch workflow): appendToBranch parks
  * ordered changesets invisibly, scanBranch previews the post-publish
  * table, fastForwardBranch publishes the whole series as ONE atomic
  * commit, discardBranch drops it all. */
class BranchStagingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(root: String) = {
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema)
    t.append(df)
    t
  }

  test("branch accumulates ordered changesets invisible to readers") {
    val t = freshTable(TestSpark.tmpDir("brs") + "/t")
    val id1 = t.appendToBranch("audit",
      (51L to 60L).map(i => (i, s"v$i")).toDF("id", "v"))
    val id2 = t.appendToBranch("audit",
      (61L to 70L).map(i => (i, s"v$i")).toDF("id", "v"))
    assert(Seq(id1, id2) == Seq("b.audit.000001", "b.audit.000002"))
    assert(t.branchChangesets("audit") == Seq(id1, id2))
    assert(t.scan().count() == 50)          // main readers see nothing
    assert(t.scanBranch("audit").count() == 70) // preview sees all
    // a second branch is independent
    t.appendToBranch("other", Seq((999L, "x")).toDF("id", "v"))
    assert(t.branchChangesets("audit").size == 2)
    assert(t.scanBranch("other").count() == 51)
  }

  test("fast-forward publishes the whole branch as ONE commit") {
    val t = freshTable(TestSpark.tmpDir("brs-ff") + "/t")
    t.appendToBranch("audit",
      (51L to 60L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.appendToBranch("audit",
      (61L to 70L).map(i => (i, s"v$i")).toDF("id", "v"))
    val histBefore = t.history.count()
    val filesBefore = t.currentSnapshot.get.liveFiles.toSet
    t.fastForwardBranch("audit")
    assert(t.scan().count() == 70)
    assert(t.history.count() == histBefore + 1) // ONE commit for both
    val snap = t.currentSnapshot.get
    assert(snap.operation == "append")
    assert(filesBefore.subsetOf(snap.liveFiles.toSet)) // zero rewrite
    assert(t.branchChangesets("audit").isEmpty)  // branch cleared
    // stats survived the branch round-trip: pruning skips base files
    val pruned = t.pruneByPredicate(snap, col("id") >= 65)
    assert(pruned.toSet.subsetOf(snap.liveFiles.toSet -- filesBefore))
    // empty branch refuses a second fast-forward
    intercept[IllegalArgumentException](t.fastForwardBranch("audit"))
  }

  test("discard drops parked files; schema drift refuses publish") {
    val t = freshTable(TestSpark.tmpDir("brs-dis") + "/t")
    t.appendToBranch("audit", Seq((51L, "v51")).toDF("id", "v"))
    t.discardBranch("audit")
    assert(t.branchChangesets("audit").isEmpty)
    assert(t.scan().count() == 50)

    t.appendToBranch("audit", Seq((52L, "v52")).toDF("id", "v"))
    t.addColumn("extra", org.apache.spark.sql.types.StringType)
    intercept[IllegalArgumentException](t.fastForwardBranch("audit"))
    t.discardBranch("audit") // discard still works after drift
    assert(t.branchChangesets("audit").isEmpty)
  }

  test("SQL surface: CALL system.fast_forward / discard_branch") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("brs-sql"))
    cat.createNamespace("ns")
    val df = (1L to 10L).map(i => (i, i * 2)).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(df)
    lt.appendToBranch("audit", Seq((11L, 22L)).toDF("id", "v"))
    lt.appendToBranch("trash", Seq((99L, 0L)).toDF("id", "v"))
    val snap = cat.sql("ns", "CALL system.fast_forward('t', 'audit')")
      .head().getLong(0)
    assert(snap == lt.currentSnapshot.get.snapshotId)
    cat.sql("ns", "CALL system.discard_branch('t', 'trash')")
    assert(lt.branchChangesets("trash").isEmpty)
    assert(cat.sql("ns", "SELECT count(*) AS n FROM t").head().getLong(0) == 11)
  }
}
