package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Concurrent-writer conflict semantics for COPY-ON-WRITE rewrites
  * (merge/delete/update): the loser of a commit race must either fail
  * cleanly (default `commit.conflict-mode=fail`) or recompute against
  * the winner's HEAD (`recompute` — a serial re-execution), and in
  * NEITHER mode may the winner's effect be silently dropped. The
  * deterministic interleave uses the beforeCommitHook seam, which
  * fires between an op's artifact write and each commit attempt.
  * Cross-process twins of these cases: [[CrossProcessConflictSpec]]. */
class ConflictRetrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(tag: String,
      recompute: Boolean): (String, LakeTable, LakeTable) = {
    val root = TestSpark.tmpDir(tag) + "/t"
    val df = spark.range(1, 101).select(
      col("id"), lit("base").as("v"))
    val t = LakeTable.create(spark, root, df.schema)
    if (recompute) t.setProperties(
      Map(LakeTable.PROP_CONFLICT_MODE -> "recompute"))
    t.append(df)
    (root, LakeTable.load(spark, root), LakeTable.load(spark, root))
  }

  test("default mode: COW merge losing to an overlapping delete fails " +
      "cleanly; winner's effect intact") {
    val (root, t1, t2) = freshTable("conflict-fail", recompute = false)
    val src = spark.range(1, 11).select(col("id"), lit("A").as("v"))
    var fired = false
    t1.beforeCommitHook = () => if (!fired) {
      fired = true
      t2.delete(col("id") <= 5L)
    }
    try {
      intercept[java.util.ConcurrentModificationException] {
        t1.merge(src, Seq("id"))
      }
    } finally t1.beforeCommitHook = () => ()
    assert(fired)
    // ONLY the delete applied: 95 rows, none of the merge's values
    val t = LakeTable.load(spark, root)
    assert(t.scan().count() == 95)
    assert(t.scan().where(col("v") === "A").count() == 0)
  }

  test("recompute mode: overlapping merge-vs-delete serializes " +
      "(loser re-executes after the winner)") {
    val (root, t1, t2) = freshTable("conflict-recompute",
      recompute = true)
    val src = spark.range(1, 11).select(col("id"), lit("A").as("v"))
    var fired = false
    t1.beforeCommitHook = () => if (!fired) {
      fired = true
      t2.delete(col("id") <= 5L)
    }
    try t1.merge(src, Seq("id"))
    finally t1.beforeCommitHook = () => ()
    assert(fired)
    // serial order is delete THEN merge: the merge re-upserts 1..10,
    // so all 100 ids exist and 1..10 carry the merge's value
    val t = LakeTable.load(spark, root)
    assert(t.scan().count() == 100)
    assert(t.scan().where(col("v") === "A").count() == 10)
  }

  test("recompute mode: non-overlapping rewrites both land") {
    val (root, t1, t2) = freshTable("conflict-disjoint",
      recompute = true)
    val src = spark.range(1, 11).select(col("id"), lit("A").as("v"))
    var fired = false
    t1.beforeCommitHook = () => if (!fired) {
      fired = true
      t2.update(col("id") >= 51L && col("id") <= 60L,
        Map("v" -> lit("B")))
    }
    try t1.merge(src, Seq("id"))
    finally t1.beforeCommitHook = () => ()
    assert(fired)
    val t = LakeTable.load(spark, root)
    assert(t.scan().count() == 100)
    assert(t.scan().where(col("v") === "A").count() == 10)
    assert(t.scan().where(col("v") === "B").count() == 10)
  }

  test("recompute mode: MOR positional delete racing a compact " +
      "re-captures ordinals on the compacted head") {
    // fail-mode twin lives in MergeOnReadSpec (retry refused because
    // captured row ordinals are invalid after re-homing); recompute
    // re-runs the locating scan against the compacted files
    val root = TestSpark.tmpDir("conflict-mor-compact") + "/t"
    val df = spark.range(1, 101).select(col("id"), lit("x").as("v"))
    val t = LakeTable.create(spark, root, df.schema)
    t.setProperties(Map(
      LakeTable.PROP_DELETE_MODE -> "merge-on-read",
      LakeTable.PROP_CONFLICT_MODE -> "recompute"))
    t.append(df.where(col("id") <= 50L))
    t.append(df.where(col("id") > 50L))
    val t1 = LakeTable.load(spark, root)
    val t2 = LakeTable.load(spark, root)
    var fired = false
    t1.beforeCommitHook = () => if (!fired) {
      fired = true
      t2.compact()
    }
    try t1.delete(col("id") <= 5L)
    finally t1.beforeCommitHook = () => ()
    assert(fired)
    val after = LakeTable.load(spark, root)
    assert(after.scan().count() == 95)
    assert(after.scan().agg(min("id")).as[Long].head() == 6L)
  }

  test("recompute re-checks idempotence watermarks (no double-apply)") {
    // the racing commit IS this op's own zombie replay: recompute must
    // skip on the watermark, not re-insert
    val (root, t1, t2) = freshTable("conflict-replay", recompute = true)
    val src = Seq((200L, "dup")).toDF("id", "v")
    val nm = Seq(MergeWhen(None,
      Some(Map("id" -> col("s.id"), "v" -> col("s.v")))))
    var fired = false
    t1.beforeCommitHook = () => if (!fired) {
      fired = true
      t2.mergeClauses(src, Seq("id"), matched = Nil, notMatched = nm,
        txn = Some(("rep", 3L)))
    }
    try t1.mergeClauses(src, Seq("id"), matched = Nil, notMatched = nm,
      txn = Some(("rep", 3L)))
    finally t1.beforeCommitHook = () => ()
    val t = LakeTable.load(spark, root)
    assert(t.scan().where(col("id") === 200L).count() == 1)
  }
}
