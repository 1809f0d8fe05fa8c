package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Deletion vectors (≡ Iceberg v3 DVs / Delta deletion vectors):
  * [[LakeTable.consolidateDeleteVectors]] folds the position-delete
  * files a MOR table accumulates into ONE parquet artifact holding a
  * packed ordinal bitset per targeted data file. The properties under
  * test: content is identical through any consolidate point, read
  * amplification collapses from one artifact + anti-join keys per
  * delete commit to one broadcast bitmap row per file, later deletes
  * compose, and every maintenance path (compact, expiry, orphan GC,
  * verify, rollback) accounts for the artifact. */
class DeleteVectorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val morProps = Map(
    LakeTable.PROP_DELETE_MODE -> "merge-on-read")

  /** MOR table of 1..1000 across 4 files, with `n` single-key
    * predicate-delete commits (ids 1..n) — n position-delete files. */
  private def deleteHeavy(tag: String, n: Int): LakeTable = {
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir(tag) + "/t",
      df.schema, properties = morProps)
    t.append(df.repartition(4))
    (1 to n).foreach(i => t.delete($"id" === i.toLong))
    t
  }

  test("consolidation folds N position-delete files into one vector, " +
      "content identical, read plan loses the anti-join") {
    val t = deleteHeavy("dv-fold", 12)
    val before = t.currentSnapshot.get
    assert(before.posDeleteFiles.size >= 12,
      "at least one artifact per delete commit")
    assert(before.dvFiles.isEmpty)
    val planBefore = t.scan().queryExecution.executedPlan.toString
    assert(planBefore.contains("LeftAnti"),
      "pre-DV read applies position deletes as an anti-join")
    val expect = t.scan().orderBy("id").collect().toSeq

    t.consolidateDeleteVectors()
    val after = t.currentSnapshot.get
    assert(after.posDeleteFiles.isEmpty, "all folded")
    assert(after.dvFiles.size == 1, "exactly one vector artifact")
    assert(t.scan().orderBy("id").collect().toSeq == expect)
    assert(t.scan().count() == 988)
    // read amplification: the pairs anti-join is gone; the vector is
    // ONE broadcast per-file bitmap lookup (left outer + bit test)
    val planAfter = t.scan().queryExecution.executedPlan.toString
    assert(!planAfter.contains("LeftAnti"),
      s"DV read must not anti-join:\n$planAfter")
    assert(planAfter.contains("BroadcastHashJoin") ||
      planAfter.contains("BroadcastNestedLoopJoin"),
      "DV applies via a broadcast join")
    // the artifact is one row per touched data file, not per deleted row
    val dvPath = new org.apache.hadoop.fs.Path(t.root,
      after.dvFiles.head.path).toString
    val dv = spark.read.parquet(dvPath)
    assert(dv.count() <= 4, "at most one bitmap row per data file")
    assert(dv.agg(sum("n_deleted")).head.getLong(0) == 12L)
  }

  test("consolidation is content-neutral to the changelog and " +
      "composes with later deletes + a second consolidation") {
    val t = deleteHeavy("dv-compose", 5)
    val pre = t.currentSnapshotId.get
    t.consolidateDeleteVectors()
    val mid = t.currentSnapshotId.get
    // zero change rows across the consolidate commit
    assert(t.changes(pre, mid).count() == 0)
    // new deletes land as position files on top of the vector
    t.delete($"id" >= 990L)
    val s = t.currentSnapshot.get
    assert(s.dvFiles.size == 1 && s.posDeleteFiles.nonEmpty)
    assert(t.scan().count() == 1000 - 5 - 11)
    assert(t.scan().where($"id" <= 5 || $"id" >= 990).count() == 0)
    // second consolidation folds vector + new positions into one
    t.consolidateDeleteVectors()
    val s2 = t.currentSnapshot.get
    assert(s2.dvFiles.size == 1 && s2.posDeleteFiles.isEmpty)
    assert(t.scan().count() == 984)
    val dv = spark.read.parquet(new org.apache.hadoop.fs.Path(t.root,
      s2.dvFiles.head.path).toString)
    assert(dv.agg(sum("n_deleted")).head.getLong(0) == 16L)
  }

  test("a no-op when already consolidated; time travel reads the " +
      "pre-DV snapshot through its original position files") {
    val t = deleteHeavy("dv-noop", 3)
    val preDv = t.currentSnapshotId.get
    val snap1 = t.consolidateDeleteVectors()
    assert(t.consolidateDeleteVectors() == snap1, "no-op re-run")
    assert(t.scanAt(preDv).count() == 997)
    assert(t.scanAt(preDv - 1).count() == 998)
  }

  test("countRows is honest under a vector; verify/orphan GC account " +
      "for the artifact; compaction clears it") {
    val t = deleteHeavy("dv-maint", 4)
    t.consolidateDeleteVectors()
    assert(t.countRows() == 996) // must NOT answer from manifest rows
    val verify = t.verifyTable().collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(verify("delete_files_exist"))
    // the live vector is referenced — orphan GC must not touch it
    val removed = t.removeOrphanFiles(olderThanMs = -60000L)
    assert(removed.forall(p => !p.contains("/dv-")), s"GC ate a DV: $removed")
    assert(t.scan().count() == 996)
    // full compaction materializes the vector into the rewrite
    t.compact(1)
    val s = t.currentSnapshot.get
    assert(s.dvFiles.isEmpty && s.posDeleteFiles.isEmpty)
    assert(t.scan().count() == 996)
    assert(t.countRows() == 996)
  }

  test("the bitmap broadcast is size-gated: bytes recorded at commit, " +
      "and above the bound the hint drops for a plain join — same rows") {
    val t = deleteHeavy("dv-gate", 8)
    t.consolidateDeleteVectors()
    val dvf = t.currentSnapshot.get.dvFiles.head
    assert(dvf.bytes > 0L, "artifact size recorded in DvFile at commit")
    // the recorded size survives the on-disk snapshot doc: a FRESH
    // handle on the same root must see it
    val reread = LakeTable.load(spark, t.root).currentSnapshot.get
    assert(reread.dvFiles.head.bytes == dvf.bytes)
    val expect = t.scan().orderBy("id").collect().toSeq
    // under the default gate (1 GB) the tiny vector is hint-broadcast
    assert(t.scan().queryExecution.analyzed.toString
      .contains("strategy=broadcast"), "small DV keeps the hint")
    // force the fallback: bound of 0 — hint must drop, rows identical
    spark.conf.set("spark.graft.lake.dv-broadcast-max-bytes", "0")
    try {
      val gated = t.scan()
      assert(!gated.queryExecution.analyzed.toString
        .contains("strategy=broadcast"),
        "above the bound the DV join must not carry a broadcast hint")
      assert(gated.orderBy("id").collect().toSeq == expect)
      assert(gated.count() == 992)
    } finally
      spark.conf.unset("spark.graft.lake.dv-broadcast-max-bytes")
  }

  test("maintain runs consolidation when the policy property asks") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("dv-maintain") + "/t",
      df.schema, properties = morProps +
        (LakeTable.PROP_MAINT_CONSOLIDATE_DV -> "true"))
    t.append(df)
    t.delete($"id" === 1L)
    t.delete($"id" === 2L)
    val actions = t.maintain().map(_._1)
    assert(actions.contains("consolidate_delete_vectors"))
    val s = t.currentSnapshot.get
    assert(s.dvFiles.size == 1 && s.posDeleteFiles.isEmpty)
    assert(t.scan().count() == 98)
  }
}
