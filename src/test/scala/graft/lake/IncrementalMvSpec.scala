package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incrementally-maintained materialized aggregate: every refresh must
  * equal the full recompute, through appends, MERGE rewrites, deletes,
  * and key retraction — and replaying a refresh must be a no-op. */
class IncrementalMvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def recompute(src: LakeTable) = src.scan()
    .groupBy("k").agg(count(lit(1)).as("cnt"),
      coalesce(sum(col("v")), lit(0.0)).as("total"))
    .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    .toSet

  private def mvState(tgt: LakeTable) = tgt.scan()
    .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    .toSet

  test("refresh tracks append, merge rewrite, delete, and retraction") {
    val base = TestSpark.tmpDir("mv")
    val src = LakeTable.create(spark, s"$base/src",
      Seq(("a", 1.0)).toDF("k", "v").schema)
    val tgt = LakeTable.create(spark, s"$base/tgt",
      IncrementalMv.targetSchema(src, Seq("k")))

    src.append(Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v"))
    IncrementalMv.refresh(src, tgt, Seq("k"), "v")
    assert(mvState(tgt) == recompute(src))
    assert(mvState(tgt) == Set(("a", 2L, 3.0), ("b", 1L, 5.0)))

    // append a new key and more of an old one
    src.append(Seq(("b", 1.0), ("c", 7.0)).toDF("k", "v"))
    IncrementalMv.refresh(src, tgt, Seq("k"), "v")
    assert(mvState(tgt) == recompute(src))

    // a COW MERGE rewrite (update b's values via keyed merge)
    src.merge(Seq(("b", 10.0)).toDF("k", "v"), Seq("k"))
    IncrementalMv.refresh(src, tgt, Seq("k"), "v")
    assert(mvState(tgt) == recompute(src))

    // retraction: deleting every 'a' row must REMOVE the 'a' MV row
    src.delete(col("k") === "a")
    IncrementalMv.refresh(src, tgt, Seq("k"), "v")
    assert(mvState(tgt) == recompute(src))
    assert(!mvState(tgt).exists(_._1 == "a"))
  }

  test("refresh is idempotent: watermark rides the merge commit") {
    val base = TestSpark.tmpDir("mv-idem")
    val src = LakeTable.create(spark, s"$base/src",
      Seq(("a", 1.0)).toDF("k", "v").schema)
    val tgt = LakeTable.create(spark, s"$base/tgt",
      IncrementalMv.targetSchema(src, Seq("k")))
    src.append(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"))
    val s1 = IncrementalMv.refresh(src, tgt, Seq("k"), "v")
    assert(tgt.properties(IncrementalMv.WatermarkProp).toLong ==
      src.currentSnapshotId.get)
    // no new source commits: replayed refresh returns the same
    // snapshot and changes nothing
    val s2 = IncrementalMv.refresh(src, tgt, Seq("k"), "v")
    assert(s2 == s1)
    assert(mvState(tgt) == recompute(src))
  }

  test("continuous MV over the change feed: exactly-once everywhere") {
    val base = TestSpark.tmpDir("mv-cont")
    val src = LakeTable.create(spark, s"$base/src",
      Seq(("a", 1.0)).toDF("k", "v").schema)
    val tgt = LakeTable.create(spark, s"$base/tgt",
      IncrementalMv.targetSchema(src, Seq("k")))
    src.append(Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v"))
    src.merge(Seq(("b", 9.0)).toDF("k", "v"), Seq("k"))
    src.delete(col("k") === "a")

    def run(ckpt: String): Unit = IncrementalMv.continuous(spark,
      s"$base/src", tgt, Seq("k"), "v", appId = "mv",
      checkpoint = s"$base/$ckpt")
    run("ckpt1")
    assert(mvState(tgt) == recompute(src))
    assert(mvState(tgt) == Set(("b", 1L, 9.0)))

    // crash replay on the SAME checkpoint: nothing re-applies
    run("ckpt1")
    assert(mvState(tgt) == Set(("b", 1L, 9.0)))

    // checkpoint LOSS with NEW data: the rebuilt stream's first batch
    // mixes replayed and new snapshots — replayed rows filter out on
    // the snapshot-aligned watermark, the new append applies once
    src.append(Seq(("b", 1.0), ("c", 4.0)).toDF("k", "v"))
    run("ckpt2")
    assert(mvState(tgt) == recompute(src))
    assert(mvState(tgt) == Set(("b", 2L, 10.0), ("c", 1L, 4.0)))
  }

  test("min/max maintenance: delta fast path + recompute-on-retraction") {
    val base = TestSpark.tmpDir("mv-ext")
    val src = LakeTable.create(spark, s"$base/src",
      Seq(("a", 1.0)).toDF("k", "v").schema)
    val tgt = LakeTable.create(spark, s"$base/tgt",
      IncrementalMv.extremesSchema(src, Seq("k")))
    def state() = tgt.scan().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    def expect() = src.scan().groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet

    // insert-only refresh: the least/greatest fast path
    src.append(Seq(("a", 3.0), ("a", 7.0), ("b", 5.0)).toDF("k", "v"))
    IncrementalMv.refreshWithExtremes(src, tgt, Seq("k"), "v")
    assert(state() == expect())
    src.append(Seq(("a", 1.0), ("b", 9.0)).toDF("k", "v"))
    IncrementalMv.refreshWithExtremes(src, tgt, Seq("k"), "v")
    assert(state() == expect())
    assert(state().exists(t => t._1 == "a" && t._4 == 1.0 && t._5 == 7.0))

    // retraction of a's MINIMUM: least() could never raise mn — only
    // the keyed recompute path can
    src.delete(col("k") === "a" && col("v") === 1.0)
    IncrementalMv.refreshWithExtremes(src, tgt, Seq("k"), "v")
    assert(state() == expect())
    assert(state().exists(t => t._1 == "a" && t._4 == 3.0 && t._5 == 7.0))

    // merge rewrite retracts b's old values (9→2): mx must DROP
    src.merge(Seq(("b", 2.0)).toDF("k", "v"), Seq("k"))
    IncrementalMv.refreshWithExtremes(src, tgt, Seq("k"), "v")
    assert(state() == expect())
    assert(state().exists(t => t._1 == "b" && t._5 == 2.0))

    // whole-key retraction
    src.delete(col("k") === "a")
    IncrementalMv.refreshWithExtremes(src, tgt, Seq("k"), "v")
    assert(state() == expect())
    assert(!state().exists(_._1 == "a"))
  }

  test("a delta netting to zero inserts no row for an unseen key") {
    val base = TestSpark.tmpDir("mv-zero")
    val src = LakeTable.create(spark, s"$base/src",
      Seq(("a", 1.0)).toDF("k", "v").schema)
    val tgt = LakeTable.create(spark, s"$base/tgt",
      IncrementalMv.targetSchema(src, Seq("k")))
    // key 'z' appears and fully disappears within one refresh window
    src.append(Seq(("z", 3.0), ("a", 1.0)).toDF("k", "v"))
    src.delete(col("k") === "z")
    IncrementalMv.refresh(src, tgt, Seq("k"), "v")
    assert(mvState(tgt) == Set(("a", 1L, 1.0)))
  }
}
