package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** Tailing a lake table as a stream (format("graft-lake")): offsets are
  * snapshot ids, batches are incremental snapshot-range scans. */
class LakeStreamSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream tails table commits exactly once across triggers") {
    val base = TestSpark.tmpDir("lakestream")
    val root = s"$base/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema)
    t.append(df)
    t.append(Seq((3L, "c")).toDF("id", "v"))

    // parquet sink: supports restart-from-checkpoint, so each drain
    // resumes from the persisted snapshot-id offsets
    def drain(): Unit = {
      val q = spark.readStream.format("graft-lake").load(root)
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def sunk(): Set[(Long, String)] =
      spark.read.parquet(s"$base/out").as[(Long, String)].collect().toSet

    drain()
    assert(sunk() == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // new commits land; a restart from the SAME checkpoint reads ONLY
    // the delta (offsets = snapshot ids, persisted by the engine)
    t.append(Seq((4L, "d")).toDF("id", "v"))
    drain()
    assert(sunk() == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // no new commits → an AvailableNow restart emits nothing new
    drain()
    assert(sunk().size == 4)
  }

  test("maxSnapshotsPerTrigger bounds each micro-batch; backfill drains in steps") {
    val base = TestSpark.tmpDir("lakestream-rate")
    val root = s"$base/t"
    val df = Seq((0L, "seed")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema)
    (1L to 5L).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))

    def drain(): Unit = {
      val q = spark.readStream.format("graft-lake")
        .option("maxSnapshotsPerTrigger", "2").load(root)
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val sunk = spark.read.parquet(s"$base/out").as[(Long, String)]
      .collect().toSet
    assert(sunk == (1L to 5L).map(i => (i, s"v$i")).toSet)
    // 5 append commits at ≤2 snapshots per trigger → ≥3 micro-batches
    val offsets = new java.io.File(s"$base/ckpt/offsets").list()
      .filterNot(_.startsWith("."))
    assert(offsets.length >= 3, offsets.mkString(","))

    // restart from the same checkpoint: the cap's base recovers from
    // the replayed last batch — only the delta streams, no duplicates
    t.append(Seq((6L, "v6")).toDF("id", "v"))
    drain()
    val after = spark.read.parquet(s"$base/out").as[(Long, String)]
      .collect()
    assert(after.length == 6 && after.toSet ==
      (1L to 6L).map(i => (i, s"v$i")).toSet)

    // a non-positive cap is rejected at stream start
    intercept[Exception] {
      spark.readStream.format("graft-lake")
        .option("maxSnapshotsPerTrigger", "0").load(root)
        .writeStream.format("noop").start().processAllAvailable()
    }
  }

  test("sink: file stream lands in a lake table; replay doesn't dup") {
    val base = TestSpark.tmpDir("lakesink")
    val root = s"$base/t"
    val in = s"$base/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    LakeTable.create(spark, root, df.schema)
    df.coalesce(1).write.mode("append").parquet(in)

    def drain(): Unit = {
      val q = spark.readStream.schema(df.schema).parquet(in)
        .writeStream.format("graft-lake").option("path", root)
        .option("txnAppId", "sink-spec")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    drain()
    val t = LakeTable.load(spark, root)
    assert(t.scan().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))

    // second input file → only the delta lands
    Seq((3L, "c")).toDF("id", "v").coalesce(1)
      .write.mode("append").parquet(in)
    drain()
    assert(t.scan().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // replaying batch 0 against the table directly (simulating a crash
    // between table commit and offset commit) is a watermarked NO-OP
    t.appendOnce(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      "sink-spec", 0L)
    assert(t.scan().count() == 3)

    // source → sink roundtrip: tail this table into another one
    val root2 = s"$base/t2"
    LakeTable.create(spark, root2, df.schema)
    val q2 = spark.readStream.format("graft-lake").load(root)
      .writeStream.format("graft-lake").option("path", root2)
      .option("txnAppId", "sink-spec-2")
      .option("checkpointLocation", s"$base/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(LakeTable.load(spark, root2).scan()
      .as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("readChangeFeed streams the row-level changelog incl. merges") {
    val base = TestSpark.tmpDir("lakecdf")
    val root = s"$base/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema)
    t.append(df.coalesce(1)) // v2
    t.merge(Seq((1L, "A"), (3L, "c")).toDF("id", "v"), Seq("id")) // v3
    t.delete($"id" === 2L) // v4

    def drain(): Unit = {
      val q = spark.readStream.format("graft-lake")
        .option("readChangeFeed", "true").load(root)
        .writeStream.format("parquet").option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    def sunk(): Set[(Long, String, String)] =
      spark.read.parquet(s"$base/out")
        .select($"id", $"v", $"_change_type")
        .as[(Long, String, String)].collect().toSet
    // the streamed feed equals the batch changelog over the same range
    val batchFeed = t.changes(0L, t.currentSnapshotId.get)
      .select($"id", $"v", $"_change_type")
      .as[(Long, String, String)].collect().toSet
    assert(sunk() == batchFeed)
    assert(sunk().contains((1L, "a", "delete"))) // merge pre-image
    assert(sunk().contains((1L, "A", "insert"))) // merge after-image
    assert(sunk().contains((2L, "b", "delete"))) // predicate delete

    // a later commit streams only its own delta
    t.append(Seq((9L, "z")).toDF("id", "v")) // v5
    drain()
    assert(sunk().diff(batchFeed) == Set((9L, "z", "insert")))
  }

  test("readChangeFeed=lineage streams typed updates with row ids") {
    val base = TestSpark.tmpDir("lakecdflin")
    val root = s"$base/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema,
      properties = Map(LakeTable.PROP_ROW_LINEAGE -> "true"))
    t.append(df.coalesce(1))
    t.update($"id" === 1L, Map("v" -> org.apache.spark.sql
      .functions.lit("A")))
    val q = spark.readStream.format("graft-lake")
      .option("readChangeFeed", "lineage").load(root)
      .writeStream.format("parquet").option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.read.parquet(s"$base/out")
      .select($"id", $"v", $"_change_type", $"_row_id")
      .as[(Long, String, String, Long)].collect().toSet
    val rid = rows.find(_._3 == "update_preimage").get._4
    assert(rows.contains((1L, "a", "update_preimage", rid)))
    assert(rows.contains((1L, "A", "update_postimage", rid)))
    assert(rows.count(_._3 == "insert") == 2)
    // a bad mode is refused loudly
    intercept[Exception] {
      val qq = spark.readStream.format("graft-lake")
        .option("readChangeFeed", "bogus").load(root)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ckpt3")
        .trigger(Trigger.AvailableNow()).start()
      qq.awaitTermination()
    }
    // lineage mode on a non-lineage table fails FAST (at load, before
    // any checkpoint exists)
    val plainRoot = s"$base/plain"
    LakeTable.create(spark, plainRoot, df.schema)
    val e = intercept[Exception](spark.readStream.format("graft-lake")
      .option("readChangeFeed", "lineage").load(plainRoot))
    assert(e.getMessage.contains("row-lineage"), e.getMessage)
  }

  test("startingSnapshotId skips history; non-appends error by default") {
    val base = TestSpark.tmpDir("lakestream2")
    val root = s"$base/t"
    val df = Seq((1L, "a")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema) // v1
    t.append(df) // v2
    val fromV2 = t.currentSnapshotId.get
    t.append(Seq((2L, "b")).toDF("id", "v")) // v3

    val q = spark.readStream.format("graft-lake")
      .option("startingSnapshotId", fromV2.toString).load(root)
      .writeStream.format("memory").queryName("lake_tail_from")
      .option("checkpointLocation", s"$base/ckpt1")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("lake_tail_from").as[(Long, String)]
      .collect().toSeq == Seq((2L, "b")))

    // a merge inside the tailed range fails the strict default...
    t.merge(Seq((1L, "A")).toDF("id", "v"), Seq("id")) // v4 rewrites
    val strict = spark.readStream.format("graft-lake")
      .option("startingSnapshotId", fromV2.toString).load(root)
      .writeStream.format("memory").queryName("lake_tail_strict")
      .option("checkpointLocation", s"$base/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    val err = intercept[Exception] { strict.awaitTermination() }
    assert(err.getMessage.contains("non-append") ||
      Option(err.getCause).exists(_.getMessage.contains("non-append")))

    // ...and skipNonAppends=true tails only the append-born files that
    // are still live at range end (the merge rewrote v3's file, so its
    // replacement content arrives via nothing here — appends only)
    val tolerant = spark.readStream.format("graft-lake")
      .option("startingSnapshotId", fromV2.toString)
      .option("skipNonAppends", "true").load(root)
      .writeStream.format("memory").queryName("lake_tail_skip")
      .option("checkpointLocation", s"$base/ckpt3")
      .trigger(Trigger.AvailableNow()).start()
    tolerant.awaitTermination()
    val got = spark.table("lake_tail_skip").as[(Long, String)].collect()
    // v3's append file survived the merge only if the merge didn't
    // rewrite it; either way no duplicated and no phantom rows
    assert(got.toSet.subsetOf(Set((2L, "b"))))
  }

  test("mid-stream column rename fails with a schema-changed error") {
    // Drive the Source directly: a RUNNING stream keeps the source
    // object (and its creation-time schema) alive across triggers, so
    // a rename between getOffset and getBatch must surface as the
    // descriptive error, not a bare unresolved-column AnalysisException.
    val base = TestSpark.tmpDir("lakestream3")
    val root = s"$base/t"
    val df = Seq((1L, "a")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema)
    t.append(df)

    val src = new org.apache.spark.sql.graftlake.GraftLakeStreamSource(
      spark.sqlContext, root, Map.empty)
    assert(src.schema.fieldNames.toSeq == Seq("id", "v"))

    // the column the running stream selects disappears mid-stream
    t.renameColumn("v", "val")
    t.append(Seq((2L, "b")).toDF("id", "val"))
    val end = org.apache.spark.sql.execution.streaming.runtime
      .LongOffset(t.currentSnapshotId.get)
    val err = intercept[UnsupportedOperationException] {
      src.getBatch(None, end)
    }
    assert(err.getMessage.contains("schema changed under a running stream")
      && err.getMessage.contains("v"),
      s"expected a descriptive schema-changed error, got: $err")
  }
}
