package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** The PRODUCTION streaming landing path: every stateful shape the
  * engine supports (windowed agg, stream-stream interval join,
  * sessionize-with-event-time-timeout) writing its results into a lake
  * table through the graft-lake SINK with `txnAppId` — not the
  * harness-only memory sink — and keeping exactly-once table content
  * under a simulated crash between the table commit and the streaming
  * offset commit (the checkpoint's `commits/<lastBatch>` marker is
  * deleted, forcing the engine to replay that batch on restart; the
  * sink's (appId, batchId) watermark must skip the replayed append). */
class StreamingLakeSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** Events → a lake source table (event_time carried as a real
    * timestamp column; writes pin TIMESTAMP_MICROS so it round-trips),
    * split into two commits so the stream has real snapshot ranges. */
  private def makeSourceTable(base: String): LakeTable = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val tsType = raw.schema("ts").dataType
    val ev = raw
      .withColumn("event_time",
        graft.sources.EventTime.eventTimeExpr(tsType))
      .withColumn("ts_us", unix_micros(col("event_time")))
      .select("event_id", "ts_us", "user_id", "event_type", "value",
        "event_time")
    val t = LakeTable.create(spark, s"$base/src", ev.schema)
    t.append(ev.where(col("event_id") % 2 === 0))
    t.append(ev.where(col("event_id") % 2 =!= 0))
    t
  }

  /** Run `transform` over the lake-source stream into a lake table at
    * `$base/out` via the graft-lake sink; returns the output table. */
  private def runStream(base: String, src: LakeTable,
      txnAppId: Option[String])(
      transform: DataFrame => DataFrame): LakeTable = {
    val stream = spark.readStream.format("graft-lake")
      .load(src.root)
    val result = transform(stream)
    val out =
      if (LakeTable.exists(spark, s"$base/out"))
        LakeTable.load(spark, s"$base/out")
      else LakeTable.create(spark, s"$base/out", result.schema)
    var w = result.writeStream.format("graft-lake")
      .option("path", out.root)
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
    txnAppId.foreach(id => w = w.option("txnAppId", id))
    val q = w.start()
    q.awaitTermination()
    out
  }

  /** Crash simulation: drop the checkpoint's LAST commit marker — the
    * engine then believes that batch never completed and replays it on
    * the next start (its table append already landed: exactly the
    * crash-between-commits window). */
  private def dropLastCommit(base: String): Unit = {
    val commits = new java.io.File(s"$base/ckpt/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(last.delete(), s"could not delete ${last}")
    // the local checksum fs keeps a hidden CRC sibling; a leftover one
    // fails the engine's re-commit rename on replay
    new java.io.File(commits, s".${last.getName}.crc").delete()
  }

  private def contents(t: LakeTable): Seq[String] =
    t.scan().collect().map(_.toString).sorted.toSeq

  private def checkExactlyOnce(base: String, src: LakeTable)(
      transform: DataFrame => DataFrame): LakeTable = {
    val out = runStream(base, src, Some("job-1"))(transform)
    val afterRun = contents(out)
    assert(afterRun.nonEmpty, "stream emitted nothing")
    dropLastCommit(base)
    runStream(base, src, Some("job-1"))(transform)
    val afterReplay = contents(LakeTable.load(spark, out.root))
    assert(afterReplay == afterRun,
      "crash-replay changed table content: exactly-once violated")
    out
  }

  test("windowed aggregation lands exactly-once in a lake table") {
    val base = TestSpark.tmpDir("lakesink-window")
    val src = makeSourceTable(base)
    def agg(df: DataFrame): DataFrame = df
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total_value"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        unix_micros(col("window.end")).as("window_end_us"),
        col("event_type"), col("n"), col("total_value"))
    val out = checkExactlyOnce(base, src)(agg)
    // content correctness: equals the memory-sink reference shape that
    // the DuckDB oracle validates (same rows, same single-drain run)
    val ref = StreamingIngest.windowedCounts(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(contents(out) == ref)
  }

  test("stream-stream interval join lands exactly-once in a lake table") {
    val base = TestSpark.tmpDir("lakesink-ijoin")
    val src = makeSourceTable(base)
    def join(df: DataFrame): DataFrame = {
      def side(eventType: String, prefix: String) = df
        .where(col("event_type") === eventType)
        .select(col("user_id").as(s"${prefix}_user"),
          col("event_id").as(s"${prefix}_id"),
          col("event_time").as(s"${prefix}_time"))
        .withWatermark(s"${prefix}_time", "1 hour")
      side("click", "c").join(side("purchase", "p"),
        col("c_user") === col("p_user") &&
          col("p_time") >= col("c_time") &&
          col("p_time") <= col("c_time") + expr("INTERVAL 900 SECONDS"))
        .select(col("c_user").as("user_id"),
          col("c_id").as("click_id"), col("p_id").as("purchase_id"),
          unix_micros(col("c_time")).as("click_ts_us"),
          unix_micros(col("p_time")).as("purchase_ts_us"))
    }
    val out = checkExactlyOnce(base, src)(join)
    // every in-data match must land: equals the batch interval join
    val ev = src.scan()
    def bSide(et: String, p: String) = ev.where(col("event_type") === et)
      .select(col("user_id").as(s"${p}_user"),
        col("event_id").as(s"${p}_id"), col("ts_us").as(s"${p}_us"))
    val expected = bSide("click", "c").join(bSide("purchase", "p"),
        col("c_user") === col("p_user") &&
          col("p_us") >= col("c_us") &&
          col("p_us") <= col("c_us") + 900L * 1000000L)
      .select(col("c_user").as("user_id"), col("c_id"), col("p_id"),
        col("c_us"), col("p_us"))
      .collect().map(_.toString).sorted.toSeq
    assert(contents(out) == expected)
  }

  test("sessionize-with-timeout lands exactly-once in a lake table") {
    val base = TestSpark.tmpDir("lakesink-sessions")
    val src = makeSourceTable(base)
    def sessions(df: DataFrame): DataFrame = {
      import StreamingSessionize._
      sessionizeWithTimeout(
        df.withWatermark("event_time", "1 hour")
          .select($"event_id", $"ts_us", $"user_id", $"event_type",
            $"value", $"event_time")
          .as[Event],
        gapSeconds = 1800L).toDF()
    }
    checkExactlyOnce(base, src)(sessions)
  }

  test("streaming MOR upsert (mergeKeys) lands exactly-once under crash-replay") {
    val base = TestSpark.tmpDir("lakesink-upsert")
    val in = new java.io.File(s"$base/in"); in.mkdirs()
    // drop 0 inserts three users; drop 1 updates u1, CDC-deletes u3,
    // inserts u4 — final state is last-writer-wins minus the delete
    val drops = Seq(
      Seq((1L, "a", 1.0), (2L, "b", 1.0), (3L, "c", 1.0)),
      Seq((1L, "a2", 5.0), (3L, "DEL", 0.0), (4L, "d", 2.0)))
    drops.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$base/tmp$i"
      rows.toDF("user_id", "tag", "v").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(in, s"drop_$i.parquet")
      assert(part.renameTo(dest))
      // pin drop ORDER (the file source batches oldest-mtime-first)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val schema = drops.head.toDF("user_id", "tag", "v").schema
    val outRoot = s"$base/out"
    LakeTable.create(spark, outRoot, schema, properties =
      Map(LakeTable.PROP_MERGE_MODE -> "merge-on-read"))
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$base/in")
        .writeStream.format("graft-lake")
        .option("path", outRoot)
        .option("txnAppId", "upsert-job")
        .option("mergeKeys", "user_id")
        .option("deleteWhen", "tag = 'DEL'")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val out = LakeTable.load(spark, outRoot)
    val after = contents(out)
    assert(after == Seq("[1,a2,5.0]", "[2,b,1.0]", "[4,d,2.0]"), after)
    val commits = out.history.count()
    dropLastCommit(base)
    run()
    // the replayed batch finds its (appId, batchId) watermark: content
    // unchanged AND no new commit (the merge was skipped, not redone)
    assert(contents(LakeTable.load(spark, outRoot)) == after)
    assert(LakeTable.load(spark, outRoot).history.count() == commits,
      "replayed merge committed again: exactly-once violated")
  }

  test("streaming partition restatement (overwritePartitions) lands " +
      "exactly-once under crash-replay") {
    val base = TestSpark.tmpDir("lakesink-restate")
    val in = new java.io.File(s"$base/in"); in.mkdirs()
    // drop 0 publishes d0+d1; drop 1 RESTATES d1 and introduces d2 —
    // final state: d0 untouched, d1 replaced wholesale, d2 new
    val drops = Seq(
      Seq((1L, "d0", "a"), (2L, "d0", "b"), (3L, "d1", "c"),
        (4L, "d1", "d")),
      Seq((9L, "d1", "restated"), (10L, "d2", "new")))
    drops.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$base/tmp$i"
      rows.toDF("k", "d", "v").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dest = new java.io.File(in, s"drop_$i.parquet")
      assert(part.renameTo(dest))
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val schema = drops.head.toDF("k", "d", "v").schema
    val outRoot = s"$base/out"
    LakeTable.create(spark, outRoot, schema, partitionBy = Seq("d"))
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$base/in")
        .writeStream.format("graft-lake")
        .option("path", outRoot)
        .option("txnAppId", "restate-job")
        .option("overwritePartitions", "true")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    val out = LakeTable.load(spark, outRoot)
    val after = contents(out)
    assert(after ==
      Seq("[1,d0,a]", "[10,d2,new]", "[2,d0,b]", "[9,d1,restated]"),
      after)
    val commits = out.history.count()
    dropLastCommit(base)
    run()
    assert(contents(LakeTable.load(spark, outRoot)) == after)
    assert(LakeTable.load(spark, outRoot).history.count() == commits,
      "replayed restatement committed again: exactly-once violated")
    // option exclusivity is refused loudly
    val e = intercept[Exception] {
      spark.readStream.schema(schema).parquet(s"$base/in")
        .writeStream.format("graft-lake")
        .option("path", outRoot)
        .option("overwritePartitions", "true")
        .option("mergeKeys", "k")
        .option("checkpointLocation", s"$base/ckpt2")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage != null)
  }

  test("without txnAppId the same crash-replay DOES duplicate (control)") {
    val base = TestSpark.tmpDir("lakesink-noeos")
    val src = makeSourceTable(base)
    def proj(df: DataFrame): DataFrame =
      df.select("event_id", "event_type", "value")
    val out = runStream(base, src, None)(proj)
    val n1 = out.scan().count()
    dropLastCommit(base)
    runStream(base, src, None)(proj)
    val n2 = LakeTable.load(spark, out.root).scan().count()
    // the replayed batch appends again: that duplication is exactly
    // what the txnAppId watermark exists to prevent
    assert(n2 > n1, s"expected duplicated rows without txnAppId ($n1, $n2)")
  }
}
