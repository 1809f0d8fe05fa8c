package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Sessionize

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("AvailableNow streaming aggregate equals the batch aggregate") {
    val streamed = StreamingIngest.availableNowAggregate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch)
  }

  test("stream-stream interval join = batch interval join") {
    val win = 900L
    val streamed = StreamingIngest.intervalJoin(spark, dir, win)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ev = graft.sources.EventTime.withTsUs(
      spark.read.parquet(s"$dir/events.parquet"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("cts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("pts"))
    val batch = c.join(p, Seq("user_id"))
      .where(col("pts") >= col("cts") &&
        col("pts") <= col("cts") + win * 1000000L)
      .select("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming sessions = batch sessions minus each user's open tail") {
    val gap = 1800L
    val streamed = StreamingSessionize.run(spark, dir, gap)
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ev = graft.sources.EventTime.withTsUs(
      spark.read.parquet(s"$dir/events.parquet"))
    val batch = Sessionize.byGap(ev, "user_id", col("ts_us"), "value", gap)
    // drop each user's final (still-open) session
    val closed = batch
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("session_start_us").desc)))
      .where(col("rn") > 1)
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed == closed)
  }

  test("timeout emission: idle finals emit once the watermark passes end+gap") {
    val gap = 1800L
    val delayMs = 3600L * 1000L
    val got = StreamingSessionize.runWithTimeout(spark, dir, gap)
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ev = graft.sources.EventTime.withTsUs(
      spark.read.parquet(s"$dir/events.parquet"))
    val batch = Sessionize.byGap(ev, "user_id", col("ts_us"), "value", gap)
    val maxUs = ev.agg(max($"ts_us")).collect()(0).getLong(0)
    val wmMs = maxUs / 1000L - delayMs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("session_start_us").desc)
    val expected = batch
      .withColumn("rn", row_number().over(w))
      // non-final sessions gap-close in-batch; finals emit iff the
      // registered timeout (end_ms + gap_ms) fell strictly behind the
      // final watermark
      .where(col("rn") > 1 ||
        (col("session_end_us") / 1000L).cast("long") + gap * 1000L
          < wmMs)
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)

    // and it emits strictly MORE than the gap-only sessionizer: the
    // timeout path is what flushes idle finals
    val gapOnly = StreamingSessionize.run(spark, dir, gap)
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gapOnly.subsetOf(got) && got.size > gapOnly.size)
  }

  test("left-outer interval join: expired unmatched clicks emit NULLs") {
    val base = graft.TestSpark.tmpDir("ojoin")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    def writeFile(tag: String, rows: Seq[(Long, Long, Long, String)],
        mtime: Long): Unit = {
      rows.map { case (id, tsSec, user, typ) =>
        (id, tsSec * 1000000000L, user, typ, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$base/stage_$tag")
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$base/stage_$tag/part-*.parquet")).head
      fs.rename(part.getPath,
        new org.apache.hadoop.fs.Path(s"$base/in/ev_$tag.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/stage_$tag"), true)
      new java.io.File(s"$base/in/ev_$tag.parquet").setLastModified(mtime)
    }
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/in"))
    val t0 = System.currentTimeMillis() - 60000
    // batch 1: a matched click (user 7) and a never-matched one (user 8)
    writeFile("a", Seq((1L, 1000L, 7L, "click"),
      (2L, 1100L, 7L, "purchase"), (3L, 2000L, 8L, "click")), t0)
    // later batches push BOTH sides' watermarks (the query watermark
    // is their MIN) far past click 3's interval end (2900s); each
    // pusher pair matches itself so only click 3 can emit a NULL.
    // Outer results lag eviction by a batch, so two pushers follow
    writeFile("b", Seq((4L, 50000L, 9L, "click"),
      (40L, 50010L, 9L, "purchase")), t0 + 1000)
    writeFile("c", Seq((5L, 100000L, 10L, "click"),
      (50L, 100010L, 10L, "purchase")), t0 + 2000)
    writeFile("d", Seq((6L, 150000L, 11L, "click"),
      (60L, 150010L, 11L, "purchase")), t0 + 3000)

    val out = StreamingIngest.intervalJoin(spark, s"$base/in",
      windowSeconds = 900, glob = "ev_*.parquet",
      joinType = "left_outer", maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // every matched pair emits once, with its purchase
    assert(out.contains((7L, 1L, 2L)), out.toString)
    assert(out.contains((9L, 4L, 40L)), out.toString)
    // the expired unmatched click emits once, with NULL purchase
    assert(out.contains((8L, 3L, -1L)), out.toString)
    // and it is the ONLY null row — matched clicks never re-emit
    assert(out.count(_._3 == -1L) == 1, out.toString)
  }

  test("lake-dim enrichment re-scans the dim per micro-batch (SCD lookup)") {
    import org.apache.spark.sql.types._
    val base = graft.TestSpark.tmpDir("enrich")
    // two event files -> two AvailableNow batches (maxFilesPerTrigger=1)
    Seq((1L, 1000L * 1000000000L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$base/in/a")
    Seq((2L, 2000L * 1000000000L, 7L, "click", 2.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$base/in/b")
    // move part files up so the glob sees exactly two files
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    Seq("a", "b").foreach { d =>
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$base/in/$d/part-*.parquet")).head
      fs.rename(part.getPath,
        new org.apache.hadoop.fs.Path(s"$base/in/ev_$d.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/in/$d"), true)
    }
    val dim = graft.lake.LakeTable.create(spark, s"$base/dim",
      StructType(Seq(StructField("seg", LongType),
        StructField("label", StringType))))
    dim.append(Seq((7L, "old")).toDF("seg", "label"))
    val out = StreamingIngest.enrichWithLakeDim(spark, s"$base/in",
      dim, col("user_id"), "seg", s"$base/out", glob = "ev_*.parquet",
      maxFilesPerTrigger = Some(1),
      onBatch = { id =>
        // SCD update after the FIRST batch: later batches must see it
        if (id == 0L) {
          dim.merge(Seq((7L, "new")).toDF("seg", "label"), Seq("seg"))
        }
      })
    val got = out.select("event_id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "old"), (2L, "new")), got.toString)
  }

  test("multi-table fan-out: atomic per batch, exactly-once on replay") {
    import org.apache.spark.sql.types._
    val base = graft.TestSpark.tmpDir("fanout")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    def writeEvents(tag: String, rows: Seq[(Long, String)],
        mtime: Long): Unit = {
      rows.zipWithIndex.map { case ((id, typ), i) =>
        (id, (1000L + i) * 1000000000L, 7L, typ, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(s"$base/stage_$tag")
      val part = fs.globStatus(new org.apache.hadoop.fs.Path(
        s"$base/stage_$tag/part-*.parquet")).head
      fs.rename(part.getPath,
        new org.apache.hadoop.fs.Path(s"$base/in/ev_$tag.parquet"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/stage_$tag"), true)
      new java.io.File(s"$base/in/ev_$tag.parquet").setLastModified(mtime)
    }
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/in"))
    val t0 = System.currentTimeMillis() - 60000
    writeEvents("a", Seq((1L, "click"), (2L, "view")), t0)
    writeEvents("b", Seq((3L, "click")), t0 + 1000)

    val cat = new graft.lake.LakeCatalog(spark, s"$base/wh")
    cat.createNamespace("ns")
    cat.createTable("ns", "bronze", StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType))))
    cat.createTable("ns", "stats", StructType(Seq(
      StructField("event_type", StringType), StructField("n", LongType))))
    val routes: Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "bronze" -> (b => b.select(col("event_id"), col("event_type"))),
      "stats" -> (b => b.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))))
    def run(ckpt: String): Unit = StreamingIngest.fanoutExactlyOnce(
      StreamingIngest.eventsStream(spark, s"$base/in", "ev_*.parquet",
        maxFilesPerTrigger = Some(1)),
      cat, "ns", routes, appId = "fan", checkpoint = ckpt)

    run(s"$base/ckpt1")
    assert(cat.loadTable("ns", "bronze").scan().count() == 3)
    // per-batch stats rows: batch a contributes (click,1),(view,1);
    // batch b contributes (click,1)
    assert(cat.loadTable("ns", "stats").scan().count() == 3)

    // checkpoint loss = full redelivery of both files; deterministic
    // <appId>-<batchId> transaction ids make the replay a no-op in
    // BOTH tables (atomic exactly-once across the group)
    run(s"$base/ckpt2")
    assert(cat.loadTable("ns", "bronze").scan().count() == 3)
    assert(cat.loadTable("ns", "stats").scan().count() == 3)
  }

  test("sessionize survives a pathological hot user in one trigger") {
    // one user carries 50k of 50.2k events in a single AvailableNow
    // trigger — the documented per-user in-batch materialization bound.
    // Correctness must hold and sessions must split exactly at the gaps.
    import spark.implicits._
    val gap = 60L // seconds
    val hot = (0 until 50000).map { i =>
      // 3 bursts separated by > gap: events every 1s within a burst
      val burst = i / 20000
      val tsUs = (burst * 1000000L + (i % 20000)) * 1000000L
      (i.toLong, tsUs * 1000L, 1L, "click", 1.0, "{}")
    }
    val cold = (0 until 200).map { i =>
      (100000L + i, (i * 500L + 7L) * 1000000000L, 2L + (i % 3), "view",
        0.5, "{}")
    }
    val dir = graft.TestSpark.tmpDir("hotuser")
    (hot ++ cold)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      // ONE file → one trigger: cross-trigger arrival order is a
      // watermark concern, not this test's (in-trigger order is
      // arbitrary and the sessionizer must sort it)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StreamingSessionize.run(spark, s"$dir/events.parquet", gap,
        glob = "part-*.parquet")
      .where(col("user_id") === 1L)
      .orderBy("session_start_us")
      .collect().map(r => (r.getAs[Long]("session_start_us"),
        r.getAs[Long]("n_events"))).toSeq
    // bursts 0 and 1 close (burst 2 stays open in state); each burst =
    // 20000 events starting at burst*1e12 us
    assert(got == Seq((0L, 20000L), (1000000000000L, 20000L)))
  }
}
