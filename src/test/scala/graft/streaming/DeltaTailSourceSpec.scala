package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.{DeltaExport, LakeTable}

/** Tailing a FOREIGN Delta log as a stream (format("delta-tail")):
  * offsets are Delta versions, batches are incremental version-range
  * reads — exactly-once across triggers and restarts, rate-limitable,
  * loud on non-append-only versions. */
class DeltaTailSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream tails published Delta versions exactly once; restart " +
      "reads only the delta; rate limit splits the backlog") {
    val base = TestSpark.tmpDir("deltatail")
    val t = LakeTable.create(spark, s"$base/t",
      Seq((1L, "a")).toDF("id", "v").schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    DeltaExport.export(t, s"$base/delta")            // v0
    t.append(Seq((3L, "c")).toDF("id", "v"))
    DeltaExport.publish(t, s"$base/delta")           // v1

    def drain(max: Option[Int] = None): Unit = {
      var r = spark.readStream.format("delta-tail").load(s"$base/delta")
      max.foreach(n => r = spark.readStream.format("delta-tail")
        .option("maxVersionsPerTrigger", n.toString)
        .load(s"$base/delta"))
      val q = r.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def sunk(): Set[(Long, String)] =
      spark.read.parquet(s"$base/out").as[(Long, String)].collect().toSet

    drain(max = Some(1)) // backlog of 2 versions drains in capped steps
    assert(sunk() == Set((1L, "a"), (2L, "b"), (3L, "c")))

    // new publishes; restart from the SAME checkpoint reads the delta
    t.append(Seq((4L, "d")).toDF("id", "v"))
    DeltaExport.publish(t, s"$base/delta")           // v2
    drain()
    assert(sunk() == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // no new versions: another drain adds nothing
    drain()
    assert(sunk().size == 4)
  }

  test("delta-tail into a graft lake sink: foreign-log -> governed " +
      "table replication, exactly-once end to end") {
    val base = TestSpark.tmpDir("deltatail-lake")
    val src = LakeTable.create(spark, s"$base/src",
      Seq((1L, 1.0)).toDF("id", "v").schema)
    src.append(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    DeltaExport.export(src, s"$base/delta")
    src.append(Seq((3L, 3.0)).toDF("id", "v"))
    DeltaExport.publish(src, s"$base/delta")
    val dst = LakeTable.create(spark, s"$base/dst",
      Seq((1L, 1.0)).toDF("id", "v").schema)
    val q = spark.readStream.format("delta-tail").load(s"$base/delta")
      .writeStream.format("graft-lake")
      .option("path", s"$base/dst")
      .option("txnAppId", "dtail")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(dst.scan().collect().map(_.toSeq).toSet ==
      src.scan().collect().map(_.toSeq).toSet)
  }

  test("readChangeFeed: cdc actions stream their _change_data rows " +
      "(same-version file actions ignored for changes); non-cdc " +
      "versions synthesize insert/delete; DV versions refuse") {
    import graft.lake.DeltaImport
    val base = TestSpark.tmpDir("deltatail-cdf")
    val src = LakeTable.create(spark, s"$base/src",
      Seq((1L, "a")).toDF("id", "v").schema)
    // one data file, so the COW delete below rewrites it (remove+add)
    src.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1))
    DeltaExport.export(src, s"$base/delta")            // v0
    src.delete(col("id") === 1L)                       // COW rewrite
    DeltaExport.publish(src, s"$base/delta")           // v1: remove+add
    def tup(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "v", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    // non-cdc version: the COW rewrite synthesizes delete(old file's
    // rows) + insert(rewritten file's rows)
    val ch1 = tup(DeltaImport.changeScan(spark, s"$base/delta",
      0L, Some(1L)))
    assert(ch1 == Set((1L, "a", "delete", 1L), (2L, "b", "delete", 1L),
      (2L, "b", "insert", 1L)))

    // hand-append v2: a cdc action + a DECOY dataChange remove that
    // the CDF read must ignore (the spec's precedence rule — counting
    // both would double-report the change)
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    Seq((9L, "z", "delete")).toDF("id", "v", "_change_type").coalesce(1)
      .write.parquet(s"$base/delta/_change_data/c0")
    val cdcPart = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$base/delta/_change_data/c0"))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val st = DeltaImport.state(spark, s"$base/delta", None)
    def jstr(x: String) = "\"" + x.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    LakeTable.writeStringExclusive(fs, new org.apache.hadoop.fs.Path(
      s"$base/delta/_delta_log/00000000000000000002.json"),
      Seq(
        s"""{"cdc":{"path":${jstr(cdcPart.getPath.toUri.toString)},"partitionValues":{},"size":${cdcPart.getLen},"dataChange":false}}""",
        s"""{"remove":{"path":${jstr(st.adds.head.rawPath)},"deletionTimestamp":1,"dataChange":true}}""")
        .mkString("", "\n", "\n"))
    assert(tup(DeltaImport.changeScan(spark, s"$base/delta",
      1L, Some(2L))) == Set((9L, "z", "delete", 2L)))

    // streaming leg: rate-limited AvailableNow drain of the whole
    // change feed, exactly-once into a parquet sink
    val q = spark.readStream.format("delta-tail")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load(s"$base/delta")
      .writeStream.format("parquet").option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(tup(spark.read.parquet(s"$base/out")) ==
      ch1 ++ Set((9L, "z", "delete", 2L)))

    // the batch plan holds a CONSTANT scan count across the range —
    // v1's synthesized insert+delete legs and v2's cdc leg = 3 scans
    // however many versions the range spans (per-kind scans + a slim
    // file→version map join, never a per-version union)
    val multi = DeltaImport.changeScan(spark, s"$base/delta",
      0L, Some(2L))
    val nScans = multi.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.size
    assert(nScans == 3, s"expected 3 scans for the 2-version range, " +
      s"got $nScans")
    assert(tup(multi) == ch1 ++ Set((9L, "z", "delete", 2L)))

    // a path removed then RE-ADDED inside the range keeps exact
    // per-version attribution (the rare duplicate gets its own leg)
    val dupDir = s"$base/dup"
    Seq((5L, "e")).toDF("id", "v").coalesce(1)
      .write.parquet(s"$dupDir/files/f")
    val fPart = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$dupDir/files/f"))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val fUri = jstr(fPart.getPath.toUri.toString)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dupDir/t/_delta_log"))
    val dupMeta = s"""{"metaData":{"id":"dup","format":{"provider":"parquet","options":{}},"schemaString":${jstr(Seq((1L, "a")).toDF("id", "v").schema.json)},"partitionColumns":[],"configuration":{},"createdTime":1}}"""
    def wv(v: Long, lines: Seq[String]): Unit =
      LakeTable.writeStringExclusive(fs, new org.apache.hadoop.fs.Path(
        s"$dupDir/t/_delta_log/" + f"$v%020d.json"),
        lines.mkString("", "\n", "\n"))
    wv(0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      dupMeta,
      s"""{"add":{"path":$fUri,"partitionValues":{},"size":${fPart.getLen},"modificationTime":1,"dataChange":true}}"""))
    wv(1L, Seq(
      s"""{"remove":{"path":$fUri,"deletionTimestamp":1,"dataChange":true}}"""))
    wv(2L, Seq(
      s"""{"add":{"path":$fUri,"partitionValues":{},"size":${fPart.getLen},"modificationTime":2,"dataChange":true}}"""))
    assert(tup(DeltaImport.changeScan(spark, s"$dupDir/t",
      -1L, Some(2L))) == Set(
      (5L, "e", "insert", 0L), (5L, "e", "delete", 1L),
      (5L, "e", "insert", 2L)))

    // a mid-range schema change refuses (older files' change rows
    // would re-type under the new schema)
    LakeTable.writeStringExclusive(fs, new org.apache.hadoop.fs.Path(
      s"$base/delta/_delta_log/00000000000000000003.json"),
      s"""{"metaData":{"id":"drift","format":{"provider":"parquet","options":{}},"schemaString":${jstr(st.schema.json)},"partitionColumns":[],"configuration":{},"createdTime":2}}""" + "\n")
    val eMeta = intercept[IllegalArgumentException] {
      DeltaImport.changeScan(spark, s"$base/delta", 0L, Some(3L))
        .collect()
    }
    assert(eMeta.getMessage.contains("metadata mid-range"))

    // a DV-bearing version without cdc actions refuses (row-level
    // changes would need a DV diff)
    val mor = LakeTable.create(spark, s"$base/mor",
      Seq((1L, "a")).toDF("id", "v").schema,
      properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    mor.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1))
    mor.delete(col("id") === 1L)
    mor.consolidateDeleteVectors()
    DeltaExport.export(mor, s"$base/delta2")
    val e = intercept[IllegalArgumentException] {
      DeltaImport.changeScan(spark, s"$base/delta2", -1L, Some(0L))
        .collect()
    }
    assert(e.getMessage.contains("DV diff"))
  }

  test("CDF hygiene: a vacuumed remove refuses at plan time with the " +
      "version named; a historical range reads under the state AS OF " +
      "its end, not the latest schema") {
    import graft.lake.DeltaImport
    val base = TestSpark.tmpDir("deltatail-cdf2")
    val fs = new org.apache.hadoop.fs.Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    def jstr(x: String) = "\"" + x.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    def mkLog(dir: String): (String, Long) = {
      Seq((5L, "e")).toDF("id", "v").coalesce(1)
        .write.parquet(s"$dir/files/f")
      val fPart = fs.listStatus(new org.apache.hadoop.fs.Path(
          s"$dir/files/f"))
        .filter(_.getPath.getName.endsWith(".parquet")).head
      fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/t/_delta_log"))
      (fPart.getPath.toUri.toString, fPart.getLen)
    }
    def wv(dir: String, v: Long, lines: Seq[String]): Unit =
      LakeTable.writeStringExclusive(fs, new org.apache.hadoop.fs.Path(
        s"$dir/t/_delta_log/" + f"$v%020d.json"),
        lines.mkString("", "\n", "\n"))
    val meta = s"""{"metaData":{"id":"h","format":{"provider":"parquet","options":{}},"schemaString":${jstr(Seq((1L, "a")).toDF("id", "v").schema.json)},"partitionColumns":[],"configuration":{},"createdTime":1}}"""

    // leg 1: remove at v1, then vacuum the data file away
    val d1 = s"$base/vac"
    val (uri1, len1) = mkLog(d1)
    wv(d1, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta,
      s"""{"add":{"path":${jstr(uri1)},"partitionValues":{},"size":$len1,"modificationTime":1,"dataChange":true}}"""))
    wv(d1, 1L, Seq(
      s"""{"remove":{"path":${jstr(uri1)},"deletionTimestamp":1,"dataChange":true}}"""))
    fs.delete(new org.apache.hadoop.fs.Path(uri1), false)
    val eVac = intercept[IllegalArgumentException] {
      DeltaImport.changeScan(spark, s"$d1/t", 0L, Some(1L))
    }
    assert(eVac.getMessage.contains("version 1") &&
      eVac.getMessage.contains("vacuumed"))

    // leg 2: schema evolves AFTER the queried range — the range's
    // rows must come back under the schema AS OF hi, not nulls/errors
    // under the renamed latest schema
    val d2 = s"$base/hist"
    val (uri2, len2) = mkLog(d2)
    wv(d2, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      meta,
      s"""{"add":{"path":${jstr(uri2)},"partitionValues":{},"size":$len2,"modificationTime":1,"dataChange":true}}"""))
    val renamed = s"""{"metaData":{"id":"h","format":{"provider":"parquet","options":{}},"schemaString":${jstr(Seq((1L, "a")).toDF("id2", "v2").schema.json)},"partitionColumns":[],"configuration":{},"createdTime":2}}"""
    wv(d2, 1L, Seq(renamed))
    val hist = DeltaImport.changeScan(spark, s"$d2/t", -1L, Some(0L))
    assert(hist.columns.take(2).toSeq == Seq("id", "v"),
      "historical range must carry the schema as of its end version")
    assert(hist.select("id", "v", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet == Set((5L, "e", "insert", 0L)))
  }

  test("a removing version fails the stream loudly (append-only " +
      "contract, same as the batch incremental read)") {
    val base = TestSpark.tmpDir("deltatail-rm")
    val t = LakeTable.create(spark, s"$base/t",
      Seq((1L, "a")).toDF("id", "v").schema)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    DeltaExport.export(t, s"$base/delta")
    t.delete(col("id") === 1L)
    DeltaExport.publish(t, s"$base/delta")           // v1 removes
    val q = spark.readStream.format("delta-tail").load(s"$base/delta")
      .writeStream.format("parquet").option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q.awaitTermination() }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
  }

  test("the CLOSED change-feed loop: a change-feed-enabled lake " +
      "table's per-commit publishes stream through readChangeFeed — " +
      "graft produces the cdc actions graft consumes, exactly once") {
    val base = TestSpark.tmpDir("deltatail-cdf-loop")
    val t = LakeTable.create(spark, s"$base/t",
      Seq((1L, "a")).toDF("id", "v").schema,
      properties = Map(LakeTable.PROP_PUBLISH_CDF -> "true"))
    t.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartition(1))
    DeltaExport.export(t, s"$base/delta")              // v0
    t.merge(Seq((2L, "B")).toDF("id", "v"), Seq("id"))
    DeltaExport.publish(t, s"$base/delta")             // v1: cdc
    t.delete(col("id") === 3L)
    DeltaExport.publish(t, s"$base/delta")             // v2: cdc
    t.append(Seq((4L, "d")).toDF("id", "v"))
    DeltaExport.publish(t, s"$base/delta")             // v3: synthesized

    val q = spark.readStream.format("delta-tail")
      .option("readChangeFeed", "true")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1")
      .load(s"$base/delta")
      .writeStream.format("parquet").option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.read.parquet(s"$base/out")
      .select("id", "v", "_change_type", "_commit_version")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (2L, "b", "delete", 1L), (2L, "B", "insert", 1L),
      (3L, "c", "delete", 2L),
      (4L, "d", "insert", 3L)), s"$got")
  }
}
