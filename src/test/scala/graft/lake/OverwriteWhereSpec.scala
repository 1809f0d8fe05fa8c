package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Predicate-scoped overwrite (replaceWhere) and dynamic partition
  * overwrite: the replaced region swaps in ONE commit (time travel
  * keeps the pre-swap state), batches that would leak rows outside the
  * region are refused before anything moves, fully-covered files drop
  * as metadata, and straddling files keep their non-matching rows. */
class OverwriteWhereSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("replaceWhere on a partitioned table: metadata-only delete side, " +
      "untouched partitions carry their files byte-identically") {
    val df = (1L to 90L).map(i => (i, s"p${i % 3}", s"v$i"))
      .toDF("k", "p", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("rw-part") + "/t",
      df.schema, partitionBy = Seq("p"))
    t.append(df)
    val before = t.currentSnapshot.get
    val untouched = before.liveFiles.filterNot(_.contains("p=p1")).toSet

    val repl = (1L to 5L).map(i => (i + 1000L, "p1", s"new$i"))
      .toDF("k", "p", "v")
    t.overwriteWhere(repl, $"p" === "p1")
    val after = t.currentSnapshot.get
    // one commit; untouched partitions' files carried, not rewritten
    assert(after.snapshotId == before.snapshotId + 1)
    assert(untouched.subsetOf(after.liveFiles.toSet))
    // the p1 region is exactly the new batch; others unchanged
    assert(t.scan().where($"p" === "p1").count() == 5)
    assert(rowsOf(t.scan().where($"p" === "p1").select("k"))
      == rowsOf(repl.select("k")))
    assert(t.scan().where($"p" =!= "p1").count() == 60)
    // time travel keeps the pre-swap state
    assert(t.scanAt(before.snapshotId).count() == 90)
  }

  test("a batch with rows outside the predicate is refused before " +
      "any commit (validated on the staged bytes)") {
    val df = (1L to 30L).map(i => (i, s"p${i % 3}")).toDF("k", "p")
    val t = LakeTable.create(spark, TestSpark.tmpDir("rw-leak") + "/t",
      df.schema, partitionBy = Seq("p"))
    t.append(df)
    val snap = t.currentSnapshotId.get
    val bad = Seq((100L, "p1"), (101L, "p2")).toDF("k", "p")
    val e = intercept[IllegalArgumentException](
      t.overwriteWhere(bad, $"p" === "p1"))
    assert(e.getMessage.contains("leak"))
    assert(t.currentSnapshotId.get == snap, "no commit happened")
    assert(t.scan().count() == 30)
  }

  test("a straddling predicate rewrites only affected files and keeps " +
      "their non-matching rows") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("rw-mid") + "/t",
      df.schema)
    t.append(df.repartition(1))
    val repl = Seq((200L, "repl")).toDF("k", "v")
    t.overwriteWhere(repl, $"k" > 90L)
    assert(t.scan().count() == 91)
    assert(t.scan().where($"k" <= 90).count() == 90)
    assert(rowsOf(t.scan().where($"k" > 90)) == rowsOf(repl))
  }

  test("replaceWhere folds outstanding MOR deletes for rewritten files") {
    val df = (1L to 60L).map(i => (i, i % 2, s"v$i")).toDF("k", "g", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("rw-mor") + "/t",
      df.schema, properties = Map(
        LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    t.append(df.repartition(1))
    t.delete($"k" % 10 === 0)                       // 6 position deletes
    val repl = Seq((1000L, 1L, "r")).toDF("k", "g", "v")
    t.overwriteWhere(repl, $"g" === 1L)
    // odd keys replaced by one row; evens keep the MOR delete applied
    assert(t.scan().where($"g" === 1L).count() == 1)
    assert(t.scan().where($"g" === 0L).count() ==
      (2L to 60L by 2).count(_ % 10 != 0))
  }

  test("dynamic partition overwrite replaces exactly the partitions in " +
      "the batch, new partition values included") {
    val df = (1L to 60L).map(i => (i, s"d${i % 3}")).toDF("k", "d")
    val t = LakeTable.create(spark, TestSpark.tmpDir("rw-dyn") + "/t",
      df.schema, partitionBy = Seq("d"))
    t.append(df)
    val batch = Seq((500L, "d1"), (501L, "d9")).toDF("k", "d")
    t.overwritePartitions(batch)
    assert(t.scan().where($"d" === "d1").count() == 1)
    assert(t.scan().where($"d" === "d9").count() == 1)
    assert(t.scan().where($"d" === "d0").count() == 20)
    assert(t.scan().where($"d" === "d2").count() == 20)
    // refusals: empty batch; unpartitioned table
    intercept[IllegalArgumentException](
      t.overwritePartitions(batch.where(lit(false))))
    val flat = LakeTable.create(spark,
      TestSpark.tmpDir("rw-dyn-flat") + "/t", df.schema)
    intercept[IllegalArgumentException](flat.overwritePartitions(batch))
  }

  test("dynamic overwrite inverts TIME transforms: day(ts) partitions " +
      "restate by source range, other days' files carried") {
    val ts0 = 1700000000000L // 2023-11-14 22:13:20 UTC
    val df = (0 until 96).map(i =>
      (i.toLong, new java.sql.Timestamp(ts0 + i * 3600000L), s"v$i"))
      .toDF("k", "ts", "v") // 4 calendar days of hourly rows
    val t = LakeTable.create(spark, TestSpark.tmpDir("rw-day") + "/t",
      df.schema, partitionBy = Seq("day(ts)"))
    t.append(df)
    val before = t.currentSnapshot.get
    assert(before.liveFiles.map(_.split('/')(1)).toSet.size == 5,
      before.liveFiles) // 4 full days + the partial first day
    // restate the rows of ONE calendar day (derived from the batch)
    val day2 = df.where(to_date($"ts") === "2023-11-16")
      .withColumn("v", concat(lit("re-"), $"v"))
    assert(day2.count() == 24)
    t.overwritePartitions(day2)
    val after = t.currentSnapshot.get
    // the other days' files carried; the restated day swapped
    val untouched = before.liveFiles
      .filterNot(_.contains("ts_day=19677")).toSet // 2023-11-16
    assert(untouched.subsetOf(after.liveFiles.toSet))
    assert(t.scan().count() == 96)
    assert(t.scan().where($"v".startsWith("re-")).count() == 24)
    assert(t.scan().where(to_date($"ts") === "2023-11-16")
      .count() == 24)
    // TIMESTAMP_NTZ sources invert too (zoneless midnights both ways)
    // — parquet writers with isAdjustedToUTC=false land here, which is
    // exactly how the q_replace_month fixture reads
    val ntz = df.withColumn("ts", $"ts".cast(TimestampNTZType))
    val tn = LakeTable.create(spark, TestSpark.tmpDir("rw-ntz") + "/t",
      ntz.schema, partitionBy = Seq("day(ts)"))
    tn.append(ntz)
    tn.overwritePartitions(
      ntz.where(to_date($"ts") === "2023-11-16")
        .withColumn("v", lit("ntz-re")))
    assert(tn.scan().where($"v" === "ntz-re").count() == 24)
    assert(tn.scan().count() == 96)
    // bucket transforms are refused up front (hash, not invertible)
    val tb = LakeTable.create(spark, TestSpark.tmpDir("rw-day-b") + "/t",
      df.schema, partitionBy = Seq("bucket(4, k)"))
    tb.append(df)
    val e = intercept[IllegalArgumentException](
      tb.overwritePartitions(day2))
    assert(e.getMessage.contains("cannot invert"))
    // truncate over ints inverts to the band range
    val di = (1L to 100L).map(i => (i, s"x$i")).toDF("k", "x")
    val tt = LakeTable.create(spark, TestSpark.tmpDir("rw-trunc") + "/t",
      di.schema, partitionBy = Seq("truncate(25, k)"))
    tt.append(di)
    tt.overwritePartitions(
      Seq((30L, "band2"), (49L, "band2b")).toDF("k", "x"))
    assert(tt.scan().count() == 100 - 25 + 2)
    assert(tt.scan().where($"k" >= 25 && $"k" < 50).count() == 2)
    assert(tt.scan().where($"k" < 25).count() == 24)
  }

  test("SQL INSERT OVERWRITE: static mode replaces the table, dynamic " +
      "mode (table property) only the batch's partitions") {
    val df = (1L to 40L).map(i => (i, s"d${i % 2}")).toDF("k", "d")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("rw-sql"))
    cat.createNamespace("ns")
    val t = cat.createTable("ns", "t", df.schema, partitionBy = Seq("d"))
    t.append(df)
    // static default: full replacement
    cat.sql("ns", "INSERT OVERWRITE t VALUES (900, 'd0')")
    assert(cat.sql("ns", "SELECT count(*) AS n FROM t")
      .collect().head.getLong(0) == 1L)
    // dynamic via table property
    val td = cat.createTable("ns", "td", df.schema,
      partitionBy = Seq("d"), properties = Map(
        "write.partition-overwrite-mode" -> "dynamic"))
    td.append(df)
    cat.sql("ns", "INSERT OVERWRITE td VALUES (900, 'd0')")
    assert(cat.sql("ns", "SELECT count(*) AS n FROM td")
      .collect().head.getLong(0) == 21L)
    assert(cat.sql("ns",
      "SELECT count(*) AS n FROM td WHERE d = 'd0'")
      .collect().head.getLong(0) == 1L)
  }

  test("SQL `INSERT INTO t REPLACE WHERE cond SELECT …` routes to " +
      "replaceWhere with positional column mapping") {
    val df = (1L to 30L).map(i => (i, s"p${i % 3}", i * 1.0))
      .toDF("k", "p", "x")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("rw-sqlrep"))
    cat.createNamespace("ns")
    val t = cat.createTable("ns", "t", df.schema, partitionBy = Seq("p"))
    t.append(df)
    cat.sql("ns",
      "INSERT INTO t REPLACE WHERE p = 'p1' VALUES (700, 'p1', 7.5)")
    assert(cat.sql("ns", "SELECT count(*) AS n FROM t WHERE p = 'p1'")
      .collect().head.getLong(0) == 1L)
    assert(cat.sql("ns", "SELECT count(*) AS n FROM t")
      .collect().head.getLong(0) == 21L)
    // a leaking batch is refused through the SQL path too
    val e = intercept[IllegalArgumentException](cat.sql("ns",
      "INSERT INTO t REPLACE WHERE p = 'p1' VALUES (701, 'p2', 1.0)"))
    assert(e.getMessage.contains("leak"))
  }

  test("the swap is one changelog delta: replaced rows delete, new rows " +
      "insert, untouched partitions silent") {
    val df = (1L to 30L).map(i => (i, s"p${i % 3}")).toDF("k", "p")
    val t = LakeTable.create(spark, TestSpark.tmpDir("rw-cdc") + "/t",
      df.schema, partitionBy = Seq("p"))
    t.append(df)
    val from = t.currentSnapshotId.get
    t.overwriteWhere(Seq((77L, "p2")).toDF("k", "p"), $"p" === "p2")
    val ch = t.changes(from, t.currentSnapshotId.get)
      .groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ch("delete") == 10L && ch("insert") == 1L)
  }
}
