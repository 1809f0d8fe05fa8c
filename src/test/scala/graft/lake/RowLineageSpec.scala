package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Row lineage (Iceberg v3 shape): stable `_row_id` assigned once at
  * commit (per-file first_row_id blocks — appends store nothing per
  * row) and preserved through every COW rewrite. */
class RowLineageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(tag: String, extraProps: Map[String, String] =
      Map.empty): LakeTable = {
    val df = Seq((1L, "a", 1.0)).toDF("id", "v", "x")
    LakeTable.create(spark, TestSpark.tmpDir(tag) + "/t", df.schema,
      properties = Map(LakeTable.PROP_ROW_LINEAGE -> "true") ++ extraProps)
  }

  private def ids(lt: LakeTable): Map[Long, Long] =
    lt.scanWithLineage().select("id", LakeTable.ROW_ID_COL)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("appends assign unique dense ids with zero per-row storage") {
    val lt = freshTable("lineage-append")
    lt.append((1L to 10L).map(i => (i, s"v$i", i.toDouble))
      .toDF("id", "v", "x"))
    lt.append((11L to 15L).map(i => (i, s"v$i", i.toDouble))
      .toDF("id", "v", "x"))
    val m = ids(lt)
    assert(m.size == 15)
    assert(m.values.toSeq.distinct.size == 15) // unique
    assert(m.values.min == 0L)                 // ids start at 0
    // counter advanced by exactly the appended rows
    assert(lt.properties(LakeTable.PROP_NEXT_ROW_ID).toLong == 15L)
    // appends did NOT write a physical _row_id column (first_row_id
    // blocks only): plain parquet read of the data files lacks it
    val raw = spark.read.parquet(lt.root + "/data")
    assert(!raw.columns.contains(LakeTable.ROW_ID_COL))
  }

  test("COW merge: updated rows keep ids, inserts get fresh ones") {
    val lt = freshTable("lineage-merge")
    lt.append((1L to 10L).map(i => (i, s"v$i", i.toDouble))
      .toDF("id", "v", "x"))
    val before = ids(lt)
    lt.merge(Seq((3L, "UP", 0.0), (99L, "NEW", 0.0))
      .toDF("id", "v", "x"), Seq("id"))
    val after = ids(lt)
    assert(after.size == 11)
    // every pre-existing row (updated or carried) kept its id
    before.foreach { case (k, rid) => assert(after(k) == rid,
      s"row $k changed id $rid -> ${after(k)}") }
    // the insert got a FRESH id beyond every pre-merge id
    assert(after(99L) > before.values.max)
    assert(after.values.toSeq.distinct.size == 11)
    // updated row really updated
    assert(lt.scan().where($"id" === 3L).select("v")
      .head().getString(0) == "UP")
  }

  test("COW delete and update preserve survivor ids") {
    val lt = freshTable("lineage-del")
    lt.append((1L to 10L).map(i => (i, s"v$i", i.toDouble))
      .toDF("id", "v", "x"))
    val before = ids(lt)
    lt.delete($"id" % 2L === 0L)
    lt.update($"id" === 3L, Map("v" -> lit("U")))
    val after = ids(lt)
    assert(after.keySet == (1L to 10L by 2).toSet)
    after.foreach { case (k, rid) => assert(before(k) == rid) }
  }

  test("compaction carries every id through the rewrite") {
    val lt = freshTable("lineage-compact")
    (1L to 4L).foreach(i => lt.append(
      Seq((i, s"v$i", i.toDouble)).toDF("id", "v", "x")))
    val before = ids(lt)
    lt.compact(1)
    assert(ids(lt) == before)
    // post-compaction files DO carry the physical column (mergeSchema:
    // the pre-compaction originals remain on disk for time travel and
    // would otherwise win the footer-sampled schema)
    val raw = spark.read.option("mergeSchema", "true")
      .parquet(lt.root + "/data")
    assert(raw.columns.contains(LakeTable.ROW_ID_COL))
  }

  test("SQL MERGE with assignments preserves target ids") {
    val lt = freshTable("lineage-clauses")
    lt.append((1L to 5L).map(i => (i, s"v$i", i.toDouble))
      .toDF("id", "v", "x"))
    val before = ids(lt)
    lt.mergeClauses(Seq((2L, "v2", 9.9)).toDF("id", "v", "x"), Seq("id"),
      matched = Seq(MergeWhen(None,
        Some(Map("x" -> col("s.x"))))),
      notMatched = Nil)
    val after = ids(lt)
    assert(after == before)
    assert(lt.scan().where($"id" === 2L).select("x")
      .head().getDouble(0) == 9.9)
  }

  test("changelog classifies updates by row identity (CDF vocabulary)") {
    val lt = freshTable("lineage-cdc")
    lt.append((1L to 10L).map(i => (i, s"v$i", i.toDouble))
      .toDF("id", "v", "x"))
    val s1 = lt.currentSnapshotId.get
    lt.update($"id" === 3L, Map("v" -> lit("U")))
    lt.delete($"id" === 5L)
    lt.merge(Seq((4L, "M", 0.0), (99L, "NEW", 0.0))
      .toDF("id", "v", "x"), Seq("id"))
    val ch = lt.changesWithLineage(s1, lt.currentSnapshotId.get)
    val counts = ch.groupBy(LakeTable.CHANGE_TYPE_COL).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // id 3 (UPDATE) and id 4 (matched MERGE) are update pairs; id 5 a
    // delete; id 99 an insert — carried rewrite rows appear NOWHERE
    assert(counts == Map("update_preimage" -> 2L,
      "update_postimage" -> 2L, "delete" -> 1L, "insert" -> 1L), counts)
    // each update pair shares ONE row id across pre and post image
    val pairs = ch.where(col(LakeTable.CHANGE_TYPE_COL)
        .startsWith("update"))
      .groupBy("id", LakeTable.ROW_ID_COL).count().collect()
    assert(pairs.length == 2 && pairs.forall(_.getLong(2) == 2L))
    // a non-lineage table refuses the typed changelog
    val plain = LakeTable.create(spark,
      TestSpark.tmpDir("lineage-cdc-off") + "/t",
      Seq((1L, "a")).toDF("id", "v").schema)
    intercept[IllegalArgumentException](plain.changesWithLineage(0L, 1L))
  }

  test("a table without the property refuses the lineage scan") {
    val df = Seq((1L, "a")).toDF("id", "v")
    val lt = LakeTable.create(spark,
      TestSpark.tmpDir("lineage-off") + "/t", df.schema)
    lt.append(df)
    intercept[IllegalArgumentException](lt.scanWithLineage())
    // and the counter property never appears
    assert(!lt.properties.contains(LakeTable.PROP_NEXT_ROW_ID))
  }

  test("_row_id is a reserved name wherever lineage is on") {
    import org.apache.spark.sql.types.LongType
    val clash = Seq((1L, 2L)).toDF("id", LakeTable.ROW_ID_COL)
    // create: a user column named _row_id + lineage would duplicate in
    // every lineage projection and COW rewrite
    intercept[IllegalArgumentException](LakeTable.create(spark,
      TestSpark.tmpDir("lineage-resv") + "/t", clash.schema,
      properties = Map(LakeTable.PROP_ROW_LINEAGE -> "true")))
    // schema evolution on a lineage table can't mint one either
    val lt = LakeTable.create(spark,
      TestSpark.tmpDir("lineage-resv2") + "/t",
      Seq((1L, "a")).toDF("id", "v").schema,
      properties = Map(LakeTable.PROP_ROW_LINEAGE -> "true"))
    intercept[IllegalArgumentException](
      lt.addColumn(LakeTable.ROW_ID_COL, LongType))
    intercept[IllegalArgumentException](
      lt.renameColumn("v", LakeTable.ROW_ID_COL))
    // nor can lineage be switched on over an existing _row_id column
    val plain = LakeTable.create(spark,
      TestSpark.tmpDir("lineage-resv3") + "/t", clash.schema)
    intercept[IllegalArgumentException](plain.setProperties(
      Map(LakeTable.PROP_ROW_LINEAGE -> "true")))
    // without lineage the name stays an ordinary (if ill-advised) column
    plain.append(clash)
    assert(plain.scan().count() == 1)
  }
}
