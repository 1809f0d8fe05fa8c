package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE` — full-sync
  * MERGE: target rows whose key is absent from the source drop (within
  * the cond scope) in the same commit that upserts the rest. Covers the
  * COW and MOR paths plus the SQL text spelling. */
class MergeSyncSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(root: String,
      props: Map[String, String] = Map.empty) = {
    val df = (1L to 100L).map(i => (i, i % 4, s"v$i")).toDF("id", "grp", "v")
    val t = LakeTable.create(spark, root, df.schema, properties = props)
    t.append(df.repartition(2))
    t
  }

  test("unconditional sync: unmatched target rows drop, rest upserts") {
    val t = freshTable(TestSpark.tmpDir("sync") + "/t")
    // source keeps only even ids, updates their payload, adds id 200
    val src = ((2L to 100L by 2) :+ 200L).map(i => (i, i % 4, "S"))
      .toDF("id", "grp", "v")
    t.merge(src, Seq("id"), None, Some(lit(true)))
    val got = t.scan()
    assert(got.count() == 51) // 50 evens + the insert
    assert(got.where($"id" % 2 === 1 && $"id" < 200).count() == 0)
    assert(got.where($"v" =!= "S").count() == 0)
  }

  test("conditional sync scopes the drop; outside rows carry") {
    val t = freshTable(TestSpark.tmpDir("sync-cond") + "/t")
    // sync group 1 only: its surviving members are the source rows
    val src = Seq((1L, 1L, "S"), (5L, 1L, "S")).toDF("id", "grp", "v")
    t.merge(src, Seq("id"), None, Some(col("grp") === 1))
    val got = t.scan()
    // group 1 had 25 members (1,5,...,97) -> now exactly the 2 synced
    assert(got.where($"grp" === 1).count() == 2)
    assert(got.where($"grp" === 1 && $"v" =!= "S").count() == 0)
    // other groups untouched
    assert(got.where($"grp" =!= 1).count() == 75)
    assert(got.where($"grp" =!= 1 && $"v" === "S").count() == 0)
  }

  test("MOR sync: zero data-file rewrite, same end state as COW") {
    val props = Map(
      LakeTable.PROP_MERGE_MODE -> "merge-on-read",
      LakeTable.PROP_DELETE_MODE -> "merge-on-read")
    val mor = freshTable(TestSpark.tmpDir("sync-mor") + "/t", props)
    val cow = freshTable(TestSpark.tmpDir("sync-cow") + "/t")
    val src = Seq((4L, 0L, "S"), (8L, 0L, "S"), (400L, 0L, "S"))
      .toDF("id", "grp", "v")
    val before = mor.currentSnapshot.get.liveFiles.toSet
    mor.merge(src, Seq("id"), None, Some(col("grp") === 0))
    cow.merge(src, Seq("id"), None, Some(col("grp") === 0))
    val snap = mor.currentSnapshot.get
    assert(snap.removedFiles.isEmpty)
    assert(before.subsetOf(snap.liveFiles.toSet))
    assert(mor.scan().orderBy("id").collect().toSeq ==
      cow.scan().orderBy("id").collect().toSeq)
  }

  test("sync composes with CDC deleteWhen in one statement") {
    val t = freshTable(TestSpark.tmpDir("sync-cdc") + "/t")
    // CDC batch over group 2: id 2 deletes by Op, id 6 updates; every
    // other group-2 member is absent from the source -> sync-dropped
    val src = Seq((2L, 2L, "x", "D"), (6L, 2L, "S", "U"))
      .toDF("id", "grp", "v", "Op")
    t.merge(src, Seq("id"), deleteWhen = Some(col("Op") === "D"),
      dropUnmatchedWhen = Some(col("grp") === 2))
    val got = t.scan()
    assert(got.where($"grp" === 2).select("id").as[Long].collect()
      .toSeq == Seq(6L))
    assert(got.count() == 76) // 75 other-group rows + id 6
  }

  test("SQL text: WHEN NOT MATCHED BY SOURCE AND cond THEN DELETE") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("sync-sql"))
    cat.createNamespace("ns")
    val df = (1L to 40L).map(i => (i, i % 2, s"v$i")).toDF("id", "grp", "v")
    cat.createTable("ns", "tt", df.schema)
    cat.loadTable("ns", "tt").append(df)
    Seq((2L, 0L, "S"), (41L, 0L, "S")).toDF("id", "grp", "v")
      .createOrReplaceTempView("__sync_spec_src")
    cat.sql("ns",
      """MERGE INTO tt AS t USING __sync_spec_src AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.grp = 0 THEN DELETE""".stripMargin)
    val got = cat.loadTable("ns", "tt").scan()
    // evens (grp 0) collapse to {2, 41}; odds untouched
    assert(got.where($"grp" === 0).select("id").as[Long].collect()
      .toSet == Set(2L, 41L))
    assert(got.where($"grp" === 1).count() == 20)
    spark.catalog.dropTempView("__sync_spec_src")
  }

  test("SQL text: an UPDATE action under NOT MATCHED BY SOURCE applies") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("sync-rej"))
    cat.createNamespace("ns")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    cat.createTable("ns", "tt", df.schema)
    cat.loadTable("ns", "tt").append(df)
    Seq((1L, "upd")).toDF("id", "v").createOrReplaceTempView("__sync_rej_src")
    // NMBS UPDATE routes through the general clause path: target rows
    // with no source match take the assignment, matched rows upsert
    cat.sql("ns",
      """MERGE INTO tt AS t USING __sync_rej_src AS s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'x'""".stripMargin)
    val got = cat.sql("ns", "SELECT id, v FROM tt ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "upd"), (2L, "x")))
    spark.catalog.dropTempView("__sync_rej_src")
  }
}
