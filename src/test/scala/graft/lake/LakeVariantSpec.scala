package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** VARIANT as first-class lake data. Spark pins VariantType
  * unorderable (no hash, no comparison, no set ops), so the engine's
  * row-image sites — CDC change tests, changelog set-differences,
  * content-hash salts — substitute each variant column's canonical
  * JSON text ([[LakeTable.containsVariant]] /
  * [[LakeTable.exceptAllVariantSafe]]). These specs drive the paths a
  * plain-typed table exercises elsewhere: write/merge/delete,
  * changelog with and without row lineage, compaction, and the
  * nested-variant refusal. */
class LakeVariantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(ids: Seq[Long], tag: String): DataFrame =
    ids.toDF("id").selectExpr("id",
      s"""parse_json(concat('{"tag":"$tag","n":', id, '}')) AS v""")

  private def tags(t: LakeTable): Map[Long, String] =
    t.scan().selectExpr("id",
        "variant_get(v, '$.tag', 'string') AS tag")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("variant columns ride create → append → merge → delete; " +
      "typed extraction sees the merged values") {
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("lakevar-crud") + "/t", df(Nil, "x").schema)
    t.append(df(1L to 20L, "base"))
    t.merge(df((1L to 20L).filter(_ % 4 == 0), "merged"), Seq("id"))
    t.delete(col("id") % 5 === 0)
    val got = tags(t)
    val expect = (1L to 20L).filter(_ % 5 != 0)
      .map(i => i -> (if (i % 4 == 0) "merged" else "base")).toMap
    assert(got == expect)
    // the variant survives a full binary round-trip, not just a
    // projection: whole-object serialization matches a fresh parse
    val js = t.scan().selectExpr("id", "to_json(v) AS j")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    expect.foreach { case (i, tag) =>
      assert(js(i) == s"""{"n":$i,"tag":"$tag"}""" ||
        js(i) == s"""{"tag":"$tag","n":$i}""", s"id $i: ${js(i)}")
    }
  }

  test("changes() on a variant table WITHOUT lineage: the id-less " +
      "set-difference legs compare via JSON text and restore real " +
      "variants; carried rows cancel") {
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("lakevar-cdc") + "/t", df(Nil, "x").schema)
    t.append(df(1L to 10L, "base").coalesce(1))
    val s1 = t.currentSnapshotId.get
    // COW update rewrites the file: the 8 un-touched rows are carried
    // and must CANCEL in the changelog even though their comparison
    // ran over substituted JSON text
    t.merge(df(Seq(3L, 7L), "upd"), Seq("id"))
    val ch = t.changes(s1, t.currentSnapshotId.get)
    val byType = ch.groupBy(LakeTable.CHANGE_TYPE_COL).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("insert" -> 2L, "delete" -> 2L), s"$byType")
    // restored values are VARIANTS (typed extraction works), and the
    // post-image carries the updated object
    val ins = ch.where(col(LakeTable.CHANGE_TYPE_COL) === "insert")
      .selectExpr("id", "variant_get(v, '$.tag', 'string') AS tag")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ins == Map(3L -> "upd", 7L -> "upd"))
  }

  test("changesWithLineage() on a variant table: the id-keyed change " +
      "test compares JSON text but emits original variant images") {
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("lakevar-cdclin") + "/t", df(Nil, "x").schema,
      properties = Map(LakeTable.PROP_ROW_LINEAGE -> "true"))
    t.append(df(1L to 10L, "base").coalesce(1))
    val s1 = t.currentSnapshotId.get
    t.merge(df(Seq(4L), "upd"), Seq("id"))
    val ch = t.changesWithLineage(s1, t.currentSnapshotId.get)
    val got = ch.selectExpr(LakeTable.CHANGE_TYPE_COL, "id",
        "variant_get(v, '$.tag', 'string') AS tag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == Set(("update_preimage", 4L, "base"),
      ("update_postimage", 4L, "upd")), s"$got")
  }

  test("binPack compaction on a variant table: the content-hash salt " +
      "substitutes JSON text; rows and values are invariant") {
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("lakevar-pack") + "/t", df(Nil, "x").schema)
    (1 to 4).foreach(k =>
      t.append(df((k * 100L) to (k * 100L + 24L), s"b$k").coalesce(1)))
    val before = tags(t)
    assert(t.currentSnapshot.get.liveFiles.size >= 4)
    t.binPack(1L << 26)
    assert(t.currentSnapshot.get.liveFiles.size < 4)
    assert(tags(t) == before)
  }

  test("exceptAllVariantSafe: value-equal variants cancel whatever " +
      "their construction; SQL NULL and variant JSON-null stay " +
      "distinct; nested variants refuse loudly") {
    val a = Seq(1L, 2L, 3L).toDF("id")
      .selectExpr("id", "parse_json(concat('{\"n\":', id, '}')) AS v")
    // same VALUES built through a different expression tree
    val b = Seq(1L, 2L).toDF("id")
      .selectExpr("id",
        "parse_json(to_json(named_struct('n', id))) AS v")
    val left = LakeTable.exceptAllVariantSafe(a, b)
    assert(left.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // the survivor is a real variant again
    assert(left.selectExpr("variant_get(v, '$.n', 'long')")
      .collect().head.getLong(0) == 3L)

    val nulls = spark.sql(
      "SELECT 1L AS id, CAST(NULL AS variant) AS v " +
        "UNION ALL SELECT 2L, parse_json('null')")
    val jsonNullOnly = LakeTable.exceptAllVariantSafe(
      nulls, nulls.where("id = 1"))
    assert(jsonNullOnly.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(jsonNullOnly.selectExpr("to_json(v)").collect()
      .head.getString(0) == "null")

    val nested = Seq(1L).toDF("id")
      .selectExpr("id", "named_struct('x', parse_json('1')) AS s")
    val e = intercept[IllegalArgumentException](
      LakeTable.exceptAllVariantSafe(nested, nested))
    assert(e.getMessage.contains("nested inside"))
  }
}
