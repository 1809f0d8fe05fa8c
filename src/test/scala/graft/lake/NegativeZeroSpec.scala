package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Upstream pushdown hole: on vanilla Spark 4.1.2, `WHERE x = -0.0`
  * against a parquet file whose pages hold only +0.0 silently returns
  * nothing under filter pushdown. Lake scans normalize the -0.0
  * comparison literal to +0.0 (equal under Spark semantics), closing
  * the hole for every session that touched a LakeTable. */
class NegativeZeroSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("x = -0.0 finds +0.0 rows through a lake scan") {
    val root = TestSpark.tmpDir("negzero") + "/t"
    // the shape that loses rows on vanilla Spark: +0.0 present, -0.0
    // absent, file bounds straddling zero (no stats-based rescue)
    val df = Seq((1L, 0.0), (2L, -77.0), (3L, 0.0), (4L, 89.0))
      .toDF("k", "x")
    val t = LakeTable.create(spark, root, df.schema)
    t.append(df.coalesce(1))
    assert(t.scan().where($"x" === -0.0).count() == 2)
    assert(t.scan().where($"x" === 0.0).count() == 2)
    assert(t.scan().where($"x".isin(-0.0, 89.0)).count() == 3)
    // float too
    val root2 = TestSpark.tmpDir("negzero-f") + "/t"
    val df2 = Seq((1L, 0.0f), (2L, -77.0f)).toDF("k", "x")
    val t2 = LakeTable.create(spark, root2, df2.schema)
    t2.append(df2.coalesce(1))
    assert(t2.scan().where($"x" === -0.0f).count() == 1)
  }

  test("x = 0.0 finds rows in a -0.0-only file (mirror direction)") {
    // The symmetric shape: pages hold ONLY -0.0, predicate uses the
    // +0.0 literal. Vanilla Spark 4.1.2 parquet pushdown drops these
    // rows too (SQL equality says 0.0 == -0.0); round 7 fixed only the
    // -0.0-literal direction and the FileIndex property caught this one.
    val root = TestSpark.tmpDir("poszero") + "/t"
    val df = Seq((1L, -0.0), (2L, -0.0), (3L, -55.0)).toDF("k", "x")
    val t = LakeTable.create(spark, root, df.schema)
    t.append(df.coalesce(1))
    assert(t.scan().where($"x" === 0.0).count() == 2)
    assert(t.scan().where(lit(0.0) === $"x").count() == 2)
    assert(t.scan().where($"x" <=> 0.0).count() == 2)
    assert(t.scan().where($"x".isin(0.0, -55.0)).count() == 3)
    // float mirror
    val root2 = TestSpark.tmpDir("poszero-f") + "/t"
    val df2 = Seq((1L, -0.0f), (2L, 42.0f)).toDF("k", "x")
    val t2 = LakeTable.create(spark, root2, df2.schema)
    t2.append(df2.coalesce(1))
    assert(t2.scan().where($"x" === 0.0f).count() == 1)
    assert(t2.scan().where($"x" <=> 0.0f).count() == 1)
  }

  test("null-safe zero equality keeps null-in → false semantics") {
    // <=> rewrites to IsNotNull AND range — must still be FALSE (not
    // null) for null inputs, and must not lose the cross-sign match.
    val root = TestSpark.tmpDir("negzero-nullsafe") + "/t"
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, -0.0), (2L, null), (3L, 7.0)).toDF("k", "x")
    val t = LakeTable.create(spark, root, df.schema)
    t.append(df.coalesce(1))
    assert(t.scan().where($"x" <=> 0.0).select($"k").as[Long].collect().toSet
      == Set(1L))
    // projection context: null row must project null for =, false for <=>
    val proj = t.scan()
      .select($"k", ($"x" === 0.0).as("eq"), ($"x" <=> 0.0).as("nseq"))
      .collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getBoolean(1), r.getBoolean(2))))
      .toMap
    assert(proj(2L) == ((null, false)))
    assert(proj(1L) == ((true, true)))
  }
}
