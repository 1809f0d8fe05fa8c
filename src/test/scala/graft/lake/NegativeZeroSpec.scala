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
}
