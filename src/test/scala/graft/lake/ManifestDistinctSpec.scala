package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DISTINCT shapes over the manifest: `SELECT DISTINCT part` folds via
  * the grouped rewrite; `count(DISTINCT part)` folds via the
  * point-valued distinct proof — both zero data I/O; non-point columns
  * fall back and stay exact. */
class ManifestDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hasFileScan(q: org.apache.spark.sql.DataFrame): Boolean = {
    q.collect()
    def scan(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.exists {
        case _: org.apache.spark.sql.execution.FileSourceScanExec => true
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => scan(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => scan(s.plan)
        case _ => false
      }
    scan(q.queryExecution.executedPlan)
  }

  test("SELECT DISTINCT part and count(DISTINCT part) answer from the " +
      "manifest on an identity-partitioned table") {
    val df = (1L to 90L).map(i =>
      (i, if (i % 5 == 0) None else Some(s"p${i % 3}"), s"v$i"))
      .toDF("k", "p", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-dist"))
    cat.createNamespace("ns")
    val t = cat.createTable("ns", "t", df.schema, partitionBy = Seq("p"))
    t.append(df)
    val q1 = cat.sql("ns", "SELECT DISTINCT p FROM t")
    assert(q1.collect().map(r =>
      if (r.isNullAt(0)) "NULL" else r.getString(0)).toSet ==
      Set("p0", "p1", "p2", "NULL"))
    assert(!hasFileScan(q1), q1.queryExecution.executedPlan.toString)
    // count(DISTINCT p) ignores the NULL partition: 3, not 4
    val q2 = cat.sql("ns", "SELECT count(DISTINCT p) AS n FROM t")
    assert(q2.collect().head.getLong(0) == 3L)
    assert(!hasFileScan(q2), q2.queryExecution.executedPlan.toString)
    // mixed with provable plain aggregates in one statement
    val q3 = cat.sql("ns",
      "SELECT count(DISTINCT p) AS nd, count(*) AS n, max(k) AS mx FROM t")
    val r3 = q3.collect().head
    assert(r3.getLong(0) == 3L && r3.getLong(1) == 90L &&
      r3.getLong(2) == 90L)
    assert(!hasFileScan(q3), q3.queryExecution.executedPlan.toString)
    // FILTERED leg composes: distinct within one partition's files
    val q4 = cat.sql("ns",
      "SELECT count(DISTINCT p) AS n FROM t WHERE p = 'p1'")
    assert(q4.collect().head.getLong(0) == 1L)
    assert(!hasFileScan(q4), q4.queryExecution.executedPlan.toString)
  }

  test("count(DISTINCT col) over a non-point column falls back and " +
      "stays exact") {
    val df = (1L to 60L).map(i => (i, s"v${i % 7}")).toDF("k", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-dist-fb"))
    cat.createNamespace("ns")
    val t = cat.createTable("ns", "t", df.schema)
    t.append(df)
    val q = cat.sql("ns", "SELECT count(DISTINCT v) AS n FROM t")
    assert(q.collect().head.getLong(0) == 7L)
    assert(hasFileScan(q), q.queryExecution.executedPlan.toString)
  }
}
