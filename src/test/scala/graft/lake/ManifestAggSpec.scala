package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata-only MIN/MAX (+ count) via ManifestAggRule: with a
  * fully-informed manifest and no outstanding deletes, a global
  * min/max/count aggregate is driver arithmetic over manifest bounds —
  * zero data I/O; every unprovable shape (filters, zero/NaN-touched fp
  * bounds, MOR delete state, expression projections) falls back to the
  * scan and stays exact. */
class ManifestAggSpec extends AnyFunSuite {
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

  test("global min/max/count answer from the manifest: no file scan") {
    val df = (1L to 500L).map { i =>
      (i, s"s${500 - i}", new Timestamp(1700000000000L + i * 1000L),
        i % 2 == 0)
    }.toDF("k", "s", "ts", "b")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df.repartition(4))

    val q = cat.sql("ns",
      """SELECT count(*) AS n, min(k) AS mnk, max(k) AS mxk,
        |  min(s) AS mns, max(s) AS mxs, min(ts) AS mnt, max(ts) AS mxt,
        |  min(b) AS mnb, max(b) AS mxb FROM t""".stripMargin)
    val r = q.collect().head
    assert(r.getLong(0) == 500L)
    assert(r.getLong(1) == 1L && r.getLong(2) == 500L)
    assert(r.getString(3) == "s0" && r.getString(4) == "s99")
    assert(r.getTimestamp(5) == new Timestamp(1700000001000L))
    assert(r.getTimestamp(6) == new Timestamp(1700000500000L))
    assert(!r.getBoolean(7) && r.getBoolean(8))
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)

    // DataFrame API path gets the same rewrite
    val api = cat.loadTable("ns", "t").scan()
      .agg(min($"k").as("mnk"), max($"s").as("mxs"))
    assert(api.collect().head.getLong(0) == 1L)
    assert(!hasFileScan(api))

    // expressions OVER metadata aggregates fold too (CollapseProject
    // merges the outer projection into the Aggregate; every aggregate
    // leaf substitutes its manifest constant, the rest evaluates)
    val exprQ = cat.sql("ns",
      """SELECT max(k) - min(k) AS span,
        |  unix_micros(max(ts)) AS mx_us,
        |  count(*) * 2 AS n2 FROM t""".stripMargin)
    val er = exprQ.collect().head
    assert(er.getLong(0) == 499L)
    assert(er.getLong(1) == 1700000500000000L)
    assert(er.getLong(2) == 1000L)
    assert(!hasFileScan(exprQ), exprQ.queryExecution.executedPlan.toString)
  }

  test("proven all-null column: NULL min/max with no scan") {
    val df = (1L to 50L).map(i => (i, Option.empty[java.lang.Long]))
      .toDF("k", "empty")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-null"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df.repartition(2))
    val q = cat.sql("ns",
      "SELECT min(empty) AS mn, max(empty) AS mx, min(k) AS mnk FROM t")
    val r = q.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getLong(2) == 1L)
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)
  }

  test("count(col) answers as rows minus recorded nulls, no scan") {
    val df = (1L to 90L).map(i =>
      (i, if (i % 3 == 0) None else Some(s"v$i"))).toDF("k", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-cnt"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df.repartition(3))
    val q = cat.sql("ns",
      "SELECT count(v) AS nv, count(k) AS nk, count(*) AS n FROM t")
    val r = q.collect().head
    assert(r.getLong(0) == 60L && r.getLong(1) == 90L &&
      r.getLong(2) == 90L)
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)
    // count(col) never depends on bounds exactness (null counts are
    // type-agnostic) — fp columns answer it regardless of zero/NaN
    val dd = (1L to 40L).map(i =>
      (i, if (i % 4 == 0) None else Some(i / 3.0))).toDF("k", "x")
    cat.createTable("ns", "d", dd.schema)
    cat.loadTable("ns", "d").append(dd)
    val qd = cat.sql("ns", "SELECT count(x) AS nx FROM d")
    assert(qd.collect().head.getLong(0) == 30L)
    assert(!hasFileScan(qd), qd.queryExecution.executedPlan.toString)
  }

  test("grouped by identity partition: per-group answers with no scan") {
    val df = (1L to 300L).map { i =>
      val p = if (i % 5 == 0) None else Some(s"g${i % 3}")
      (i, p, s"v$i")
    }.toDF("k", "p", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-grp"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema, partitionBy = Seq("p"))
    cat.loadTable("ns", "t").append(df)

    val q = cat.sql("ns",
      """SELECT p, count(*) AS n, min(k) AS mn, max(k) AS mx
        |FROM t GROUP BY p""".stripMargin)
    val got = q.collect().map(r =>
      (if (r.isNullAt(0)) "NULL" else r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val exp = df.groupBy("p")
      .agg(count(lit(1)).as("n"), min($"k").as("mn"), max($"k").as("mx"))
      .collect().map(r =>
        (if (r.isNullAt(0)) "NULL" else r.getString(0),
          r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == exp && got.size == 4) // g0 g1 g2 + NULL partition
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)

    // expressions over the group key and aggregates fold too
    val qe = cat.sql("ns",
      """SELECT upper(p) AS pu, count(*) * 2 AS n2, max(k) - min(k) AS d
        |FROM t GROUP BY p""".stripMargin)
    assert(qe.collect().length == 4)
    assert(!hasFileScan(qe), qe.queryExecution.executedPlan.toString)

    // grouping on a column whose files straddle values: falls back
    val qf = cat.sql("ns",
      "SELECT v, count(*) AS n FROM t GROUP BY v")
    assert(qf.collect().length == 300)
    assert(hasFileScan(qf))
  }

  test("multi-column partition grouping folds per (a, b) group, no scan") {
    val df = (1L to 240L).map { i =>
      (i, s"d${i % 2}", if (i % 3 == 0) None else Some(s"s${i % 2}"))
    }.toDF("k", "day", "src")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-grp2"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema,
      partitionBy = Seq("day", "src"))
    cat.loadTable("ns", "t").append(df)
    val q = cat.sql("ns",
      """SELECT day, src, count(*) AS n, max(k) AS mx
        |FROM t GROUP BY day, src""".stripMargin)
    val got = q.collect().map(r => (r.getString(0),
      if (r.isNullAt(1)) "NULL" else r.getString(1),
      r.getLong(2), r.getLong(3))).toSet
    val exp = df.groupBy("day", "src")
      .agg(count(lit(1)).as("n"), max($"k").as("mx"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) "NULL" else r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == exp && got.size == 4) // (d0|d1) × (s-val|NULL)
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)
  }

  test("float/double min/max answer from the manifest when the folded " +
      "bounds are provably exact (non-zero, no NaN files)") {
    val df = (1L to 300L).map(i => (i, i / 7.0, (i * 0.5).toFloat))
      .toDF("k", "x", "f")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-fp"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df.repartition(3))
    val q = cat.sql("ns",
      """SELECT min(x) AS mnx, max(x) AS mxx,
        |  min(f) AS mnf, max(f) AS mxf FROM t""".stripMargin)
    val r = q.collect().head
    assert(r.getDouble(0) == 1 / 7.0 && r.getDouble(1) == 300 / 7.0)
    assert(r.getFloat(2) == 0.5f && r.getFloat(3) == 150.0f)
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)
    // ... and as the MEASURE of a grouped-by-partition rewrite
    val pdf = (1L to 90L).map(i => (i, s"g${i % 3}", i + 0.25))
      .toDF("k", "g", "x")
    val pt = LakeTable.create(spark, TestSpark.tmpDir("magg-fpg") + "/t",
      pdf.schema, partitionBy = Seq("g"))
    pt.append(pdf)
    val gq = pt.scan().groupBy($"g")
      .agg(min($"x").as("mn"), max($"x").as("mx"))
    val rows = gq.collect().map(r0 =>
      r0.getString(0) -> (r0.getDouble(1), r0.getDouble(2))).toMap
    assert(rows("g0") == (3.25, 90.25) && rows("g1") == (1.25, 88.25))
    assert(!hasFileScan(gq), gq.queryExecution.executedPlan.toString)
  }

  test("FP bounds that fold to ±0.0 block the rewrite: the stored sign " +
      "is widened, so the scan answers — exact either way") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-fp0"))
    cat.createNamespace("ns")
    // corpus crossing zero: folded min is negative (exact) but folded
    // max path must survive a file whose max IS 0.0
    val df = Seq((1L, -3.5), (2L, -1.0), (3L, 0.0)).toDF("k", "x")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df.repartition(1))
    val q = cat.sql("ns", "SELECT min(x) AS mn, max(x) AS mx FROM t")
    val r = q.collect().head
    assert(r.getDouble(0) == -3.5 && r.getDouble(1) == 0.0)
    assert(hasFileScan(q), q.queryExecution.executedPlan.toString)
    // the DANGEROUS corpus the guard exists for: a file holding -0.0
    // records widened bounds (-0.0, 0.0); answering max from metadata
    // would return +0.0 for a value that is bitwise -0.0
    val dz = Seq((1L, -0.0), (2L, -2.0)).toDF("k", "x")
    cat.createTable("ns", "z", dz.schema)
    cat.loadTable("ns", "z").append(dz.repartition(1))
    val qz = cat.sql("ns", "SELECT max(x) AS mx FROM z")
    assert(hasFileScan(qz), qz.queryExecution.executedPlan.toString)
    assert(java.lang.Double.doubleToRawLongBits(
      qz.collect().head.getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(-0.0))
  }

  test("a NaN-bearing file blocks the FP rewrite: fallback scan keeps " +
      "Spark's NaN-is-largest max semantics") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-fpnan"))
    cat.createNamespace("ns")
    val df = Seq((1L, 1.5), (2L, Double.NaN), (3L, 7.5)).toDF("k", "x")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df.repartition(1))
    val q = cat.sql("ns", "SELECT min(x) AS mn, max(x) AS mx FROM t")
    val r = q.collect().head
    assert(r.getDouble(0) == 1.5 && r.getDouble(1).isNaN)
    assert(hasFileScan(q), q.queryExecution.executedPlan.toString)
  }

  test("FP GROUP KEYS never rewrite (normalized keys could flip a " +
      "zero's sign): fallback scan, exact") {
    val df = Seq((1L, 2.5), (2L, 2.5), (3L, 4.5)).toDF("k", "g")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-fpkey"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df)
    val q = cat.sql("ns",
      "SELECT g, count(*) AS n FROM t GROUP BY g")
    assert(q.collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap ==
      Map(2.5 -> 2L, 4.5 -> 1L))
    assert(hasFileScan(q), q.queryExecution.executedPlan.toString)
  }

  test("FILTERED aggregates answer from the manifest when the file " +
      "split is proven: partition equality, zero data I/O") {
    val df = (1L to 120L).map(i =>
      (i, s"p${i % 3}", i * 1.5, if (i % 4 == 0) None else Some(s"v$i")))
      .toDF("k", "p", "x", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-fw"))
    cat.createNamespace("ns")
    val t = cat.createTable("ns", "t", df.schema, partitionBy = Seq("p"))
    t.append(df.repartition(2))
    val q = cat.sql("ns",
      """SELECT count(*) AS n, count(v) AS nv, min(k) AS mn,
        |  max(k) AS mx, max(x) AS mxx, max(k) - min(k) AS span
        |FROM t WHERE p = 'p1'""".stripMargin)
    val r = q.collect().head
    val keys = (1L to 120L).filter(_ % 3 == 1)
    assert(r.getLong(0) == keys.size)
    assert(r.getLong(1) == keys.count(_ % 4 != 0))
    assert(r.getLong(2) == keys.min && r.getLong(3) == keys.max)
    assert(r.getDouble(4) == keys.max * 1.5)
    assert(r.getLong(5) == keys.max - keys.min)
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)
    // IS NULL partition condition folds over the null-dir files
    val nf = df.withColumn("p",
      when($"k" % 2 === 0, $"p").otherwise(lit(null)))
    val t2 = cat.createTable("ns", "t2", nf.schema, partitionBy = Seq("p"))
    t2.append(nf)
    val qn = cat.sql("ns",
      "SELECT count(*) AS n, min(k) AS mn FROM t2 WHERE p IS NULL")
    val rn = qn.collect().head
    assert(rn.getLong(0) == 60L && rn.getLong(1) == 1L)
    assert(!hasFileScan(qn), qn.queryExecution.executedPlan.toString)
    // zero matching files: SQL's empty-input row, still metadata-only
    val qe = cat.sql("ns",
      "SELECT count(*) AS n, min(k) AS mn FROM t WHERE p = 'absent'")
    val re = qe.collect().head
    assert(re.getLong(0) == 0L && re.isNullAt(1))
    assert(!hasFileScan(qe), qe.queryExecution.executedPlan.toString)
  }

  test("FILTERED aggregates: a range aligned with file bounds answers; " +
      "a straddling range falls back — exact either way") {
    val df = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-fwr"))
    cat.createNamespace("ns")
    val t = cat.createTable("ns", "t", df.schema)
    // two appends with DISJOINT key ranges = file-aligned cut at 100
    t.append(df.where($"k" <= 100).repartition(1))
    t.append(df.where($"k" > 100).repartition(1))
    val aligned = cat.sql("ns",
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM t " +
        "WHERE k > 100")
    val ra = aligned.collect().head
    assert(ra.getLong(0) == 100L && ra.getLong(1) == 101L &&
      ra.getLong(2) == 200L)
    assert(!hasFileScan(aligned),
      aligned.queryExecution.executedPlan.toString)
    // a cut through a file blocks the proof: normal pruned scan, exact
    val straddle = cat.sql("ns",
      "SELECT count(*) AS n, min(k) AS mn FROM t WHERE k > 150")
    val rs = straddle.collect().head
    assert(rs.getLong(0) == 50L && rs.getLong(1) == 151L)
    assert(hasFileScan(straddle))
    // MOR delete state blocks it by plan shape (anti-join below filter)
    val tm = cat.createTable("ns", "tm", df.schema,
      properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    tm.append(df.where($"k" <= 100))
    tm.append(df.where($"k" > 100))
    tm.deleteByKeys(Seq(101L).toDF("k"), Seq("k"))
    val qm = cat.sql("ns", "SELECT count(*) AS n FROM tm WHERE k > 100")
    assert(qm.collect().head.getLong(0) == 99L)
    assert(hasFileScan(qm))
  }

  test("FILTERED + GROUPED compose: per-partition answers over only " +
      "the proven matching files, no scan") {
    val df = (1L to 180L).map(i =>
      (i, s"d${i % 2}", s"s${i % 3}")).toDF("k", "day", "src")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-fg"))
    cat.createNamespace("ns")
    val t = cat.createTable("ns", "t", df.schema,
      partitionBy = Seq("day", "src"))
    // ONE file per (day, src) dir spanning the full k range, so a k
    // cut below provably straddles every file
    t.append(df.repartition(1))
    val q = cat.sql("ns",
      """SELECT src, count(*) AS n, min(k) AS mn, max(k) AS mx
        |FROM t WHERE day = 'd1' GROUP BY src""".stripMargin)
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val keys = (1L to 180L).filter(_ % 2 == 1)
    val exp = keys.groupBy(k => s"s${k % 3}").map { case (s, ks) =>
      (s, ks.size.toLong, ks.min, ks.max)
    }.toSet
    assert(got == exp && got.size == 3)
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)
    // a filter the manifest cannot prove still blocks the grouped fold
    val qf = cat.sql("ns",
      "SELECT src, count(*) AS n FROM t WHERE k > 90 GROUP BY src")
    assert(qf.collect().map(_.getLong(1)).sum == 90L)
    assert(hasFileScan(qf))
  }

  test("time-travel scans get the metadata rewrite against the " +
      "HISTORICAL manifest") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("magg-tt") + "/t",
      df.schema)
    t.append(df.where($"k" <= 60))                       // snap 2
    val histSnap = t.currentSnapshotId.get
    t.append(df.where($"k" > 60))                        // snap 3
    t.delete($"k" <= 10)                                 // COW rewrite
    val q = t.scanAt(histSnap).agg(count(lit(1)).as("n"),
      min($"k").as("mn"), max($"k").as("mx"))
    val r = q.collect().head
    assert(r.getLong(0) == 60L && r.getLong(1) == 1L &&
      r.getLong(2) == 60L)
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)
    // HEAD answers the post-delete state from its own manifest
    val qh = t.scan().agg(count(lit(1)).as("n"), min($"k").as("mn"))
    val rh = qh.collect().head
    assert(rh.getLong(0) == 90L && rh.getLong(1) == 11L)
    assert(!hasFileScan(qh), qh.queryExecution.executedPlan.toString)
  }

  test("unprovable shapes fall back to the scan and stay exact") {
    val df = (1L to 300L).map(i => (i, i / 7.0, s"v$i"))
      .toDF("k", "x", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("magg-fb"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df.repartition(3))

    // filters block the rewrite
    val filtered =
      cat.sql("ns", "SELECT min(k) AS mn FROM t WHERE k > 100")
    assert(filtered.collect().head.getLong(0) == 101L)
    assert(hasFileScan(filtered))

    // expression aggregates block it
    val exprAgg = cat.sql("ns", "SELECT min(k + 1) AS mn FROM t")
    assert(exprAgg.collect().head.getLong(0) == 2L)
    assert(hasFileScan(exprAgg))

    // grouped aggregates block it
    val grouped = cat.sql("ns",
      "SELECT k % 2 AS g, min(k) AS mn FROM t GROUP BY k % 2")
    assert(grouped.collect().length == 2)
    assert(hasFileScan(grouped))
  }

  test("MOR delete state blocks the rewrite; result stays exact") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("magg-mor") + "/t",
      df.schema,
      properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    t.append(df.repartition(2))
    t.deleteByKeys(Seq(1L, 100L).toDF("k"), Seq("k"))
    val q = t.scan().agg(min($"k").as("mn"), max($"k").as("mx"),
      count(lit(1)).as("n"))
    val r = q.collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 99L && r.getLong(2) == 98L)
    assert(hasFileScan(q))
    // compaction folds the deletes in -> metadata answers come back
    t.compact(1)
    val q2 = t.scan().agg(min($"k").as("mn"), max($"k").as("mx"))
    val r2 = q2.collect().head
    assert(r2.getLong(0) == 2L && r2.getLong(1) == 99L)
    assert(!hasFileScan(q2))
  }

  test("renamed column still answers from the manifest (physical-name keying)") {
    val df = (1L to 60L).map(i => (i, s"v$i")).toDF("a", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("magg-ren") + "/t",
      df.schema)
    t.append(df)
    t.renameColumn("a", "b")
    val q = t.scan().agg(min($"b").as("mn"), max($"b").as("mx"))
    val r = q.collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 60L)
    assert(!hasFileScan(q), q.queryExecution.executedPlan.toString)
    // the FILTERED leg resolves the renamed column to its physical
    // name too (file bounds prove `b >= 1` all-match)
    val qf = t.scan().where($"b" >= 1L)
      .agg(count(lit(1)).as("n"), max($"b").as("mx"))
    val rf = qf.collect().head
    assert(rf.getLong(0) == 60L && rf.getLong(1) == 60L)
    assert(!hasFileScan(qf), qf.queryExecution.executedPlan.toString)
  }

  test("metadata SUM: write.agg.columns records exact per-file sums; " +
      "global / grouped / filtered legs fold with no file scan") {
    val df = (1L to 400L).map(i =>
      (i, (i % 4).toInt, if (i % 10 == 0) null
        else java.lang.Long.valueOf(i * 3)))
      .toDF("k", "p", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("msum"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema,
      partitionBy = Seq("p"),
      properties = Map(LakeTable.PROP_AGG_COLUMNS -> "v,k"))
    cat.loadTable("ns", "t").append(df.repartition(4))

    val expSum = (1L to 400L).filter(_ % 10 != 0).map(_ * 3).sum
    val g = cat.sql("ns",
      "SELECT sum(v) AS sv, sum(k) AS sk, count(v) AS cv FROM t")
    val r = g.collect().head
    assert(r.getLong(0) == expSum)
    assert(r.getLong(1) == (1L to 400L).sum)
    assert(r.getLong(2) == 360L)
    assert(!hasFileScan(g), g.queryExecution.executedPlan.toString)

    // avg spelled as exact legs folds too (deterministic expression
    // over substituted constants)
    val avg = cat.sql("ns",
      "SELECT sum(v) / count(v) AS av FROM t")
    assert(math.abs(avg.collect().head.getDouble(0) -
      expSum.toDouble / 360.0) < 1e-9)
    assert(!hasFileScan(avg))

    // grouped by the identity partition: per-group sums, zero I/O
    val gr = cat.sql("ns",
      "SELECT p, sum(v) AS sv FROM t GROUP BY p")
    val got = gr.collect().map(x => x.getInt(0) -> x.getLong(1)).toMap
    val exp = (1L to 400L).filter(_ % 10 != 0).groupBy(i => (i % 4).toInt)
      .map { case (p, is) => p -> is.map(_ * 3).sum }
    assert(got == exp)
    assert(!hasFileScan(gr), gr.queryExecution.executedPlan.toString)

    // filtered leg: partition probe proves the split
    val f = cat.sql("ns", "SELECT sum(v) AS sv FROM t WHERE p = 2")
    assert(f.collect().head.getLong(0) == exp(2))
    assert(!hasFileScan(f))
  }

  test("metadata SUM guards: zero non-null rows fold to NULL; a file " +
      "without the stat blocks; FP and Average never fold") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("msum-g"))
    cat.createNamespace("ns")
    // all-null column: sum is SQL NULL, still metadata-only
    val dfN = Seq.tabulate(10)(i =>
      (i.toLong, null: java.lang.Long)).toDF("k", "v")
    cat.createTable("ns", "tn", dfN.schema,
      properties = Map(LakeTable.PROP_AGG_COLUMNS -> "v"))
    cat.loadTable("ns", "tn").append(dfN)
    val qn = cat.sql("ns", "SELECT sum(v) AS sv FROM tn")
    assert(qn.collect().head.isNullAt(0))
    assert(!hasFileScan(qn))

    // files written BEFORE the property was set block the fold (no
    // silent wrong answer) but all-null legacy files still pass
    val df = Seq((1L, 5L), (2L, 7L)).toDF("k", "v")
    cat.createTable("ns", "tb", df.schema)
    val tb = cat.loadTable("ns", "tb")
    tb.append(df)
    tb.setProperties(Map(LakeTable.PROP_AGG_COLUMNS -> "v"))
    tb.append(Seq((3L, 9L)).toDF("k", "v"))
    val qb = cat.sql("ns", "SELECT sum(v) AS sv FROM tb")
    assert(qb.collect().head.getLong(0) == 21L)
    assert(hasFileScan(qb), "legacy file without the stat must scan")
    // compaction rewrites every file under the property: fold returns
    tb.compact(1)
    val qc = cat.sql("ns", "SELECT sum(v) AS sv FROM tb")
    assert(qc.collect().head.getLong(0) == 21L)
    assert(!hasFileScan(qc))

    // fp sums are never recorded/folded; avg(col) never folds either
    val dfF = Seq((1L, 1.5), (2L, 2.5)).toDF("k", "x")
    cat.createTable("ns", "tf", dfF.schema,
      properties = Map(LakeTable.PROP_AGG_COLUMNS -> "x,k"))
    cat.loadTable("ns", "tf").append(dfF)
    val qf = cat.sql("ns", "SELECT sum(x) AS sx FROM tf")
    assert(qf.collect().head.getDouble(0) == 4.0)
    assert(hasFileScan(qf), "fp sum must run the scan")
    val qa = cat.sql("ns", "SELECT avg(k) AS ak FROM tf")
    assert(qa.collect().head.getDouble(0) == 1.5)
    assert(hasFileScan(qa), "Average must run the scan")
  }

  test("metadata SUM under ANSI/TRY: mixed-sign columns block the fold " +
      "(an intermediate scan overflow could throw where the fold " +
      "answers); single-signed columns still fold") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("msum-ansi"))
    cat.createNamespace("ns")
    // pos: all values >= 0 (monotone partials — provably safe);
    // mix: genuinely mixed signs, total in range
    val df = Seq((1L, 10L, -5L), (2L, 20L, 7L), (3L, 30L, -1L))
      .toDF("k", "pos", "mix")
    cat.createTable("ns", "ta", df.schema,
      properties = Map(LakeTable.PROP_AGG_COLUMNS -> "pos,mix"))
    cat.loadTable("ns", "ta").append(df)
    // LEGACY mode (ansi off explicitly — Spark 4 defaults it ON):
    // both fold (Long wraps modulo 2^64 — an in-range total is exact
    // whatever the intermediate excursions)
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ql = cat.sql("ns",
        "SELECT sum(pos) AS sp, sum(mix) AS sm FROM ta")
      val rl = ql.collect().head
      assert(rl.getLong(0) == 60L && rl.getLong(1) == 1L)
      assert(!hasFileScan(ql), ql.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
    // ANSI (the session default here): single-signed still folds,
    // mixed-sign runs the scan
    val qp = cat.sql("ns", "SELECT sum(pos) AS sp FROM ta")
    assert(qp.collect().head.getLong(0) == 60L)
    assert(!hasFileScan(qp), "single-signed ANSI sum must still fold")
    val qm = cat.sql("ns", "SELECT sum(mix) AS sm FROM ta")
    assert(qm.collect().head.getLong(0) == 1L)
    assert(hasFileScan(qm),
      "mixed-sign ANSI sum must run the scan (overflow is a " +
        "row-order property the manifest cannot witness)")
    // TRY mode guards like ANSI whatever the conf says
    val qt = cat.sql("ns",
      "SELECT try_sum(mix) AS sm, try_sum(pos) AS sp FROM ta")
    val rt = qt.collect().head
    assert(rt.getLong(0) == 1L && rt.getLong(1) == 60L)
    assert(hasFileScan(qt), "try_sum(mix) must run the scan")
  }
}
