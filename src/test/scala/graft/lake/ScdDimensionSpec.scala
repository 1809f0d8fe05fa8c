package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SCD Type-2 dimension maintenance: every refresh must leave the
  * dimension equal to the version history a full replay would build —
  * through inserts, updates, deletes, re-inserts, multi-change
  * batches, and crash-replayed refreshes. */
class ScdDimensionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkPair(base: String) = {
    val src = LakeTable.create(spark, s"$base/src",
      Seq((1, "x", 0.0)).toDF("k", "seg", "bal").schema)
    val dim = LakeTable.create(spark, s"$base/dim",
      ScdDimension.dimensionSchema(src.schema, Seq("k"),
        Seq("seg", "bal")))
    (src, dim)
  }

  private def state(dim: LakeTable) = dim.scan()
    .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2),
      r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
      r.getBoolean(5))).toSet

  test("insert → update → delete → re-insert builds the full history") {
    val (src, dim) = mkPair(TestSpark.tmpDir("scd2"))
    // s2: initial rows
    src.append(Seq((1, "A", 10.0), (2, "B", 20.0)).toDF("k", "seg", "bal"))
    ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    assert(state(dim) == Set(
      (1, "A", 10.0, 2L, None, true),
      (2, "B", 20.0, 2L, None, true)))

    // s3: update k=1; s4: delete k=2 — one refresh applies both
    src.update(col("k") === 1, Map("bal" -> lit(11.0)))
    src.delete(col("k") === 2)
    ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    assert(state(dim) == Set(
      (1, "A", 10.0, 2L, Some(3L), false),
      (1, "A", 11.0, 3L, None, true),
      (2, "B", 20.0, 2L, Some(4L), false)))

    // s5: re-insert k=2 — a NEW version row, the closed one untouched
    src.append(Seq((2, "C", 25.0)).toDF("k", "seg", "bal"))
    ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    assert(state(dim) == Set(
      (1, "A", 10.0, 2L, Some(3L), false),
      (1, "A", 11.0, 3L, None, true),
      (2, "B", 20.0, 2L, Some(4L), false),
      (2, "C", 25.0, 5L, None, true)))
  }

  test("multiple commits to one key in a single refresh: every " +
      "intermediate version lands, chained by _valid_to") {
    val (src, dim) = mkPair(TestSpark.tmpDir("scd2-multi"))
    src.append(Seq((1, "A", 1.0)).toDF("k", "seg", "bal"))     // s2
    src.update(col("k") === 1, Map("bal" -> lit(2.0)))         // s3
    src.update(col("k") === 1, Map("seg" -> lit("B")))         // s4
    src.delete(col("k") === 1)                                 // s5
    src.append(Seq((1, "Z", 9.0)).toDF("k", "seg", "bal"))     // s6
    ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    assert(state(dim) == Set(
      (1, "A", 1.0, 2L, Some(3L), false),
      (1, "A", 2.0, 3L, Some(4L), false),
      (1, "B", 2.0, 4L, Some(5L), false),
      (1, "Z", 9.0, 6L, None, true)))
  }

  test("no-op suppression: a rewrite that keeps tracked attrs equal " +
      "creates no version — in-batch AND against the open dim row") {
    val base = TestSpark.tmpDir("scd2-noop")
    val src = LakeTable.create(spark, s"$base/src",
      Seq((1, "x", 0.0, "u")).toDF("k", "seg", "bal", "other").schema)
    val dim = LakeTable.create(spark, s"$base/dim",
      ScdDimension.dimensionSchema(src.schema, Seq("k"),
        Seq("seg", "bal")))
    src.append(Seq((1, "A", 1.0, "u")).toDF("k", "seg", "bal", "other"))
    ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    val before = state2(dim)
    // an UPDATE touching only the untracked column: delete+insert in
    // the changelog, identical post-image — must be suppressed against
    // the OPEN dim row (first event of the next batch)
    src.update(col("k") === 1, Map("other" -> lit("v")))
    val snapAfter = ScdDimension.refresh(src, dim, Seq("k"),
      Seq("seg", "bal"))
    assert(state2(dim) == before)
    // watermark still advances (idempotence bookkeeping is per-source)
    assert(dim.properties(ScdDimension.WatermarkProp).toLong ==
      src.currentSnapshotId.get)
    // in-batch: noop rewrite THEN a real change in one refresh — only
    // the real change versions
    src.update(col("k") === 1, Map("other" -> lit("w")))   // noop
    src.update(col("k") === 1, Map("bal" -> lit(2.0)))     // real
    ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    val s = state2(dim)
    assert(s.size == 2)
    assert(s.exists { case (_, _, bal, _, to, cur) =>
      bal == 2.0 && to.isEmpty && cur })
    assert(snapAfter >= 0)
  }

  private def state2(dim: LakeTable) = dim.scan()
    .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2),
      r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
      r.getBoolean(5))).toSet

  test("refresh is idempotent and crash-safe: watermark rides the " +
      "merge commit; replay is a no-op") {
    val (src, dim) = mkPair(TestSpark.tmpDir("scd2-idem"))
    src.append(Seq((1, "A", 1.0)).toDF("k", "seg", "bal"))
    val s1 = ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    assert(dim.properties(ScdDimension.WatermarkProp).toLong ==
      src.currentSnapshotId.get)
    val s2 = ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    assert(s1 == s2)
  }

  test("duplicate business key in one source commit is refused loudly") {
    val (src, dim) = mkPair(TestSpark.tmpDir("scd2-dup"))
    src.append(Seq((1, "A", 1.0), (1, "B", 2.0)).toDF("k", "seg", "bal"))
    val e = intercept[Exception] {
      ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    }
    assert(e.getMessage != null)
  }

  test("continuous SCD2 over the change feed matches batch refresh") {
    val base = TestSpark.tmpDir("scd2-cont")
    val (src, dim) = mkPair(base)
    val (src2, dim2) = mkPair(s"$base/twin")
    def drive(t: LakeTable): Unit = {
      t.append(Seq((1, "A", 1.0), (2, "B", 2.0)).toDF("k", "seg", "bal"))
      t.update(col("k") === 1, Map("bal" -> lit(5.0)))
      t.delete(col("k") === 2)
    }
    drive(src); drive(src2)
    ScdDimension.continuous(spark, src.root, dim, Seq("k"),
      Seq("seg", "bal"), appId = "scd2-test",
      checkpoint = s"$base/ckpt")
    ScdDimension.refresh(src2, dim2, Seq("k"), Seq("seg", "bal"))
    assert(state(dim) == state(dim2))
    // replay the whole stream from a LOST checkpoint: txn watermark
    // makes re-application a no-op
    ScdDimension.continuous(spark, src.root, dim, Seq("k"),
      Seq("seg", "bal"), appId = "scd2-test",
      checkpoint = s"$base/ckpt2")
    assert(state(dim) == state(dim2))
  }

  test("merge-on-read dimension: refresh rewrites ZERO data files " +
      "(the scale mode for scattered business keys) and matches COW") {
    val base = TestSpark.tmpDir("scd2-mor")
    val src = LakeTable.create(spark, s"$base/src",
      Seq((1, "x", 0.0)).toDF("k", "seg", "bal").schema)
    val dim = LakeTable.create(spark, s"$base/dim",
      ScdDimension.dimensionSchema(src.schema, Seq("k"),
        Seq("seg", "bal")),
      properties = Map(LakeTable.PROP_MERGE_MODE -> "merge-on-read"))
    src.append(Seq((1, "A", 1.0), (2, "B", 2.0)).toDF("k", "seg", "bal"))
    ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    src.update(col("k") === 1, Map("bal" -> lit(5.0)))
    src.delete(col("k") === 2)
    val preFiles = dim.currentSnapshot.get.liveFiles.toSet
    ScdDimension.refresh(src, dim, Seq("k"), Seq("seg", "bal"))
    val post = dim.currentSnapshot.get
    assert(preFiles.subsetOf(post.liveFiles.toSet),
      "MOR refresh must not rewrite or drop existing data files")
    assert(post.deleteFiles.nonEmpty, "refresh lands an equality-delete")
    // watermark rode the same MOR commit
    assert(dim.properties(ScdDimension.WatermarkProp).toLong ==
      src.currentSnapshotId.get)
    assert(state(dim) == Set(
      (1, "A", 1.0, 2L, Some(3L), false),
      (1, "A", 5.0, 3L, None, true),
      (2, "B", 2.0, 2L, Some(4L), false)))
  }

  test("applyCdcBatch: DMS-shaped I/U/D rows build the history on the " +
      "CDC clock; same-ts duplicates refuse") {
    val base = TestSpark.tmpDir("scd2-cdc")
    val dim = LakeTable.create(spark, s"$base/dim",
      ScdDimension.dimensionSchema(
        Seq((1, "x", 0.0)).toDF("k", "seg", "bal").schema,
        Seq("k"), Seq("seg", "bal")))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val batch = Seq(
      ("I", ts("2024-01-01 00:00:00"), 1, "A", 1.0),
      ("U", ts("2024-01-02 00:00:00"), 1, "A", 2.0),
      ("D", ts("2024-01-03 00:00:00"), 1, "A", 2.0),
      ("I", ts("2024-01-01 00:00:00"), 2, "B", 9.0)
    ).toDF("op", "ts", "k", "seg", "bal")
    ScdDimension.applyCdcBatch(dim, batch, Seq("k"), Seq("seg", "bal"),
      "op", "ts")
    def us(s: String) = ts(s).getTime * 1000L
    assert(state(dim) == Set(
      (1, "A", 1.0, us("2024-01-01 00:00:00"),
        Some(us("2024-01-02 00:00:00")), false),
      (1, "A", 2.0, us("2024-01-02 00:00:00"),
        Some(us("2024-01-03 00:00:00")), false),
      (2, "B", 9.0, us("2024-01-01 00:00:00"), None, true)))
    // duplicate live event per (key, ts) refuses loudly
    val dup = Seq(
      ("I", ts("2024-02-01 00:00:00"), 3, "C", 1.0),
      ("U", ts("2024-02-01 00:00:00"), 3, "C", 2.0)
    ).toDF("op", "ts", "k", "seg", "bal")
    intercept[Exception] {
      ScdDimension.applyCdcBatch(dim, dup, Seq("k"), Seq("seg", "bal"),
        "op", "ts")
    }
  }

  test("SQL surface: define + CALL system.refresh_scd2") {
    val base = TestSpark.tmpDir("scd2-sql")
    val cat = new LakeCatalog(spark, s"$base/cat")
    cat.createNamespace("ns")
    val src = cat.createTable("ns", "cust",
      Seq((1, "x")).toDF("k", "seg").schema)
    val dim = cat.createTable("ns", "cust_dim",
      ScdDimension.dimensionSchema(src.schema, Seq("k"), Seq("seg")))
    ScdDimension.define(dim, "cust", Seq("k"), Seq("seg"))
    src.append(Seq((1, "A"), (2, "B")).toDF("k", "seg"))
    assert(LakeSql.run(cat, "ns",
      "CALL system.scd2_staleness('cust_dim')")
      .select("is_stale").head.getBoolean(0), "stale before refresh")
    val out = LakeSql.run(cat, "ns",
      "CALL system.refresh_scd2('cust_dim')")
    assert(out.columns.toSeq ==
      Seq("snapshot_id", "applied_source_snapshot"))
    assert(out.head.getLong(1) == src.currentSnapshotId.get)
    assert(dim.scan().count() == 2)
    assert(!LakeSql.run(cat, "ns",
      "CALL system.scd2_staleness('cust_dim')")
      .select("is_stale").head.getBoolean(0), "fresh after refresh")
  }

  test("row-lineage source: the id-join changelog refresh builds the " +
      "EXACT history the content-diff changelog builds, through " +
      "updates, deletes, re-inserts, and no-op rewrites") {
    // identical commit sequences against two sources — one plain, one
    // write.row-lineage=true — must land identical dimensions
    def run(base: String, lineage: Boolean) = {
      val props =
        if (lineage) Map(LakeTable.PROP_ROW_LINEAGE -> "true")
        else Map.empty[String, String]
      val src = LakeTable.create(spark, s"$base/src",
        Seq((1, "x", 0.0)).toDF("k", "seg", "bal").schema,
        properties = props)
      assert(src.rowLineageEnabled == lineage)
      val dim = LakeTable.create(spark, s"$base/dim",
        ScdDimension.dimensionSchema(src.schema, Seq("k"),
          Seq("seg", "bal")))
      def rf() = ScdDimension.refresh(src, dim, Seq("k"),
        Seq("seg", "bal"), useLineage = lineage)
      src.append((1 to 50).map(i => (i, "A", i * 1.0))
        .toDF("k", "seg", "bal"))
      rf()
      // COW update touches 10 keys — the other 40 rows are CARRIED by
      // the rewrite; the lineage path must cancel them in the id join
      src.update(col("k") <= 10, Map("bal" -> (col("bal") + 100)))
      src.delete(col("k") === 25)
      rf()
      src.append(Seq((25, "B", 7.0)).toDF("k", "seg", "bal"))
      // a second update of the SAME keys (multi-version chains)
      src.update(col("k") <= 5, Map("seg" -> lit("Z")))
      rf()
      state(dim)
    }
    val plain = run(TestSpark.tmpDir("scd2-plain"), lineage = false)
    val viaLineage = run(TestSpark.tmpDir("scd2-lin"), lineage = true)
    assert(viaLineage == plain,
      "lineage refresh diverged from the content-diff refresh")
    assert(plain.count(_._6) == 50, "50 open rows expected")
    assert(plain.size == 50 + 10 + 1 + 5,
      "closed versions: 10 first updates + 1 delete + 5 re-updates")
  }
}
