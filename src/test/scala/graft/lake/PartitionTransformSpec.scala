package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hidden partitioning (≡ Iceberg partition transforms): bucket / day /
  * month / year / truncate specs derive the directory value from a
  * source column, readers never see the derived column, and
  * MERGE/DELETE prune by transform — set-membership for bucket, range
  * intersection for the monotone transforms. */
class PartitionTransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(p: String) = TestSpark.tmpDir(p) + "/t"

  test("spec parsing: all transforms, identity fallback, invalid rejected") {
    import PartitionSpec._
    assert(parse("plain") == Field("plain", Identity, "plain"))
    assert(parse("bucket(8, key)") == Field("key", Bucket(8),
      "bucket(8, key)"))
    assert(parse("day(ts)") == Field("ts", Day, "day(ts)"))
    assert(parse("hour(ts)") == Field("ts", Hour, "hour(ts)"))
    assert(parse("month(ts)") == Field("ts", Month, "month(ts)"))
    assert(parse("year(ts)") == Field("ts", Year, "year(ts)"))
    assert(parse("truncate(4, code)") == Field("code", Truncate(4),
      "truncate(4, code)"))
    intercept[IllegalArgumentException](parse("hash(3, x)"))
    intercept[IllegalArgumentException](parse("bucket(x)"))
    intercept[IllegalArgumentException](parseAll(
      Seq("bucket(4, k)", "bucket(4, k)")))
  }

  test("create validates transform specs against the schema") {
    val df = Seq((1L, 0.5d, "ab", new Timestamp(0L)))
      .toDF("id", "x", "code", "ts")
    // unknown source
    intercept[IllegalArgumentException](LakeTable.create(spark,
      freshRoot("pt-bad1"), df.schema, Seq("bucket(4, nope)")))
    // bucket on a floating-point source (Iceberg forbids it too)
    intercept[IllegalArgumentException](LakeTable.create(spark,
      freshRoot("pt-bad2"), df.schema, Seq("bucket(4, x)")))
    // time transform on a non-temporal source
    intercept[IllegalArgumentException](LakeTable.create(spark,
      freshRoot("pt-bad3"), df.schema, Seq("year(code)")))
  }

  test("bucket table: hidden on read, dirs derived, merge prunes to one bucket") {
    val root = freshRoot("pt-bucket")
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema,
      partitionBy = Seq("bucket(4, id)"))
    t.append(df.repartition(1))
    val base = t.currentSnapshot.get
    // one file per non-empty bucket, named by the derived column
    assert(base.liveFiles.size == 4)
    assert(base.liveFiles.forall(_.contains("id_bucket_4=")))
    // the scan is transform-invisible: same schema, same rows
    assert(t.scan().schema.fieldNames.toSeq == Seq("id", "v"))
    assert(t.scan().count() == 100)
    // a single-key merge prunes to exactly the key's bucket file
    val src = Seq((42L, "UPD")).toDF("id", "v")
    val pruned = t.pruneByStats(base, src, Seq("id"))
    assert(pruned.size == 1, s"expected 1 bucket candidate: $pruned")
    t.merge(src, Seq("id"))
    val snap = t.currentSnapshot.get
    assert(snap.removedFiles.size == 1, "merge must rewrite only 1 bucket")
    assert(t.scan().where($"v" === "UPD").count() == 1)
    assert(t.scan().count() == 100)
  }

  test("bucket table: predicate delete prunes via driver-side hash") {
    val root = freshRoot("pt-bucketdel")
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema,
      partitionBy = Seq("bucket(4, id)"))
    t.append(df.repartition(1))
    val base = t.currentSnapshot.get
    // footer stats on id can't prune (every bucket spans ~the full id
    // range) — only the bucket-hash equality prune narrows this
    val candEq = t.pruneByPredicate(base, $"id" === 42L)
    assert(candEq.size == 1, s"bucket-equality prune failed: $candEq")
    val candIn = t.pruneByPredicate(base, $"id".isin(42L, 43L, 44L))
    assert(candIn.size <= 3)
    // a non-equality predicate keeps all buckets (no false pruning)
    assert(t.pruneByPredicate(base, $"id" > 10L).size == 4)
    t.delete($"id" === 42L)
    assert(t.scan().count() == 99)
    assert(t.scan().where($"id" === 42L).count() == 0)
  }

  test("year table: monotone range pruning, hidden on read") {
    val root = freshRoot("pt-year")
    val rows = (0 until 30).map { i =>
      (i.toLong, new Timestamp(
        Timestamp.valueOf(s"${2020 + i % 3}-0${1 + i % 9}-15 12:00:00")
          .getTime))
    }
    val df = rows.toDF("id", "ts")
    val t = LakeTable.create(spark, root, df.schema,
      partitionBy = Seq("year(ts)"))
    t.append(df.repartition(1))
    val base = t.currentSnapshot.get
    assert(base.liveFiles.size == 3) // one per year
    assert(base.liveFiles.forall(_.contains("ts_year=")))
    // merge keyed on ts restricted to 2021 prunes to that year's file
    val src = Seq((999L,
      Timestamp.valueOf("2021-03-15 12:00:00"))).toDF("id", "ts")
    val pruned = t.pruneByStats(base, src, Seq("ts"))
    assert(pruned.size == 1, s"year range prune failed: $pruned")
    assert(pruned.head.contains("ts_year=51")) // 2021 - 1970
    assert(t.scan().count() == 30)
    assert(t.scan().schema.fieldNames.toSeq == Seq("id", "ts"))
  }

  test("hour table: epoch-hour dirs, range pruning, scan(predicate) " +
      "opens only the hour's files, dynamic overwrite inverts exactly") {
    val root = freshRoot("pt-hour")
    val rows = (0 until 24).map { i =>
      (i.toLong, Timestamp.valueOf(f"2021-01-01 ${i % 4}%02d:${i}%02d:00"))
    }
    val df = rows.toDF("id", "ts")
    val t = LakeTable.create(spark, root, df.schema,
      partitionBy = Seq("hour(ts)"))
    t.append(df.repartition(1))
    val base = t.currentSnapshot.get
    assert(base.liveFiles.size == 4) // one per hour
    // 2021-01-01 00:00 UTC = 447_312 hours since epoch
    val h0 = java.time.Instant.parse("2021-01-01T00:00:00Z")
      .getEpochSecond / 3600
    assert(base.liveFiles.exists(_.contains(s"ts_hour=$h0")))
    // keyed prune: a source pinned to hour 2 touches only its file
    val src = Seq((999L, Timestamp.valueOf("2021-01-01 02:10:00")))
      .toDF("id", "ts")
    val pruned = t.pruneByStats(base, src, Seq("ts"))
    assert(pruned.size == 1 && pruned.head.contains(s"ts_hour=${h0 + 2}"),
      s"hour prune failed: $pruned")
    assert(t.scan().count() == 24)
    assert(t.scan().schema.fieldNames.toSeq == Seq("id", "ts"))
    // dynamic partition overwrite restates exactly one hour via the
    // hour inverse (instant range)
    val restate = Seq((1000L, Timestamp.valueOf("2021-01-01 01:30:00")))
      .toDF("id", "ts")
    t.overwritePartitions(restate)
    val got = t.scan().collect().map(_.getLong(0)).toSet
    val expect = rows.collect {
      case (id, ts) if ts.toLocalDateTime.getHour != 1 => id
    }.toSet + 1000L
    assert(got == expect, s"hour restatement diverged")
  }

  test("truncate(string) table: prefix dirs, range pruning") {
    val root = freshRoot("pt-trunc")
    val df = Seq(("aaX", 1L), ("aaY", 2L), ("abZ", 3L), ("zzQ", 4L))
      .toDF("code", "id")
    val t = LakeTable.create(spark, root, df.schema,
      partitionBy = Seq("truncate(2, code)"))
    t.append(df.repartition(1))
    val base = t.currentSnapshot.get
    assert(base.liveFiles.size == 3) // aa, ab, zz
    assert(base.liveFiles.exists(_.contains("code_trunc_2=aa")))
    val pruned = t.pruneByStats(base,
      Seq(("aaX", 9L)).toDF("code", "id"), Seq("code"))
    assert(pruned.size == 1 && pruned.head.contains("code_trunc_2=aa"))
    assert(t.scan().count() == 4)
  }

  test("day and month derived values match epoch arithmetic") {
    import PartitionSpec._
    val df = Seq(Timestamp.valueOf("2024-03-05 10:30:00")).toDF("ts")
    def derived(spec: String): Long = {
      val f = parse(spec)
      df.select(f.expr(TimestampType).as("d")).head().getLong(0)
    }
    assert(derived("day(ts)") ==
      java.time.LocalDate.of(2024, 3, 5).toEpochDay)
    assert(derived("month(ts)") == (2024 - 1970) * 12 + 2)
    assert(derived("year(ts)") == 54)
  }

  test("compact preserves hidden partitioning; deleteByKeys prunes buckets") {
    val root = freshRoot("pt-compact")
    val df = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema,
      partitionBy = Seq("bucket(4, id)"))
    // three small appends per bucket, then compact back to 4 files
    (0 until 3).foreach(i => t.append(
      df.where($"id" % 3 === i).repartition(1)))
    assert(t.currentSnapshot.get.liveFiles.size > 4)
    t.compact()
    val snap = t.currentSnapshot.get
    assert(snap.liveFiles.size == 4, s"expected 4 bucket files after " +
      s"compact: ${snap.liveFiles}")
    assert(snap.liveFiles.forall(_.contains("id_bucket_4=")))
    assert(t.scan().count() == 60)
    // keyed delete prunes to the keys' buckets
    val base = t.currentSnapshot.get
    val keys = Seq(7L).toDF("id")
    assert(t.pruneByStats(base, keys, Seq("id")).size == 1)
    t.deleteByKeys(keys, Seq("id"))
    assert(t.scan().count() == 59)
  }

  test("partition-source columns cannot be renamed or dropped") {
    val root = freshRoot("pt-rename")
    val df = Seq((1L, "a")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema,
      partitionBy = Seq("bucket(4, id)"))
    t.append(df)
    intercept[IllegalArgumentException](t.renameColumn("id", "id2"))
    intercept[IllegalArgumentException](t.dropColumn("id"))
    // non-source columns still evolve freely
    t.renameColumn("v", "w")
    assert(t.scan().schema.fieldNames.toSeq == Seq("id", "w"))
  }

  test("pruned scan(predicate) opens only the predicate's bucket files") {
    val root = freshRoot("pt-scanprune")
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, root, df.schema,
      partitionBy = Seq("bucket(4, id)"))
    t.append(df.repartition(1))
    val pruned = t.scan($"id" === 42L)
    // identical semantics to the unpruned filter…
    assert(pruned.collect().toSeq ==
      t.scan().where($"id" === 42L).collect().toSeq)
    // …but only the key's bucket file is opened
    assert(pruned.queryExecution.executedPlan.collectLeaves().flatMap {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles
      case _ => Nil
    }.length == 1)
    // a range-pruned scan on a sorted table works the same way
    val sroot = freshRoot("pt-scanprune2")
    val st = LakeTable.create(spark, sroot, df.schema,
      properties = Map(LakeTable.PROP_SORT_ORDER -> "id"))
    (0 until 4).foreach(i => st.append(
      df.where($"id" > i * 25L && $"id" <= (i + 1) * 25L).repartition(1)))
    val spruned = st.scan($"id" === 60L)
    assert(spruned.collect().map(_.getLong(0)).toSeq == Seq(60L))
    assert(spruned.queryExecution.executedPlan.collectLeaves().flatMap {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles
      case _ => Nil
    }.length == 1)
  }

  test("mixed identity + transform spec") {
    val root = freshRoot("pt-mixed")
    val df = Seq(
      ("x", 1L, "a"), ("x", 2L, "b"), ("y", 3L, "c"), ("y", 4L, "d"))
      .toDF("p", "id", "v")
    val t = LakeTable.create(spark, root, df.schema,
      partitionBy = Seq("p", "bucket(2, id)"))
    t.append(df.repartition(1))
    val base = t.currentSnapshot.get
    assert(base.liveFiles.forall(f =>
      f.contains("p=") && f.contains("id_bucket_2=")))
    // identity value comes from the dir, source column from the file
    assert(t.scan().orderBy("id").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq(("x", 1L, "a"), ("x", 2L, "b"), ("y", 3L, "c"), ("y", 4L, "d")))
    // pruning composes: identity p range + id bucket set
    val pruned = t.pruneByStats(base,
      Seq(("x", 1L, "upd")).toDF("p", "id", "v"), Seq("p", "id"))
    assert(pruned.size == 1, s"composed prune failed: $pruned")
  }
}
