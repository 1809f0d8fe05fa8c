package graft.lake

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Regression coverage for the manifest-stats MERGE/DELETE pruning:
  * driver-side logic that silently drops rows from data-rewriting commits
  * if a bound is mis-encoded — the riskiest kind of untested code. */
class StatsPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot = TestSpark.tmpDir("statsprune") + "/t"

  /** 8 single-file appends with disjoint id ranges [i*100, i*100+99]. */
  private def eightFileTable(root: String): LakeTable = {
    val first = (0L to 99L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, root, first.schema)
    (0 until 8).foreach { b =>
      val lo = b * 100L
      t.append((lo to lo + 99L).map(i => (i, s"v$i")).toDF("id", "v")
        .repartition(1))
    }
    t
  }

  test("pruneByStats narrows a single-key merge to one candidate file") {
    val t = eightFileTable(freshRoot)
    val base = t.currentSnapshot.get
    assert(base.liveFiles.size == 8)
    val src = Seq((250L, "updated")).toDF("id", "v")
    val candidates = t.pruneByStats(base, src, Seq("id"))
    assert(candidates.size == 1,
      s"expected 1 candidate, got ${candidates.size}: $candidates")
    // and it is the file actually holding id=250 (range [200, 299])
    assert(base.fileStats(candidates.head)("id") == ColStat("200", "299"))
  }

  test("stats-less legacy manifest keeps the full candidate set") {
    val t = eightFileTable(freshRoot)
    val base = t.currentSnapshot.get
    val legacy = base.copy(fileStats = Map.empty)
    val src = Seq((250L, "updated")).toDF("id", "v")
    assert(t.pruneByStats(legacy, src, Seq("id")) == legacy.liveFiles)
    // and a merge against such a manifest still produces correct data:
    // simulate by rewriting the snapshot metadata without stats
    val mPath = new org.apache.hadoop.fs.Path(t.root,
      s"${LakeTable.METADATA_DIR}/v${base.snapshotId}.json")
    val fs = mPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(mPath, false)
    LakeTable.writeStringExclusive(fs, mPath, legacy.toJson)
    val t2 = LakeTable.load(spark, t.root)
    t2.merge(src, Seq("id"))
    val got = t2.scan().where($"id" === 250L).collect()
    assert(got.map(_.getString(1)).toSeq == Seq("updated"))
    assert(t2.scan().count() == 800)
  }

  test("disjoint-range merge is a pure insert (zero files rewritten)") {
    val t = eightFileTable(freshRoot)
    val src = Seq((5000L, "new")).toDF("id", "v")
    t.merge(src, Seq("id"))
    val snap = t.currentSnapshot.get
    assert(snap.operation == "merge")
    assert(snap.removedFiles.isEmpty,
      s"pure insert should rewrite nothing, removed: ${snap.removedFiles}")
    assert(t.scan().count() == 801)
  }

  test("pruned merge result equals unpruned semantics across key types") {
    // one table per key type; two disjoint single-file batches + a source
    // touching only batch 2 plus a null key and a fresh insert
    def run[T](name: String, mk: Long => T)(implicit
        enc: org.apache.spark.sql.Encoder[(T, String)],
        enc2: org.apache.spark.sql.Encoder[(Option[T], String)]): Unit = {
      val root = TestSpark.tmpDir(s"statsprune-$name") + "/t"
      val b1 = (1L to 50L).map(i => (mk(i), s"a$i")).toDF("k", "v")
      val t = LakeTable.create(spark, root, b1.schema)
      t.append(b1.repartition(1))
      t.append((51L to 100L).map(i => (mk(i), s"a$i")).toDF("k", "v")
        .repartition(1))
      val src = (Seq((Option(mk(60L)), "upd"), (Option(mk(200L)), "ins"),
        (Option.empty[T], "nullkey"))).toDF("k", "v")
      val base = t.currentSnapshot.get
      val pruned = t.pruneByStats(base, src.na.drop(Seq("k")), Seq("k"))
      assert(pruned.size == 1,
        s"[$name] expected 1 candidate of ${base.liveFiles.size}: $pruned")
      t.merge(src, Seq("k"))
      val got = t.scan()
      assert(got.count() == 102, s"[$name] wrong row count") // 100+ins+null
      assert(got.where($"v" === "upd").count() == 1, s"[$name] update lost")
      assert(got.where($"v" === "a60").count() == 0,
        s"[$name] stale row survived")
      assert(got.where($"v" === "ins").count() == 1, s"[$name] insert lost")
      assert(got.where($"k".isNull && $"v" === "nullkey").count() == 1,
        s"[$name] null-key insert lost")
    }
    run[Long]("long", identity)
    run[String]("string", i => f"k$i%05d")
    run[Date]("date", i => Date.valueOf(java.time.LocalDate
      .of(2020, 1, 1).plusDays(i)))
    run[Timestamp]("timestamp", i => new Timestamp(1600000000000L + i * 1000))
  }

  test("NaN-bearing double column records no bounds and never mis-prunes") {
    val root = freshRoot
    val df = Seq((1.0, "one"), (Double.NaN, "nan")).toDF("k", "v")
    val t = LakeTable.create(spark, root, df.schema)
    t.append(df.repartition(1))
    val base = t.currentSnapshot.get
    // the NaN-poisoned footer stats must have been dropped for k
    base.fileStats.values.foreach(cols => assert(!cols.contains("k"),
      s"NaN-bearing column kept bounds: ${cols.get("k")}"))
    // so a merge on k=1.0 still finds the file and updates the row
    t.merge(Seq((1.0, "ONE")).toDF("k", "v"), Seq("k"))
    assert(t.scan().where($"v" === "ONE").count() == 1)
  }

  test("-0.0 file bound matches a 0.0 source key (and vice versa)") {
    val root = freshRoot
    val df = Seq((-0.0, "negzero"), (5.0, "five")).toDF("k", "v")
    val t = LakeTable.create(spark, root, df.schema)
    t.append(df.repartition(1))
    // source key +0.0 must not be range-pruned away from the -0.0 file
    t.merge(Seq((0.0, "ZERO")).toDF("k", "v"), Seq("k"))
    assert(t.scan().where($"v" === "ZERO").count() == 1,
      "merge on 0.0 missed the -0.0 row")
    assert(t.scan().where($"v" === "negzero").count() == 0)
  }

  test("snapshot JSON round-trips fileStats exactly") {
    val snap = Snapshot(
      snapshotId = 7L, parentId = Some(6L), timestampMs = 123456789L,
      operation = "merge",
      addedFiles = Seq("data/p=a/f1.parquet"),
      removedFiles = Seq("data/p=a/f0.parquet"),
      liveFiles = Seq("data/p=a/f1.parquet", "data/p=b/f2.parquet"),
      schemaJson = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))).json,
      partitionColumns = Seq("p"),
      properties = Map("write.parquet.compression-codec" -> "zstd"),
      fileStats = Map(
        "data/p=a/f1.parquet" -> Map(
          "id" -> ColStat("-5", "10"),
          "s" -> ColStat("aa", "zzé"),
          "d" -> ColStat("-0.0", "3.14")),
        "data/p=b/f2.parquet" -> Map("id" -> ColStat("11", "20"))))
    assert(Snapshot.fromJson(snap.toJson) == snap)
  }

  test("merge on a stats-supported partition column prunes to the partition") {
    val root = freshRoot
    val df = (1L to 90L).map(i => (i, s"v$i", s"p${i % 3}"))
      .toDF("id", "v", "p")
    val t = LakeTable.create(spark, root, df.schema, Seq("p"))
    t.append(df)
    val base = t.currentSnapshot.get
    assert(base.liveFiles.size >= 3)
    val src = Seq((7L, "upd", "p1")).toDF("id", "v", "p")
    val candidates = t.pruneByStats(base, src, Seq("id", "p"))
    // every candidate must be in the p=p1 partition directory
    assert(candidates.nonEmpty)
    assert(candidates.forall(_.contains("p=p1")),
      s"candidates outside p=p1: $candidates")
  }
}
