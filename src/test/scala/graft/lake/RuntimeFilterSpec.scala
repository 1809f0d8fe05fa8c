package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** scanForJoin: dynamic file pruning for key-equality joins — the fact
  * table's file list shrinks to files that can hold the dim's ACTUAL
  * keys (bounds / hidden buckets / Blooms), and the join result is
  * bit-identical to the full-scan join. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("range-clustered fact: dim keys open only overlapping files") {
    val fact = (1L to 10000L).map(i => (i, s"p$i", i % 97))
      .toDF("k", "payload", "grp")
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("rtf-range") + "/t", fact.schema)
    // range-clustered ingest: files carry disjoint k bounds
    t.append(fact.repartitionByRange(8, $"k").sortWithinPartitions($"k"))
    val dim = Seq((10L, "a"), (25L, "b"), (700L, "c")).toDF("k", "d")

    val full = t.scan()
    val pruned = t.scanForJoin(dim, Seq("k"))
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"${pruned.inputFiles.length} vs ${full.inputFiles.length}")

    val a = pruned.join(dim, Seq("k")).orderBy("k")
      .collect().map(_.toSeq).toSeq
    val b = full.join(dim, Seq("k")).orderBy("k")
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.length == 3)
  }

  test("bucket table: dim keys open only their buckets") {
    val fact = (1L to 4000L).map(i => (i, s"p$i")).toDF("k", "v")
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("rtf-bucket") + "/t", fact.schema,
      partitionBy = Seq("bucket(8, k)"))
    t.append(fact)
    val dim = Seq((42L, "x")).toDF("k", "d")
    val pruned = t.scanForJoin(dim, Seq("k"))
    // a single key lives in exactly one of 8 buckets
    assert(pruned.inputFiles.length * 8 <= t.scan().inputFiles.length * 2)
    val got = pruned.join(dim, Seq("k")).collect()
    assert(got.length == 1 && got.head.getString(1) == "p42")
  }

  test("bloom-indexed fact: unsorted ingest still prunes by key membership") {
    // shuffled ingest: every file spans the whole key range, so bounds
    // can't prune — only the per-file Bloom can
    val fact = new scala.util.Random(7).shuffle((1L to 8000L).toVector)
      .map(i => (i, s"p$i")).toDF("k", "v")
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("rtf-bloom") + "/t", fact.schema,
      properties = Map("write.bloom.columns" -> "k"))
    t.append(fact.repartition(8))
    val dim = Seq((4242L, "x")).toDF("k", "d")
    val pruned = t.scanForJoin(dim, Seq("k"))
    assert(pruned.inputFiles.length < t.scan().inputFiles.length)
    val got = pruned.join(dim, Seq("k")).collect()
    assert(got.length == 1 && got.head.getString(1) == "p4242")
  }

  test("oversized or unbounded dim degrades to the full scan, never wrong") {
    val fact = (1L to 1000L).map(i => (i, s"p$i")).toDF("k", "v")
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("rtf-deg") + "/t", fact.schema)
    t.append(fact.repartitionByRange(4, $"k"))
    val wide = (1L to 1000L).map(i => (i, "d")).toDF("k", "d")
    val pruned = t.scanForJoin(wide, Seq("k"))
    assert(pruned.join(wide, Seq("k")).count() == 1000L)
  }
}
