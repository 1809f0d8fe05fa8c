package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `bucket_iceberg(N, col)`: the Iceberg-spec bucket transform
  * (murmur3_x86_32 seed 0 over spec byte forms). The hash is pinned
  * against the spec's PUBLISHED test values (Appendix B, "32-bit Hash
  * Requirements" — these exact inputs/outputs appear in the public
  * spec so independent implementations can interoperate); then the
  * write/prune/export path is exercised end-to-end. */
class IcebergBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hash matches the spec's published test values") {
    import IcebergBucketHash._
    // int and long 34 widen to the same 8-byte little-endian form
    assert(hashLong(34L) == 2017239379)
    assert(hashValue(34, org.apache.spark.sql.types.IntegerType) ==
      2017239379)
    assert(hashValue(34L, org.apache.spark.sql.types.LongType) ==
      2017239379)
    // string: UTF-8 bytes
    assert(hashValue("iceberg", org.apache.spark.sql.types.StringType) ==
      1210000089)
    assert(hashValue(
      org.apache.spark.unsafe.types.UTF8String.fromString("iceberg"),
      org.apache.spark.sql.types.StringType) == 1210000089)
    // decimal 14.20: minimal two's-complement big-endian of unscaled
    assert(hashValue(new java.math.BigDecimal("14.20"),
      org.apache.spark.sql.types.DecimalType(9, 2)) == -500754589)
    // date 2017-11-16 = 17486 days since epoch, hashed as a long
    assert(java.time.LocalDate.of(2017, 11, 16).toEpochDay == 17486L)
    assert(hashValue(17486, org.apache.spark.sql.types.DateType) ==
      -653330422)
    // timestamp 2017-11-16T22:31:08 as MICROS since epoch
    val micros = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(hashValue(micros,
      org.apache.spark.sql.types.TimestampNTZType) == -2047944441)
    // binary 0x00010203
    assert(hashValue(Array[Byte](0, 1, 2, 3),
      org.apache.spark.sql.types.BinaryType) == -188683207)
    // the spec's worked bucket example: bucket(16, 'iceberg') = 9
    assert(bucketValue("iceberg",
      org.apache.spark.sql.types.StringType, 16) == 9)
  }

  test("column expression agrees with the scalar hash and stays " +
      "inside whole-stage codegen") {
    // spark.range gives a codegen-participating scan (a local Seq
    // constant-folds to LocalTableScan and proves nothing)
    val df = spark.range(1, 2000).select(($"id" * 7 - 3000).as("v"))
    val out = df.select($"v",
      org.apache.spark.sql.graft.shim.column(IcebergBucketId(
        org.apache.spark.sql.graft.shim.expression($"v"), 16)).as("b"))
    val got = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (v, b) =>
      assert(b == IcebergBucketHash.bucketValue(v,
        org.apache.spark.sql.types.LongType, 16))
    }
    // the `*(1)` stage marker on the Project carrying the expression =
    // it participates in whole-stage codegen (no fallback project)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("iceberg_bucket_id") && l.trim.startsWith("*(")), plan)
  }

  test("an iceberg-bucketed table writes, prunes by literal equality " +
      "with the ICEBERG hash, and round-trips content") {
    val df = (1L to 400L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("ibucket") + "/t", df.schema,
      partitionBy = Seq("bucket_iceberg(8, id)"))
    t.append(df)
    // 8 hive dirs under the derived name, ids in [0, 8)
    val dirs = LakeTable.listParquet(
      new org.apache.hadoop.fs.Path(t.root).getFileSystem(
        spark.sessionState.newHadoopConf()),
      new org.apache.hadoop.fs.Path(t.root, "data"))
      .map(_.getParent.getName).toSet
    assert(dirs.forall(_.startsWith("id_ibucket_8=")))
    assert(dirs.map(_.split('=')(1).toInt).subsetOf((0 until 8).toSet))
    // content round-trips; the transform is invisible to the scan
    assert(t.scan().columns.toSeq == Seq("id", "v"))
    assert(t.scan().agg(sum($"id")).head().getLong(0) == 80200L)
    // literal-equality pruning reads ONLY the key's bucket partition
    val key = 123L
    val expectBucket = IcebergBucketHash.bucketValue(key,
      org.apache.spark.sql.types.LongType, 8)
    val pruned = t.scan($"id" === key)
    assert(pruned.collect().map(_.getLong(0)).toSeq == Seq(key))
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(scanned.contains(s"id_ibucket_8=$expectBucket") ||
      t.scan($"id" === key).inputFiles
        .forall(_.contains(s"id_ibucket_8=$expectBucket")),
      "scan must touch only the iceberg-hash bucket of the literal")
    // keyed delete prunes via the same set-membership path
    t.deleteByKeys(Seq(Tuple1(123L), Tuple1(200L)).toDF("id"), Seq("id"))
    assert(t.scan().count() == 398)
  }

  test("export accepts bucket_iceberg and declares bucket[N] with int " +
      "partition values; native bucket stays refused") {
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("ibucket-exp") + "/t", df.schema,
      partitionBy = Seq("bucket_iceberg(4, id)"))
    t.append(df)
    val metaPath = IcebergExport.export(t,
      TestSpark.tmpDir("ibucket-exp-out"))
    val meta = Snapshot.mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Path.of(new java.net.URI(metaPath))))
    val specField = meta.path("partition-specs").get(0).path("fields")
      .get(0)
    assert(specField.path("transform").asText() == "bucket[4]")
    assert(specField.path("name").asText() == "id_ibucket_4")
    // per-entry partition values: ints matching the spec hash of at
    // least one row in the file (exact per-file check: every value in
    // [0,4) and the per-bucket row counts sum to 100)
    val entries = IcebergExport.readEntries(metaPath,
      spark.sessionState.newHadoopConf())
    assert(entries.map(_._2).sum == 100L)
    val buckets = entries.map(_._3("id_ibucket_4").toInt)
    assert(buckets.forall(b => b >= 0 && b < 4))
    // per-bucket counts from the export equal the hash's own grouping
    val expect = (1L to 100L)
      .groupBy(i => IcebergBucketHash.bucketValue(i,
        org.apache.spark.sql.types.LongType, 4))
      .view.mapValues(_.size.toLong).toMap
    val got = entries.groupBy(_._3("id_ibucket_4").toInt)
      .view.mapValues(_.map(_._2).sum).toMap
    assert(got == expect)
  }
}
