package graft.lake

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Iceberg-spec v2 export round-trip. No Iceberg jar exists offline, so
  * the check re-reads the written artifacts with the SAME avro/jackson
  * libraries and verifies (a) every spec-REQUIRED v2 field is present
  * with the spec's field-ids, (b) the manifest's values agree with the
  * graft manifest (paths, rows, bytes, partition values), and (c) the
  * referenced parquet — untouched, absolute-URI, zero-copy — scans back
  * row-identical to the graft table. */
class IcebergExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def localFile(uri: String): File =
    if (uri.startsWith("file:")) new File(new java.net.URI(uri))
    else new File(uri)

  private def avroRecords(uri: String): Seq[GenericRecord] = {
    val r = DataFileReader.openReader(localFile(uri),
      new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toList finally r.close()
  }

  test("unpartitioned export: spec-required metadata, manifest values " +
      "equal the graft manifest, referenced parquet scans identical") {
    val df = (1L to 500L).map(i => (i, s"v$i", i * 1.5))
      .toDF("id", "v", "x")
    val t = LakeTable.create(spark, TestSpark.tmpDir("ice-flat") + "/t",
      df.schema)
    t.append(df.where($"id" <= 300).repartition(2))
    t.append(df.where($"id" > 300).repartition(1))
    val dest = TestSpark.tmpDir("ice-flat-out")
    val metaPath = IcebergExport.export(t, dest)

    val meta = Snapshot.mapper.readTree(
      java.nio.file.Files.readString(localFile(metaPath).toPath))
    // spec-required v2 top-level fields
    Seq("format-version", "table-uuid", "location",
      "last-sequence-number", "last-updated-ms", "last-column-id",
      "schemas", "current-schema-id", "partition-specs",
      "default-spec-id", "last-partition-id", "sort-orders",
      "default-sort-order-id", "current-snapshot-id", "snapshots")
      .foreach(k => assert(meta.has(k), s"metadata.json lacks $k"))
    assert(meta.path("format-version").asInt() == 2)
    assert(meta.path("current-snapshot-id").asLong() ==
      t.currentSnapshotId.get)
    val schemaFields = meta.path("schemas").get(0).path("fields")
      .elements().asScala.toSeq
    assert(schemaFields.map(_.path("name").asText()) ==
      Seq("id", "v", "x"))
    assert(schemaFields.map(_.path("id").asInt()) == Seq(1, 2, 3))
    assert(meta.path("last-column-id").asInt() == 3)

    // manifest list → manifest → entries
    val listUri = meta.path("snapshots").get(0)
      .path("manifest-list").asText()
    val listRecs = avroRecords(listUri)
    assert(listRecs.size == 1)
    val mf = listRecs.head
    assert(mf.get("content").asInstanceOf[Int] == 0)
    assert(mf.get("added_files_count").asInstanceOf[Int] == 3)
    assert(mf.get("added_rows_count").asInstanceOf[Long] == 500L)
    assert(mf.get("manifest_length").asInstanceOf[Long] ==
      localFile(mf.get("manifest_path").toString).length())

    val entries = avroRecords(mf.get("manifest_path").toString)
    assert(entries.size == 3)
    val snap = t.currentSnapshot.get
    val byPath = entries.map { e =>
      val d = e.get("data_file").asInstanceOf[GenericRecord]
      assert(e.get("status").asInstanceOf[Int] == 1)
      assert(d.get("file_format").toString == "PARQUET")
      assert(d.get("content").asInstanceOf[Int] == 0)
      d.get("file_path").toString ->
        (d.get("record_count").asInstanceOf[Long],
          d.get("file_size_in_bytes").asInstanceOf[Long])
    }.toMap
    snap.liveFiles.foreach { rel =>
      val abs = byPath.keys.find(_.endsWith(rel)).getOrElse(
        fail(s"manifest lacks $rel"))
      val info = snap.fileInfo(rel)
      assert(byPath(abs) == (info.rows, info.bytes))
    }
    // zero-copy: the exported table's file list scans row-identical
    val viaExport = spark.read.parquet(byPath.keys.toSeq: _*)
    assert(viaExport.orderBy("id").collect().toSeq ==
      t.scan().orderBy("id").collect().toSeq)
  }

  test("identity-partitioned export carries partition spec + values") {
    val df = (1L to 100L).map(i => (i, s"g${i % 4}", i * 2.0))
      .toDF("id", "grp", "x")
    val t = LakeTable.create(spark, TestSpark.tmpDir("ice-part") + "/t",
      df.schema, partitionBy = Seq("grp"))
    t.append(df)
    val dest = TestSpark.tmpDir("ice-part-out")
    val metaPath = IcebergExport.export(t, dest)
    val meta = Snapshot.mapper.readTree(
      java.nio.file.Files.readString(localFile(metaPath).toPath))
    val specField = meta.path("partition-specs").get(0).path("fields")
      .get(0)
    assert(specField.path("name").asText() == "grp")
    assert(specField.path("transform").asText() == "identity")
    assert(specField.path("source-id").asInt() == 2)
    assert(specField.path("field-id").asInt() == 1000)
    val listUri = meta.path("snapshots").get(0)
      .path("manifest-list").asText()
    val mf = avroRecords(listUri).head
    val parts = avroRecords(mf.get("manifest_path").toString).map { e =>
      e.get("data_file").asInstanceOf[GenericRecord]
        .get("partition").asInstanceOf[GenericRecord]
        .get("grp").toString
    }.toSet
    assert(parts == Set("g0", "g1", "g2", "g3"))
  }

  test("truncate over an int source exports with int type and values " +
      "(Iceberg: truncate's result type IS the source type)") {
    val df = (1 to 100).map(i => (i, i.toLong, s"v$i"))
      .toDF("n", "id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("ice-trunc") + "/t",
      df.schema, partitionBy = Seq("truncate(25, n)"))
    t.append(df)
    val metaPath = IcebergExport.export(t,
      TestSpark.tmpDir("ice-trunc-out"))
    val meta = Snapshot.mapper.readTree(
      java.nio.file.Files.readString(localFile(metaPath).toPath))
    val listUri = meta.path("snapshots").get(0)
      .path("manifest-list").asText()
    val mf = avroRecords(listUri).head
    val entries = avroRecords(mf.get("manifest_path").toString)
    val partField = entries.head.get("data_file")
      .asInstanceOf[GenericRecord].getSchema
      .getField("partition").schema().getFields.get(0)
    // nullable union ["null", int] — the non-null branch must be INT
    val nonNull = partField.schema().getTypes.asScala
      .filter(_.getType != org.apache.avro.Schema.Type.NULL)
    assert(nonNull.map(_.getType) ==
      Seq(org.apache.avro.Schema.Type.INT), s"got $nonNull")
    val parts = entries.map(_.get("data_file")
      .asInstanceOf[GenericRecord]
      .get("partition").asInstanceOf[GenericRecord]
      .get(partField.name)).toSet
    assert(parts.forall(_.isInstanceOf[java.lang.Integer]))
    assert(parts.map(_.asInstanceOf[java.lang.Integer].intValue()) ==
      Set(0, 25, 50, 75, 100))
  }

  test("refusals: outstanding deletes; bucket transforms") {
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    val mor = LakeTable.create(spark,
      TestSpark.tmpDir("ice-mor") + "/t", df.schema,
      properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    mor.append(df)
    mor.delete($"id" === 1L)
    val e1 = intercept[IllegalArgumentException](
      IcebergExport.export(mor, TestSpark.tmpDir("ice-mor-out")))
    assert(e1.getMessage.contains("delete-free"))
    // after compaction the same table exports fine
    mor.compact(1)
    IcebergExport.export(mor, TestSpark.tmpDir("ice-mor-out2"))

    val bt = LakeTable.create(spark,
      TestSpark.tmpDir("ice-bucket") + "/t", df.schema,
      partitionBy = Seq("bucket(4, id)"))
    bt.append(df)
    val e2 = intercept[IllegalArgumentException](
      IcebergExport.export(bt, TestSpark.tmpDir("ice-bucket-out")))
    assert(e2.getMessage.contains("bucket"))
  }
}
