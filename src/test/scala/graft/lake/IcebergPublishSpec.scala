package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Continuous Iceberg publish: successive graft snapshots append to
  * ONE exported table as metadata versions — readers time-travel
  * across publishes, append-only deltas carry the prior manifests
  * verbatim (O(new files) work), anything else falls back to a full
  * manifest rewrite, and schema drift is refused. */
class IcebergPublishSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def localFile(uri: String): java.io.File =
    if (uri.startsWith("file:")) new java.io.File(new java.net.URI(uri))
    else new java.io.File(uri)

  private def listRecords(metaPath: String): Seq[GenericRecord] = {
    val meta = Snapshot.mapper.readTree(
      java.nio.file.Files.readString(localFile(metaPath).toPath))
    val cur = meta.path("current-snapshot-id").asLong()
    val listUri = meta.path("snapshots").elements().asScala
      .find(_.path("snapshot-id").asLong() == cur).get
      .path("manifest-list").asText()
    val r = DataFileReader.openReader(localFile(listUri),
      new GenericDatumReader[GenericRecord]())
    try r.iterator().asScala.toList finally r.close()
  }

  test("append-only publishes reuse prior manifests and build a " +
      "time-travelable history; a delete falls back to full rewrite") {
    val df = (1L to 300L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("icepub") + "/t",
      df.schema, properties = Map(
        LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    val dest = TestSpark.tmpDir("icepub-out")
    val s1 = t.append(df.where($"id" <= 100).repartition(2))
    val m1 = IcebergExport.publish(t, dest) // fresh dir → v1
    assert(m1.endsWith("v1.metadata.json"))
    val manifests1 = listRecords(m1).map(_.get("manifest_path").toString)

    val s2 = t.append(df.where($"id" > 100 && $"id" <= 200)
      .repartition(2))
    val m2 = IcebergExport.publish(t, dest)
    assert(m2.endsWith("v2.metadata.json"))
    // DELTA: v2's manifest list = v1's manifests verbatim + one new
    val recs2 = listRecords(m2)
    assert(recs2.map(_.get("manifest_path").toString)
      .containsSlice(manifests1))
    assert(recs2.size == manifests1.size + 1)
    val delta = recs2.filterNot(r =>
      manifests1.contains(r.get("manifest_path").toString)).head
    assert(delta.get("added_files_count") == 2)
    assert(delta.get("added_rows_count") == 100L)

    // a MOR delete breaks append-only → v3 rewrites fully, no carry
    t.delete($"id" % 10 === 7)
    val m3 = IcebergExport.publish(t, dest)
    assert(m3.endsWith("v3.metadata.json"))
    val recs3 = listRecords(m3)
    assert(!recs3.map(_.get("manifest_path").toString)
      .exists(manifests1.contains), "full rewrite carries nothing")
    assert(recs3.exists(_.get("content") == 1), "DELETES manifest")

    // append on top of outstanding deletes → delta again, the delete
    // manifest carried verbatim
    t.append(df.where($"id" > 200).repartition(1))
    val m4 = IcebergExport.publish(t, dest)
    val recs4 = listRecords(m4)
    assert(recs4.map(_.get("manifest_path").toString)
      .containsSlice(recs3.map(_.get("manifest_path").toString)))

    // one table, one uuid, four snapshots; hint points at v4
    val meta4 = Snapshot.mapper.readTree(
      java.nio.file.Files.readString(localFile(m4).toPath))
    val meta1 = Snapshot.mapper.readTree(
      java.nio.file.Files.readString(localFile(m1).toPath))
    assert(meta4.path("table-uuid").asText() ==
      meta1.path("table-uuid").asText())
    assert(meta4.path("snapshots").size() == 4)
    assert(meta4.path("metadata-log").size() == 3)
    assert(java.nio.file.Files.readString(localFile(
      m4.replaceAll("v4\\.metadata\\.json$", "version-hint.text"))
      .toPath).trim == "4")

    // the CURRENT state reads exactly; TIME TRAVEL across publishes
    // reproduces each published state from one metadata file
    def rows(dfr: org.apache.spark.sql.DataFrame) =
      dfr.collect().map(_.toString).toSet
    assert(rows(IcebergImport.scan(spark, m4)) == rows(t.scan()))
    assert(rows(IcebergImport.scan(spark, m4, Some(s1))) ==
      rows(t.scanAt(s1)))
    assert(rows(IcebergImport.scan(spark, m4, Some(s2))) ==
      rows(t.scanAt(s2)))

    // idempotent re-publish: same version back, no new metadata
    assert(IcebergExport.publish(t, dest) == m4)
  }

  test("schema drift since the last publish is refused; a fresh " +
      "directory accepts the evolved table") {
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = LakeTable.create(spark, TestSpark.tmpDir("icepub-evo") + "/t",
      df.schema)
    t.append(df)
    val dest = TestSpark.tmpDir("icepub-evo-out")
    IcebergExport.publish(t, dest)
    t.addColumn("extra", org.apache.spark.sql.types.LongType)
    t.compact() // clears the name mapping; schema is still different
    t.append(Seq((51L, "x", 9L)).toDF("id", "v", "extra"))
    val e = intercept[IllegalArgumentException](
      IcebergExport.publish(t, dest))
    assert(e.getMessage.contains("schema changed"))
    val fresh = TestSpark.tmpDir("icepub-evo-out2")
    val m = IcebergExport.publish(t, fresh)
    assert(IcebergImport.scan(spark, m).count() == t.scan().count())
  }

  test("CALL system.publish_iceberg drives the same path through SQL") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("icepub-sql"))
    cat.createNamespace("ns")
    val df = (1L to 60L).map(i => (i, i % 3)).toDF("k", "g")
    cat.createTable("ns", "src", df.schema)
    cat.loadTable("ns", "src").append(df.where($"k" <= 30))
    val dest = TestSpark.tmpDir("icepub-sql-out")
    val m1 = cat.sql("ns", s"CALL system.publish_iceberg('src', '$dest')")
      .head().getString(0)
    assert(m1.endsWith("v1.metadata.json"))
    cat.loadTable("ns", "src").append(df.where($"k" > 30))
    val m2 = cat.sql("ns", s"CALL system.publish_iceberg('src', '$dest')")
      .head().getString(0)
    assert(m2.endsWith("v2.metadata.json"))
    assert(IcebergImport.scan(spark, m2).count() == 60)
  }
}
