package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Column-mapped Delta tables (reader v2 / v3 + columnMapping) read
  * engine-free: files store PHYSICAL column names (mode `name`) or
  * resolve by parquet FIELD ID (mode `id`); partitionValues and stats
  * JSON are physical-keyed. Fixtures are hand-written logs over
  * Spark-written parquet — the same hostile-fixture class as the rest
  * of the interop suite (no delta jar exists offline to write one). */
class DeltaColumnMappingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val mapper = Snapshot.mapper

  private def fm(id: Long, phys: String) = new MetadataBuilder()
    .putLong("delta.columnMapping.id", id)
    .putString("delta.columnMapping.physicalName", phys).build()

  /** Logical schema: id BIGINT, p STRING (partition), rec STRUCT<x
    * BIGINT> — every field mapped to an opaque physical name. */
  private val logical = StructType(Seq(
    StructField("id", LongType, nullable = true, fm(1, "col-aa")),
    StructField("p", StringType, nullable = true, fm(2, "col-bb")),
    StructField("rec", StructType(Seq(
      StructField("x", LongType, nullable = true, fm(4, "col-dd")))),
      nullable = true, fm(3, "col-cc"))))

  private def writeLog(dir: String, mode: String,
      adds: Seq[(String, Map[String, String], Long)]): Unit = {
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(dir, "_delta_log"))
    val lines = Seq.newBuilder[String]
    lines += """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}"""
    val md = mapper.createObjectNode()
    val o = md.putObject("metaData")
    o.put("id", "cmx")
    val f = o.putObject("format")
    f.put("provider", "parquet"); f.putObject("options")
    o.put("schemaString", logical.json)
    val pc = o.putArray("partitionColumns")
    pc.add("p") // partitionColumns are LOGICAL names
    val cfg = o.putObject("configuration")
    cfg.put("delta.columnMapping.mode", mode)
    o.put("createdTime", 1L)
    lines += mapper.writeValueAsString(md)
    adds.foreach { case (path, pv, size) =>
      val n = mapper.createObjectNode()
      val a = n.putObject("add")
      a.put("path", path)
      val pvo = a.putObject("partitionValues")
      pv.foreach { case (k, v) => pvo.put(k, v) } // PHYSICAL keys
      a.put("size", size)
      a.put("modificationTime", 1L)
      a.put("dataChange", true)
      // stats keyed by PHYSICAL names too
      a.put("stats",
        """{"numRecords":3,"minValues":{},"maxValues":{},"nullCount":{}}""")
      lines += mapper.writeValueAsString(n)
    }
    LakeTable.writeStringExclusive(fs,
      new Path(dir, "_delta_log/00000000000000000000.json"),
      lines.result().mkString("", "\n", "\n"))
  }

  private def fileAt(dir: String): (String, Long) = {
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val st = fs.listStatus(new Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    (st.getPath.toUri.toString, st.getLen)
  }

  test("mode=name: physical file columns (nested included) and " +
      "physical partitionValues read back as the logical schema") {
    val base = TestSpark.tmpDir("delta-cm-name")
    // data files under PHYSICAL names; partition column NOT in files
    def writePart(sub: String, ids: Seq[Long]): (String, Long) = {
      ids.map(i => (i, i * 10))
        .toDF("col-aa", "x")
        .select(col("`col-aa`"),
          struct(col("x").as("col-dd")).as("col-cc"))
        .coalesce(1).write.parquet(s"$base/$sub")
      fileAt(s"$base/$sub")
    }
    val (f1, s1) = writePart("d1", Seq(1L, 2L, 3L))
    val (f2, s2) = writePart("d2", Seq(4L, 5L, 6L))
    writeLog(s"$base/t", "name", Seq(
      (f1, Map("col-bb" -> "east"), s1),
      (f2, Map("col-bb" -> "west"), s2)))

    val st = DeltaImport.state(spark, s"$base/t", None)
    assert(st.schema == logical)
    assert(DeltaImport.mappingMode(st) == "name")
    val got = DeltaImport.scan(spark, s"$base/t")
    assert(got.schema.fieldNames.toSeq == Seq("id", "p", "rec"))
    assert(got.schema("rec").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("x"), "nested rename lost")
    val rows = got.select(col("id"), col("p"), col("rec.x"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(rows == Set((1L, "east", 10L), (2L, "east", 20L),
      (3L, "east", 30L), (4L, "west", 40L), (5L, "west", 50L),
      (6L, "west", 60L)))
    // logical partition predicate prunes through the physical scan
    val pp = DeltaImport.scanWhere(spark, s"$base/t", col("p") === "west")
    assert(pp.select("id").collect().map(_.getLong(0)).toSet ==
      Set(4L, 5L, 6L))
    // importTable materializes the logical shape
    val imp = DeltaImport.importTable(spark, s"$base/t", s"$base/copy")
    assert(imp.scan().count() == 6L)
    assert(imp.scan().schema.fieldNames.toSeq == Seq("id", "p", "rec"))
  }

  test("mode=id: parquet FIELD IDS resolve columns even when the " +
      "file's names match NEITHER logical nor physicalName") {
    val base = TestSpark.tmpDir("delta-cm-id")
    // the writer used arbitrary on-disk names, but stamped field ids
    def idMeta(id: Long) = new MetadataBuilder()
      .putLong("parquet.field.id", id).build()
    val writeSchema = StructType(Seq(
      StructField("weird_1", LongType, nullable = true, idMeta(1)),
      StructField("weird_3", StructType(Seq(
        StructField("weird_4", LongType, nullable = true, idMeta(4)))),
        nullable = true, idMeta(3))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(7L, org.apache.spark.sql.Row(70L)),
        org.apache.spark.sql.Row(8L, org.apache.spark.sql.Row(80L))), 1),
      writeSchema)
    df.coalesce(1).write.parquet(s"$base/d1")
    val (f1, s1) = fileAt(s"$base/d1")
    writeLog(s"$base/t", "id", Seq((f1, Map("col-bb" -> "zone"), s1)))
    val got = DeltaImport.scan(spark, s"$base/t")
      .select(col("id"), col("p"), col("rec.x"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got == Set((7L, "zone", 70L), (8L, "zone", 80L)))
  }

  test("physical-keyed stats JSON prunes logical predicates") {
    val base = TestSpark.tmpDir("delta-cm-stats")
    def writeOne(sub: String, ids: Seq[Long]): (String, Long) = {
      ids.map(i => (i, i)).toDF("col-aa", "x")
        .select(col("`col-aa`"),
          struct(col("x").as("col-dd")).as("col-cc"))
        .coalesce(1).write.parquet(s"$base/$sub")
      fileAt(s"$base/$sub")
    }
    val (f1, s1) = writeOne("d1", Seq(1L, 2L))
    val (f2, s2) = writeOne("d2", Seq(100L, 200L))
    val fs = new Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(s"$base/t/_delta_log"))
    val lines = Seq(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
      {
        val md = mapper.createObjectNode()
        val o = md.putObject("metaData")
        o.put("id", "cmx2")
        val f = o.putObject("format")
        f.put("provider", "parquet"); f.putObject("options")
        o.put("schemaString", logical.json)
        o.putArray("partitionColumns")
        o.putObject("configuration")
          .put("delta.columnMapping.mode", "name")
        o.put("createdTime", 1L)
        mapper.writeValueAsString(md)
      }) ++ Seq((f1, s1, 1L, 2L), (f2, s2, 100L, 200L)).map {
        case (p, sz, lo, hi) =>
          val n = mapper.createObjectNode()
          val a = n.putObject("add")
          a.put("path", p)
          a.putObject("partitionValues")
          a.put("size", sz); a.put("modificationTime", 1L)
          a.put("dataChange", true)
          a.put("stats", s"""{"numRecords":2,"minValues":{"col-aa":$lo},""" +
            s""""maxValues":{"col-aa":$hi},"nullCount":{"col-aa":0}}""")
          mapper.writeValueAsString(n)
      }
    LakeTable.writeStringExclusive(fs,
      new Path(s"$base/t/_delta_log/00000000000000000000.json"),
      lines.mkString("", "\n", "\n"))
    val st = DeltaImport.state(spark, s"$base/t", None)
    // the Scala prune path translates physical stat keys to logical
    val pruned = DeltaImport.pruneAdds(spark, st, col("id") <= 10L)
    assert(pruned.size == 1, s"kept ${pruned.size} of 2")
    assert(DeltaImport.scanWhere(spark, s"$base/t", col("id") <= 10L)
      .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("columnMapping + rowTracking together (the liquid-clustering-" +
      "era delta-spark default): lineageScan resolves ids under " +
      "PHYSICAL column names, the materialized column overriding " +
      "exactly where it is non-null") {
    val base = TestSpark.tmpDir("cm-rowtrack")
    val fs = new Path(base).getFileSystem(
      spark.sessionState.newHadoopConf())
    // physical file: col-aa (logical id), col-bb (logical s), and the
    // materialized row-id column — non-null ONLY at row index 1
    spark.sql("SELECT id AS `col-aa`, concat('v', id) AS `col-bb`, " +
        "CASE WHEN id = 1 THEN 900L ELSE NULL END AS `_rid-mat-7` " +
        "FROM range(3)")
      .coalesce(1).write.parquet(s"$base/files/f1")
    val part = fs.listStatus(new Path(s"$base/files/f1"))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val logical2 = StructType(Seq(
      StructField("id", LongType, nullable = true, fm(1, "col-aa")),
      StructField("s", StringType, nullable = true, fm(2, "col-bb"))))
    def jstr(x: String) = "\"" + x.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    LakeTable.writeStringExclusive(fs,
      new Path(s"$base/t/_delta_log/00000000000000000000.json"),
      Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":7,""" +
          """"writerFeatures":["appendOnly","invariants",""" +
          """"columnMapping","rowTracking","domainMetadata"]}}""",
        s"""{"metaData":{"id":"cmrt","format":{"provider":"parquet","options":{}},"schemaString":${jstr(
          logical2.json)},"partitionColumns":[],"configuration":{"delta.columnMapping.mode":"name","delta.rowTracking.enabled":"true","delta.rowTracking.materializedRowIdColumnName":"_rid-mat-7"},"createdTime":1}}""",
        s"""{"domainMetadata":{"domain":"delta.rowTracking","configuration":"{\\"rowIdHighWaterMark\\":902}","removed":false}}""",
        s"""{"add":{"path":${jstr(part.getPath.toUri.toString)},"partitionValues":{},"size":${part.getLen},"modificationTime":1,"dataChange":true,"baseRowId":500,"defaultRowCommitVersion":0}}""")
        .mkString("", "\n", "\n"))
    val got = DeltaImport.lineageScan(spark, s"$base/t")
      .select(col("id"), col("s"), col("_row_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((0L, "v0", 500L), (1L, "v1", 900L),
      (2L, "v2", 502L)), s"$got")
  }
}
