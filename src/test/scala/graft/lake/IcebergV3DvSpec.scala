package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Iceberg v3 interop: puffin codec round-trips, the v3 export whose
  * MOR deletes are deletion-vector blobs, the engine-free import that
  * applies them, the format-version gate, and the hostile refusals
  * (unknown versions, default values, foreign blob types, corrupt
  * frames). */
class IcebergV3DvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def hconf = spark.sessionState.newHadoopConf()

  test("puffin codec: blobs + footer round-trip; framing, flags, and " +
      "region bounds are verified") {
    val dir = TestSpark.tmpDir("puffin-rt")
    val p = new Path(dir, "t.puffin")
    val fs = p.getFileSystem(hconf)
    val dv1 = Puffin.dvBlob(Array(1L, 5L, 70000L))
    val dv2 = Puffin.dvBlob((0L until 5000L).toArray)
    val offs = Puffin.writeFile(fs, p, Seq(
      (Puffin.DvBlobType, dv1, Map("referenced-data-file" -> "a.parquet",
        "cardinality" -> "3")),
      (Puffin.DvBlobType, dv2, Map("cardinality" -> "5000"))),
      Map("created-by" -> "graft"))
    assert(offs.head._1 == 4L, "first blob sits right after the magic")
    val metas = Puffin.readBlobs(fs, p)
    assert(metas.size == 2)
    assert(metas.map(m => (m.offset, m.length)) == offs)
    assert(metas.forall(_.blobType == Puffin.DvBlobType))
    assert(metas.forall(m =>
      m.snapshotId == -1L && m.sequenceNumber == -1L))
    assert(metas.head.properties("referenced-data-file") == "a.parquet")
    val got1 = Puffin.readDvBlob(Puffin.readBlob(fs, p,
      metas.head.offset, metas.head.length), Some(3L))
    assert(got1.toSeq == Seq(1L, 5L, 70000L))
    val got2 = Puffin.readDvBlob(Puffin.readBlob(fs, p,
      metas(1).offset, metas(1).length), Some(5000L))
    assert(got2.length == 5000)
    // region outside the file refuses
    intercept[IllegalArgumentException] {
      Puffin.readBlob(fs, p, fs.getFileStatus(p).getLen - 2, 100L)
    }
    // cardinality cross-check refuses
    val e = intercept[IllegalArgumentException] {
      Puffin.readDvBlob(dv1, Some(4L))
    }
    assert(e.getMessage.contains("cardinality"))
    // corrupted payload byte → CRC refusal
    val broken = dv1.clone(); broken(6) = (broken(6) ^ 0x40).toByte
    val e2 = intercept[IllegalArgumentException] {
      Puffin.readDvBlob(broken, Some(3L))
    }
    assert(e2.getMessage.contains("checksum"))
    // a non-puffin file refuses on the magic
    val junk = new Path(dir, "junk.puffin")
    LakeTable.writeStringExclusive(fs, junk, "x" * 64)
    val e3 = intercept[IllegalArgumentException] {
      Puffin.readBlobs(fs, junk)
    }
    assert(e3.getMessage.contains("magic"))
  }

  test("v3 export/import round-trip: consolidated DVs become puffin " +
      "deletion-vector blobs, the engine-free reader applies them, a " +
      "grown DV re-publishes, row-lineage counters stay monotone") {
    val base = TestSpark.tmpDir("ice-v3")
    val src = (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
    val lt = LakeTable.create(spark, s"$base/t", src.schema,
      properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    lt.append(src.repartition(4))
    lt.delete(col("id") % 7 === 0)
    lt.consolidateDeleteVectors()
    val meta1 = IcebergExport.export(lt, s"$base/ice", formatVersion = 3)
    val fs = new Path(base).getFileSystem(hconf)

    // metadata shape: format-version 3 + row-lineage counters
    val m = Snapshot.mapper
    val node1 = m.readTree(LakeTable.readString(fs, new Path(meta1)))
    assert(node1.path("format-version").asInt() == 3)
    val next1 = node1.path("next-row-id").asLong()
    assert(next1 == 200L)
    assert(node1.path("snapshots").elements().next()
      .path("first-row-id").asLong() == 0L)

    // the manifest references ONE puffin file by
    // referenced_data_file + content_offset/content_size_in_bytes
    val tm = IcebergImport.load(meta1, hconf)
    val dels = tm.deleteEntries
    assert(dels.nonEmpty && dels.forall(_.format == "puffin"))
    assert(dels.forall(d => d.referencedDataFile.isDefined &&
      d.contentOffset.isDefined && d.contentSize.isDefined))
    assert(dels.map(_.uri).distinct.size == 1)
    assert(dels.head.uri.endsWith(".puffin"))
    // footer agrees with the manifest regions
    val pf = new Path(dels.head.uri)
    val metas = Puffin.readBlobs(pf.getFileSystem(hconf), pf)
    assert(metas.map(b => (b.offset, b.length)).toSet ==
      dels.map(d => (d.contentOffset.get, d.contentSize.get)).toSet)

    // the import applies the DVs: row-identical to the governed scan
    assert(rows(IcebergImport.scan(spark, meta1)) == rows(lt.scan()))
    assert(IcebergImport.scan(spark, meta1).count() == 200L - 28L)

    // grow the deletes → publish inherits v3, rewrites the puffin
    lt.delete(col("id") % 5 === 0)
    lt.consolidateDeleteVectors()
    lt.append((201L to 210L).map(i => (i, s"v$i")).toDF("id", "v"))
    val meta2 = IcebergExport.publish(lt, s"$base/ice")
    val node2 = m.readTree(LakeTable.readString(fs, new Path(meta2)))
    assert(node2.path("format-version").asInt() == 3)
    assert(node2.path("next-row-id").asLong() > next1,
      "next-row-id must advance across publishes")
    val sn2 = node2.path("snapshots").elements()
    sn2.next()
    assert(sn2.next().path("first-row-id").asLong() == next1)
    assert(rows(IcebergImport.scan(spark, meta2)) == rows(lt.scan()))

    // EXECUTOR-SIDE puffin decode parity: force the distributed path
    // (driver threshold 0) — footer gate + blob decode run in tasks,
    // same rows back
    spark.conf.set("spark.graft.lake.dv-decode-driver-max-files", "0")
    try {
      assert(rows(IcebergImport.scan(spark, meta2)) == rows(lt.scan()))
    } finally {
      spark.conf.unset("spark.graft.lake.dv-decode-driver-max-files")
      spark.catalog.clearCache()
    }
  }

  test("SQL surface: CALL system.export_iceberg(tbl, dir, snapshot, " +
      "3) writes the v3 puffin-DV tree") {
    val base = TestSpark.tmpDir("ice-v3-sql")
    val cat = new LakeCatalog(spark, s"$base/cat")
    cat.createNamespace("ns")
    val src = (1L to 60L).map(i => (i, s"v$i")).toDF("id", "v")
    val t = cat.createTable("ns", "src", src.schema,
      properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    t.append(src.repartition(2))
    t.delete(col("id") % 6 === 0)
    t.consolidateDeleteVectors()
    val snap = t.currentSnapshotId.get
    val meta = LakeSql.run(cat, "ns",
      s"CALL system.export_iceberg('src', '$base/ice', $snap, 3)")
      .head.getString(0)
    val tm = IcebergImport.load(meta, hconf)
    assert(tm.deleteEntries.nonEmpty &&
      tm.deleteEntries.forall(_.format == "puffin"))
    assert(rows(IcebergImport.scan(spark, meta)) == rows(t.scan()))
  }

  test("refusals: unknown format-version, v3 initial-default schemas, " +
      "loose position deletes on a v3 export, foreign blob types, " +
      "manifest regions the footer does not declare") {
    val base = TestSpark.tmpDir("ice-v3-hostile")
    val src = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    val fs = new Path(base).getFileSystem(hconf)
    val m = Snapshot.mapper

    // format-version gate: 1 and 4 refuse with the version named
    val lt = LakeTable.create(spark, s"$base/t", src.schema)
    lt.append(src)
    val meta = IcebergExport.export(lt, s"$base/ice")
    def rewriteMeta(f: com.fasterxml.jackson.databind.node.ObjectNode
        => Unit): String = {
      val node = m.readTree(LakeTable.readString(fs, new Path(meta)))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      f(node)
      val out = new Path(base, s"meta-${System.nanoTime()}.json")
      LakeTable.writeStringExclusive(fs, out, m.writeValueAsString(node))
      out.toString
    }
    Seq(1, 4).foreach { v =>
      val p = rewriteMeta(_.put("format-version", v))
      val e = intercept[IllegalArgumentException] {
        IcebergImport.load(p, hconf)
      }
      assert(e.getMessage.contains(s"format-version $v"))
    }

    // v3 schema with initial-default on an OPTIONAL field refuses (a
    // stored NULL must stay NULL — applying the default would clobber
    // it; required-field defaults APPLY, see the defaults test below)
    val pDefault = rewriteMeta { n =>
      n.put("format-version", 3)
      val it = n.path("schemas").elements().next()
        .path("fields").elements()
      it.next() // id (required — defaults on it apply, skip)
      it.next() // v: optional string
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .put("initial-default", "zz")
    }
    val eDef = intercept[IllegalArgumentException] {
      IcebergImport.load(pDefault, hconf)
    }
    assert(eDef.getMessage.contains("initial-default"))

    // loose (unconsolidated) position deletes refuse on a v3 export
    val mor = LakeTable.create(spark, s"$base/mor", src.schema,
      properties = Map(LakeTable.PROP_DELETE_MODE -> "merge-on-read"))
    mor.append(src)
    mor.delete(col("id") <= 5)
    val eLoose = intercept[IllegalArgumentException] {
      IcebergExport.export(mor, s"$base/ice-loose", formatVersion = 3)
    }
    assert(eLoose.getMessage.contains("consolidateDeleteVectors"))

    // a foreign blob TYPE at the referenced offset refuses: flip the
    // footer's type string in place (same byte length keeps the
    // framing valid) — the manifest still points at the region
    mor.consolidateDeleteVectors()
    val meta3 = IcebergExport.export(mor, s"$base/ice3",
      formatVersion = 3)
    val dels = IcebergImport.load(meta3, hconf).deleteEntries
    val pf = new Path(dels.head.uri)
    val bytes = {
      val in = fs.open(pf)
      try {
        val buf = new Array[Byte](fs.getFileStatus(pf).getLen.toInt)
        in.readFully(0, buf); buf
      } finally in.close()
    }
    val swapped = new String(bytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("deletion-vector-v1", "deletion-vector-v9")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    fs.delete(pf, false)
    val out = fs.create(pf, false)
    try out.write(swapped) finally out.close()
    val eType = intercept[IllegalArgumentException] {
      IcebergImport.scan(spark, meta3).collect()
    }
    assert(eType.getMessage.contains("deletion-vector-v9"))

    // a manifest region the footer does not declare refuses: restore
    // the type but truncate the declared length in the footer JSON is
    // framing-sensitive — instead point a fresh puffin WITHOUT blobs
    // at the same path shape via an empty-blob file and a stale
    // manifest: simplest equivalent is offset drift, exercised by
    // writing a new puffin (different offsets) under the SAME path
    val positions = Array(0L, 1L)
    fs.delete(pf, false)
    Puffin.writeFile(fs, pf, Seq(
      (Puffin.DvBlobType, Array.fill(64)(0x7f.toByte) ++
        Puffin.dvBlob(positions), Map.empty[String, String])))
    val eRegion = intercept[IllegalArgumentException] {
      IcebergImport.scan(spark, meta3).collect()
    }
    assert(eRegion.getMessage.contains("does not declare") ||
      eRegion.getMessage.contains("no footer blob"))
  }

  test("v3 initial-defaults: a REQUIRED defaulted column reads as the " +
      "default from pre-evolution files (and through scanWhere); " +
      "optional-with-default, nested, and unmappable-type defaults " +
      "refuse") {
    val base = TestSpark.tmpDir("ice-v3-defaults")
    val src = (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
    val fs = new Path(base).getFileSystem(hconf)
    val m = Snapshot.mapper
    val lt = LakeTable.create(spark, s"$base/t", src.schema)
    lt.append(src)
    val meta = IcebergExport.export(lt, s"$base/ice")
    def withField(extra: String): String = {
      val node = m.readTree(LakeTable.readString(fs, new Path(meta)))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      node.put("format-version", 3)
      node.path("schemas").elements().next()
        .path("fields").asInstanceOf[
          com.fasterxml.jackson.databind.node.ArrayNode]
        .add(m.readTree(extra))
      val out = new Path(base, s"meta-${System.nanoTime()}.json")
      LakeTable.writeStringExclusive(fs, out, m.writeValueAsString(node))
      out.toString
    }
    // the data files PREDATE the column entirely — every row reads 42
    val pInt = withField("""{"id":99,"name":"flag","required":true,"type":"int","initial-default":42}""")
    val tm = IcebergImport.load(pInt, hconf)
    assert(tm.defaults == Seq("flag" -> 42))
    val got = IcebergImport.scan(spark, pInt)
      .select("id", "flag").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == (1L to 50L).map(i => (i, 42)).toSet)
    // filters see the defaulted value (applied before the row filter)
    assert(IcebergImport.scanWhere(spark, pInt,
      col("flag") === 42).count() == 50L)
    assert(IcebergImport.scanWhere(spark, pInt,
      col("flag") === 7).count() == 0L)
    // typed defaults: date and decimal pin the exact type
    val pDate = withField("""{"id":98,"name":"d0","required":true,"type":"date","initial-default":"2024-02-29"}""")
    assert(IcebergImport.scan(spark, pDate).select("d0").distinct()
      .collect().map(_.getDate(0).toString).toSeq == Seq("2024-02-29"))
    val pDec = withField("""{"id":97,"name":"m0","required":true,"type":"decimal(10,2)","initial-default":"12.34"}""")
    val dec = IcebergImport.scan(spark, pDec).select("m0").distinct()
      .collect().map(_.getDecimal(0))
    assert(dec.map(_.toPlainString).toSeq == Seq("12.34"))
    // optional-with-default refuses (a stored NULL must stay NULL)
    val pOpt = withField("""{"id":96,"name":"o0","required":false,"type":"int","initial-default":1}""")
    val eOpt = intercept[IllegalArgumentException] {
      IcebergImport.load(pOpt, hconf)
    }
    assert(eOpt.getMessage.contains("OPTIONAL"))
    // unmappable default type refuses by name
    val pBin = withField("""{"id":95,"name":"b0","required":true,"type":"binary","initial-default":"0xDEAD"}""")
    val eBin = intercept[IllegalArgumentException] {
      IcebergImport.load(pBin, hconf)
    }
    assert(eBin.getMessage.contains("unmappable"))
    // nested defaults refuse
    val pNest = withField("""{"id":94,"name":"s0","required":true,"type":{"type":"struct","fields":[{"id":93,"name":"x","required":true,"type":"int","initial-default":5}]}}""")
    val eNest = intercept[IllegalArgumentException] {
      IcebergImport.load(pNest, hconf)
    }
    assert(eNest.getMessage.contains("NESTED"))
  }
}
