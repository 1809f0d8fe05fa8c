package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `addFiles` / `CALL system.add_files`: import existing Parquet files
  * into a lake table by RENAME (no rewrite) with full validation —
  * the Iceberg `add_files`/`migrate` surface. */
class AddFilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  test("imports external parquet by rename; stats prune immediately") {
    val wh = TestSpark.tmpDir("addfiles")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("ns")
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(df.where($"id" <= 50))
    // external files written by PLAIN spark, outside the table
    val ext = TestSpark.tmpDir("addfiles-ext")
    df.where($"id" > 50).repartition(3).write
      .mode("overwrite").parquet(ext)
    val extFiles = LakeTable.listParquet(fs(ext), new Path(ext))
    assert(extFiles.size == 3)
    val out = cat.sql("ns", s"CALL system.add_files('t', '$ext')")
      .head()
    assert(out.getLong(1) == 3L) // added_files
    val t = cat.loadTable("ns", "t")
    assert(t.scan().count() == 100)
    assert(t.scan().agg(sum($"id")).head().getLong(0) == 5050L)
    // ownership moved: source dir is drained, files live under data/
    assert(LakeTable.listParquet(fs(ext), new Path(ext)).isEmpty)
    // history shows the dedicated op; one commit for the whole import
    assert(t.history.where($"operation" === "add-files").count() == 1)
    // footer stats were profiled: a point read plans fewer files than
    // the table holds (bounds pruning over the imported files too)
    val planned = t.scan($"id" === 60L)
    assert(planned.count() == 1)
  }

  test("identity-partitioned hive layout keeps partition pruning") {
    val wh = TestSpark.tmpDir("addfiles-part")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("ns")
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "grp", "v")
    cat.createTable("ns", "tp", df.schema, partitionBy = Seq("grp"))
    val ext = TestSpark.tmpDir("addfiles-part-ext")
    df.write.mode("overwrite").partitionBy("grp").parquet(ext)
    val lt = cat.loadTable("ns", "tp")
    val (_, n) = lt.addFiles(ext)
    assert(n >= 2)
    assert(lt.scan().count() == 3)
    assert(lt.scan().where($"grp" === "b").select("id")
      .head().getLong(0) == 3L)
    // partition metadata parsed from the preserved hive dirs
    assert(lt.partitions.count() == 2)
  }

  test("rejects schema drift, transform specs, bad layouts — atomically") {
    val wh = TestSpark.tmpDir("addfiles-bad")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("ns")
    val df = Seq((1L, "a")).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(df)
    val before = lt.currentSnapshotId
    // wrong column type
    val ext1 = TestSpark.tmpDir("addfiles-bad1")
    Seq((1, "a")).toDF("id", "v").write.mode("overwrite").parquet(ext1)
    intercept[IllegalArgumentException](lt.addFiles(ext1))
    // missing column
    val ext2 = TestSpark.tmpDir("addfiles-bad2")
    Seq(Tuple1(1L)).toDF("id").write.mode("overwrite").parquet(ext2)
    intercept[IllegalArgumentException](lt.addFiles(ext2))
    // nothing imported, nothing committed, source files untouched
    assert(cat.loadTable("ns", "t").currentSnapshotId == before)
    assert(cat.loadTable("ns", "t").scan().count() == 1)
    assert(LakeTable.listParquet(fs(ext1), new Path(ext1)).nonEmpty)
    // hidden-transform partitioning is refused up front
    val df3 = Seq((1L, "a", 2.0)).toDF("id", "grp", "v")
    cat.createTable("ns", "tb", df3.schema,
      partitionBy = Seq("bucket(4, id)"))
    intercept[IllegalArgumentException](
      cat.loadTable("ns", "tb").addFiles(ext1))
    // identity-partitioned table refuses a flat (dir-less) layout
    cat.createTable("ns", "tp2", df3.schema, partitionBy = Seq("grp"))
    val ext3 = TestSpark.tmpDir("addfiles-bad3")
    df3.write.mode("overwrite").parquet(ext3)
    intercept[IllegalArgumentException](
      cat.loadTable("ns", "tp2").addFiles(ext3))
  }

  test("refuses the table's own directory; flattens 'data' segments") {
    val wh = TestSpark.tmpDir("addfiles-self")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("ns")
    val df = Seq((1L, "a")).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(df)
    // importing the table's own data dir (or any parent of the table)
    // would rename live files out from under the manifests
    intercept[IllegalArgumentException](lt.addFiles(lt.root + "/data"))
    intercept[IllegalArgumentException](lt.addFiles(wh))
    assert(lt.scan().count() == 1)
    // a source layout containing a dir literally named `data` must not
    // survive into the stored path — the move-proof `data/`-boundary
    // rule that lineage and position deletes key on pins the LAST such
    // segment
    val ext = TestSpark.tmpDir("addfiles-datadir")
    Seq((2L, "b")).toDF("id", "v").write.mode("overwrite")
      .parquet(ext + "/export/data")
    val (_, n) = lt.addFiles(ext)
    assert(n >= 1)
    assert(lt.scan().count() == 2)
    val stored = lt.files.select("file_path").collect()
      .map(_.getString(0))
    stored.foreach { p =>
      assert(p.split('/').count(_ == "data") == 1, p)
    }
    // the import left no staged marker behind (protection was
    // transient, released by the commit)
    assert(lt.stagedIds.isEmpty)
  }

  test("write constraints validate imported rows before ownership") {
    val wh = TestSpark.tmpDir("addfiles-chk")
    val cat = new LakeCatalog(spark, wh)
    cat.createNamespace("ns")
    val df = Seq((1L, 5.0)).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    cat.sql("ns", "ALTER TABLE t ADD CONSTRAINT pos CHECK (v > 0)")
    val ext = TestSpark.tmpDir("addfiles-chk-ext")
    Seq((2L, -1.0)).toDF("id", "v").write.mode("overwrite").parquet(ext)
    val e = intercept[Exception](cat.loadTable("ns", "t").addFiles(ext))
    assert(e.getMessage.contains("pos"), e.getMessage)
    // violating files were NOT taken: still in the source dir
    assert(LakeTable.listParquet(fs(ext), new Path(ext)).nonEmpty)
    assert(cat.loadTable("ns", "t").scan().count() == 0)
  }
}
