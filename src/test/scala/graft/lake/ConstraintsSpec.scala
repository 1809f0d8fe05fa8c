package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CHECK constraints + NOT NULL enforcement (≡ Delta's constraint
  * scheme): declared as `constraints.<name>` table properties, added
  * only after the existing data validates, and re-validated on EVERY
  * data write (ingest, merge/update rewrites) in one probe job — a
  * violating batch aborts before any file is committed. */
class ConstraintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("add validates existing data; writes re-validate; drop releases") {
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "x")
    val t = LakeTable.create(spark, TestSpark.tmpDir("ck") + "/t",
      df.schema)
    t.append(df)

    // an add the data violates is refused
    val e0 = intercept[IllegalArgumentException](
      t.addCheckConstraint("big_k", "k > 50"))
    assert(e0.getMessage.contains("big_k"))

    t.addCheckConstraint("pos_k", "k > 0")
    assert(t.checkConstraints == Map("pos_k" -> "k > 0"))

    // violating append aborts BEFORE committing; table unchanged
    val before = t.currentSnapshotId
    val e1 = intercept[IllegalStateException](
      t.append(Seq((-5L, 1.0)).toDF("k", "x")))
    assert(e1.getMessage.contains("pos_k"))
    assert(t.currentSnapshotId == before && t.scan().count() == 100L)

    // valid append passes; NULL check result also violates (Delta rule)
    t.append(Seq((101L, 1.0)).toDF("k", "x"))
    val e2 = intercept[IllegalStateException](t.append(
      Seq((Option.empty[java.lang.Long], Some(1.0))).toDF("k", "x")))
    assert(e2.getMessage.contains("pos_k"))

    t.dropCheckConstraint("pos_k")
    t.append(Seq((-5L, 1.0)).toDF("k", "x")) // now admitted
    assert(t.scan().count() == 102L)
  }

  test("UPDATE/MERGE rewrites cannot smuggle a violation in") {
    val df = (1L to 20L).map(i => (i, i * 1.0)).toDF("k", "x")
    val t = LakeTable.create(spark, TestSpark.tmpDir("ck-upd") + "/t",
      df.schema)
    t.append(df)
    t.addCheckConstraint("x_pos", "x >= 0")
    val before = t.currentSnapshotId
    val e = intercept[IllegalStateException](
      t.update(col("k") === 3L, Map("x" -> lit(-1.0))))
    assert(e.getMessage.contains("x_pos"))
    assert(t.currentSnapshotId == before)
    t.update(col("k") === 3L, Map("x" -> lit(7.0)))
    assert(t.scan().where(col("k") === 3L).select("x")
      .collect().head.getDouble(0) == 7.0)
  }

  test("SQL surface: ADD CONSTRAINT / violation / DROP CONSTRAINT") {
    val df = (1L to 50L).map(i => (i, s"v$i")).toDF("k", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("ck-sql"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df)

    cat.sql("ns", "ALTER TABLE t ADD CONSTRAINT k_pos CHECK (k > 0)")
    assert(cat.loadTable("ns", "t").checkConstraints
      .contains("k_pos"))
    val e = intercept[IllegalStateException](
      cat.sql("ns", "INSERT INTO t VALUES (-1, 'bad')"))
    assert(e.getMessage.contains("k_pos"))
    cat.sql("ns", "ALTER TABLE t DROP CONSTRAINT k_pos")
    cat.sql("ns", "INSERT INTO t VALUES (-1, 'ok now')")
    assert(cat.sql("ns", "SELECT count(*) AS n FROM t")
      .collect().head.getLong(0) == 51L)
  }

  test("NOT NULL columns enforce on write") {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val t = LakeTable.create(spark, TestSpark.tmpDir("ck-nn") + "/t",
      schema,
      properties = Map(LakeTable.PropEnforceNotNull -> "true"))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val bad = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(null, "b")),
      StructType(Seq(StructField("k", LongType, nullable = true),
        StructField("v", StringType))))
    val e = intercept[IllegalStateException](t.append(bad))
    assert(e.getMessage.contains("NOT NULL column k"))
    assert(t.scan().count() == 1L)
  }

  test("schema changes that would orphan a constraint are refused") {
    val df = (1L to 10L).map(i => (i, i * 1.0)).toDF("k", "x")
    val t = LakeTable.create(spark, TestSpark.tmpDir("ck-ref") + "/t",
      df.schema)
    t.append(df)
    t.addCheckConstraint("x_pos", "x >= 0")
    intercept[IllegalArgumentException](t.dropColumn("x"))
    intercept[IllegalArgumentException](t.renameColumn("x", "y"))
    t.dropCheckConstraint("x_pos")
    t.renameColumn("x", "y") // now fine
    assert(t.schema.fieldNames.contains("y"))
  }
}
