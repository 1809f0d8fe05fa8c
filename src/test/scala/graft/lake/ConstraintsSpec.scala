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
object ConstraintsSpec {
  /** Evaluation counter for the non-determinism test (local mode: UDF
    * closures run in this JVM, so a static is visible to tasks). */
  val evals = new java.util.concurrent.atomic.AtomicLong()
}

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

  test("non-deterministic input: validation sees the WRITTEN rows, once") {
    // The poison column is valid for its first full evaluation (10 rows)
    // and violating for any later one. Probe-then-write would validate
    // evaluation #1 and commit evaluation #2's violating rows; the
    // staged-file validation reads back what the write actually staged,
    // so the write both succeeds AND commits only valid rows — and the
    // input plan is evaluated exactly once (no double computation).
    ConstraintsSpec.evals.set(0L)
    val poison = udf { () =>
      if (ConstraintsSpec.evals.incrementAndGet() <= 10) 1.0 else -1.0
    }.asNondeterministic()
    val t = LakeTable.create(spark,
      TestSpark.tmpDir("ck-nd") + "/t",
      StructType(Seq(StructField("k", LongType),
        StructField("x", DoubleType))))
    t.addCheckConstraint("x_pos", "x >= 0")
    t.append(spark.range(10).coalesce(1)
      .select(col("id").as("k"), poison().as("x")))
    assert(ConstraintsSpec.evals.get() == 10L,
      s"input evaluated ${ConstraintsSpec.evals.get()} times, expected 10")
    assert(t.scan().where(col("x") < 0).count() == 0L)
    assert(t.scan().count() == 10L)
  }

  test("adding a column does not orphan constraints; constrain new column") {
    val df = (1L to 5L).map(i => (i, i * 10L)).toDF("id", "amount")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("ck-evolve"))
    cat.createNamespace("ns")
    val t = cat.createTable("ns", "t", df.schema)
    t.append(df)
    t.addCheckConstraint("amt_pos", "amount >= 0")

    // evolve-merge adding a source-only column: allowed (only
    // drop/rename orphan a constraint), and amt_pos re-validates the
    // rewritten rows
    Seq((2L, 99L, "eu"), (9L, 9L, "us"))
      .toDF("id", "amount", "region").createOrReplaceTempView("ev_src")
    cat.sql("ns", """
MERGE WITH SCHEMA EVOLUTION INTO t USING ev_src ON t.id = ev_src.id
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
""")
    assert(t.schema.fieldNames.toSeq ==
      Seq("id", "amount", "region"))
    assert(t.scan().count() == 6L)

    // constrain the EVOLVED column (NULL-tolerant: pre-existing rows
    // read NULL for it and a CHECK must evaluate TRUE)
    t.addCheckConstraint("region_len",
      "region IS NULL OR length(region) <= 4")
    // ...and a NULL-intolerant add over those NULL rows is refused
    intercept[IllegalArgumentException](
      t.addCheckConstraint("region_req", "region IS NOT NULL"))

    // a later merge violating the evolved-column constraint aborts the
    // DATA commit (rows unchanged)
    Seq((3L, 30L, "overlong")).toDF("id", "amount", "region")
      .createOrReplaceTempView("ev_bad")
    val e = intercept[IllegalStateException](cat.sql("ns", """
MERGE INTO t USING ev_bad ON t.id = ev_bad.id
WHEN MATCHED THEN UPDATE SET *
"""))
    assert(e.getMessage.contains("region_len"))
    assert(t.scan().where(col("id") === 3L).select("region")
      .collect().head.isNullAt(0))
  }

  test("constrain-then-evolve: violating evolve-merge aborts the data") {
    val df = (1L to 5L).map(i => (i, i * 10L)).toDF("id", "amount")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("ck-cte"))
    cat.createNamespace("ns")
    val t = cat.createTable("ns", "t", df.schema)
    t.append(df)
    t.addCheckConstraint("amt_pos", "amount >= 0")

    // the merge's auto-evolve (a metadata commit) may land, but the
    // violating DATA write must not
    Seq((2L, -1L, "eu")).toDF("id", "amount", "region")
      .createOrReplaceTempView("cte_bad")
    val e = intercept[IllegalStateException](cat.sql("ns", """
MERGE WITH SCHEMA EVOLUTION INTO t USING cte_bad ON t.id = cte_bad.id
WHEN MATCHED THEN UPDATE SET *
"""))
    assert(e.getMessage.contains("amt_pos"))
    val rows = t.scan().select("id", "amount").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == (1L to 5L).map(i => (i, i * 10L)))
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
