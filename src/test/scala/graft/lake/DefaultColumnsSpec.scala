package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Column DEFAULT values (≡ Iceberg v3 initial-defaults / Delta
  * `ADD COLUMN … DEFAULT`): `ALTER TABLE … ADD COLUMN c T DEFAULT e`
  * is a metadata-only commit — pre-existing files project the default
  * at scan time, later writes that omit the column materialize it, and
  * an explicitly written NULL stays NULL (default is not a read-time
  * coalesce). */
class DefaultColumnsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat = new LakeCatalog(spark, TestSpark.tmpDir("defcols"))

  test("ADD COLUMN DEFAULT: old rows read the default, not NULL") {
    val cat = freshCat
    cat.createNamespace("ns")
    val t0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    cat.createTable("ns", "t", t0.schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(t0)
    val before = lt.currentSnapshotId

    cat.sql("ns", "ALTER TABLE t ADD COLUMN score INT DEFAULT 5 + 2")
    // metadata-only: no data files rewritten
    assert(cat.loadTable("ns", "t").currentSnapshotId != before)

    val got = cat.sql("ns", "SELECT id, score FROM t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 7), (2L, 7)))
  }

  test("writes after the add: omitted column fills the default, explicit NULL stays NULL") {
    val cat = freshCat
    cat.createNamespace("ns")
    cat.createTable("ns", "t", Seq((1L, "a")).toDF("id", "v").schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(Seq((1L, "a")).toDF("id", "v"))
    cat.sql("ns", "ALTER TABLE t ADD COLUMN tag STRING DEFAULT 'std'")

    // INSERT naming only (id, v): tag takes its CURRENT_DEFAULT
    cat.sql("ns", "INSERT INTO t (id, v) VALUES (2, 'b')")
    // INSERT writing tag explicitly, including an explicit NULL
    cat.sql("ns", "INSERT INTO t VALUES (3, 'c', 'custom'), (4, 'd', NULL)")

    val got = cat.sql("ns", "SELECT id, tag FROM t ORDER BY id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq(1L -> Some("std"), 2L -> Some("std"),
      3L -> Some("custom"), 4L -> None))
  }

  test("defaults survive rename, interact with filters, and show in DDL") {
    val cat = freshCat
    cat.createNamespace("ns")
    cat.createTable("ns", "t", Seq((1L, "a")).toDF("id", "v").schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    cat.sql("ns", "ALTER TABLE t ADD COLUMN band INT DEFAULT 10")
    cat.sql("ns", "INSERT INTO t VALUES (3, 'c', 99)")

    // filter on the defaulted column must see old rows under the default
    val hits = cat.sql("ns", "SELECT id FROM t WHERE band = 10 ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(1L, 2L))

    // rename keeps the default attached to the renamed column
    cat.sql("ns", "ALTER TABLE t RENAME COLUMN band TO tier")
    val renamed = cat.sql("ns", "SELECT id, tier FROM t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(renamed == Seq((1L, 10), (2L, 10), (3L, 99)))

    val ddl = cat.sql("ns", "SHOW CREATE TABLE t")
      .collect().head.getString(0)
    assert(ddl.contains("tier INT DEFAULT 10"))
  }

  test("non-deterministic or malformed defaults are rejected at DDL time") {
    val cat = freshCat
    cat.createNamespace("ns")
    cat.createTable("ns", "t", Seq((1L, "a")).toDF("id", "v").schema)
    val lt = cat.loadTable("ns", "t")
    intercept[Exception] {
      lt.addColumn("r", org.apache.spark.sql.types.DoubleType,
        defaultSql = Some("rand()"))
    }
    intercept[Exception] {
      lt.addColumn("x", org.apache.spark.sql.types.IntegerType,
        defaultSql = Some("not_a_function(1,"))
    }
    // the failed DDLs must not have committed anything
    assert(lt.schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("COW rewrite (DELETE) materializes defaults for surviving rows") {
    val cat = freshCat
    cat.createNamespace("ns")
    cat.createTable("ns", "t", Seq((1L, "a")).toDF("id", "v").schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    cat.sql("ns", "ALTER TABLE t ADD COLUMN w INT DEFAULT 42")
    // row-level delete forces a COW rewrite of the file; the rewritten
    // survivors must carry the default as REAL values
    cat.sql("ns", "DELETE FROM t WHERE id = 2")
    val got = cat.sql("ns", "SELECT id, w FROM t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 42), (3L, 42)))
  }
}
