package graft.lake

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stored SQL views (≡ Iceberg views): original text persisted in
  * catalog metadata (`<ns>/_views.json`), late-bound — each statement
  * re-resolves the text against the CURRENT table state, so views see
  * new commits without re-creation. */
class ViewsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("create / query / late-binding / chaining / drop") {
    val df = (1L to 100L).map(i => (i, i % 5, i * 2.0))
      .toDF("k", "g", "x")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("views"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema)
    val t = cat.loadTable("ns", "t")
    t.append(df)

    cat.sql("ns",
      "CREATE VIEW big AS SELECT k, g, x FROM t WHERE k > 90")
    assert(cat.sql("ns", "SELECT count(*) AS n FROM big")
      .collect().head.getLong(0) == 10L)

    // late binding: a new commit is visible without re-creating
    t.append(Seq((101L, 1L, 1.0)).toDF("k", "g", "x"))
    assert(cat.sql("ns", "SELECT count(*) AS n FROM big")
      .collect().head.getLong(0) == 11L)

    // views can reference earlier views (creation-order registration)
    cat.sql("ns",
      "CREATE VIEW big_sum AS SELECT g, sum(x) AS sx FROM big GROUP BY g")
    assert(cat.sql("ns", "SELECT count(*) AS n FROM big_sum")
      .collect().head.getLong(0) > 0L)

    // OR REPLACE swaps the definition
    cat.sql("ns",
      "CREATE OR REPLACE VIEW big AS SELECT k, g, x FROM t WHERE k > 99")
    assert(cat.sql("ns", "SELECT count(*) AS n FROM big")
      .collect().head.getLong(0) == 2L)

    // SHOW VIEWS lists both, persisted across a fresh catalog handle
    val cat2 = new LakeCatalog(spark, cat.warehouse)
    assert(cat2.sql("ns", "SHOW VIEWS").collect()
      .map(_.getString(1)).toSet == Set("big", "big_sum"))

    cat.sql("ns", "DROP VIEW big_sum")
    assert(cat.listViews("ns").map(_._1) == Seq("big"))
    intercept[Exception](cat.sql("ns", "DROP VIEW big_sum"))
    cat.sql("ns", "DROP VIEW IF EXISTS big_sum") // no-op, no error
  }

  test("a view name cannot shadow a table; bad definitions fail loudly") {
    val df = (1L to 5L).map(i => (i, s"v$i")).toDF("k", "v")
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("views2"))
    cat.createNamespace("ns")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df)
    intercept[Exception](
      cat.sql("ns", "CREATE VIEW t AS SELECT 1 AS x"))
    intercept[Exception](
      cat.sql("ns", "CREATE VIEW broken AS SELECT * FROM no_such_table"))
    // reserved metadata-view suffixes of existing tables: a view named
    // t_history would silently shadow table t's generated history view
    val e = intercept[IllegalArgumentException](
      cat.createView("ns", "t_history", "SELECT 1 AS x"))
    assert(e.getMessage.contains("t_history"))
    intercept[IllegalArgumentException](
      cat.createView("ns", "t_files", "SELECT 1 AS x"))
    // ...but the suffix alone is fine when no such table exists
    cat.createView("ns", "other_history", "SELECT 1 AS x")
    cat.dropView("ns", "other_history")
    assert(cat.listViews("ns").isEmpty)
  }

  test("concurrent createView calls do not lose updates") {
    val cat = new LakeCatalog(spark, TestSpark.tmpDir("views3"))
    cat.createNamespace("ns")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val fs = (1 to 16).map { i =>
        pool.submit(new Runnable {
          def run(): Unit =
            cat.createView("ns", s"v$i", s"SELECT $i AS x")
        })
      }
      fs.foreach(_.get())
    } finally pool.shutdown()
    assert(cat.listViews("ns").map(_._1).toSet ==
      (1 to 16).map(i => s"v$i").toSet)
  }
}
