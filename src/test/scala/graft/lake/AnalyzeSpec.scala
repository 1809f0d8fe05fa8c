package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** `ANALYZE TABLE … COMPUTE STATISTICS [FOR COLUMNS …]` → table
  * properties (`stats.num_rows` / `stats.size_bytes` /
  * `stats.col.<c>.{ndv,nulls,min,max}`), surfaced through
  * SHOW TBLPROPERTIES and DESCRIBE EXTENDED. Table-level stats are
  * metadata-only (manifest row counts); column stats are one aggregate
  * pass. */
class AnalyzeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat = new LakeCatalog(spark, TestSpark.tmpDir("analyze"))

  test("ANALYZE TABLE records exact row count and bytes from the manifest") {
    val cat = freshCat
    cat.createNamespace("ns")
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(df)
    cat.sql("ns", "ANALYZE TABLE t COMPUTE STATISTICS")
    val props = cat.loadTable("ns", "t").properties
    assert(props(LakeTable.PROP_STATS_ROWS) == "100")
    assert(props(LakeTable.PROP_STATS_BYTES).toLong > 0L)
    assert(props.contains(LakeTable.PROP_STATS_SNAPSHOT))
    // NOSCAN spelling parses and lands the same stats
    cat.sql("ns", "ANALYZE TABLE t COMPUTE STATISTICS NOSCAN")
    assert(cat.loadTable("ns", "t")
      .properties(LakeTable.PROP_STATS_ROWS) == "100")
  }

  test("FOR COLUMNS computes ndv, nulls, min, max per column") {
    val cat = freshCat
    cat.createNamespace("ns")
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (3L, Some("b"))).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df)
    cat.sql("ns", "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS id, v")
    val props = cat.loadTable("ns", "t").properties
    assert(props("stats.col.id.ndv") == "3")
    assert(props("stats.col.id.nulls") == "0")
    assert(props("stats.col.id.min") == "1")
    assert(props("stats.col.id.max") == "3")
    assert(props("stats.col.v.ndv") == "2")
    assert(props("stats.col.v.nulls") == "1")
    assert(props("stats.col.v.min") == "a")
    assert(props("stats.col.v.max") == "b")
    assert(props(LakeTable.PROP_STATS_ROWS) == "4")
  }

  test("FOR ALL COLUMNS analyzes every atomic column; stats reflect deletes") {
    val cat = freshCat
    cat.createNamespace("ns")
    val df = (1L to 10L).map(i => (i, i * 2.0)).toDF("id", "d")
    cat.createTable("ns", "t", df.schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(df)
    cat.sql("ns", "DELETE FROM t WHERE id > 5")
    cat.sql("ns", "ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS")
    val props = cat.loadTable("ns", "t").properties
    assert(props(LakeTable.PROP_STATS_ROWS) == "5")
    assert(props("stats.col.id.ndv") == "5")
    assert(props("stats.col.d.max") == "10.0")
    // approx flavor stays within HLL error on a small domain
    val approx = cat.loadTable("ns", "t")
      .analyzeColumns(Seq("id"), exact = false)
    val ndv = cat.loadTable("ns", "t").properties("stats.col.id.ndv").toLong
    assert(ndv >= 4 && ndv <= 6)
  }

  test("DESCRIBE EXTENDED surfaces the analyzed statistics") {
    val cat = freshCat
    cat.createNamespace("ns")
    val df = (1L to 7L).map(i => (i, s"v$i")).toDF("id", "v")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df)
    cat.sql("ns", "ANALYZE TABLE t COMPUTE STATISTICS")
    val rows = cat.sql("ns", "DESCRIBE EXTENDED t").collect()
    val stat = rows.find(_.getString(0) == "Statistics")
    assert(stat.isDefined)
    assert(stat.get.getString(1).endsWith("7 rows"))
    // plain DESCRIBE omits the statistics section
    val plain = cat.sql("ns", "DESCRIBE t").collect()
    assert(!plain.exists(_.getString(0) == "Statistics"))
  }

  test("unknown and non-atomic columns are rejected") {
    val cat = freshCat
    cat.createNamespace("ns")
    val df = Seq((1L, Seq(1, 2))).toDF("id", "arr")
    cat.createTable("ns", "t", df.schema)
    cat.loadTable("ns", "t").append(df)
    intercept[Exception] {
      cat.sql("ns", "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS nope")
    }
    intercept[Exception] {
      cat.sql("ns", "ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS arr")
    }
    // FOR ALL COLUMNS silently skips the non-atomic column
    cat.sql("ns", "ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS")
    val props = cat.loadTable("ns", "t").properties
    assert(props.contains("stats.col.id.ndv"))
    assert(!props.contains("stats.col.arr.ndv"))
  }
}
