package graft.lake

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** General MERGE surface ([[LakeTable.mergeClauses]] via the SQL text
  * front-end): per-clause conditions, explicit `SET col = expr` /
  * `INSERT (cols) VALUES` lists, multiple MATCHED clauses with Spark's
  * first-match-wins precedence — the Iceberg-Spark shapes beyond the
  * reference's star-only merge text (scripts/bronze-silver.py:265-266). */
class GeneralMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat = new LakeCatalog(spark, TestSpark.tmpDir("genmerge"))

  private def setup(cat: LakeCatalog): LakeTable = {
    cat.createNamespace("ns")
    val tgt = Seq(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("id", "cat", "amount")
    cat.createTable("ns", "t", tgt.schema)
    val lt = cat.loadTable("ns", "t")
    lt.append(tgt)
    lt
  }

  test("conditional MATCHED clauses: first match wins, rest carry through") {
    val cat = freshCat
    setup(cat)
    Seq((1L, "x", 5L), (2L, "y", 100L), (3L, "z", 25L), (9L, "n", 1L))
      .toDF("id", "cat", "amount").createOrReplaceTempView("src")
    // id=1: amount 5 < 50 → first clause updates cat only
    // id=2: src amount 100 ≥ 50 → second clause doubles the amount
    // id=3: src amount 25 < 50 → first clause
    // id=9: unmatched → conditional insert (amount > 0) applies
    cat.sql("ns", """
MERGE INTO t USING src ON t.id = src.id
WHEN MATCHED AND src.amount < 50 THEN UPDATE SET cat = src.cat
WHEN MATCHED THEN UPDATE SET amount = src.amount * 2, cat = 'big'
WHEN NOT MATCHED AND src.amount > 0 THEN INSERT (id, cat) VALUES (src.id, upper(src.cat))
""")
    val got = cat.sql("ns", "SELECT * FROM t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, "x", 10L),   // cat updated, amount untouched
      (2L, "big", 200L), // second clause: doubled
      (3L, "z", 30L),   // first clause: cat only
      (4L, "d", 40L),   // untouched carry-through in unaffected file
      (9L, "N", -1L)))  // partial insert: amount null
  }

  test("MATCHED DELETE before UPDATE takes precedence; no-clause rows survive") {
    val cat = freshCat
    setup(cat)
    Seq((1L, 99L), (2L, 5L), (3L, 7L)).toDF("id", "amount")
      .createOrReplaceTempView("src")
    // id=1: delete (amount ≥ 50); id=2,3: update amount; NO insert
    // clause at all — unmatched source rows must not appear
    cat.sql("ns", """
MERGE INTO t USING src ON t.id = src.id
WHEN MATCHED AND src.amount >= 50 THEN DELETE
WHEN MATCHED THEN UPDATE SET amount = t.amount + src.amount
""")
    val got = cat.sql("ns", "SELECT id, amount FROM t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((2L, 25L), (3L, 37L), (4L, 40L)))
  }

  test("NOT MATCHED BY SOURCE UPDATE composes with the upsert") {
    val cat = freshCat
    setup(cat)
    Seq((1L, "u", 11L)).toDF("id", "cat", "amount")
      .createOrReplaceTempView("src")
    cat.sql("ns", """
MERGE INTO t USING src ON t.id = src.id
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
WHEN NOT MATCHED BY SOURCE AND amount >= 40 THEN DELETE
WHEN NOT MATCHED BY SOURCE THEN UPDATE SET cat = 'aged'
""")
    val got = cat.sql("ns", "SELECT id, cat, amount FROM t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // id=1 upserted; id=2,3 unmatched → aged; id=4 unmatched amount≥40 → dropped
    assert(got == Seq((1L, "u", 11L), (2L, "aged", 20L), (3L, "aged", 30L)))
  }

  test("mergeClauses API: insert-only into an empty table honors clause order") {
    val cat = freshCat
    cat.createNamespace("ns")
    val schema = Seq((0L, "", 0L)).toDF("id", "cat", "amount").schema
    cat.createTable("ns", "e", schema)
    val lt = cat.loadTable("ns", "e")
    val src = Seq((1L, "p", 3L), (2L, "q", -4L)).toDF("id", "cat", "amount")
    lt.mergeClauses(src, Seq("id"),
      matched = Nil,
      notMatched = Seq(
        MergeWhen(Some(col("s.amount") > 0),
          Some(Map("id" -> col("s.id"), "cat" -> lit("pos")))),
        MergeWhen(None,
          Some(Map("id" -> col("s.id"), "cat" -> col("s.cat"),
            "amount" -> col("s.amount"))))))
    val got = lt.scan().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq((1L, "pos", -1L), (2L, "q", -4L)))
  }

  test("general merge rewrites only key-affected files") {
    val cat = freshCat
    cat.createNamespace("ns")
    val schema = Seq((0L, 0L)).toDF("id", "v").schema
    cat.createTable("ns", "p", schema)
    val lt = cat.loadTable("ns", "p")
    // two range-disjoint files
    lt.append(Seq((1L, 1L), (2L, 2L)).toDF("id", "v").coalesce(1))
    lt.append(Seq((100L, 3L), (200L, 4L)).toDF("id", "v").coalesce(1))
    val before = lt.currentSnapshot.get.liveFiles.toSet
    Seq((1L, 50L)).toDF("id", "v").createOrReplaceTempView("psrc")
    cat.sql("ns", """
MERGE INTO p USING psrc ON p.id = psrc.id
WHEN MATCHED AND psrc.v > 10 THEN UPDATE SET v = psrc.v
""")
    val after = lt.currentSnapshot.get.liveFiles.toSet
    // the 100/200 file must survive untouched — stats pruning keeps
    // the merge's rewrite proportional to the touched key range
    assert(before.intersect(after).size == 1,
      s"expected exactly the untouched file to survive: $before -> $after")
    val got = lt.scan().orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 50L), (2L, 2L), (100L, 3L), (200L, 4L)))
  }

  test("MERGE WITH SCHEMA EVOLUTION adds source-only columns") {
    val cat = freshCat
    val lt = setup(cat)
    Seq((2L, "B", 99L, "eu"), (9L, "n", 9L, "us"))
      .toDF("id", "cat", "amount", "region")
      .createOrReplaceTempView("esrc")
    // without the clause, the same star merge DROPS region (alignment)
    cat.sql("ns", """
MERGE WITH SCHEMA EVOLUTION INTO t USING esrc ON t.id = esrc.id
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
""")
    assert(lt.schema.fieldNames.toSeq == Seq("id", "cat", "amount", "region"))
    val got = cat.sql("ns", "SELECT id, cat, amount, region FROM t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)).getOrElse("-"))).toSeq
    assert(got == Seq(
      (1L, "a", 10L, "-"),   // pre-existing row: evolved column reads NULL
      (2L, "B", 99L, "eu"),  // updated row carries the new column
      (3L, "c", 30L, "-"),
      (4L, "d", 40L, "-"),
      (9L, "n", 9L, "us")))  // insert carries it too

    // the SAME statement without the clause drops unknown source columns
    Seq((3L, "C", 1L, "apac")).toDF("id", "cat", "amount", "extra2")
      .createOrReplaceTempView("esrc2")
    cat.sql("ns", """
MERGE INTO t USING esrc2 ON t.id = esrc2.id
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
""")
    assert(lt.schema.fieldNames.toSeq == Seq("id", "cat", "amount", "region"))
  }

  test("txn merge racing its own replay lands exactly once") {
    // the check-then-act window: a zombie replay of the same
    // (appId, version) commits BETWEEN this merge's up-front watermark
    // check and its commit attempt — the retry must re-check the
    // watermark on the rebased head and no-op, never double-apply
    val cat = freshCat
    cat.createNamespace("ns")
    val schema = Seq((0L, "", 0L)).toDF("id", "cat", "amount").schema
    cat.createTable("ns", "e", schema)
    val lt = cat.loadTable("ns", "e")
    val src = Seq((1L, "p", 3L)).toDF("id", "cat", "amount")
    val nm = Seq(MergeWhen(None, Some(Map(
      "id" -> col("s.id"), "cat" -> col("s.cat"),
      "amount" -> col("s.amount")))))
    var fired = false
    lt.beforeCommitHook = () => if (!fired) {
      fired = true
      // the "zombie" second driver applies the same versioned merge
      cat.loadTable("ns", "e").mergeClauses(src, Seq("id"),
        matched = Nil, notMatched = nm, txn = Some(("job", 7L)))
    }
    try lt.mergeClauses(src, Seq("id"),
      matched = Nil, notMatched = nm, txn = Some(("job", 7L)))
    finally lt.beforeCommitHook = () => ()
    assert(fired)
    assert(lt.scan().count() == 1)
    assert(lt.properties("txn.job") == "7")
  }
}
