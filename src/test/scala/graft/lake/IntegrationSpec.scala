package graft.lake

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Kitchen-sink integration: one table running every lake feature in
  * sequence — partitioned + sorted + merge-on-read + schema evolution +
  * compaction + time travel + expiry — asserting the final content
  * against a DataFrame-computed expectation. Pairwise specs cover each
  * feature; this covers their interactions. */
class IntegrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("full lifecycle on one table: MOR + evolution + sort + compact") {
    val root = TestSpark.tmpDir("integration") + "/t"
    val df0 = (1L to 300L).map(i => (i, s"v$i", s"p${i % 3}", i * 1.0))
      .toDF("id", "v", "p", "amt")
    val t = LakeTable.create(spark, root, df0.schema,
      partitionBy = Seq("p"),
      properties = Map(
        LakeTable.PROP_MERGE_MODE -> "merge-on-read",
        LakeTable.PROP_DELETE_MODE -> "merge-on-read",
        LakeTable.PROP_SORT_ORDER -> "id"))

    // 1) sorted, partitioned append
    t.append(df0)
    val sAfterAppend = t.currentSnapshotId.get

    // 2) MOR merge: update 50 rows, insert 20
    t.merge(((251L to 320L).map(i => (i, s"m$i", s"p${i % 3}", i * 2.0)))
      .toDF("id", "v", "p", "amt"), Seq("id"))

    // 3) evolve: rename the merge key's neighbor, add a column
    t.renameColumn("amt", "amount")
    t.addColumn("tag", StringType)

    // 4) post-evolution MOR merge keyed on id, carrying the new shape
    t.merge(Seq((5L, "upd5", "p2", 555.0, "tagged"))
      .toDF("id", "v", "p", "amount", "tag"), Seq("id"))

    // 5) MOR key delete
    t.deleteByKeys(Seq(10L, 20L).toDF("id"), Seq("id"))

    // expectation computed independently
    def expected = {
      val base = (1L to 300L).map(i => (i, s"v$i", s"p${i % 3}", i * 1.0,
        null: String))
      val merged = base.map { case r @ (i, _, _, _, _) =>
        if (i >= 251L) (i, s"m$i", s"p${i % 3}", i * 2.0, null: String)
        else r
      } ++ (301L to 320L).map(i =>
        (i, s"m$i", s"p${i % 3}", i * 2.0, null: String))
      merged.map { case r @ (i, _, _, _, _) =>
        if (i == 5L) (5L, "upd5", "p2", 555.0, "tagged") else r
      }.filterNot(r => r._1 == 10L || r._1 == 20L)
        .toDF("id", "v", "p", "amount", "tag")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v", "p", "amount", "tag")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getDouble(3), if (r.isNullAt(4)) null else r.getString(4)))
        .toSet

    assert(rows(t.scan()) == rows(expected))
    assert(t.currentSnapshot.get.deleteFiles.nonEmpty)

    // 6) compact: folds MOR deletes, content identical, deletes cleared
    t.compact()
    assert(t.currentSnapshot.get.deleteFiles.isEmpty)
    assert(rows(t.scan()) == rows(expected))

    // 7) post-compact COW-style predicate update still correct
    t.update($"id" === 7L, Map("v" -> lit("SEVEN")))
    assert(t.scan().where($"v" === "SEVEN").count() == 1)

    // 8) time travel: the original append is intact under its own schema
    val tt = t.scanAt(sAfterAppend)
    assert(tt.columns.toSeq == Seq("id", "v", "p", "amt"))
    assert(tt.count() == 300)
    assert(tt.where($"id" === 5L).select("v").as[String].collect()
      .toSeq == Seq("v5"))

    // 9) expiry keeps the current state readable
    t.expireSnapshots(keepLast = 2)
    assert(t.scan().where($"v" === "SEVEN").count() == 1)
    assert(t.scan().count() == expected.count())
  }
}
