package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz of the row-level DML surface beyond MERGE:
  * random 1–3-op SEQUENCES of UPDATE/DELETE/REPLACE-WHERE (predicate
  * templates × assignment templates, including an IN-subquery delete)
  * over random data, each sequence executed three ways that must agree
  * row-for-row after EVERY op:
  *
  *   1. the SQL TEXT path (`DELETE FROM` / `UPDATE … SET` through
  *      [[LakeSql]] / Spark's parser),
  *   2. the direct [[LakeTable.delete]]/[[LakeTable.update]] API,
  *   3. a driver-side reference interpreter over plain Scala rows.
  *
  * Each case also draws independent `write.delete.mode` /
  * `write.update.mode` settings, so sequences stack MOR position
  * deletes on top of earlier MOR after-images and COW rewrites on top
  * of delete files — the interleavings the hand-written specs don't
  * reach. Complements MergeFuzzSpec (the MERGE grammar) the same way
  * Iceberg's own RowDelta randomized suites complement its SQL tests. */
class UpdateDeleteFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import MergeFuzzSpec.R

  // ---- predicate templates: SQL text + Column + reference ----------

  private case class PTpl(sql: String, col: Column, ref: R => Boolean)

  private val predPool = Seq(
    PTpl("a > 500", expr("a > 500"), _.a > 500),
    PTpl("b % 2 = 0", expr("b % 2 = 0"), _.b % 2 == 0),
    PTpl("id >= 8", expr("id >= 8"), _.id >= 8),
    PTpl("a + b < 900", expr("a + b < 900"), r => r.a + r.b < 900),
    PTpl("id IN (1, 3, 5, 7)", col("id").isin(1L, 3L, 5L, 7L),
      r => Set(1L, 3L, 5L, 7L)(r.id)),
    // IN-subquery: the text path resolves it through the session
    // catalog; the API side gets the equivalent literal set
    PTpl("id IN (SELECT id FROM fuzz_ud_keys)",
      col("id").isin(2L, 4L, 9L), r => Set(2L, 4L, 9L)(r.id)))

  // ---- assignment templates: SQL SET + Column map + reference ------

  private case class ATpl(sql: String, api: Map[String, Column],
      ref: R => R)

  private val asgPool = Seq(
    ATpl("a = a + 1", Map("a" -> expr("a + 1")),
      r => r.copy(a = r.a + 1)),
    ATpl("b = a + b", Map("b" -> expr("a + b")),
      r => r.copy(b = r.a + r.b)),
    ATpl("a = 0, b = b * 2", Map("a" -> lit(0L), "b" -> expr("b * 2")),
      r => r.copy(a = 0L, b = r.b * 2)))

  private sealed trait Op
  private case class Del(p: PTpl) extends Op
  private case class Upd(p: PTpl, a: ATpl) extends Op
  // replaceWhere: the region's rows re-derived through an assignment
  // and swapped back in. When the transform pushes a row OUT of the
  // predicate, BOTH paths must refuse (the leak gate) and leave state
  // untouched — refusals are part of the modeled behavior, not noise.
  private case class Rep(p: PTpl, a: ATpl) extends Op

  private val opGen: Gen[Op] = Gen.oneOf(
    Gen.oneOf(predPool).map(Del(_)),
    for { p <- Gen.oneOf(predPool); a <- Gen.oneOf(asgPool) }
      yield Upd(p, a),
    for { p <- Gen.oneOf(predPool); a <- Gen.oneOf(asgPool) }
      yield Rep(p, a))

  private val rowGen: Gen[R] = for {
    id <- Gen.chooseNum(0L, 15L)
    a <- Gen.chooseNum(0L, 1000L)
    b <- Gen.chooseNum(0L, 1000L)
  } yield R(id, a, b)

  private def dedup(rs: List[R]): List[R] =
    rs.groupBy(_.id).map(_._2.head).toList.sortBy(_.id)

  private val caseGen = for {
    rows <- Gen.listOf(rowGen).map(dedup)
    ops <- Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, opGen))
    morDel <- Gen.oneOf(false, true)
    morUpd <- Gen.oneOf(false, true)
  } yield (rows, ops, morDel, morUpd)

  test("property: UPDATE/DELETE text ≡ API ≡ reference over op " +
      "sequences, COW and MOR, 60+ cases") {
    Seq((2L, 1), (4L, 1), (9L, 1)).toDF("id", "x")
      .createOrReplaceTempView("fuzz_ud_keys")
    var n = 0
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(60)
    val res = org.scalacheck.Test.check(params,
      Prop.forAllNoShrink(caseGen) { case (rows, ops, morDel, morUpd) =>
        n += 1
        val base = TestSpark.tmpDir(s"ud-fuzz-$n")
        val cat = new LakeCatalog(spark, base)
        cat.createNamespace("f")
        val props = Map.newBuilder[String, String]
        if (morDel)
          props += LakeTable.PROP_DELETE_MODE -> "merge-on-read"
        if (morUpd)
          props += LakeTable.PROP_UPDATE_MODE -> "merge-on-read"
        val df = rows.toDF()
        cat.createTable("f", "t_sql", df.schema,
          properties = props.result())
        cat.createTable("f", "t_api", df.schema,
          properties = props.result())
        val tSql = cat.loadTable("f", "t_sql")
        val tApi = cat.loadTable("f", "t_api")
        tSql.append(df); tApi.append(df)

        var ref = rows: Seq[R]
        var ok = true
        for (op <- ops if ok) {
          op match {
            case Del(p) =>
              cat.sql("f", s"DELETE FROM t_sql WHERE ${p.sql}")
              tApi.delete(p.col)
              ref = ref.filterNot(p.ref)
            case Upd(p, a) =>
              cat.sql("f", s"UPDATE t_sql SET ${a.sql} WHERE ${p.sql}")
              tApi.update(p.col, a.api)
              ref = ref.map(r => if (p.ref(r)) a.ref(r) else r)
            case Rep(p, a) =>
              val batch = ref.filter(p.ref).map(a.ref)
              val bdf = batch.toDF()
              bdf.createOrReplaceTempView("fuzz_rep_src")
              val sqlText = s"INSERT INTO t_sql REPLACE WHERE " +
                s"${p.sql} SELECT * FROM fuzz_rep_src"
              if (batch.exists(r => !p.ref(r))) {
                // leaking batch: both paths refuse, state untouched
                intercept[IllegalArgumentException](
                  tApi.overwriteWhere(bdf, p.col))
                intercept[IllegalArgumentException](cat.sql("f", sqlText))
              } else {
                tApi.overwriteWhere(bdf, p.col)
                cat.sql("f", sqlText)
                ref = ref.filterNot(p.ref) ++ batch
              }
          }
          def rows3(t: LakeTable) = t.scan().collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            .sorted.toSeq
          val expect = ref.map(r => (r.id, r.a, r.b)).sorted
          val gotSql = rows3(tSql)
          val gotApi = rows3(tApi)
          ok = gotSql == expect && gotApi == expect
          if (!ok) info(s"UD CASE $n FAILED op=$op " +
            s"morDel=$morDel morUpd=$morUpd\n rows=$rows\n ops=$ops" +
            s"\n expect=$expect\n sql=$gotSql\n api=$gotApi")
        }
        ok
      })
    assert(res.passed, res.status.toString)
    info(s"$n update/delete fuzz cases executed")
    spark.catalog.dropTempView("fuzz_ud_keys")
  }
}
