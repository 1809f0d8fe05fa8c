package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of join attaches the latest right row at or before each left ts") {
    val left = Seq(
      (1L, 10L, "c1"), (1L, 20L, "c2"), (1L, 5L, "c0"),
      (2L, 15L, "c3")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 18L, 180.0), (2L, 99L, 990.0)
    ).toDF("k", "ts", "price")

    val got = AsOfJoin.join(left, right, Seq("k"), "ts", "ts",
      Seq("price", "ts"))
      .select("k", "ts", "tag", "asof_price", "asof_ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet

    assert(got == Set(
      (1L, 5L, "c0", None, None),              // nothing at or before 5
      (1L, 10L, "c1", Some(100.0), Some(10L)), // inclusive match at 10
      (1L, 20L, "c2", Some(180.0), Some(18L)), // latest prior is 18
      (2L, 15L, "c3", None, None)              // right row is later (99)
    ))
  }

  test("tolerance nulls out matches older than the lookback window") {
    val left = Seq(
      (1L, 10L, "c1"), (1L, 30L, "c2"), (2L, 50L, "c3")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 8L, 80.0), (2L, 10L, 100.0)
    ).toDF("k", "ts", "price")
    val got = AsOfJoin.join(left, right, Seq("k"), "ts", "ts",
      Seq("price", "ts"), tolerance = Some(5L))
      .select("k", "ts", "tag", "asof_price", "asof_ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(got == Set(
      (1L, 10L, "c1", Some(80.0), Some(8L)), // age 2 <= 5: kept
      (1L, 30L, "c2", None, None),           // age 22 > 5: nulled
      (2L, 50L, "c3", None, None)            // age 40 > 5: nulled
    ))
    // no-tolerance call still attaches any age (regression guard)
    val any = AsOfJoin.join(left, right, Seq("k"), "ts", "ts",
      Seq("price"))
      .where($"tag" === "c2").select("asof_price").head().getDouble(0)
    assert(any == 80.0)
  }

  test("salted join equals the plain join") {
    val big = Seq.tabulate(100)(i => (i % 3L, i)).toDF("k", "v")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).orderBy("k", "v")
      .collect().toSeq
    val salted = SaltedJoin.join(big, dim, Seq("k"), saltFactor = 4)
      .orderBy("k", "v").collect().toSeq
    assert(salted == plain)
  }
}
