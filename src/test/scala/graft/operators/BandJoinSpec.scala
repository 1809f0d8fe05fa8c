package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BandJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("band join equals the naive non-equi join, each pair once") {
    val l = Seq((1L, 0L), (2L, 95L), (3L, 1000L), (4L, -30L))
      .toDF("l_id", "l_ts")
    val r = Seq((10L, 10L), (11L, 100L), (12L, 205L), (13L, -130L))
      .toDF("r_id", "r_ts")
    val got = BandJoin.join(l, r, "l_ts", "r_ts", band = 100L)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val naive = l.crossJoin(r)
      .where(abs(col("l_ts") - col("r_ts")) <= 100L)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(got == naive)
    assert(got == got.distinct, "a pair appeared more than once")
    // boundary: |0 - 100| = band is INCLUSIVE; negatives bin correctly
    assert(got.contains((1L, 11L)))
    assert(got.contains((4L, 10L)) && got.contains((4L, 13L)))
  }

  test("band join on the real events matches the predicate exactly") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = graft.sources.EventTime.withTsUs(TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/events.parquet"))
    val err = e.where($"event_type" === "error")
      .select($"event_id".as("error_id"), $"ts_us".as("error_ts"))
    val sg = e.where($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"ts_us".as("signup_ts"))
    val band = 300000000L // 5 min in µs
    val got = BandJoin.join(err, sg, "error_ts", "signup_ts", band)
    val naive = err.crossJoin(sg)
      .where(abs(col("error_ts") - col("signup_ts")) <= band)
    assert(got.count() == naive.count())
    assert(got.count() > 0)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }
}
