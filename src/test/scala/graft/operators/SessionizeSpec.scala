package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gap sessionization on a hand-built timeline") {
    val us = 1000000L
    // user 1: events at 0s, 10s, 2000s (gap>1800 → 2 sessions)
    // user 2: single event
    val df = Seq(
      (1L, 0L * us, 1.0), (1L, 10L * us, 2.0), (1L, 2000L * us, 4.0),
      (2L, 5L * us, 8.0)
    ).toDF("user_id", "ts_us", "value")
    val got = Sessionize.byGap(df, "user_id", col("ts_us"), "value", 1800)
      .orderBy("user_id", "session_no").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_no"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_value"),
        r.getAs[Long]("duration_s")))
    assert(got.toSeq == Seq(
      (1L, 0L, 2L, 3.0, 10L),
      (1L, 1L, 1L, 4.0, 0L),
      (2L, 0L, 1L, 8.0, 0L)))
  }
}
