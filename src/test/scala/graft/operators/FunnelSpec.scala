package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  private def run(events: Seq[(Long, Long, String)], span: Long = 100L) = {
    val df = events.toDF("user_id", "ts", "event_type")
    Funnel.funnel(df, steps, col("ts"), span)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_users"), r.getAs[Double]("conv_rate")))
  }

  test("greedy earliest-completion chain with a window cutoff") {
    val got = run(Seq(
      // user 1 completes: view@0 click@10 buy@20
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "buy"),
      // user 2 stalls at click: the buy comes BEFORE the click
      (2L, 0L, "view"), (2L, 30L, "click"), (2L, 5L, "buy"),
      // user 3: click outside the 100-tick window → depth 1
      (3L, 0L, "view"), (3L, 500L, "click"),
      // user 4 never views: not in the funnel at all
      (4L, 0L, "click"), (4L, 1L, "buy")))
    assert(got.toSeq == Seq(
      (1, "view", 3L, 1.0), (2, "click", 2L, 0.6667),
      (3, "buy", 1L, 0.3333)))
  }

  test("ineligible candidates keep the partial-funnel row (left join)") {
    // user's only click is before their first view: must still count
    // at step 1, not vanish from the output
    val got = run(Seq((1L, 50L, "view"), (1L, 10L, "click")))
    assert(got.toSeq == Seq(
      (1, "view", 1L, 1.0), (2, "click", 0L, 0.0), (3, "buy", 0L, 0.0)))
  }

  test("step matched greedily at the EARLIEST eligible event") {
    // view@0; clicks at 10 and 20; buy at 15 — greedy takes click@10,
    // so buy@15 is eligible (a latest-click match would miss it)
    val got = run(Seq(
      (1L, 0L, "view"), (1L, 10L, "click"), (1L, 20L, "click"),
      (1L, 15L, "buy")))
    assert(got.map(_._3).toSeq == Seq(1L, 1L, 1L))
  }

  test("same-timestamp events satisfy the non-decreasing chain") {
    val got = run(Seq(
      (1L, 7L, "view"), (1L, 7L, "click"), (1L, 7L, "buy")))
    assert(got.map(_._3).toSeq == Seq(1L, 1L, 1L))
  }

  test("cohort retention over anchored periods") {
    // period length 10: user 1 first at t=3 (p0), active p0 and p2;
    // user 2 first at t=12 (p1), active p1 only
    val df = Seq((1L, 3L), (1L, 5L), (1L, 23L), (2L, 12L))
      .toDF("user_id", "ts")
    val got = Funnel.cohortRetention(df, col("ts"), anchor = 0L,
        periodLen = 10L)
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset"), r.getAs[Long]("n_users")))
    assert(got.toSeq == Seq((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }
}
