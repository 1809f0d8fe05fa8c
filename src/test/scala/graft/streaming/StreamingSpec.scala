package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Sessionize

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("AvailableNow streaming aggregate equals the batch aggregate") {
    val streamed = StreamingIngest.availableNowAggregate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch)
  }

  test("stream-stream interval join = batch interval join") {
    val win = 900L
    val streamed = StreamingIngest.intervalJoin(spark, dir, win)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("cts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("pts"))
    val batch = c.join(p, Seq("user_id"))
      .where(col("pts") >= col("cts") &&
        col("pts") <= col("cts") + win * 1000000L)
      .select("user_id", "click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("streaming sessions = batch sessions minus each user's open tail") {
    val gap = 1800L
    val streamed = StreamingSessionize.run(spark, dir, gap)
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
    val batch = Sessionize.byGap(ev, "user_id", col("ts_us"), "value", gap)
    // drop each user's final (still-open) session
    val closed = batch
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("session_start_us").desc)))
      .where(col("rn") > 1)
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(streamed == closed)
  }
}
