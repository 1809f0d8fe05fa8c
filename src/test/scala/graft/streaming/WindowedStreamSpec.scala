package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WindowedStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("watermarked windowed counts emit exactly the closed windows") {
    val dir = "/root/testdata/sf0.001"
    val streamed = StreamingIngest.windowedCounts(spark, dir,
      windowDuration = "1 hour", watermarkDelay = "1 hour")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet

    // batch equivalent: tumbling windows with end <= max(event) - delay
    val ev = graft.sources.EventTime.withTsUs(
      spark.read.parquet(s"$dir/events.parquet"))
    val hourUs = 3600L * 1000000L
    val maxTs = ev.agg(max($"ts_us")).collect()(0).getLong(0)
    val closed = ev
      .withColumn("window_start_us", ($"ts_us" - pmod($"ts_us", lit(hourUs))))
      .withColumn("window_end_us", $"window_start_us" + hourUs)
      .where($"window_end_us" <= maxTs - hourUs)
      .groupBy("window_start_us", "window_end_us", "event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet

    assert(streamed.nonEmpty)
    assert(streamed == closed)
  }
}
