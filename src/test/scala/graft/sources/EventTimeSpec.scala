package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The events fixture has shipped with three different physical ts
  * encodings across generations (int64 nanos, TIMESTAMP µs UTC,
  * TIMESTAMP_NTZ µs). Every consumer normalizes through EventTime; this
  * spec pins that all three encodings yield the SAME canonical epoch-µs
  * values — the regression that silently broke every streaming query in
  * round 9 when the fixture flipped ns→µs. */
class EventTimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 2024-01-01T00:00:07.179575Z and a second-later sibling
  private val micros = Seq(1704067207179575L, 1704067208179575L)

  test("int64-nanos, timestamp, and timestamp_ntz all normalize to the same ts_us") {
    val dir = TestSpark.tmpDir("eventtime")

    // (a) int64 nanos (the pre-round-9 fixture shape, read via nanosAsLong)
    micros.map(us => Tuple1(us * 1000L)).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/ns")

    // (b) TIMESTAMP (µs, adjusted to UTC)
    micros.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros($"us").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/tsz")

    // (c) TIMESTAMP_NTZ (µs, wall clock — the round-9 fixture shape)
    micros.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")

    val got = Seq("ns", "tsz", "ntz").map { sub =>
      val df = spark.read.parquet(s"$dir/$sub")
      EventTime.withTsUs(df).select("ts_us")
        .collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(got.forall(_ == micros), s"mismatch: $got")
  }

  test("eventTimeExpr matches tsUsExpr on every encoding") {
    val dir = TestSpark.tmpDir("eventtime2")
    micros.map(us => Tuple1(us * 1000L)).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/ns")
    micros.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros($"us").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz")
    Seq("ns", "ntz").foreach { sub =>
      val df = spark.read.parquet(s"$dir/$sub")
      val dt = df.schema("ts").dataType
      val rows = df.select(
          unix_micros(EventTime.eventTimeExpr(dt)).as("a"),
          EventTime.tsUsExpr(dt).as("b"))
        .collect()
      assert(rows.forall(r => r.getLong(0) == r.getLong(1)), s"$sub drift")
    }
  }
}
