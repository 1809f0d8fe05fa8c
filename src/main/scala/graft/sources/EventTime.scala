package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive normalization of the events table's `ts` column.
  *
  * Different parquet writers encode event time differently — the fixture
  * has shipped as INT64 nanos-since-epoch (read as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`), as TIMESTAMP(MICROS,
  * adjustedToUTC=true) (Spark TimestampType), and as TIMESTAMP(MICROS,
  * adjustedToUTC=false) (Spark TimestampNTZType). A real lake faces the
  * same heterogeneity across producers, so every consumer goes through
  * this one normalizer instead of assuming a physical encoding.
  *
  * Canonical forms (matching the DuckDB oracle, which normalizes all
  * three to its µs TIMESTAMP and exposes `epoch_us(ts)`):
  *   - `ts_us`      LongType epoch microseconds (ns truncates, ≡ DuckDB)
  *   - `event_time` TimestampType (µs precision, UTC session timezone)
  *
  * NTZ wall-clock is interpreted in the session timezone; callers pin
  * `spark.sql.session.timeZone=UTC` (Verify/Bench/TestSpark do) so the
  * numbers agree with DuckDB's naive-UTC reading.
  */
object EventTime {

  /** Epoch-µs column for a `ts` field of any supported storage. */
  def tsUsExpr(dt: DataType): Column = dt match {
    case LongType        => expr("ts div 1000") // int64 nanos → truncate
    case TimestampType   => unix_micros(col("ts"))
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported storage type $other")
  }

  /** TimestampType event-time column for the same field. */
  def eventTimeExpr(dt: DataType): Column = dt match {
    case LongType        => timestamp_micros(expr("ts div 1000"))
    case TimestampType   => col("ts")
    case TimestampNTZType => col("ts").cast(TimestampType)
    case other => throw new IllegalArgumentException(
      s"events.ts: unsupported storage type $other")
  }

  /** Append a canonical `ts_us` column derived from `df`'s own schema. */
  def withTsUs(df: DataFrame): DataFrame =
    df.withColumn("ts_us", tsUsExpr(df.schema("ts").dataType))
}
