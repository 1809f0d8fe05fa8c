package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (batch form).
  *
  * Classic two-window formulation, one shuffle on the user key:
  * a session boundary is an event whose gap from the previous event of
  * the same user exceeds `gapSeconds`; the running sum of boundary flags
  * numbers the sessions; a final group-by aggregates per session.
  * The streaming twin (arbitrary stateful processing) lives in
  * [[graft.streaming.StreamingSessionize]].
  */
object Sessionize {

  /** `tsCol` must be in microseconds (long) — callers reading ns-precision
    * parquet pass the nanos column divided by 1000. Returns one row per
    * (user, session) with start/end/duration/count/value sum. */
  def byGap(events: DataFrame, userCol: String, tsMicros: Column,
      valueCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsMicros)
    val gapUs = gapSeconds * 1000000L
    val withSession = events
      .withColumn("__ts", tsMicros)
      .withColumn("__new_session",
        when(col("__ts") - lag(col("__ts"), 1).over(byUser) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_no",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withSession.groupBy(col(userCol), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__ts")).as("session_start_us"),
        max(col("__ts")).as("session_end_us"),
        round(sum(col(valueCol)), 2).as("total_value"))
      .withColumn("duration_s",
        ((col("session_end_us") - col("session_start_us")) / 1000000L)
          .cast("long"))
  }
}
