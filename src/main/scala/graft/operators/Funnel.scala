package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: windowed funnels and cohort retention —
  * the two standard product-analytics queries over an event stream,
  * both expressed as declarative plans Catalyst can optimize.
  * Timestamps are a NUMERIC column (epoch micros — the same
  * schema-adaptive `ts_us` the sessionizer runs on), so the operators
  * are fixture- and timezone-agnostic.
  *
  * Scale: every stage shuffles on `user_id` only (the natural key);
  * the funnel's step chain is n-1 hash joins all pre-partitioned by
  * the same key — one exchange shape, reused. Cohort retention is two
  * grouped aggregates and one join, again all on user_id. Per-user
  * state is O(steps) / O(weeks), never corpus-wide. */
object Funnel {

  /** Windowed funnel over ordered `steps` (event_type values): a user
    * reaches step k if events of types steps(0..k-1) occur at
    * non-decreasing timestamps, greedily matching each step to its
    * EARLIEST eligible event, with the whole chain completing within
    * `maxSpan` (same unit as `tsCol`) of the step-1 event — the
    * deterministic "earliest completion" funnel every
    * product-analytics engine ships. Output one row per step:
    * (step, event_type, n_users, conv_rate) with conv_rate relative
    * to step 1, rounded HALF_UP to 4 decimals (DuckDB's rounding). */
  /** Per-user greedy earliest-completion chain: one row per user with
    * a step-1 event, columns `__t1 … __tN` (NULL from the first
    * unreached step on). The building block [[funnel]] summarizes and
    * conversion-timing analyses consume directly. */
  def userFunnel(events: DataFrame, steps: Seq[String], tsCol: Column,
      maxSpan: Long, userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val t1 = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(tsCol).as("__t1"))
    // each later step: earliest event of that type at/after the
    // previous step's match and inside the window from step 1.
    // Eligibility sits IN the join condition: a user whose candidate
    // events all fall outside the window keeps their partial-funnel
    // row (left join, null match)
    steps.tail.zipWithIndex.foldLeft(t1) {
      case (cur, (step, i)) =>
        val prev = s"__t${i + 1}"
        val cand = events.where(col(typeCol) === step)
          .select(col(userCol).as("__u"), tsCol.as("__ts"))
        cur.join(cand,
            col(userCol) === col("__u") && col("__ts") >= col(prev) &&
              col("__ts") <= col("__t1") + maxSpan, "left")
          .groupBy(cur.columns.map(col).toIndexedSeq: _*)
          .agg(min(col("__ts")).as(s"__t${i + 2}"))
    }
  }

  def funnel(events: DataFrame, steps: Seq[String], tsCol: Column,
      maxSpan: Long, userCol: String = "user_id",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._

    val chain = userFunnel(events, steps, tsCol, maxSpan, userCol,
      typeCol)
    val reached = chain.select(
      (lit(1L) +: steps.tail.indices.map(i =>
        when(col(s"__t${i + 2}").isNotNull, 1L).otherwise(0L))
      ).reduce(_ + _).as("__depth"))
    // the depth histogram is tiny (≤ steps.size rows) — cumulating it
    // is driver arithmetic, like the ANN centroid collects
    val perDepth = reached.groupBy(col("__depth"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = perDepth.values.sum
    val rows = steps.zipWithIndex.map { case (name, i) =>
      val n = perDepth.filter(_._1 >= i + 1).values.sum
      (i + 1, name, n,
        if (total == 0) 0.0
        else BigDecimal(n.toDouble / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    rows.toDF("step", "event_type", "n_users", "conv_rate")
  }

  /** Cohort retention over anchored fixed-length periods: cohort =
    * period index (periods of `periodLen`, same unit as `tsCol`,
    * counted from `anchor`) of a user's first event; a (cohort_week,
    * week_offset) cell counts users from that cohort active that many
    * periods later. Anchored periods avoid engine-specific
    * week-start rules. Output: (cohort_week, week_offset, n_users). */
  def cohortRetention(events: DataFrame, tsCol: Column, anchor: Long,
      periodLen: Long, userCol: String = "user_id"): DataFrame = {
    require(periodLen > 0, "periodLen must be positive")
    val wk = floor((tsCol - anchor) / periodLen).cast("long")
    val active = events.select(col(userCol), wk.as("__wk")).distinct()
    val cohorts = active.groupBy(col(userCol))
      .agg(min(col("__wk")).as("__cohort"))
    active.join(cohorts, Seq(userCol))
      .groupBy(col("__cohort").as("cohort_week"),
        (col("__wk") - col("__cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
