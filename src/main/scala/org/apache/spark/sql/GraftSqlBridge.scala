package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark's `private[sql]` plan → DataFrame constructor.
  *
  * `Dataset.ofRows` is the only way to execute a [[LogicalPlan]]
  * assembled outside `spark.sql(text)` — needed by graft's SQL DML
  * front-end, which parses DML with Spark's own parser, routes the
  * command to the lake layer, and executes rewritten sub-plans (the
  * MERGE source subquery, time-travel-substituted SELECTs). Placing
  * one object inside `org.apache.spark.sql` to reach it is the
  * standard technique for Spark table-format extensions (Delta Lake
  * and Iceberg's Spark runtime ship the same kind of shim). */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Wrap a parsed catalyst expression in a Column WITHOUT a SQL-text
    * round-trip — subquery expressions (`IN (SELECT …)`, `EXISTS …`)
    * have no parseable `.sql` form (ListQuery prints as a function
    * call no catalog resolves), so the DML front-end hands the tree
    * straight to analysis. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
