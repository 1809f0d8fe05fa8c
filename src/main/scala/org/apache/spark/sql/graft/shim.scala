package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 made `Column` backend-agnostic (backed by `ColumnNode`, no
  * public `.expr` / `new Column(expr)` anymore); the supported conversion
  * for extension libraries lives in `org.apache.spark.sql.classic
  * .ExpressionUtils`, which is `private[sql]` — hence this shim lives in
  * the `org.apache.spark.sql` namespace, the conventional extension point
  * (same technique Delta/Iceberg-style extension jars use).
  */
object shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
