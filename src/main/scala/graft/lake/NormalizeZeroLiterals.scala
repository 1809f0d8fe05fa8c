package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThanOrEqual, In, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Rewrites floating-point `= -0.0` equalities into the range pair
  * `>= 0.0 AND <= 0.0` — a value-identical form that closes an
  * UPSTREAM pushdown hole: measured on vanilla Spark 4.1.2,
  * `WHERE x = -0.0` against a parquet file whose pages hold only
  * `+0.0` returns ZERO rows with `spark.sql.parquet.filterPushdown`
  * on and the right rows with it off (the write-side ±0 stat widening
  * of PARQUET-1222 protects range checks and the `+0.0` literal
  * direction, but not the `-0.0` equality literal).
  *
  * Why a RANGE PAIR and not just swapping the literal for `+0.0`:
  * Catalyst's transform framework compares old and new nodes with
  * `==`, and `Literal(-0.0) == Literal(0.0)` is TRUE under primitive
  * numeric equality — a literal swap is silently discarded as
  * "unchanged". The range pair is structurally different, so it
  * survives, and is value-identical in every context: null in → null
  * out, NaN → false, and Spark comparison semantics already treat the
  * two zeros as equal.
  *
  * Registered once per session via
  * `spark.experimental.extraOptimizations` when the first [[LakeTable]]
  * is constructed; surfaced by the FileIndex property test
  * (LakePropertiesSpec "manifest-pruned scans never lose rows"). */
object NormalizeZeroComparisonLiterals extends Rule[LogicalPlan] {

  private def isNegZero(e: Expression): Boolean = e match {
    case Literal(d: java.lang.Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(d.doubleValue()) ==
        java.lang.Double.doubleToRawLongBits(-0.0)
    case Literal(f: java.lang.Float, FloatType) =>
      java.lang.Float.floatToRawIntBits(f.floatValue()) ==
        java.lang.Float.floatToRawIntBits(-0.0f)
    case _ => false
  }

  private def zeroRange(a: Expression, l: Literal): Expression = {
    val z = if (l.dataType == DoubleType) Literal(0.0) else Literal(0.0f)
    And(GreaterThanOrEqual(a, z), LessThanOrEqual(a, z))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case EqualTo(a, l: Literal)
          if isNegZero(l) && a.dataType == l.dataType =>
        zeroRange(a, l)
      case EqualTo(l: Literal, a)
          if isNegZero(l) && a.dataType == l.dataType =>
        zeroRange(a, l)
      case In(a, vs)
          if vs.exists(isNegZero) && vs.forall(_.isInstanceOf[Literal]) =>
        val rest = vs.filterNot(isNegZero)
        val z = zeroRange(a, vs.find(isNegZero).get.asInstanceOf[Literal])
        if (rest.isEmpty) z else Or(In(a, rest), z)
    }

  /** Idempotent per-session registration. */
  def ensure(spark: SparkSession): Unit = synchronized {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }
}
