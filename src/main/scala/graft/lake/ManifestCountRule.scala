package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graftlake.GraftManifestFileIndex

/** Answers `SELECT COUNT(*) FROM lake_table` from the MANIFEST — zero
  * data I/O at any scale (≡ Iceberg's count pushdown via DSv2
  * aggregate pushdown; this engine's scans are DSv1, so the same win
  * lands as an optimizer rewrite). The API twin is
  * [[LakeTable.countRows]] (q_metadata_count); this rule gives the SQL
  * surface the same O(1) answer: on a 100 TB table, `COUNT(*)` over a
  * registered view goes from a full scan of every row group to a
  * driver-side sum the manifest already holds.
  *
  * Strictly conservative by PLAN SHAPE — the rewrite fires only when:
  *  - the aggregate is global (no grouping) and every output is a
  *    bare `count(*)` / `count(<non-null literal>)` (no DISTINCT, no
  *    FILTER clause, no other functions mixed in);
  *  - the child is the scan's Project chain over a [[LogicalRelation]]
  *    whose file index is a [[GraftManifestFileIndex]] carrying an
  *    exact row count from the manifest (every planned file reported
  *    its footer row count at commit), or a Union of such per-era
  *    sub-scans. Projects are always 1:1 so they never change the
  *    count; ANYTHING else — Filter, the MOR delete anti-joins,
  *    limits, samples — blocks the rewrite and the query runs normally.
  * MOR tables with outstanding deletes are safe by construction: their
  * read plan contains anti-joins, which block the pattern. */
object ManifestCountRule extends Rule[LogicalPlan] {

  /** Exact relation row count, looking through count-preserving
    * Projects and summing per-era Union legs; None = cannot prove. */
  private def relationCount(p: LogicalPlan): Option[Long] = p match {
    case Project(_, child) => relationCount(child)
    case u: Union =>
      val legs = u.children.map(relationCount)
      if (legs.forall(_.isDefined)) Some(legs.flatten.sum) else None
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation => h.location match {
        case g: GraftManifestFileIndex => g.knownRowCount
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def isCountStar(e: NamedExpression): Boolean = e match {
    case Alias(ae: AggregateExpression, _) =>
      !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
        case Count(Seq(l: Literal)) => l.value != null
        case _ => false
      })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty &&
          agg.aggregateExpressions.forall(isCountStar) =>
      relationCount(agg.child) match {
        case Some(n) =>
          LocalRelation(agg.output,
            Seq(InternalRow.fromSeq(agg.output.map(_ => n))),
            isStreaming = false, stream = None)
        case None => agg
      }
  }

  /** Idempotent per-session registration (same hook as
    * [[NormalizeZeroComparisonLiterals]]). */
  def ensure(spark: SparkSession): Unit = synchronized {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }
}
