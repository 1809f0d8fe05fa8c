package graft.lake

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Manifest-stats pruning for predicate-driven DELETE/UPDATE: decide,
  * from a file's recorded per-column [min, max] alone, whether the file
  * can possibly contain a row matching the predicate. Strictly
  * conservative — any expression shape we don't understand evaluates to
  * "maybe", so pruning can only skip files that provably hold no
  * matching row (the same contract Iceberg's `InclusiveMetricsEvaluator`
  * implements over its manifests).
  *
  * Handles the simple comparison family that covers real DELETE/UPDATE
  * predicates: `col <op> literal` (both argument orders) for
  * =, <=>, <, <=, >, >=, plus IN over literals, AND/OR composition.
  * Everything else — casts around the column, function calls over it,
  * NOT, IS NULL, subqueries — keeps the file. The predicate arrives
  * ANALYZED against the table schema (see LakeTable.pruneByPredicate),
  * so attributes are resolved and a literal-only side — even
  * `to_timestamp('…')` — is foldable to a typed constant.
  */
object PredicatePruning {

  private type Check = (DataType, ColStat, String) => Boolean

  /** Files from `liveFiles` that may contain a row matching `predicate`.
    * `stats` maps file → column → recorded bounds (absent = unknown). */
  def candidateFiles(predicate: Expression, schema: StructType,
      liveFiles: Seq[String],
      stats: Map[String, Map[String, ColStat]]): Seq[String] = {
    if (stats.isEmpty) return liveFiles
    val types = schema.fields.map(f => f.name -> f.dataType).toMap
    liveFiles.filter { f =>
      stats.get(f) match {
        case None => true // legacy manifest entry without stats
        case Some(fileStats) => canMatch(predicate, fileStats, types)
      }
    }
  }

  // bounds are attained values (parquet min/max are real rows; the ±0.0
  // widening only ever widens), so strict checks against them are safe
  private val eqCheck: Check = (dt, st, x) =>
    FileStats.cmp(dt, st.min, x) <= 0 && FileStats.cmp(dt, st.max, x) >= 0
  private val maxGt: Check = (dt, st, x) => FileStats.cmp(dt, st.max, x) > 0
  private val maxGe: Check = (dt, st, x) => FileStats.cmp(dt, st.max, x) >= 0
  private val minLt: Check = (dt, st, x) => FileStats.cmp(dt, st.min, x) < 0
  private val minLe: Check = (dt, st, x) => FileStats.cmp(dt, st.min, x) <= 0

  /** Can a row of a file with bounds `fileStats` satisfy `e`?
    * For each ordered comparison the flipped literal-first form mirrors
    * the operator: `lit > col` ⇔ `col < lit`. */
  private def canMatch(e: Expression, fileStats: Map[String, ColStat],
      types: Map[String, DataType]): Boolean = e match {
    case And(l, r) =>
      canMatch(l, fileStats, types) && canMatch(r, fileStats, types)
    case Or(l, r) =>
      canMatch(l, fileStats, types) || canMatch(r, fileStats, types)
    case EqualTo(a, b) => sided(a, b, fileStats, types)(eqCheck, eqCheck)
    case EqualNullSafe(a, b) =>
      sided(a, b, fileStats, types)(eqCheck, eqCheck)
    case GreaterThan(a, b) => sided(a, b, fileStats, types)(maxGt, minLt)
    case GreaterThanOrEqual(a, b) =>
      sided(a, b, fileStats, types)(maxGe, minLe)
    case LessThan(a, b) => sided(a, b, fileStats, types)(minLt, maxGt)
    case LessThanOrEqual(a, b) =>
      sided(a, b, fileStats, types)(minLe, maxGe)
    case In(a, vs) if vs.nonEmpty =>
      vs.exists(v => sided(a, v, fileStats, types)(eqCheck, eqCheck))
    case InSet(a, vs) if vs.nonEmpty && attrName(a).isDefined =>
      vs.exists(v => sided(a, Literal.create(v, a.dataType),
        fileStats, types)(eqCheck, eqCheck))
    case _ => true
  }

  /** `a <op> b` where one side is an attribute and the other a literal
    * (or a foldable literal-only subtree, e.g. `to_timestamp('…')` after
    * analysis): run `fwd` for attr-first, `flip` for literal-first; keep
    * the file for any other shape. */
  private def sided(a: Expression, b: Expression,
      fileStats: Map[String, ColStat], types: Map[String, DataType])(
      fwd: Check, flip: Check): Boolean =
    (attrName(a), asLiteral(b), asLiteral(a), attrName(b)) match {
      case (Some(name), Some(l), _, _) =>
        boundsCheck(name, l, fileStats, types, fwd)
      case (_, _, Some(l), Some(name)) =>
        boundsCheck(name, l, fileStats, types, flip)
      case _ => true
    }

  /** Fold a literal-only subtree down to a Literal; None when the
    * expression references columns or can't be evaluated. */
  private def asLiteral(e: Expression): Option[Literal] = e match {
    case l: Literal => Some(l)
    case _ if e.resolved && e.foldable =>
      scala.util.Try(Literal.create(e.eval(null), e.dataType)).toOption
    case _ => None
  }

  private def boundsCheck(name: String, l: Literal,
      fileStats: Map[String, ColStat], types: Map[String, DataType],
      check: Check): Boolean =
    types.get(name) match {
      case Some(dt) if FileStats.supportsPruning(dt) =>
        encodeLiteral(dt, l) match {
          case Some(encoded) =>
            fileStats.get(name) match {
              case Some(st) => check(dt, st, encoded)
              case None => true // no bounds recorded for this column
            }
          case None => true // literal not encodable in the stat domain
        }
      case _ => true
    }

  private def attrName(e: Expression): Option[String] = e match {
    case u: UnresolvedAttribute if u.nameParts.length == 1 =>
      Some(u.nameParts.head)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Encode a literal into the stat domain of column type `dt`
    * (FileStats' string encoding); None when the literal's type can't be
    * losslessly mapped — e.g. a string literal against an int column
    * (Spark would cast at analysis; we stay conservative). */
  private def encodeLiteral(dt: DataType, l: Literal): Option[String] = {
    if (l.value == null) return None // col = NULL matches no row, but a
    // non-prune here only costs a scan — stay out of three-valued logic
    (dt, l.dataType) match {
      case (StringType, StringType) => Some(l.value.toString)
      case (ByteType | ShortType | IntegerType | LongType,
          ByteType | ShortType | IntegerType | LongType) =>
        Some(l.value.toString) // integral internal values print as decimal
      case (BooleanType, BooleanType) =>
        Some(if (l.value.asInstanceOf[Boolean]) "1" else "0")
      case (DateType, DateType) =>
        Some(l.value.toString) // internal = days since epoch (Int)
      case (TimestampType, TimestampType) =>
        Some(l.value.toString) // internal = micros since epoch (Long)
      case (FloatType | DoubleType, _) =>
        val d = l.value match {
          case f: java.lang.Float => f.doubleValue()
          case d: java.lang.Double => d.doubleValue()
          case n: java.lang.Number => n.doubleValue()
          case _ => return None
        }
        if (d.isNaN) None // NaN ordering poisons range checks
        else Some(d.toString)
      case _ => None
    }
  }
}
