package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Partition-spec transforms (≡ Iceberg's hidden partitioning): a table
  * is partitioned by a TRANSFORM of a source column, the transform value
  * appears only in the directory layout, and readers/writers never see
  * or supply it — `bucket(8, key)` keeps a 100 TB keyed table
  * merge-prunable without a sort order, `day(ts)`/`month(ts)`/`year(ts)`
  * give time-partition pruning without materializing a date column, and
  * `truncate(w, col)` coarsens high-cardinality dimensions.
  *
  * Spec strings (stored verbatim in the snapshot's `partition_columns`,
  * so pre-transform manifests parse unchanged as identity):
  *
  *   - `col`                — identity (hive behavior, value in the dir)
  *   - `bucket(N, col)`     — `pmod(hash(col), N)` (Spark's murmur3
  *                            bucket id); any prunable type
  *   - `bucket_iceberg(N, col)` — the ICEBERG-spec bucket id
  *                            ([[IcebergBucketHash]], murmur3_x86_32
  *                            seed 0 over spec byte forms) — opt-in for
  *                            tables meant for Iceberg handoff: exports
  *                            as `bucket[N]` with reader-correct prune
  *                            semantics, but claims NO Spark BucketSpec
  *                            (the two hash domains differ)
  *   - `day(col)` / `month(col)` / `year(col)`
  *                          — days/months/years since epoch (date/ts)
  *   - `truncate(W, col)`   — floor-to-width for integrals, prefix for
  *                            strings
  *
  * Scale shape: the derived value is computed map-side at write
  * (codegen'd `hash`/`datediff` — no shuffle beyond the hive write's
  * own), recorded per-file from the directory name as an exact
  * point-stat, and pruned against driver-side: set-membership for bucket
  * (≤ N values per source key set), range intersection for the monotone
  * time/truncate transforms. Bucket files additionally carry Spark's
  * `_NNNNN` bucket-id name suffix, so scans of a single-bucket-field
  * table run as genuine BUCKETED scans (HashPartitioning(source, N)) —
  * co-located joins and aggregations on the source column skip the
  * table-side shuffle entirely.
  */
object PartitionSpec {

  sealed trait Transform
  case object Identity extends Transform
  final case class Bucket(n: Int) extends Transform
  final case class BucketIceberg(n: Int) extends Transform
  case object Day extends Transform
  case object Hour extends Transform
  case object Month extends Transform
  case object Year extends Transform
  final case class Truncate(w: Long) extends Transform

  /** One field of a partition spec. `dirName` is the hive directory /
    * derived-column name; for identity it is the source column itself
    * (legacy layout, value not stored in the data file). Transformed
    * sources ARE stored in the data file — only the derived value moves
    * into the directory. */
  final case class Field(source: String, transform: Transform,
      spec: String) {

    def isIdentity: Boolean = transform == Identity

    val dirName: String = transform match {
      case Identity => source
      case Bucket(n) => s"${source}_bucket_$n"
      case BucketIceberg(n) => s"${source}_ibucket_$n"
      case Day => s"${source}_day"
      case Hour => s"${source}_hour"
      case Month => s"${source}_month"
      case Year => s"${source}_year"
      case Truncate(w) => s"${source}_trunc_$w"
    }

    /** Derived-value expression over the source column. Numeric-domain
      * transforms emit LongType so the dir value round-trips as a plain
      * decimal; truncate-on-string emits the prefix string. */
    def expr(sourceType: DataType): Column = transform match {
      case Identity => col(source)
      // Spark's OWN bucket-id function (murmur3 seed 42 — identical to
      // HashPartitioning.partitionIdExpression, what Spark's bucketed
      // writes/reads use). Keeping the bucket domain Spark-native lets
      // the scan claim a real BucketSpec, so joins/aggs on the source
      // column are storage-partitioned: zero shuffle on the table side.
      case Bucket(n) => pmod(hash(col(source)), lit(n)).cast(LongType)
      // Iceberg-spec bucket id, already in [0, n) — codegen Expression,
      // map-side like `hash`
      case BucketIceberg(n) =>
        org.apache.spark.sql.graft.shim.column(IcebergBucketId(
          org.apache.spark.sql.graft.shim.expression(col(source)), n))
          .cast(LongType)
      case Day =>
        datediff(col(source).cast(DateType), to_date(lit("1970-01-01")))
          .cast(LongType)
      // hours since epoch. An INSTANT column uses its micros directly
      // (zone-independent, the Iceberg rule); an NTZ column is
      // zoneless both ways — wall-clock days×24 + wall-clock hour —
      // mirroring the Day transform's zone-consistency design
      case Hour => sourceType match {
        case TimestampNTZType =>
          (datediff(col(source).cast(DateType),
            to_date(lit("1970-01-01"))).cast(LongType) * lit(24L) +
            hour(col(source)).cast(LongType)).cast(LongType)
        case _ =>
          floor(unix_micros(col(source)) / lit(3600000000L))
            .cast(LongType)
      }
      case Month =>
        ((year(col(source).cast(DateType)) - lit(1970)) * lit(12) +
          month(col(source).cast(DateType)) - lit(1)).cast(LongType)
      case Year => (year(col(source).cast(DateType)) - lit(1970))
        .cast(LongType)
      case Truncate(w) => sourceType match {
        case StringType => substring(col(source), 1, w.toInt)
        case _ =>
          (col(source).cast(LongType) -
            pmod(col(source).cast(LongType), lit(w))).cast(LongType)
      }
    }

    /** Condition on the SOURCE column selecting exactly the rows whose
      * derived value equals `v` — the dynamic-partition-overwrite
      * inverse. Time transforms invert to source RANGES built from the
      * same session-timezone casts as the forward expression, so the
      * round trip is exact in any session zone AND the range shape
      * lets the stats prover drop whole files as metadata. None for
      * non-invertible transforms: bucket is a hash; truncate-on-string
      * is a prefix the range prover cannot express. A null derived
      * value selects the null-source rows. */
    def inverseCond(sourceType: DataType, v: Any): Option[Column] = {
      if (v == null) return Some(col(source).isNull)
      def dayRange(first: java.time.LocalDate,
          next: java.time.LocalDate): Option[Column] = sourceType match {
        case DateType =>
          if (java.time.temporal.ChronoUnit.DAYS.between(first, next) == 1)
            Some(col(source) === lit(java.sql.Date.valueOf(first)))
          else Some(col(source) >= lit(java.sql.Date.valueOf(first)) &&
            col(source) < lit(java.sql.Date.valueOf(next)))
        case TimestampType =>
          // date → timestamp casts at SESSION midnight, mirroring the
          // forward ts → date cast — boundaries agree in any zone
          Some(col(source) >=
              lit(java.sql.Date.valueOf(first)).cast(TimestampType) &&
            col(source) <
              lit(java.sql.Date.valueOf(next)).cast(TimestampType))
        case TimestampNTZType =>
          // NTZ is zoneless wall-clock both ways: literal midnights
          Some(col(source) >= lit(java.time.LocalDateTime.of(
              first, java.time.LocalTime.MIDNIGHT)) &&
            col(source) < lit(java.time.LocalDateTime.of(
              next, java.time.LocalTime.MIDNIGHT)))
        case _ => None
      }
      transform match {
        case Identity => Some(col(source) === lit(v))
        case Day =>
          val d = java.time.LocalDate.ofEpochDay(
            v.asInstanceOf[Number].longValue())
          dayRange(d, d.plusDays(1))
        case Hour =>
          val h = v.asInstanceOf[Number].longValue()
          sourceType match {
            case TimestampType => Some(
              col(source) >= lit(java.time.Instant
                .ofEpochSecond(h * 3600L)) &&
              col(source) < lit(java.time.Instant
                .ofEpochSecond((h + 1) * 3600L)))
            case TimestampNTZType => Some(
              col(source) >= lit(java.time.LocalDateTime
                .ofEpochSecond(h * 3600L, 0,
                  java.time.ZoneOffset.UTC)) &&
              col(source) < lit(java.time.LocalDateTime
                .ofEpochSecond((h + 1) * 3600L, 0,
                  java.time.ZoneOffset.UTC)))
            case _ => None
          }
        case Month =>
          val m = v.asInstanceOf[Number].longValue()
          val first = java.time.LocalDate.of(
            (1970L + Math.floorDiv(m, 12L)).toInt,
            Math.floorMod(m, 12L).toInt + 1, 1)
          dayRange(first, first.plusMonths(1))
        case Year =>
          val first = java.time.LocalDate.of(
            (1970L + v.asInstanceOf[Number].longValue()).toInt, 1, 1)
          dayRange(first, first.plusYears(1))
        case Truncate(w) if sourceType != StringType =>
          val lo = v.asInstanceOf[Number].longValue()
          val loLit = lit(lo).cast(sourceType)
          try {
            val hi = Math.addExact(lo, w)
            Some(col(source) >= loLit &&
              col(source) < lit(hi).cast(sourceType))
          } catch { case _: ArithmeticException =>
            Some(col(source) >= loLit) // band touches the type maximum
          }
        case _ => None
      }
    }

    /** Stat-domain type of the derived value (see [[FileStats]]). */
    def statType(sourceType: DataType): DataType = transform match {
      case Identity => sourceType
      case Truncate(_) if sourceType == StringType => StringType
      case _ => LongType
    }

    /** Is the derived value a MONOTONE function of the source? (Range
      * pruning is sound only then; bucket prunes by set-membership.) */
    def monotone: Boolean = transform match {
      case Bucket(_) | BucketIceberg(_) => false
      case _ => true
    }

    /** Is the derived value a bucket id (pruned by set-membership,
      * never by range)? Covers BOTH hash domains. */
    def isBucketLike: Boolean = transform match {
      case Bucket(_) | BucketIceberg(_) => true
      case _ => false
    }

    /** Source types the transform accepts. Bucket excludes FP sources
      * (as Iceberg does): ±0.0/NaN equality-vs-hash mismatches would
      * make bucket assignment ambiguous. */
    def validFor(dt: DataType): Boolean = transform match {
      case Identity => true
      case Bucket(_) => dt match {
        case FloatType | DoubleType => false
        case other => FileStats.supportsPruning(other)
      }
      case BucketIceberg(_) => IcebergBucketHash.supports(dt)
      case Day | Month | Year =>
        dt == DateType || dt == TimestampType || dt == TimestampNTZType
      case Hour => dt == TimestampType || dt == TimestampNTZType
      case Truncate(_) => dt match {
        case ByteType | ShortType | IntegerType | LongType | StringType =>
          true
        case _ => false
      }
    }
  }

  private val FnRe = """^\s*(\w+)\s*\(\s*([^)]*)\s*\)\s*$""".r

  /** Parse one spec string; a bare column name is identity. */
  def parse(spec: String): Field = spec match {
    case FnRe(fn, args) =>
      val parts = args.split(',').map(_.trim).filter(_.nonEmpty)
      (fn.toLowerCase, parts) match {
        case ("bucket", Array(n, src)) => Field(src, Bucket(n.toInt), spec)
        case ("bucket_iceberg", Array(n, src)) =>
          Field(src, BucketIceberg(n.toInt), spec)
        case ("truncate", Array(w, src)) =>
          Field(src, Truncate(w.toLong), spec)
        case ("day", Array(src)) => Field(src, Day, spec)
        case ("hour", Array(src)) => Field(src, Hour, spec)
        case ("month", Array(src)) => Field(src, Month, spec)
        case ("year", Array(src)) => Field(src, Year, spec)
        case _ => throw new IllegalArgumentException(
          s"unsupported partition transform: $spec")
      }
    case name => Field(name.trim, Identity, name.trim)
  }

  def parseAll(specs: Seq[String]): Seq[Field] = {
    val fields = specs.map(parse)
    val dup = fields.groupBy(_.dirName).collectFirst {
      case (n, fs) if fs.size > 1 => n
    }
    require(dup.isEmpty, s"duplicate partition field: ${dup.get}")
    fields
  }
}
