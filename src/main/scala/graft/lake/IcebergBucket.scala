package graft.lake

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-spec bucket hashing (spec "Bucket Transform Details" +
  * Appendix B): murmur3_x86_32 with seed 0 over the value's
  * spec-defined byte form — integral types widen to a LITTLE-ENDIAN
  * 8-byte long (so `bucket(N, int_col)` and `bucket(N, long_col)`
  * agree), strings hash their UTF-8 bytes, decimals the minimal
  * two's-complement big-endian of the unscaled value, date the days
  * ordinal as a long, timestamps the micros as a long, binary its
  * bytes. Bucket id = `(hash & Int.MaxValue) % N`.
  *
  * Graft's native `bucket(N, col)` deliberately uses Spark's OWN
  * bucket-id function (murmur3 seed 42) so scans can claim a real
  * BucketSpec and joins are storage-partitioned; that makes it
  * non-exportable (an Iceberg reader would prune with the wrong hash).
  * `bucket_iceberg(N, col)` is the opt-in write transform for tables
  * MEANT for Iceberg handoff: the hash matches the Iceberg spec
  * bit-for-bit (IcebergBucketSpec pins the appendix's published test
  * values), so the exported `bucket[N]` spec prunes correctly on the
  * reader's side. The trade: no Spark BucketSpec claim — the two hash
  * domains must never be conflated.
  *
  * Reference behavior: the reference creates its Iceberg tables via
  * the AWS/Iceberg runtime whose bucket transform is exactly this
  * function (raw-bronze.py writes through that jar's SQL).
  */
object IcebergBucketHash {

  /** murmur3_x86_32, seed 0 — the public algorithm, implemented
    * directly so the byte-form contract is self-contained (Spark's
    * internal Murmur3 helpers differ in seed and block handling). */
  def hashBytes(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0
    val len = data.length
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tailBase = nblocks * 4
    var k1 = 0
    val rem = len & 3
    if (rem >= 3) k1 ^= (data(tailBase + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tailBase + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tailBase) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Integral / date / timestamp byte form: 8-byte little-endian. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xffL).toByte; i += 1 }
    hashBytes(b)
  }

  /** The source types with a spec-defined, here-tested byte form. */
  def supports(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType | BinaryType =>
      true
    case _: DecimalType => true
    case _ => false
  }

  /** Hash of one non-null INTERNAL value of `dt` (Catalyst
    * representation: UTF8String, days-int, micros-long, Decimal). */
  def hashValue(v: Any, dt: DataType): Int = dt match {
    case ByteType => hashLong(v.asInstanceOf[Byte].toLong)
    case ShortType => hashLong(v.asInstanceOf[Short].toLong)
    case IntegerType | DateType => hashLong(v.asInstanceOf[Int].toLong)
    case LongType | TimestampType | TimestampNTZType =>
      hashLong(v.asInstanceOf[Long])
    case StringType => v match {
      case u: UTF8String => hashBytes(u.getBytes)
      case s: String => hashBytes(s.getBytes("UTF-8"))
    }
    case BinaryType => hashBytes(v.asInstanceOf[Array[Byte]])
    case _: DecimalType => hashBytes(v match {
      case d: Decimal => d.toJavaBigDecimal.unscaledValue.toByteArray
      case d: java.math.BigDecimal => d.unscaledValue.toByteArray
      case d: BigDecimal => d.underlying.unscaledValue.toByteArray
    })
    case other => throw new IllegalArgumentException(
      s"no Iceberg bucket byte form for ${other.simpleString}")
  }

  /** Bucket id in [0, n). */
  def bucketValue(v: Any, dt: DataType, n: Int): Int =
    (hashValue(v, dt) & Integer.MAX_VALUE) % n
}

/** `bucket_iceberg(N, col)` as a codegen-friendly Catalyst expression:
  * the Iceberg-spec bucket id of the child value. Null-safe (null in →
  * null out; the partition layer routes nulls to the hive default
  * partition like every other transform). */
case class IcebergBucketId(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"bucket count must be positive, got $n")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "iceberg_bucket_id"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (IcebergBucketHash.supports(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"iceberg bucket over " +
        s"${child.dataType.simpleString} has no spec byte form")

  /** Row-hot entry point the generated code calls through a
    * reference object (same pattern as the other graft expressions). */
  def compute(v: Any): Int =
    IcebergBucketHash.bucketValue(v, child.dataType, n)

  override protected def nullSafeEval(input: Any): Any = compute(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ibucket", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(c: Expression)
      : IcebergBucketId = copy(child = c)
}
