package graft.lake

import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Per-file Bloom filters for key-equality pruning (≡ Iceberg's
  * `write.metadata.metrics` bloom story / Delta's file-skipping on
  * high-cardinality point lookups).
  *
  * Why: min/max bounds prune RANGE-disjoint files, but a keyed
  * MERGE/DELETE against files whose key ranges all overlap (the normal
  * state of an unsorted ingest — every file spans ~the whole id domain)
  * rewrites everything. A small per-file Bloom over the key column
  * turns "ranges overlap" into "file provably lacks ALL source keys" —
  * at 100 TB the difference between a rewrite proportional to the
  * source keys' actual file footprint and one proportional to the
  * table.
  *
  * Mechanics: `write.bloom.columns` lists the columns;
  * [[build]] makes ONE distributed pass over each commit's fresh files
  * (per column: explode k=4 double-hashed bit positions, `collect_set`
  * per file — bounded by m bits), the driver packs the bitset and
  * stores it base64-coded INSIDE the existing per-file stats map under
  * a `__bloom__<col>` pseudo-column (rides the manifest chunks with
  * zero format changes; metadata views filter the prefix out).
  * Saturated filters (> 50% bits set — fpp ≥ ~6%) are dropped rather
  * than stored: they would prune nothing and bloat the manifest.
  * Filter size comes from the stored bytes, so `write.bloom.bits`
  * changes never corrupt old filters.
  *
  * Hash discipline: both sides use Spark's `xxhash64` — the write path
  * computes positions in the write job, the prune path collects the
  * RAW source-key hashes with a tiny distinct agg and the driver does
  * only `floorMod` arithmetic (≡ Spark's `pmod`). Null keys never
  * match (merge contract) and are excluded on both sides. */
object BloomStats {

  val Prefix = "__bloom__"
  val K = 4
  val DefaultBits = 65536 // 8 KB per column per file, pre-saturation
  /** Prune only when the DISTINCT source key count is at most this —
    * beyond it the driver-side membership loop (and the collect) stops
    * being metadata-cheap and bounds pruning stands alone. */
  val MaxSourceKeys = 10000

  def statKey(c: String): String = Prefix + c
  def isBloomKey(k: String): Boolean = k.startsWith(Prefix)

  /** The two 64-bit hash streams for column `c` (write and prune sides
    * MUST agree — this is the single definition both call). */
  private[lake] def hashCols(c: String) =
    (xxhash64(col(c)), xxhash64(lit("graft-bloom"), col(c)))

  private def positions(h1: Long, h2: Long, mBits: Int): Seq[Int] = {
    val a = java.lang.Math.floorMod(h1, mBits.toLong).toInt
    val b = java.lang.Math.floorMod(h2, mBits.toLong).toInt
    (0 until K).map(i => (a + i * b) % mBits)
  }

  /** One distributed pass over freshly written `absFiles`: per bloom
    * column, per file, the set of bit positions its values hit.
    * Returns file(abs) → statKey(col) → packed filter; saturated or
    * absent (all-null) columns are omitted. */
  def build(spark: SparkSession, absFiles: Seq[String], basePath: String,
      schema: StructType, cols: Seq[String], mBits: Int)
      : Map[String, Map[String, ColStat]] = {
    require(mBits >= 64 && mBits % 8 == 0,
      s"write.bloom.bits must be a multiple of 8 >= 64, got $mBits")
    val acc = scala.collection.mutable.Map
      .empty[String, Map[String, ColStat]]
    cols.foreach { c =>
      val (h1, h2) = hashCols(c)
      val a = pmod(h1, lit(mBits.toLong))
      val b = pmod(h2, lit(mBits.toLong))
      // (a + i*b) stays < 4m — safe under ANSI arithmetic
      val posArr = array((0 until K).map(i =>
        pmod(a + lit(i.toLong) * b, lit(mBits.toLong))): _*)
      spark.read.option("basePath", basePath).schema(schema)
        .parquet(absFiles: _*)
        .where(col(c).isNotNull)
        .select(input_file_name().as("__f"), explode(posArr).as("__p"))
        .groupBy("__f").agg(collect_set("__p").as("__ps"))
        .collect().foreach { r =>
          val f = r.getString(0)
          val ps = r.getSeq[Long](1)
          if (ps.size <= mBits / 2) { // saturated filters prune nothing
            val bits = new Array[Byte](mBits / 8)
            ps.foreach { p =>
              bits(p.toInt >> 3) =
                (bits(p.toInt >> 3) | (1 << (p.toInt & 7))).toByte
            }
            val b64 = Base64.getEncoder.encodeToString(bits)
            acc(f) = acc.getOrElse(f, Map.empty) +
              (statKey(c) -> ColStat(b64, ""))
          }
        }
    }
    acc.toMap
  }

  /** Distinct non-null source key hash tuples, or None when the source
    * exceeds [[MaxSourceKeys]] (caller then skips bloom pruning).
    * Row layout: (h1, h2) per key column, in `keys` order. */
  def sourceKeyHashes(src: DataFrame,
      keys: Seq[String]): Option[Array[Array[Long]]] = {
    val hashed = src.na.drop("any", keys)
      .select(keys.flatMap { k =>
        val (h1, h2) = hashCols(k)
        Seq(h1.as(s"__h1_$k"), h2.as(s"__h2_$k"))
      }: _*)
      .distinct().limit(MaxSourceKeys + 1).collect()
    if (hashed.length > MaxSourceKeys) None
    else Some(hashed.map(r =>
      Array.tabulate(2 * keys.size)(i => r.getLong(i))))
  }

  /** Can a row with source key hashes `row` exist in a file whose
    * bloom entries (for the tested columns, in order) are `filters`?
    * A column without a stored filter is unknown → true for it. */
  def mightContain(filters: Seq[Option[Array[Byte]]],
      row: Array[Long]): Boolean =
    filters.zipWithIndex.forall { case (fOpt, i) =>
      fOpt.forall { bits =>
        positions(row(2 * i), row(2 * i + 1), bits.length * 8)
          .forall(p => (bits(p >> 3) & (1 << (p & 7))) != 0)
      }
    }

  def decode(b64: String): Array[Byte] = Base64.getDecoder.decode(b64)
}
