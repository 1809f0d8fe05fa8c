package graft.lake

import scala.reflect.ClassTag

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared deletion-vector ROW FILTER for the foreign-format readers
  * ([[DeltaImport]] and [[IcebergImport]]'s v3 puffin path): given per
  * data file the deleted row ordinals, drop those rows from a scan by
  * a packed-word bitmap bit-test — one slim row PER FILE (bytes ∝
  * deleted rows / 8, never a per-deleted-row join key), joined on the
  * file key and tested map-side against the row ordinal. The same
  * shape, broadcast gate (`spark.graft.lake.dv-broadcast-max-bytes`),
  * and shuffled-join fallback as graft's own L44 DV read path.
  *
  * DECODE PLACEMENT: a foreign table can carry one DV per data file —
  * 10⁶ files would mean 10⁶ sequential driver fs round-trips and an
  * ungated driver heap of bitmaps. [[filterDeletedBy]] therefore
  * decodes on EXECUTORS (mapped over the descriptor list, one slim
  * packed-words row per file coming back) once the file count exceeds
  * `spark.graft.lake.dv-decode-driver-max-files` (default 1024);
  * below it the driver decode avoids the extra Spark job. */
private[graft] object DvFilter {

  private val dvSchema = StructType(Seq(
    StructField("__gdv_file", StringType, nullable = false),
    StructField("__gdv_words", ArrayType(LongType))))

  /** Pack sorted deleted ordinals into a bit-per-row word array. */
  private def packWords(key: String, positions: Array[Long]): Array[Long] =
    if (positions.isEmpty) Array.empty[Long]
    else {
      require(positions.last < (1L << 34),
        s"DV row index ${positions.last} for $key exceeds any " +
          "plausible parquet row count — refusing a hostile DV")
      val w = new Array[Long]((positions.last >>> 6).toInt + 1)
      positions.foreach(i => w((i >>> 6).toInt) |= (1L << (i & 63)))
      w
    }

  /** Drop the rows `dvs` marks deleted. `fileKey` must evaluate to the
    * same normalized form as the Seq's keys; `pos` is the row ordinal
    * within its file (`_metadata.row_index`). Files absent from `dvs`
    * pass through untouched (left join + null-words bypass). */
  def filterDeleted(spark: SparkSession, df: DataFrame,
      fileKey: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column,
      dvs: Seq[(String, Array[Long])]): DataFrame = {
    if (dvs.isEmpty) return df
    val rows = dvs.map { case (key, positions) =>
      Row(key, packWords(key, positions).toSeq)
    }
    val dvDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), dvSchema)
    val dvBytes = rows.map(r => 64L + r.getSeq[Long](1).length * 8L).sum
    joinFiltered(spark, df, fileKey, pos, dvDf, dvBytes)
  }

  /** Like [[filterDeleted]] but with the PER-FILE DECODE step under
    * this object's control: `decode` turns one opaque spec into
    * (fileKey, sorted deleted ordinals). Below the driver-decode
    * threshold it runs inline on the driver; above it the specs
    * distribute and decode inside executor tasks (`decode` and
    * anything it captures must be serializable — pass a
    * SerializableConfiguration, never a FileSystem), so neither the
    * fs round-trips nor the decoded bitmaps ever aggregate on the
    * driver. The distributed words frame persists (caller releases
    * via `spark.catalog.clearCache()` after its action, the house
    * cache-release contract) so the exact-byte broadcast-gate measure
    * does not decode twice. */
  def filterDeletedBy[T: ClassTag](spark: SparkSession, df: DataFrame,
      fileKey: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column,
      specs: Seq[T], decode: T => (String, Array[Long])): DataFrame = {
    if (specs.isEmpty) return df
    val maxDriver = spark.conf
      .getOption("spark.graft.lake.dv-decode-driver-max-files")
      .map(_.toInt).getOrElse(1024)
    if (specs.size <= maxDriver)
      return filterDeleted(spark, df, fileKey, pos, specs.map(decode))
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism,
      specs.size / 64))
    val rdd = spark.sparkContext.parallelize(specs, slices).map { t =>
      val (key, positions) = decode(t)
      Row(key, packWords(key, positions).toSeq)
    }
    val dvDf = spark.createDataFrame(rdd, dvSchema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val agg = dvDf.agg(sum(
      size(col("__gdv_words")).cast("long") * 8L + 64L)).head()
    val dvBytes = if (agg.isNullAt(0)) 0L else agg.getLong(0)
    joinFiltered(spark, df, fileKey, pos, dvDf, dvBytes)
  }

  private def joinFiltered(spark: SparkSession, df: DataFrame,
      fileKey: org.apache.spark.sql.Column,
      pos: org.apache.spark.sql.Column,
      dvDf: DataFrame, dvBytes: Long): DataFrame = {
    val dvMax = spark.conf
      .getOption("spark.graft.lake.dv-broadcast-max-bytes")
      .map(_.toLong).getOrElse(1L << 30)
    val hinted = if (dvBytes <= dvMax) broadcast(dvDf) else dvDf
    df.withColumn("__gdv_k", fileKey)
      .withColumn("__gdv_i", pos)
      .join(hinted, col("__gdv_k") === col("__gdv_file"), "left")
      .where(col("__gdv_words").isNull || coalesce(
        expr("(shiftright(get(__gdv_words, " +
          "CAST(__gdv_i / 64 AS INT)), " +
          "CAST(__gdv_i % 64 AS INT)) & 1) = 0"),
        lit(true)))
      .drop("__gdv_k", "__gdv_i", "__gdv_file", "__gdv_words")
  }
}
