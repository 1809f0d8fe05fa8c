package graft.lake

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
  * and shuffled-join fallback as graft's own L44 DV read path. */
private[lake] object DvFilter {

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
      val words =
        if (positions.isEmpty) Array.empty[Long]
        else {
          require(positions.last < (1L << 34),
            s"DV row index ${positions.last} for $key exceeds any " +
              "plausible parquet row count — refusing a hostile DV")
          val w = new Array[Long]((positions.last >>> 6).toInt + 1)
          positions.foreach(i => w((i >>> 6).toInt) |= (1L << (i & 63)))
          w
        }
      Row(key, words.toSeq)
    }
    val dvDf = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("__gdv_file", StringType, nullable = false),
        StructField("__gdv_words", ArrayType(LongType)))))
    val dvBytes = rows.map(r => 64L + r.getSeq[Long](1).length * 8L).sum
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
