package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batched feature extraction over
  * partitions.
  *
  * The decode step is a clearly-marked STUB (this container ships no
  * image/audio codecs): it derives deterministic pseudo-features from the
  * raw bytes. Everything around it — the schema contract
  * (`media binary, media_meta struct`), partition-parallel batched
  * execution (`mapPartitions` over fixed-size batches, the JVM shape of
  * `mapInPandas`), and the downstream feature consumers (ANN search over
  * the extracted vectors) — is real and tested. Swapping in a real codec
  * changes only the body of [[decodeStub]].
  */
object MediaPipeline {

  /** Batch size for the batched per-partition decode — sized so a batch
    * of decoded media (not just bytes) fits executor memory; the knob a
    * real image pipeline tunes first. */
  val DefaultBatchSize = 256

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Attach a fake media column derived from the text (deterministic
    * stand-in for reading real image/audio blobs alongside metadata). */
  def attachFakeMedia(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      col(textCol).cast(BinaryType).as("media"),
      struct(
        lit("fake/raw").as("format"),
        lit(64).as("width"),
        lit(64).as("height"),
        length(col(textCol)).cast(LongType).as("n_bytes")).as("media_meta"))

  /** STUB decode: deterministic `dim`-point pseudo-features from raw
    * bytes (per-bucket byte means, normalized). A real implementation
    * would decode the codec here and produce e.g. pooled pixel stats —
    * same signature, same batching. */
  private[multimodal] def decodeStub(bytes: Array[Byte],
      dim: Int): Array[Float] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      sums(i % dim) += b
      counts(i % dim) += 1
      i += 1
    }
    Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0f else (sums(j).toDouble / counts(j) / 255.0).toFloat)
  }

  /** Batched partition-parallel feature extraction: each partition is
    * consumed in `batchSize` groups (decode-friendly memory shape), one
    * feature vector per media row. No shuffle — runs where the data
    * lives. */
  def extractFeatures(df: DataFrame, dim: Int = 8,
      batchSize: Int = DefaultBatchSize): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("n_bytes", LongType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            Row(id, decodeStub(bytes, dim).toSeq, bytes.length.toLong)
          }
        }
      }(encoder)
  }
}
