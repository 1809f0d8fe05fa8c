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

  /** STUB resize: deterministic byte decimation standing in for an image
    * resample (a real codec would decode → resample to w×h → re-encode;
    * same signature, same per-row shape). Keeps every `step`-th byte. */
  private[multimodal] def resizeStub(bytes: Array[Byte], targetW: Int,
      targetH: Int): Array[Byte] = {
    val targetLen = math.max(1, targetW * targetH / 64)
    if (bytes.length <= targetLen) bytes
    else {
      val step = bytes.length.toDouble / targetLen
      Array.tabulate(targetLen)(i => bytes((i * step).toInt))
    }
  }

  /** Batched media resize: binary → smaller binary, metadata updated to
    * the target dimensions. Partition-local, no shuffle. */
  def resize(df: DataFrame, targetW: Int, targetH: Int,
      batchSize: Int = DefaultBatchSize): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col("doc_id"), col("media"),
        col("media_meta.format").as("fmt"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { r =>
          val resized = resizeStub(r.getAs[Array[Byte]](1), targetW, targetH)
          Row(r.getLong(0), resized,
            Row(r.getString(2), targetW, targetH, resized.length.toLong))
        })
      }(encoder)
  }

  /** Batched frame sampling: one media blob → up to `maxFrames` frame
    * rows (video → frames shape; STUB chunks the bytes evenly — a real
    * impl would seek keyframes). Output explodes rows partition-locally;
    * downstream per-frame ops (feature extract, dedup) then fan out with
    * full parallelism. */
  def sampleFrames(df: DataFrame, maxFrames: Int = 4,
      batchSize: Int = DefaultBatchSize): DataFrame = {
    require(maxFrames >= 1)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame", BinaryType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val n = math.min(maxFrames, math.max(1, bytes.length))
          val size = math.max(1, bytes.length / n)
          (0 until n).iterator.map { i =>
            val from = i * size
            val until = if (i == n - 1) bytes.length
              else math.min(bytes.length, from + size)
            Row(r.getLong(0), i, java.util.Arrays.copyOfRange(
              bytes, from, until))
          }
        })
      }(encoder)
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
