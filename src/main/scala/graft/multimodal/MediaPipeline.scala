package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batched feature extraction over
  * partitions.
  *
  * Image decode, resize, and feature extraction are REAL — JDK
  * `javax.imageio` handles PNG/JPEG/BMP/GIF with no external codecs.
  * Pixel access goes through the `Raster` (raw samples), NOT `getRGB`,
  * so grayscale images are read without color-management remapping and
  * the features are exact, reproducible functions of the stored
  * samples. Audio decode is REAL too — JDK `javax.sound.sampled`
  * parses WAV/AIFF/AU PCM, and [[audioFeatures]] computes banded mean
  * amplitudes from the decoded frames. Video decode is REAL for
  * MJPEG-in-AVI — a pure-JDK RIFF chunk walk ([[decodeAviFrames]])
  * yields the per-frame JPEG payloads, which ImageIO then decodes like
  * any other image — so [[sampleFrames]] seeks real frames and
  * [[extractFeatures]] computes real per-frame band features for that
  * container. Only bytes in none of those families (codecs the JDK
  * cannot touch: H.264/VP9/…, arbitrary blobs) fall back to a
  * clearly-marked deterministic byte-level STUB. The plumbing around
  * every path — the schema contract (`media binary, media_meta
  * struct`), partition-parallel batched execution (`mapPartitions`
  * over fixed-size batches, the JVM shape of `mapInPandas`), and the
  * downstream feature consumers (ANN search over the extracted
  * vectors) — is identical and tested.
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

  /** Synthetic-but-REAL image fixture: a `width`×`height` grayscale PNG
    * per document whose row `y` holds the constant sample
    * `(doc_id + y) mod 256` — a closed-form pixel function, so decoded
    * feature values are exactly predictable (and SQL-expressible by an
    * oracle) while still exercising the full encode → decode path. */
  def attachSyntheticPng(docs: DataFrame, width: Int = 16,
      height: Int = 8, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col(idCol).cast(LongType).as("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val img = new BufferedImage(width, height,
            BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < height) {
            val v = ((id + y) % 256 + 256) % 256
            var x = 0
            while (x < width) { raster.setSample(x, y, 0, v.toInt); x += 1 }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          val bytes = out.toByteArray
          Row(id, bytes,
            Row("image/png", width, height, bytes.length.toLong))
        }
      }(encoder)
  }

  /** Synthetic-but-REAL audio fixture: a mono 8-bit unsigned-PCM WAV
    * per document (8 kHz, `bands`×`perBand` samples) whose band `j`
    * holds the constant sample `(doc_id + j) mod 256` — a closed-form
    * amplitude function, so decoded feature values are exactly
    * predictable (and SQL-expressible by an oracle) while still
    * exercising the full WAV encode → `javax.sound.sampled` decode
    * path. */
  def attachSyntheticWav(docs: DataFrame, bands: Int = 8,
      perBand: Int = 16, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col(idCol).cast(LongType).as("doc_id"))
      .mapPartitions { rows =>
        val fmt = new AudioFormat(
          AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
        rows.map { r =>
          val id = r.getLong(0)
          val data = new Array[Byte](bands * perBand)
          var i = 0
          while (i < data.length) {
            data(i) = (((id + i / perBand) % 256 + 256) % 256).toByte
            i += 1
          }
          val out = new ByteArrayOutputStream()
          val ais = new AudioInputStream(
            new ByteArrayInputStream(data), fmt, data.length.toLong)
          AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
          val bytes = out.toByteArray
          Row(id, bytes, Row("audio/wav", null, null, bytes.length.toLong))
        }
      }(encoder)
  }

  // ------------------------------------------------ MJPEG-AVI (video)

  /** Assemble a minimal well-formed MJPEG-in-AVI container (RIFF
    * `AVI ` → `hdrl` (avih + strl/strh/strf) → `movi` with one `00dc`
    * chunk per JPEG frame). Pure JDK byte assembly — the inverse of
    * [[decodeAviFrames]] and the standard uncompressed-index-free AVI
    * every MJPEG camera writes. */
  private[multimodal] def buildMjpegAvi(frames: Seq[Array[Byte]],
      width: Int, height: Int, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      cc(id) ++ le32(body.length.toLong) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(kind) ++ body)
    val maxFrame = frames.map(_.length).max
    val avih = le32(1000000L / fps) ++ le32(maxFrame.toLong * fps) ++
      le32(0) ++ le32(0x10) /* AVIF_HASINDEX off, 0x10 = interleaved */ ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++
      le32(maxFrame.toLong) ++ le32(width.toLong) ++ le32(height.toLong) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val strh = cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps.toLong) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(maxFrame.toLong) ++
      le32(0xFFFFFFFFL) /* quality */ ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    val strf = le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
      le16(1) ++ le16(24) ++ cc("MJPG") ++
      le32(width.toLong * height * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++
        chunk("strf", strf)))
    val movi = list("movi",
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** REAL video decode for the one container pure JDK can handle:
    * MJPEG-in-AVI. Walks the RIFF chunk tree and returns the `00dc` /
    * `00db` stream payloads — each a standalone JPEG that ImageIO
    * decodes. None for bytes that are not a RIFF AVI (or hold no video
    * chunks) — those fall through to the byte-level stub, which after
    * this remains only for codecs the JDK genuinely cannot touch. */
  private[multimodal] def decodeAviFrames(bytes: Array[Byte])
      : Option[Seq[Array[Byte]]] =
    try {
      if (bytes.length < 12) return None
      def fourcc(off: Int) = new String(bytes, off, 4, "US-ASCII")
      def u32(off: Int): Long =
        (bytes(off) & 0xFFL) | ((bytes(off + 1) & 0xFFL) << 8) |
          ((bytes(off + 2) & 0xFFL) << 16) | ((bytes(off + 3) & 0xFFL) << 24)
      if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(off)
          val size = u32(off + 4).toInt
          val dataStart = off + 8
          if (size < 0 || dataStart + size > bytes.length) return
          if (id == "LIST" && size >= 4)
            walk(dataStart + 4, dataStart + size)
          else if ((id.endsWith("dc") || id.endsWith("db")) && size > 0)
            frames += java.util.Arrays.copyOfRange(bytes, dataStart,
              dataStart + size)
          off = dataStart + size + (size & 1)
        }
      }
      walk(12, math.min(bytes.length, 8 + u32(4).toInt))
      if (frames.isEmpty) None else Some(frames.toSeq)
    } catch { case _: Exception => None }

  /** Synthetic-but-REAL video fixture: an MJPEG-AVI per document whose
    * frame `f` is a grayscale JPEG with row `y` holding (approximately,
    * JPEG being lossy) the sample `(doc_id + f + y) mod 256` —
    * exercises the full container-assemble → RIFF-walk → per-frame
    * ImageIO path. */
  def attachSyntheticAvi(docs: DataFrame, width: Int = 16,
      height: Int = 8, nFrames: Int = 6,
      idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("media_meta", mediaMetaType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col(idCol).cast(LongType).as("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val frames = (0 until nFrames).map { f =>
            val img = new BufferedImage(width, height,
              BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < height) {
              val v = ((id + f + y) % 256 + 256) % 256
              var x = 0
              while (x < width) { raster.setSample(x, y, 0, v.toInt); x += 1 }
              y += 1
            }
            val out = new ByteArrayOutputStream()
            ImageIO.write(img, "jpg", out)
            out.toByteArray
          }
          val bytes = buildMjpegAvi(frames, width, height)
          Row(id, bytes,
            Row("video/x-msvideo", width, height, bytes.length.toLong))
        }
      }(encoder)
  }

  /** JDK `javax.sound.sampled` decode: Some(normalized samples) for
    * WAV/AIFF/AU PCM bytes — per-frame channel average mapped to
    * [0, 1] over the format's full-scale range — None for anything the
    * JDK cannot read (triggers the stub fallback). Handles 8-bit
    * signed/unsigned and 16-bit signed PCM in either endianness; other
    * encodings are converted to 16-bit signed PCM first. */
  private[multimodal] def decodeAudio(bytes: Array[Byte])
      : Option[Array[Double]] =
    try {
      val raw = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val enc = raw.getFormat.getEncoding
      val ais =
        if (enc == AudioFormat.Encoding.PCM_SIGNED ||
            enc == AudioFormat.Encoding.PCM_UNSIGNED) raw
        else {
          val f = raw.getFormat
          AudioSystem.getAudioInputStream(new AudioFormat(
            AudioFormat.Encoding.PCM_SIGNED, f.getSampleRate, 16,
            f.getChannels, 2 * f.getChannels, f.getSampleRate, false), raw)
        }
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      if (bits != 8 && bits != 16) return None
      val channels = fmt.getChannels
      val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
      val big = fmt.isBigEndian
      val data = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * channels
      val nFrames = data.length / frameBytes
      val out = new Array[Double](nFrames)
      var f = 0
      while (f < nFrames) {
        var sum = 0.0
        var c = 0
        while (c < channels) {
          val off = f * frameBytes + c * bytesPerSample
          val norm =
            if (bits == 8) {
              val b = data(off)
              if (unsigned) (b & 0xFF) / 255.0 else (b.toInt + 128) / 255.0
            } else {
              val (b0, b1) = (data(off) & 0xFF, data(off + 1) & 0xFF)
              val u = if (big) (b0 << 8) | b1 else (b1 << 8) | b0
              if (unsigned) u / 65535.0
              else ((u.toShort: Int) + 32768) / 65535.0
            }
          sum += norm
          c += 1
        }
        out(f) = sum / channels
        f += 1
      }
      Some(out)
    } catch { case _: Exception => None }

  /** REAL audio features: `dim` equal time bands; band value = mean
    * normalized amplitude over the band's frames (same band mapping as
    * [[imageFeatures]]). Bands past the clip length stay 0. */
  private[multimodal] def audioFeatures(samples: Array[Double],
      dim: Int): Array[Float] = {
    val n = samples.length
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < n) {
      val band = math.min(dim - 1, i * dim / n)
      sums(band) += samples(i)
      counts(band) += 1
      i += 1
    }
    Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0f else (sums(j) / counts(j)).toFloat)
  }

  /** JDK ImageIO decode: Some(image) for PNG/JPEG/BMP/GIF bytes, None
    * for anything the JDK cannot read (triggers the stub fallback). */
  private[multimodal] def decodeImage(bytes: Array[Byte])
      : Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** REAL image features: `dim` horizontal bands; band value = mean raw
    * sample over the band's pixels and bands, normalized to [0, 1].
    * Raster samples (not getRGB) keep grayscale exact; multi-band
    * images average their bands per pixel. Bands past the image height
    * (height < dim) stay 0. */
  private[multimodal] def imageFeatures(img: BufferedImage,
      dim: Int): Array[Float] = {
    val raster = img.getRaster
    val (w, h, nb) = (img.getWidth, img.getHeight, raster.getNumBands)
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    var y = 0
    while (y < h) {
      val band = math.min(dim - 1, y * dim / h)
      var x = 0
      while (x < w) {
        var b = 0
        var px = 0.0
        while (b < nb) { px += raster.getSampleDouble(x, y, b); b += 1 }
        sums(band) += px / nb
        counts(band) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0f else (sums(j) / counts(j) / 255.0).toFloat)
  }

  /** STUB decode for bytes that are none of image / audio / MJPEG-AVI:
    * deterministic `dim`-point pseudo-features from the raw bytes
    * (per-bucket byte means, normalized). After the AVI path, this
    * stand-in remains only for codecs the JDK genuinely cannot decode
    * (H.264/VP9/…, arbitrary blobs). */
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

  /** REAL image resize: decode → `Graphics2D` bilinear resample to
    * `targetW`×`targetH` → PNG re-encode. Preserves the gray color
    * model for grayscale inputs (no channel inflation). */
  private[multimodal] def resizeImage(img: BufferedImage, targetW: Int,
      targetH: Int): Array[Byte] = {
    val imgType =
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY)
        BufferedImage.TYPE_BYTE_GRAY
      else BufferedImage.TYPE_INT_RGB
    val scaled = new BufferedImage(targetW, targetH, imgType)
    val g = scaled.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, targetW, targetH, null)
    } finally g.dispose()
    val out = new ByteArrayOutputStream()
    ImageIO.write(scaled, "png", out)
    out.toByteArray
  }

  /** STUB resize for non-image bytes: deterministic byte decimation
    * standing in for a media resample. Keeps every `step`-th byte. */
  private[multimodal] def resizeStub(bytes: Array[Byte], targetW: Int,
      targetH: Int): Array[Byte] = {
    val targetLen = math.max(1, targetW * targetH / 64)
    if (bytes.length <= targetLen) bytes
    else {
      val step = bytes.length.toDouble / targetLen
      Array.tabulate(targetLen)(i => bytes((i * step).toInt))
    }
  }

  /** Batched media resize: image bytes resample for real (ImageIO →
    * PNG), non-image bytes decimate via the stub; metadata records the
    * target dimensions and the actual output format. Partition-local,
    * no shuffle. */
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
          val bytes = r.getAs[Array[Byte]](1)
          val (resized, fmt) = decodeImage(bytes) match {
            case Some(img) =>
              (resizeImage(img, targetW, targetH), "image/png")
            case None => (resizeStub(bytes, targetW, targetH),
              r.getString(2))
          }
          Row(r.getLong(0), resized,
            Row(fmt, targetW, targetH, resized.length.toLong))
        })
      }(encoder)
  }

  /** Batched frame sampling: one media blob → up to `maxFrames` frame
    * rows. MJPEG-AVI blobs sample REAL frames — evenly spaced indices
    * over the container's decoded `00dc` chunks, each emitted frame a
    * standalone JPEG (`frame_no` = the original frame index) — any
    * other bytes fall back to the even byte-chunk STUB (codecs the JDK
    * cannot read). Output explodes rows partition-locally; downstream
    * per-frame ops (feature extract, dedup) then fan out with full
    * parallelism. */
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
          decodeAviFrames(bytes) match {
            case Some(frames) =>
              val n = math.min(maxFrames, frames.length)
              (0 until n).iterator.map { i =>
                val idx = i * frames.length / n // even spacing
                Row(r.getLong(0), idx, frames(idx))
              }
            case None =>
              val n = math.min(maxFrames, math.max(1, bytes.length))
              val size = math.max(1, bytes.length / n)
              (0 until n).iterator.map { i =>
                val from = i * size
                val until = if (i == n - 1) bytes.length
                  else math.min(bytes.length, from + size)
                Row(r.getLong(0), i, java.util.Arrays.copyOfRange(
                  bytes, from, until))
              }
          }
        })
      }(encoder)
  }

  /** Batched partition-parallel feature extraction: each partition is
    * consumed in `batchSize` groups (decode-friendly memory shape), one
    * feature vector per media row. Image bytes decode for real (width/
    * height filled from the decoded image); other bytes take the stub
    * (width/height null). No shuffle — runs where the data lives. */
  def extractFeatures(df: DataFrame, dim: Int = 8,
      batchSize: Int = DefaultBatchSize): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(FloatType, containsNull = false)),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            decodeImage(bytes) match {
              case Some(img) =>
                Row(id, imageFeatures(img, dim).toSeq, bytes.length.toLong,
                  img.getWidth, img.getHeight)
              case None => decodeAudio(bytes) match {
                case Some(samples) =>
                  Row(id, audioFeatures(samples, dim).toSeq,
                    bytes.length.toLong, null, null)
                case None => decodeAviFrames(bytes)
                    .map(_.flatMap(decodeImage)).filter(_.nonEmpty) match {
                  case Some(imgs) =>
                    // video: mean of per-frame band features (the
                    // standard frame-pooled video embedding shape)
                    val fs = imgs.map(imageFeatures(_, dim))
                    val mean = Array.tabulate(dim)(j =>
                      (fs.map(_(j).toDouble).sum / fs.size).toFloat)
                    Row(id, mean.toSeq, bytes.length.toLong,
                      imgs.head.getWidth, imgs.head.getHeight)
                  case None =>
                    Row(id, decodeStub(bytes, dim).toSeq,
                      bytes.length.toLong, null, null)
                }
              }
            }
          }
        }
      }(encoder)
  }
}
