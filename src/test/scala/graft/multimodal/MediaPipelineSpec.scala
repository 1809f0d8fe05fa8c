package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MediaPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("attach + extract roundtrip: schema, determinism, byte counts") {
    val docs = Seq((1L, "hello world"), (2L, "some other document text"))
      .toDF("doc_id", "text")
    val media = MediaPipeline.attachFakeMedia(docs)
    assert(media.columns.toSeq == Seq("doc_id", "media", "media_meta"))
    assert(media.schema("media").dataType ==
      org.apache.spark.sql.types.BinaryType)

    val feats = MediaPipeline.extractFeatures(media, dim = 8)
    val rows = feats.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(11L, 24L)) // n_bytes = len
    val f1 = rows(0).getSeq[Float](1)
    assert(f1.length == 8)
    // determinism: re-extract gives identical features
    val again = MediaPipeline.extractFeatures(media, dim = 8)
      .orderBy("doc_id").collect()(0).getSeq[Float](1)
    assert(f1 == again)
  }

  test("resize shrinks media and rewrites metadata") {
    val docs = Seq((1L, "x" * 1000)).toDF("doc_id", "text")
    val resized = MediaPipeline.resize(
      MediaPipeline.attachFakeMedia(docs), targetW = 32, targetH = 32)
    val r = resized.collect().head
    val bytes = r.getAs[Array[Byte]]("media")
    assert(bytes.length == 32 * 32 / 64)
    val meta = r.getStruct(2)
    assert(meta.getInt(1) == 32 && meta.getInt(2) == 32)
    assert(meta.getLong(3) == bytes.length.toLong)
  }

  test("frame sampling chunks media into per-frame rows covering all bytes") {
    val docs = Seq((1L, "0123456789")).toDF("doc_id", "text")
    val frames = MediaPipeline.sampleFrames(
      MediaPipeline.attachFakeMedia(docs), maxFrames = 4)
      .orderBy("frame_no").collect()
    assert(frames.length == 4)
    val joined = frames.flatMap(_.getAs[Array[Byte]]("frame"))
    assert(new String(joined, "UTF-8") == "0123456789")
    // tiny blob: frames capped at byte count
    val tiny = MediaPipeline.sampleFrames(
      MediaPipeline.attachFakeMedia(Seq((2L, "ab")).toDF("doc_id", "text")),
      maxFrames = 4).count()
    assert(tiny == 2)
  }

  test("decode stub is pure byte arithmetic") {
    val a = MediaPipeline.decodeStub("abc".getBytes("UTF-8"), 4)
    val b = MediaPipeline.decodeStub("abc".getBytes("UTF-8"), 4)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 4)
    assert(MediaPipeline.decodeStub(Array.emptyByteArray, 4).toSeq ==
      Seq(0f, 0f, 0f, 0f))
  }

  test("real PNG round-trip: encode → decode → banded features, exact") {
    val docs = Seq((10L, "-"), (300L, "-")).toDF("doc_id", "text")
    val media = MediaPipeline.attachSyntheticPng(docs, width = 16, height = 8)
    val rows = media.orderBy("doc_id").collect()
    // the media column holds genuine PNG bytes (magic header)
    val png = rows(0).getAs[Array[Byte]]("media")
    assert(png.take(8).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte, 0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte))

    val feats = MediaPipeline.extractFeatures(media, dim = 8)
      .orderBy("doc_id").collect()
    // real decode fills width/height from the image itself
    assert(feats.map(r => (r.getInt(3), r.getInt(4))).toSeq ==
      Seq((16, 8), (16, 8)))
    // band b of doc d = ((d + b) mod 256) / 255 exactly — the decoded
    // samples must match the encoded closed form bit-for-bit
    def expected(id: Long): Seq[Float] =
      (0 until 8).map(b => (((id + b) % 256) / 255.0).toFloat)
    assert(feats(0).getSeq[Float](1) == expected(10L))
    assert(feats(1).getSeq[Float](1) == expected(300L)) // wraps past 255
  }

  test("real image resize: decoded dimensions and uniform-gray preservation") {
    val docs = Seq((42L, "-")).toDF("doc_id", "text")
    val media = MediaPipeline.attachSyntheticPng(docs, width = 16,
      height = 16)
    val resized = MediaPipeline.resize(media, targetW = 4, targetH = 4)
    val r = resized.collect().head
    val meta = r.getStruct(2)
    assert(meta.getString(0) == "image/png")
    assert(meta.getInt(1) == 4 && meta.getInt(2) == 4)
    // decode the resized PNG for real: it must BE a 4×4 image
    val img = MediaPipeline.decodeImage(r.getAs[Array[Byte]]("media")).get
    assert(img.getWidth == 4 && img.getHeight == 4)
    // a uniform-gray source resamples to the same uniform gray
    val uniform = MediaPipeline.attachSyntheticPng(
      Seq((0L, "-")).toDF("doc_id", "text"), width = 8, height = 1)
    val ru = MediaPipeline.resize(uniform, 2, 1).collect().head
    val iu = MediaPipeline.decodeImage(ru.getAs[Array[Byte]]("media")).get
    assert(iu.getRaster.getSample(0, 0, 0) == 0 &&
      iu.getRaster.getSample(1, 0, 0) == 0)
  }

  test("real WAV round-trip: encode → javax.sound decode → banded features") {
    val docs = Seq((10L, "-"), (300L, "-")).toDF("doc_id", "text")
    val media = MediaPipeline.attachSyntheticWav(docs, bands = 8, perBand = 16)
    val rows = media.orderBy("doc_id").collect()
    // the media column holds genuine RIFF/WAVE bytes
    val wav = rows(0).getAs[Array[Byte]]("media")
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(wav.length == 44 + 8 * 16) // canonical PCM header + data

    val feats = MediaPipeline.extractFeatures(media, dim = 8)
      .orderBy("doc_id").collect()
    // audio path: no image dimensions
    assert(feats.forall(r => r.isNullAt(3) && r.isNullAt(4)))
    // band b of doc d = ((d + b) mod 256) / 255 exactly — the decoded
    // frames must match the encoded closed form bit-for-bit
    def expected(id: Long): Seq[Float] =
      (0 until 8).map(b => (((id + b) % 256) / 255.0).toFloat)
    assert(feats(0).getSeq[Float](1) == expected(10L))
    assert(feats(1).getSeq[Float](1) == expected(300L)) // wraps past 255
  }

  test("decodeAudio handles 16-bit signed PCM with channel averaging") {
    // hand-built stereo 16-bit little-endian WAV: 2 frames,
    // L/R = (+16384, -16384) then (32767, 32767)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 2, 4, 8000f, false)
    val data = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(16384).putShort(-16384)
      .putShort(32767).putShort(32767).array()
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, 2),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val samples = MediaPipeline.decodeAudio(out.toByteArray).get
    assert(samples.length == 2)
    // frame 0: mean of (16384+32768)/65535 and (-16384+32768)/65535
    assert(math.abs(samples(0) - 32768.0 / 65535.0) < 1e-12)
    // frame 1: both full-scale positive = (32767+32768)/65535 = 1.0
    assert(math.abs(samples(1) - 1.0) < 1e-9)
    // non-audio, non-image bytes still say None
    assert(MediaPipeline.decodeAudio("not audio".getBytes).isEmpty)
  }

  test("MJPEG-AVI round-trip: assemble → RIFF walk → real JPEG frames") {
    val docs = Seq((7L, "x"), (300L, "y")).toDF("doc_id", "text")
    val media = MediaPipeline.attachSyntheticAvi(docs, width = 16,
      height = 8, nFrames = 6)
    val row = media.orderBy("doc_id").collect().head
    val bytes = row.getAs[Array[Byte]](1)
    // container is a real RIFF AVI
    assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(bytes, 8, 4, "US-ASCII") == "AVI ")
    // parser recovers every frame; each one is a standalone JPEG that
    // ImageIO decodes at the declared dimensions
    val frames = MediaPipeline.decodeAviFrames(bytes)
    assert(frames.exists(_.length == 6))
    frames.get.foreach { f =>
      val img = MediaPipeline.decodeImage(f)
      assert(img.isDefined)
      assert(img.get.getWidth == 16 && img.get.getHeight == 8)
    }
    // frame content tracks the closed-form pixel function (JPEG-lossy:
    // the first row of frame 0 for doc 7 is near (7 + 0 + 0) mod 256)
    val first = MediaPipeline.decodeImage(frames.get.head).get
    val v = first.getRaster.getSampleDouble(0, 0, 0)
    assert(math.abs(v - 7.0) < 16.0, s"frame pixel $v far from 7")

    // sampleFrames seeks REAL frames for AVI media: evenly spaced
    // original indices, each emitted frame decodable
    val sampled = MediaPipeline.sampleFrames(media, maxFrames = 3)
      .where($"doc_id" === 7L).orderBy("frame_no").collect()
    assert(sampled.length == 3)
    assert(sampled.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    sampled.foreach(r => assert(
      MediaPipeline.decodeImage(r.getAs[Array[Byte]](2)).isDefined))

    // extractFeatures pools per-frame band features with REAL video
    // dimensions; values near the closed-form mean, not the byte stub
    val feats = MediaPipeline.extractFeatures(media, dim = 8)
      .where($"doc_id" === 7L).collect().head
    assert(feats.getInt(3) == 16 && feats.getInt(4) == 8)
    val fs = feats.getSeq[Float](1)
    // band y of frame f ≈ (7 + f + y)/255; mean over f=0..5 adds 2.5
    (0 until 8).foreach { y =>
      val expected = (7.0 + 2.5 + y) / 255.0
      assert(math.abs(fs(y) - expected) < 0.05,
        s"band $y: ${fs(y)} vs $expected")
    }
  }

  test("sampleFrames on an AVI shorter than maxFrames emits every frame") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val media = MediaPipeline.attachSyntheticAvi(docs, nFrames = 2)
    val sampled = MediaPipeline.sampleFrames(media, maxFrames = 5).collect()
    assert(sampled.length == 2)
    assert(sampled.map(_.getInt(1)).toSet == Set(0, 1))
  }

  test("non-image bytes keep the stub fallback with null dimensions") {
    val docs = Seq((1L, "plainly not a png")).toDF("doc_id", "text")
    val feats = MediaPipeline.extractFeatures(
      MediaPipeline.attachFakeMedia(docs), dim = 4).collect().head
    assert(feats.isNullAt(3) && feats.isNullAt(4))
    assert(feats.getSeq[Float](1) == MediaPipeline.decodeStub(
      "plainly not a png".getBytes("UTF-8"), 4).toSeq)
  }
}
