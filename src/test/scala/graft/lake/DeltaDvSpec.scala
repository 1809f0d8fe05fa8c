package graft.lake

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** The Delta deletion-vector codec in isolation: Z85 (pinned to the
  * ZeroMQ reference vector), RoaringBitmapArray round-trips across
  * container kinds, run-container DEserialization (foreign writers
  * runOptimize; this writer never emits runs), and file framing with
  * CRC verification. */
class DeltaDvSpec extends AnyFunSuite {

  test("Z85 reference vector (ZeroMQ spec): 864FD26FB559F75B → " +
      "HelloWorld; uuid round-trips at 20 chars") {
    val bytes = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeltaDv.z85Encode(bytes) == "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld").toSeq == bytes.toSeq)
    val u = java.util.UUID.fromString(
      "01234567-89ab-cdef-0123-456789abcdef")
    val enc = DeltaDv.encodeUuid(u)
    assert(enc.length == 20)
    assert(DeltaDv.decodeUuid(enc) == u)
  }

  test("roaring round-trip: array containers, a dense bitmap " +
      "container, multi-container keys, and a >2^32 row index") {
    val cases = Seq(
      Array.empty[Long],
      Array(0L),
      Array(0L, 1L, 63L, 64L, 65L, 4095L, 65536L, 65537L),
      // dense: > 4096 values in one 16-bit container → bitmap container
      (0L until 5000L).toArray,
      // straddle a high-32 boundary → two bitmaps in the array
      Array(7L, (1L << 32) + 3L, (1L << 32) + 70000L),
      // sparse spread over several 16-bit keys
      (0L until 20L).map(_ * 100003L).toArray)
    cases.foreach { pos =>
      val rt = DeltaDv.deserialize(DeltaDv.serialize(pos))
      assert(rt.toSeq == pos.toSeq, s"round-trip failed for ${pos.take(8).toSeq}…")
    }
  }

  test("run-container deserialization (foreign runOptimized bitmap)") {
    // hand-build: magic, 1 bitmap, run cookie with 1 container,
    // run flags 0x01, key 0 card 100, runs: [10, len 49], [200, len 49]
    val runsPayload = ByteBuffer.allocate(2 + 2 * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    runsPayload.putShort(2.toShort)
    runsPayload.putShort(10.toShort); runsPayload.putShort(49.toShort)
    runsPayload.putShort(200.toShort); runsPayload.putShort(49.toShort)
    val bm = ByteBuffer.allocate(4 + 1 + 4 + runsPayload.capacity())
      .order(ByteOrder.LITTLE_ENDIAN)
    bm.putInt(12347 | (0 << 16)) // run cookie, containerCount-1 = 0
    bm.put(0x01.toByte)          // container 0 is a run container
    bm.putShort(0.toShort)       // key
    bm.putShort(99.toShort)      // cardinality - 1
    // n < 4 → NO offset header in the run format
    bm.put(runsPayload.array())
    val data = ByteBuffer.allocate(16 + bm.capacity())
      .order(ByteOrder.LITTLE_ENDIAN)
    data.putInt(1681511377)
    data.putLong(1L)
    data.putInt(0) // u32 LE key of this bitmap
    data.put(bm.array())
    val got = DeltaDv.deserialize(data.array())
    val want = ((10L to 59L) ++ (200L to 249L)).toArray
    assert(got.toSeq == want.toSeq)
  }

  test("run container whose start+len overflows the 16-bit value " +
      "space refuses (would carry into the container-key bits)") {
    val runsPayload = ByteBuffer.allocate(2 + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    runsPayload.putShort(1.toShort)
    runsPayload.putShort(0xfffe.toShort) // start = 65534
    runsPayload.putShort(5.toShort)      // len 5 → 65534+5 > 0xffff
    val bm = ByteBuffer.allocate(4 + 1 + 4 + runsPayload.capacity())
      .order(ByteOrder.LITTLE_ENDIAN)
    bm.putInt(12347 | (0 << 16))
    bm.put(0x01.toByte)
    bm.putShort(0.toShort)
    bm.putShort(5.toShort)
    bm.put(runsPayload.array())
    val data = ByteBuffer.allocate(16 + bm.capacity())
      .order(ByteOrder.LITTLE_ENDIAN)
    data.putInt(1681511377)
    data.putLong(1L)
    data.putInt(0) // u32 LE key of this bitmap
    data.put(bm.array())
    val e = intercept[IllegalArgumentException] {
      DeltaDv.deserialize(data.array())
    }
    assert(e.getMessage.contains("overflows"))
  }

  test("byte-level fixture pinned to the RoaringFormatSpec 64-bit " +
      "portable layout delta-spark/delta-rs write: magic, u64 count, " +
      "u32 key per bitmap, standard 32-bit bitmaps") {
    // positions {1, 5} in bitmap key 0 and {3} in bitmap key 1
    val pos = Array(1L, 5L, (1L << 32) + 3L)
    val exp = ByteBuffer.allocate(4 + 8 + (4 + 20) + (4 + 18))
      .order(ByteOrder.LITTLE_ENDIAN)
    exp.putInt(1681511377) // RoaringBitmapArray portable magic
    exp.putLong(2L)        // number of serialized bitmaps
    exp.putInt(0)          // key of bitmap 0
    exp.putInt(12346)      //   no-run cookie
    exp.putInt(1)          //   container count
    exp.putShort(0.toShort); exp.putShort(1.toShort) // key, card-1
    exp.putInt(16)         //   offset of container 0 (within bitmap)
    exp.putShort(1.toShort); exp.putShort(5.toShort) // array values
    exp.putInt(1)          // key of bitmap 1
    exp.putInt(12346)
    exp.putInt(1)
    exp.putShort(0.toShort); exp.putShort(0.toShort)
    exp.putInt(16)
    exp.putShort(3.toShort)
    assert(DeltaDv.serialize(pos).toSeq == exp.array().toSeq,
      "serialized bytes must match the spec layout exactly")
    assert(DeltaDv.deserialize(exp.array()).toSeq == pos.toSeq)
  }

  test("sparse bitmap keys honored on deserialize; out-of-order keys " +
      "refuse") {
    // one serialized bitmap at key 2 holding {7} → row (2<<32)|7
    def oneBitmap(key: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 + 4 + 18)
        .order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(1681511377); bb.putLong(1L)
      bb.putInt(key)
      bb.putInt(12346); bb.putInt(1)
      bb.putShort(0.toShort); bb.putShort(0.toShort)
      bb.putInt(16)
      bb.putShort(7.toShort)
      bb.array()
    }
    assert(DeltaDv.deserialize(oneBitmap(2)).toSeq ==
      Seq((2L << 32) | 7L))
    // two bitmaps with keys 1 then 0 refuse
    val two = ByteBuffer.allocate(4 + 8 + 2 * (4 + 18))
      .order(ByteOrder.LITTLE_ENDIAN)
    two.putInt(1681511377); two.putLong(2L)
    Seq(1, 0).foreach { k =>
      two.putInt(k)
      two.putInt(12346); two.putInt(1)
      two.putShort(0.toShort); two.putShort(0.toShort)
      two.putInt(16)
      two.putShort(7.toShort)
    }
    val e = intercept[IllegalArgumentException] {
      DeltaDv.deserialize(two.array())
    }
    assert(e.getMessage.contains("out of order"))
  }

  test("descriptor uniqueId follows delta-spark's reconciliation key " +
      "shape: storageType + pathOrInlineDv [+ @offset]") {
    assert(DeltaDv.Descriptor("u", "abc", Some(7), 10, 2L).uniqueId ==
      "uabc@7")
    assert(DeltaDv.Descriptor("i", "zzz", None, 10, 2L).uniqueId ==
      "izzz")
  }

  test("malformed input refuses loudly: bad magic, bad cookie") {
    val e1 = intercept[IllegalArgumentException] {
      DeltaDv.deserialize(Array.fill(16)(0x7f.toByte))
    }
    assert(e1.getMessage.contains("magic"))
    val bb = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(1681511377); bb.putLong(1L)
    bb.putInt(0)   // key
    bb.putInt(999) // bad cookie
    val e2 = intercept[IllegalArgumentException] {
      DeltaDv.deserialize(bb.array())
    }
    assert(e2.getMessage.contains("cookie"))
  }

  test("file framing: version byte, BE size, CRC32 — read verifies " +
      "size, checksum, and cardinality; corruption refuses") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val dir = graft.TestSpark.tmpDir("dv-frame")
    val p = new org.apache.hadoop.fs.Path(dir, "deletion_vector_" +
      "01234567-89ab-cdef-0123-456789abcdef.bin")
    val fs = p.getFileSystem(conf)
    val a = DeltaDv.serialize(Array(1L, 5L, 9L))
    val b = DeltaDv.serialize((0L until 5000L).toArray)
    val offs = DeltaDv.writeFile(fs, p, Seq(a, b))
    assert(offs.head._1 == 1, "first DV sits right after the version byte")
    val u = java.util.UUID.fromString(
      "01234567-89ab-cdef-0123-456789abcdef")
    val d1 = DeltaDv.Descriptor("u", DeltaDv.encodeUuid(u),
      Some(offs.head._1), offs.head._2, 3L)
    val d2 = DeltaDv.Descriptor("u", DeltaDv.encodeUuid(u),
      Some(offs(1)._1), offs(1)._2, 5000L)
    assert(DeltaDv.read(fs, dir, d1).toSeq == Seq(1L, 5L, 9L))
    assert(DeltaDv.read(fs, dir, d2).length == 5000)
    // wrong cardinality refuses
    val e = intercept[IllegalArgumentException] {
      DeltaDv.read(fs, dir, d1.copy(cardinality = 4L))
    }
    assert(e.getMessage.contains("cardinality"))
    // inline variant round-trips when 4-aligned, refuses otherwise
    if (a.length % 4 == 0) {
      val di = DeltaDv.Descriptor("i", DeltaDv.z85Encode(a), None,
        a.length, 3L)
      assert(DeltaDv.read(fs, dir, di).toSeq == Seq(1L, 5L, 9L))
    }
    // unknown storage type refuses
    val eu = intercept[IllegalArgumentException] {
      DeltaDv.read(fs, dir, d1.copy(storageType = "x"))
    }
    assert(eu.getMessage.contains("not implemented"))
  }
}
