package graft.lake

import java.nio.{ByteBuffer, ByteOrder}
import java.util.UUID
import java.util.zip.CRC32

import org.apache.hadoop.fs.{FileSystem, Path}

/** Delta Lake DELETION VECTOR codec — the on-disk encoding delta-spark
  * and delta-rs share, implemented from the public spec (delta-io
  * PROTOCOL.md "Deletion Vectors" + the RoaringFormatSpec):
  *
  *  - a DV's `data` is a serialized **RoaringBitmapArray** ("portable"
  *    flavor): little-endian `int32 magic = 1681511377`, `int64 n`,
  *    then `n` entries of `int32-LE key | standard 32-bit
  *    RoaringBitmap` in increasing key order (the bitmap at `key`
  *    holds the low-32 bits of every deleted row index whose high-32
  *    bits equal `key`; the writer emits the dense 0..n−1 index, the
  *    reader honors sparse keys). The standard bitmap serialization is the
  *    RoaringFormatSpec portable format: no-run cookie 12346 or run
  *    cookie 12347, descriptive header of (key, cardinality−1) pairs,
  *    optional offset header, then array (sorted uint16s) / bitmap
  *    (1024 uint64 words) / run (numRuns × start,len−1) containers.
  *    This writer always emits the no-run form; the reader accepts
  *    all three container kinds.
  *  - a DV **file** (`deletion_vector_<uuid>.bin`) starts with one
  *    format-version byte (1); each stored DV is
  *    `int32-BE dataSize | data | int32-BE CRC32(data)`, with the
  *    descriptor's `offset` pointing at the size word and
  *    `sizeInBytes` = dataSize.
  *  - the `add.deletionVector` descriptor's `pathOrInlineDv` carries
  *    (storageType `u`) an optional path prefix plus the 20-char
  *    **Z85** encoding of the file UUID, (`i`) the Z85 of the data
  *    itself, or (`p`) an absolute path.
  *
  * Everything here is pure byte plumbing on the driver — DV payloads
  * are per-file bitmaps (bytes ∝ deleted rows / 8), the same driver
  * planning class as graft's own DV artifacts (L44). */
object DeltaDv {

  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long) {
    /** The spec's file-action reconciliation key component —
      * delta-spark's `DeletionVectorDescriptor.uniqueId`:
      * `storageType + pathOrInlineDv` plus `@offset` when stored at an
      * offset. Add/remove actions pair up on (path, uniqueId); a file
      * action without a DV contributes the empty id. */
    def uniqueId: String =
      storageType + pathOrInlineDv + offset.map("@" + _).getOrElse("")
  }

  private val Magic = 1681511377
  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val NoOffsetThreshold = 4

  // ---- Z85 (ZeroMQ base-85; the alphabet the Delta spec pins) ----
  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Inv: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0,
      s"Z85 input must be 4-byte aligned, got ${bytes.length}")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div > 0) {
        sb.append(Z85(((v / div) % 85).toInt)); div /= 85
      }
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0,
      s"Z85 text must be 5-char aligned, got ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Inv(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d; j += 1
      }
      var k = 3
      val o = i / 5 * 4
      while (k >= 0) { out(o + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      i += 5
    }
    out
  }

  def encodeUuid(u: UUID): String = {
    val bb = ByteBuffer.allocate(16)
    bb.putLong(u.getMostSignificantBits)
    bb.putLong(u.getLeastSignificantBits)
    z85Encode(bb.array())
  }

  def decodeUuid(s: String): UUID = {
    val bb = ByteBuffer.wrap(z85Decode(s))
    new UUID(bb.getLong(), bb.getLong())
  }

  // ---- RoaringBitmapArray portable (de)serialization ----

  /** Serialize sorted, distinct, non-negative row indexes. */
  def serialize(positions: Array[Long]): Array[Byte] = {
    require(positions.isEmpty || positions.last < (1L << 62),
      "row index out of range")
    val nBitmaps =
      if (positions.isEmpty) 0L else (positions.last >>> 32) + 1
    // per high-32 bitmap: per high-16 container: low-16 values
    val bitmaps = Array.fill(nBitmaps.toInt)(
      scala.collection.mutable.LinkedHashMap
        .empty[Int, scala.collection.mutable.ArrayBuffer[Int]])
    positions.foreach { p =>
      require(p >= 0, s"negative row index $p")
      val hi32 = (p >>> 32).toInt
      val lo32 = (p & 0xffffffffL).toInt
      val key = lo32 >>> 16
      bitmaps(hi32).getOrElseUpdate(key,
        scala.collection.mutable.ArrayBuffer.empty) += (lo32 & 0xffff)
    }
    val serialized = bitmaps.map(serializeBitmap)
    // portable format: each 32-bit bitmap is PRECEDED by its u32 LE
    // key (delta-spark's RoaringBitmapArray writes the dense index;
    // the reader below honors sparse keys too)
    val total = 4 + 8 + serialized.length * 4 +
      serialized.map(_.length).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(nBitmaps)
    serialized.zipWithIndex.foreach { case (s, key) =>
      bb.putInt(key); bb.put(s)
    }
    bb.array()
  }

  private def serializeBitmap(
      containers: scala.collection.mutable.LinkedHashMap[Int,
        scala.collection.mutable.ArrayBuffer[Int]]): Array[Byte] = {
    val keys = containers.keys.toArray.sorted
    val n = keys.length
    val sizes = keys.map { k =>
      val card = containers(k).length
      if (card <= 4096) card * 2 else 8192
    }
    val headerLen = 4 + 4 + 4 * n + 4 * n // cookie+count+desc+offsets
    val bb = ByteBuffer.allocate(headerLen + sizes.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(CookieNoRun)
    bb.putInt(n)
    keys.foreach { k =>
      bb.putShort(k.toShort)
      bb.putShort((containers(k).length - 1).toShort)
    }
    var off = headerLen
    sizes.foreach { s => bb.putInt(off); off += s }
    keys.foreach { k =>
      val vals = containers(k).toArray.sorted
      if (vals.length <= 4096) vals.foreach(v => bb.putShort(v.toShort))
      else {
        val words = new Array[Long](1024)
        vals.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        words.foreach(bb.putLong)
      }
    }
    bb.array()
  }

  /** Deserialize to sorted row indexes; refuses malformed input
    * loudly (a hostile log must never silently mis-delete rows). */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.remaining() >= 12, "DV data truncated")
    val magic = bb.getInt()
    require(magic == Magic, s"bad RoaringBitmapArray magic $magic")
    val nBitmaps = bb.getLong()
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue,
      s"bad bitmap count $nBitmaps")
    val out = Array.newBuilder[Long]
    var b = 0
    var prevKey = -1L
    while (b < nBitmaps) {
      // u32 LE key precedes each bitmap (RoaringFormatSpec 64-bit
      // portable as pinned by Delta PROTOCOL.md / Iceberg v3); keys
      // must be increasing and may be sparse (empty bitmaps omitted)
      val key = bb.getInt().toLong & 0xffffffffL
      require(key > prevKey,
        s"bitmap keys out of order ($key after $prevKey)")
      require(key < (1L << 30), s"bitmap key $key out of range")
      prevKey = key
      val high = key << 32
      deserializeBitmap(bb, v => out += (high | (v & 0xffffffffL)))
      b += 1
    }
    out.result()
  }

  /** One standard 32-bit roaring bitmap, consumed IN PLACE from `bb`
    * (containers are sized from the descriptive header, so the read
    * advances exactly past this bitmap). */
  private def deserializeBitmap(bb: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = bb.getInt()
    val (n, runFlags) =
      if ((cookie & 0xffff) == CookieRun) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        bb.get(flags)
        (n, flags)
      } else {
        require(cookie == CookieNoRun, s"bad roaring cookie $cookie")
        (bb.getInt(), null)
      }
    require(n >= 0 && n <= 65536, s"bad container count $n")
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = bb.getShort() & 0xffff
      cards(i) = (bb.getShort() & 0xffff) + 1
      i += 1
    }
    val hasOffsets = runFlags == null || n >= NoOffsetThreshold
    if (hasOffsets) { var j = 0; while (j < n) { bb.getInt(); j += 1 } }
    def isRun(i: Int) =
      runFlags != null && ((runFlags(i / 8) >> (i % 8)) & 1) == 1
    i = 0
    while (i < n) {
      val base = keys(i) << 16
      if (isRun(i)) {
        val runs = bb.getShort() & 0xffff
        var r = 0
        while (r < runs) {
          val start = bb.getShort() & 0xffff
          val len = bb.getShort() & 0xffff
          // a run must stay inside its 16-bit container: past 0xffff
          // the value would carry into the container-key bits and
          // silently emit WRONG row indexes (the loud-failure contract
          // forbids that; the read()-side cardinality cross-check comes
          // from the same untrusted descriptor, so it cannot be relied
          // on to catch it)
          require(start + len <= 0xffff,
            s"malformed run container: start=$start len=$len overflows " +
              "the 16-bit value space")
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) { // bitmap container
        var w = 0
        while (w < 1024) {
          var word = bb.getLong()
          var bit = 0
          while (word != 0L) {
            val t = java.lang.Long.numberOfTrailingZeros(word)
            bit += t
            emit(base | ((w << 6) + bit))
            word = word >>> t >>> 1
            bit += 1
          }
          w += 1
        }
      } else { // array container
        var v = 0
        while (v < cards(i)) { emit(base | (bb.getShort() & 0xffff)); v += 1 }
      }
      i += 1
    }
  }

  // ---- DV file framing ----

  /** Frame one serialized bitmap as `int32-BE dataSize | data |
    * int32-BE CRC32(data)` — the layout BOTH formats share: Delta
    * stores this frame per DV inside its `.bin` files (after the
    * version byte), and Iceberg v3 stores the IDENTICAL frame as a
    * puffin `deletion-vector-v1` blob (the deliberate cross-format
    * compatibility of the two specs: the "magic + vector" the Iceberg
    * spec frames is byte-for-byte the RoaringBitmapArray serialization
    * Delta frames as `data`). */
  def frame(data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32
    crc.update(data)
    val bb = ByteBuffer.allocate(4 + data.length + 4) // BE by default
    bb.putInt(data.length)
    bb.put(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Inverse of [[frame]]: verify the length word and CRC, return the
    * serialized bitmap bytes. Refuses loudly on any mismatch. */
  def unframe(framed: Array[Byte]): Array[Byte] = {
    require(framed.length >= 8, s"DV frame truncated (${framed.length} B)")
    val bb = ByteBuffer.wrap(framed) // big-endian
    val len = bb.getInt()
    require(len >= 0 && len == framed.length - 8,
      s"DV frame length $len does not match the framed region " +
        s"(${framed.length} B)")
    val data = new Array[Byte](len)
    bb.get(data)
    val stored = bb.getInt()
    val crc = new CRC32
    crc.update(data)
    require(stored == crc.getValue.toInt, "DV frame checksum mismatch")
    data
  }

  /** Write one DV file holding `dvs` (serialized bitmap datas) and
    * return each DV's (offset, sizeInBytes). */
  def writeFile(fs: FileSystem, path: Path,
      dvs: Seq[Array[Byte]]): Seq[(Int, Int)] = {
    val out = fs.create(path, false)
    try {
      out.writeByte(1) // format version
      var off = 1
      dvs.map { data =>
        val crc = new CRC32
        crc.update(data)
        out.writeInt(data.length)
        out.write(data)
        out.writeInt(crc.getValue.toInt)
        val r = (off, data.length)
        off += 4 + data.length + 4
        r
      }
    } finally out.close()
  }

  /** Resolve a descriptor to its deleted row indexes (sorted). */
  def read(fs: FileSystem, tableDir: String, d: Descriptor): Array[Long] = {
    val data = d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv)
      case "u" | "p" =>
        val p = d.storageType match {
          case "p" => new Path(d.pathOrInlineDv)
          case _ =>
            require(d.pathOrInlineDv.length >= 20,
              s"uuid path too short: ${d.pathOrInlineDv}")
            val prefix = d.pathOrInlineDv.dropRight(20)
            val uuid = decodeUuid(d.pathOrInlineDv.takeRight(20))
            val name = s"deletion_vector_$uuid.bin"
            if (prefix.isEmpty) new Path(tableDir, name)
            else new Path(new Path(tableDir, prefix), name)
        }
        val off = d.offset.getOrElse(
          throw new IllegalArgumentException(
            s"deletionVector storageType ${d.storageType} requires an " +
              "offset"))
        val in = fs.open(p)
        try {
          in.seek(off)
          val size = in.readInt()
          require(size == d.sizeInBytes,
            s"DV size $size at offset $off != descriptor " +
              s"sizeInBytes ${d.sizeInBytes}")
          val data = new Array[Byte](size)
          in.readFully(data)
          val stored = in.readInt()
          val crc = new CRC32
          crc.update(data)
          require(stored == crc.getValue.toInt,
            s"DV checksum mismatch in $p at offset $off")
          data
        } finally in.close()
      case other =>
        throw new IllegalArgumentException(
          s"deletionVector storageType '$other' is not implemented " +
            "(supported: u, i, p) — refusing rather than mis-reading")
    }
    val positions = deserialize(data)
    require(positions.length == d.cardinality,
      s"DV cardinality ${positions.length} != descriptor " +
        s"${d.cardinality}")
    positions
  }
}
