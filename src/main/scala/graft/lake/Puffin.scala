package graft.lake

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}

/** PUFFIN codec — Iceberg's stats-and-blobs container format
  * (https://iceberg.apache.org/puffin-spec/), implemented from the
  * public spec for the v3 deletion-vector handoff:
  *
  *   - file = `Magic | Blob₁ … Blobₙ | Footer`; magic is the 4 bytes
  *     `PFA1`;
  *   - footer = `Magic | FooterPayload (UTF-8 JSON) |
  *     FooterPayloadSize (int32-LE) | Flags (4 bytes) | Magic`;
  *     flag bit 0 of byte 0 marks an lz4-frame-compressed payload —
  *     this writer never compresses, the reader refuses compressed
  *     payloads loudly (decompressing wrongly would silently mis-read);
  *   - the footer JSON is `{"blobs": [...], "properties": {...}}`,
  *     each blob carrying `type`, `fields`, `snapshot-id`,
  *     `sequence-number`, `offset`, `length`, optional
  *     `compression-codec` and `properties`.
  *
  * For `deletion-vector-v1` blobs (Iceberg spec v3) the blob bytes are
  * `int32-BE length | RoaringBitmapArray bitmap | int32-BE CRC-32` —
  * deliberately byte-identical to one Delta DV file entry, so
  * [[DeltaDv.frame]]/[[DeltaDv.unframe]] and the roaring codec are
  * shared verbatim. Blob `snapshot-id`/`sequence-number` are −1 per
  * the v3 DV rule; `referenced-data-file` and `cardinality` ride the
  * blob properties.
  *
  * All driver-side byte plumbing — blob payloads are per-file bitmaps
  * (bytes ∝ deleted rows / 8), the same planning class as graft's own
  * DV artifacts. */
object Puffin {

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"

  final case class BlobMeta(blobType: String, offset: Long, length: Long,
      snapshotId: Long, sequenceNumber: Long,
      properties: Map[String, String],
      compressionCodec: Option[String])

  /** Write a puffin file of `blobs` = (type, content bytes,
    * properties); returns each blob's (offset, length) in file order. */
  def writeFile(fs: FileSystem, path: Path,
      blobs: Seq[(String, Array[Byte], Map[String, String])],
      fileProperties: Map[String, String] = Map.empty)
      : Seq[(Long, Long)] = {
    val m = Snapshot.mapper
    val out = fs.create(path, false)
    try {
      out.write(Magic)
      var off = 4L
      val metas = blobs.map { case (tpe, content, props) =>
        out.write(content)
        val r = (tpe, off, content.length.toLong, props)
        off += content.length
        r
      }
      val root = m.createObjectNode()
      val arr = root.putArray("blobs")
      metas.foreach { case (tpe, o, len, props) =>
        val b = arr.addObject()
        b.put("type", tpe)
        b.putArray("fields")
        // the v3 DV rule: snapshot-id / sequence-number are -1 (the
        // blob is not bound to the snapshot that wrote it — manifests
        // carry the binding)
        b.put("snapshot-id", -1L)
        b.put("sequence-number", -1L)
        b.put("offset", o)
        b.put("length", len)
        if (props.nonEmpty) {
          val po = b.putObject("properties")
          props.foreach { case (k, v) => po.put(k, v) }
        }
      }
      if (fileProperties.nonEmpty) {
        val po = root.putObject("properties")
        fileProperties.foreach { case (k, v) => po.put(k, v) }
      }
      val payload = m.writeValueAsString(root)
        .getBytes(StandardCharsets.UTF_8)
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: uncompressed footer payload
      out.write(tail.array())
      out.write(Magic)
      metas.map(t => (t._2, t._3))
    } finally out.close()
  }

  /** Parse the footer: every blob's metadata, magics and flags
    * verified. Refuses compressed footers and malformed framing. */
  def readBlobs(fs: FileSystem, path: Path): Seq[BlobMeta] = {
    val len = fs.getFileStatus(path).getLen
    require(len >= 4 + 4 + 8 + 4,
      s"$path too short (${len} B) to be a puffin file")
    val in = fs.open(path)
    try {
      val head = new Array[Byte](4)
      in.readFully(0L, head)
      require(head.sameElements(Magic),
        s"$path does not start with the puffin magic")
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      val bb = ByteBuffer.wrap(tail).order(ByteOrder.LITTLE_ENDIAN)
      val payloadSize = bb.getInt()
      val flags = bb.getInt()
      require(tail.slice(8, 12).sameElements(Magic),
        s"$path does not end with the puffin magic")
      require(flags == 0,
        s"$path footer flags 0x${flags.toHexString} — compressed " +
          "footer payloads are not supported; refusing rather than " +
          "mis-reading")
      // min file = head magic 4 + footer magic 4 + payload +
      // size/flags/magic 12, so a blob-less file's payload is len-20
      require(payloadSize >= 0 && payloadSize <= len - 20,
        s"$path footer payload size $payloadSize out of range")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, payload)
      val preMagic = new Array[Byte](4)
      in.readFully(len - 12 - payloadSize - 4, preMagic)
      require(preMagic.sameElements(Magic),
        s"$path footer payload is not magic-framed")
      val root = Snapshot.mapper.readTree(
        new String(payload, StandardCharsets.UTF_8))
      root.path("blobs").elements().asScala.map { b =>
        BlobMeta(
          b.path("type").asText(),
          b.path("offset").asLong(),
          b.path("length").asLong(),
          b.path("snapshot-id").asLong(),
          b.path("sequence-number").asLong(),
          b.path("properties").properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap,
          Option(b.path("compression-codec").asText(null)))
      }.toSeq
    } finally in.close()
  }

  /** Read one blob's raw bytes at (offset, length). Compressed blobs
    * are refused (this writer never compresses; a foreign codec would
    * change what the bytes mean). */
  def readBlob(fs: FileSystem, path: Path, offset: Long, length: Long,
      compressionCodec: Option[String] = None): Array[Byte] = {
    compressionCodec.filter(_.nonEmpty).foreach { c =>
      throw new IllegalArgumentException(
        s"puffin blob compression-codec '$c' is not supported — " +
          "refusing rather than mis-reading")
    }
    require(length >= 0 && length <= Int.MaxValue,
      s"blob length $length out of range")
    val fileLen = fs.getFileStatus(path).getLen
    require(offset >= 4 && offset + length <= fileLen,
      s"blob region [$offset, ${offset + length}) outside $path " +
        s"($fileLen B)")
    val in = fs.open(path)
    try {
      val buf = new Array[Byte](length.toInt)
      in.readFully(offset, buf)
      buf
    } finally in.close()
  }

  // ------------------------------------------ deletion-vector blobs

  val DvBlobType = "deletion-vector-v1"

  /** Serialize deleted row ordinals as a `deletion-vector-v1` blob:
    * the shared frame over the shared roaring serialization. */
  def dvBlob(positions: Array[Long]): Array[Byte] =
    DeltaDv.frame(DeltaDv.serialize(positions))

  /** Decode a `deletion-vector-v1` blob back to sorted row ordinals,
    * frame and CRC verified; `cardinality` cross-checked when the
    * caller carries one (manifest `record_count`). */
  def readDvBlob(bytes: Array[Byte],
      cardinality: Option[Long] = None): Array[Long] = {
    val positions = DeltaDv.deserialize(DeltaDv.unframe(bytes))
    cardinality.foreach(c => require(positions.length == c,
      s"DV blob cardinality ${positions.length} != declared $c"))
    positions
  }
}
