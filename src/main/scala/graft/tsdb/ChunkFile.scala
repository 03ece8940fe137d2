package graft.tsdb

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C
import scala.collection.mutable.ArrayBuffer

/** TSDB chunk segment file framing — the migration/ingest compatibility
  * layer for blocks written by the reference's shipper.
  *
  * Format (`vendor/github.com/prometheus/tsdb/chunks.go:30-31,199-270`):
  *   file: 4-byte BE magic 0x85BD40DD | 1-byte version (1) | records...
  *   record @offset: uvarint len | 1-byte encoding | len data bytes | crc32
  *   crc: CRC-32 Castagnoli over (encoding byte ++ data)
  * A chunk ref packs `fileSeq << 32 | byteOffset`
  * (`vendor/.../tsdb/chunks.go:241-247`, decoded in agni `chunks.go:113-115`).
  */
object ChunkFile {
  val Magic: Int = 0x85bd40dd
  val Version: Int = 1

  final case class ChunkRecord(ref: Long, encoding: Int, data: Array[Byte])

  def ref(fileSeq: Int, offset: Int): Long = (fileSeq.toLong << 32) | (offset.toLong & 0xffffffffL)
  def refFileSeq(ref: Long): Int = (ref >>> 32).toInt
  def refOffset(ref: Long): Int = (ref & 0xffffffffL).toInt

  private def crc32c(enc: Int, data: Array[Byte]): Int = {
    val c = new CRC32C
    c.update(enc)
    c.update(data, 0, data.length)
    c.getValue.toInt
  }

  /** Serialize chunks into one segment file; returns (bytes, refs aligned
    * with the input order) for `fileSeq`. */
  def write(fileSeq: Int, chunks: Seq[Array[Byte]], encoding: Int = XorChunk.Encoding): (Array[Byte], Seq[Long]) = {
    val out = new java.io.ByteArrayOutputStream()
    val header = ByteBuffer.allocate(5).order(ByteOrder.BIG_ENDIAN)
    header.putInt(Magic); header.put(Version.toByte)
    out.write(header.array())
    val refs = ArrayBuffer[Long]()
    chunks.foreach { data =>
      refs += ref(fileSeq, out.size())
      // uvarint length
      var v = data.length.toLong
      while (v >= 0x80) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
      out.write(encoding)
      out.write(data, 0, data.length)
      val crcBuf = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN)
      crcBuf.putInt(crc32c(encoding, data))
      out.write(crcBuf.array())
    }
    (out.toByteArray, refs.toSeq)
  }

  /** Read one chunk record at `offset` (same slicing as agni's coalesced
    * range-read path, `chunks.go:112-159`). */
  def readAt(bytes: Array[Byte], offset: Int): ChunkRecord = {
    var pos = offset
    var len = 0L; var shift = 0
    var b = bytes(pos) & 0xff; pos += 1
    while ((b & 0x80) != 0) { len |= (b & 0x7fL) << shift; shift += 7; b = bytes(pos) & 0xff; pos += 1 }
    len |= (b & 0x7fL) << shift
    val enc = bytes(pos) & 0xff; pos += 1
    val data = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
    pos += len.toInt
    val crc = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.BIG_ENDIAN).getInt
    require(crc == crc32c(enc, data), s"chunk crc mismatch at offset $offset")
    ChunkRecord(ref(0, offset), enc, data)
  }

  /** Sequentially scan all chunk records in a segment file. */
  def readAll(bytes: Array[Byte]): Seq[ChunkRecord] = {
    require(ByteBuffer.wrap(bytes, 0, 4).order(ByteOrder.BIG_ENDIAN).getInt == Magic, "bad chunk file magic")
    require((bytes(4) & 0xff) == Version, "bad chunk file version")
    val out = ArrayBuffer[ChunkRecord]()
    var pos = 5
    while (pos < bytes.length) {
      val rec = readAt(bytes, pos)
      out += rec.copy(ref = ref(0, pos))
      // advance: uvarint len size + 1 enc + data + 4 crc
      var l = rec.data.length.toLong; var n = 1
      while (l >= 0x80) { n += 1; l >>>= 7 }
      pos += n + 1 + rec.data.length + 4
    }
    out.toSeq
  }
}
