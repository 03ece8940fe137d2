package graft.tsdb

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** Tombstones file: per-series deleted time intervals, part of every
  * block directory (reference `vendor/.../tsdb/tombstones.go:40-82`
  * write, `:91-140` read; agni always serves empty ones,
  * `block.go:73-75`, but blocks produced by a real Prometheus carry
  * real intervals after deletes — the migration path must honor them).
  *
  * Layout: BE32 magic 0x130BA30, version byte 1, then per interval
  * `(uvarint seriesRef, varint mint, varint maxt)`, then BE32
  * CRC32-Castagnoli over the interval region. Series ref = the same
  * postings ref the index uses.
  */
object Tombstones {
  val Magic = 0x130BA30
  val Version = 1

  type Stones = Map[Long, Seq[(Long, Long)]]

  private def crc32c(b: Array[Byte], from: Int, until: Int): Int = {
    val c = new java.util.zip.CRC32C
    c.update(b, from, until - from)
    c.getValue.toInt
  }

  def write(dir: java.nio.file.Path, stones: Stones): Unit =
    write(dir.toString, stones)

  def write(dir: String, stones: Stones): Unit = {
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def be32(v: Int): Unit = { u8(v >>> 24); u8(v >>> 16); u8(v >>> 8); u8(v) }
    def uvarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { u8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      u8(v.toInt)
    }
    def varint(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
    be32(Magic); u8(Version)
    val bodyStart = out.size()
    stones.toSeq.sortBy(_._1).foreach { case (ref, ivs) =>
      ivs.foreach { case (mint, maxt) =>
        uvarint(ref); varint(mint); varint(maxt)
      }
    }
    val bytes = out.toByteArray
    val full = ByteBuffer.allocate(bytes.length + 4)
    full.put(bytes)
    full.putInt(crc32c(bytes, bodyStart, bytes.length))
    BlockIO.writeBytes(BlockIO.child(dir, "tombstones"), full.array())
  }

  def read(dir: java.nio.file.Path): Stones = read(dir.toString)

  /** Read a block's tombstones; empty map when the file is absent (the
    * reference's nop behavior) or contains no intervals. `dir` may be any
    * Hadoop-FS URI. */
  def read(dir: String,
           conf: org.apache.hadoop.conf.Configuration = null): Stones = {
    val p = BlockIO.child(dir, "tombstones")
    if (!BlockIO.exists(p, conf)) return Map.empty
    val b = BlockIO.readAllBytes(p, conf)
    require(b.length >= 9, "tombstones file too short")
    var pos = 0
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def be32(): Int = { val v = ByteBuffer.wrap(b, pos, 4).getInt; pos += 4; v }
    def uvarint(): Long = {
      var v = 0L; var shift = 0; var x = 0
      do { x = u8(); v |= (x & 0x7fL) << shift; shift += 7 } while ((x & 0x80) != 0)
      v
    }
    def varint(): Long = { val u = uvarint(); (u >>> 1) ^ -(u & 1L) }
    require(be32() == Magic, "bad tombstones magic")
    require(u8() == Version, "bad tombstones version")
    val bodyStart = pos
    val bodyEnd = b.length - 4
    require(ByteBuffer.wrap(b, bodyEnd, 4).getInt == crc32c(b, bodyStart, bodyEnd),
      "tombstones crc mismatch")
    val acc = scala.collection.mutable.Map[Long, Vector[(Long, Long)]]()
    while (pos < bodyEnd) {
      val ref = uvarint(); val mint = varint(); val maxt = varint()
      acc(ref) = acc.getOrElse(ref, Vector.empty) :+ (mint, maxt)
    }
    acc.toMap
  }

  /** Does `t` fall in any deleted interval? (inclusive bounds, reference
    * `Interval.inBounds`, tombstones.go:253-255) */
  def deleted(ivs: Seq[(Long, Long)], t: Long): Boolean =
    ivs.exists { case (lo, hi) => t >= lo && t <= hi }
}
