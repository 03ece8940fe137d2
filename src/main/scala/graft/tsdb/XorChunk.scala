package graft.tsdb

import scala.collection.mutable.ArrayBuffer

/** MSB-first bit stream, the substrate of the XOR chunk encoding.
  * Same wire behavior as the reference's bstream
  * (`vendor/github.com/prometheus/tsdb/chunks/bstream.go`): bits fill each
  * byte from the most-significant end. Clean-room implementation from the
  * format (Gorilla paper §4.1; Prometheus TSDB chunk format docs). */
final class BitWriter {
  private val buf = ArrayBuffer[Byte]()
  private var bitPos = 8 // bits free in current byte; 8 == no open byte

  def writeBit(b: Boolean): Unit = {
    if (bitPos == 8) { buf += 0; bitPos = 0 }
    if (b) buf(buf.length - 1) = (buf(buf.length - 1) | (0x80 >>> bitPos)).toByte
    bitPos += 1
    if (bitPos == 8) bitPos = 8
  }

  /** Write the low `n` bits of `v`, MSB first. */
  def writeBits(v: Long, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { writeBit(((v >>> i) & 1L) == 1L); i -= 1 }
  }

  def writeByte(b: Int): Unit = writeBits(b.toLong & 0xffL, 8)

  /** Unsigned LEB128 varint (Go encoding/binary PutUvarint). */
  def writeUvarint(v0: Long): Unit = {
    var v = v0
    while (java.lang.Long.compareUnsigned(v, 0x80L) >= 0) {
      writeByte(((v & 0x7f) | 0x80).toInt)
      v = v >>> 7
    }
    writeByte(v.toInt)
  }

  /** Signed zig-zag varint (Go encoding/binary PutVarint). */
  def writeVarint(v: Long): Unit =
    writeUvarint((v << 1) ^ (v >> 63))

  def toBytes: Array[Byte] = buf.toArray
  /** Overwrite a previously written byte (for the sample-count header). */
  def setByte(idx: Int, b: Int): Unit = buf(idx) = b.toByte
}

final class BitReader(bytes: Array[Byte]) {
  private var idx = 0
  private var bit = 0

  def readBit(): Boolean = {
    val b = ((bytes(idx) >>> (7 - bit)) & 1) == 1
    bit += 1
    if (bit == 8) { bit = 0; idx += 1 }
    b
  }

  def readBits(n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 1) | (if (readBit()) 1L else 0L); i += 1 }
    v
  }

  def readByte(): Int = readBits(8).toInt

  def readUvarint(): Long = {
    var v = 0L; var shift = 0
    var b = readByte()
    while ((b & 0x80) != 0) {
      v |= (b & 0x7fL) << shift; shift += 7; b = readByte()
    }
    v | ((b & 0x7fL) << shift)
  }

  def readVarint(): Long = {
    val u = readUvarint()
    (u >>> 1) ^ -(u & 1L)
  }
}

/** Gorilla-style XOR chunk: delta-of-delta timestamps + XOR'd float64
  * mantissa reuse. Bit-compatible with the reference's chunk encoding
  * (`vendor/github.com/prometheus/tsdb/chunks/xor.go:134-224` append,
  * `xor.go:249-389` decode), re-derived from the published format:
  *
  *   header: uint16 BE sample count
  *   s0: varint t0 | raw 64-bit v0
  *   s1: uvarint (t1-t0) | xor-coded v1
  *   sN: dod prefix-coded '0' | '10'+14b | '110'+17b | '1110'+20b | '1111'+64b
  *       (two's-complement in the narrow widths), xor-coded vN:
  *       '0' if xor==0; '1','0' reuse previous leading/trailing window;
  *       '1','1' 5b leading | 6b sigbit-count (64 encoded as 0) | sig bits
  */
object XorChunk {
  val Encoding: Int = 1 // chunk encoding byte for XOR (chunks.go framing)

  def encode(samples: Seq[Sample]): Array[Byte] = {
    require(samples.size <= 0xffff, "chunk overflow")
    val w = new BitWriter
    w.writeByte(samples.size >>> 8); w.writeByte(samples.size & 0xff)
    var prevT = 0L; var prevDelta = 0L; var prevV = 0L
    var leading = -1; var trailing = 0 // -1 == no window yet (ref sentinel 0xff)
    var i = 0
    samples.foreach { s =>
      if (i == 0) {
        w.writeVarint(s.t)
        prevV = java.lang.Double.doubleToLongBits(s.v)
        w.writeBits(prevV, 64)
      } else if (i == 1) {
        prevDelta = s.t - prevT
        w.writeUvarint(prevDelta)
        writeXorValue(w, s.v)
      } else {
        val delta = s.t - prevT
        val dod = delta - prevDelta
        prevDelta = delta
        if (dod == 0) w.writeBit(false)
        else if (bitRange(dod, 14)) { w.writeBits(0x2, 2); w.writeBits(dod, 14) }
        else if (bitRange(dod, 17)) { w.writeBits(0x6, 3); w.writeBits(dod, 17) }
        else if (bitRange(dod, 20)) { w.writeBits(0xe, 4); w.writeBits(dod, 20) }
        else { w.writeBits(0xf, 4); w.writeBits(dod, 64) }
        writeXorValue(w, s.v)
      }
      prevT = s.t
      i += 1

      def writeXorValue(w: BitWriter, v: Double): Unit = {
        val bits = java.lang.Double.doubleToLongBits(v)
        val xor = bits ^ prevV
        prevV = bits
        if (xor == 0) w.writeBit(false)
        else {
          w.writeBit(true)
          var lead = java.lang.Long.numberOfLeadingZeros(xor)
          val trail = java.lang.Long.numberOfTrailingZeros(xor)
          if (lead > 31) lead = 31 // 5-bit field cap (xor.go:191)
          if (leading != -1 && lead >= leading && trail >= trailing) {
            w.writeBit(false)
            w.writeBits(xor >>> trailing, 64 - leading - trailing)
          } else {
            leading = lead; trailing = trail
            w.writeBit(true)
            w.writeBits(lead.toLong, 5)
            val sigbits = 64 - lead - trail
            w.writeBits(sigbits.toLong & 0x3f, 6) // 64 encoded as 0
            w.writeBits(xor >>> trail, sigbits)
          }
        }
      }
    }
    w.toBytes
  }

  /** dod fits in an n-bit two's-complement field with the reference's
    * asymmetric bound: -(2^(n-1)-1) <= x <= 2^(n-1). */
  private def bitRange(x: Long, n: Int): Boolean =
    -((1L << (n - 1)) - 1) <= x && x <= (1L << (n - 1))

  def decode(bytes: Array[Byte]): IndexedSeq[Sample] = {
    val r = new BitReader(bytes)
    val num = ((r.readByte() & 0xff) << 8) | (r.readByte() & 0xff)
    val out = new ArrayBuffer[Sample](num)
    var t = 0L; var delta = 0L; var vBits = 0L
    var leading = 0; var trailing = 0
    var i = 0
    while (i < num) {
      if (i == 0) {
        t = r.readVarint()
        vBits = r.readBits(64)
      } else if (i == 1) {
        delta = r.readUvarint()
        t += delta
        readXorValue()
      } else {
        var prefix = 0
        var d = 0
        while (d < 4 && r.readBit()) { prefix += 1; d += 1 }
        val dod = prefix match {
          case 0 => 0L
          case 1 => signExtend(r.readBits(14), 14)
          case 2 => signExtend(r.readBits(17), 17)
          case 3 => signExtend(r.readBits(20), 20)
          case 4 => r.readBits(64)
        }
        delta += dod
        t += delta
        readXorValue()
      }
      out += Sample(t, java.lang.Double.longBitsToDouble(vBits))
      i += 1

      def readXorValue(): Unit = {
        if (r.readBit()) {
          if (r.readBit()) {
            leading = r.readBits(5).toInt
            var sig = r.readBits(6).toInt
            if (sig == 0) sig = 64 // 0 means 64 (xor.go decode)
            trailing = 64 - leading - sig
          }
          val sig = 64 - leading - trailing
          vBits ^= r.readBits(sig) << trailing
        }
      }
    }
    out.toIndexedSeq
  }

  /** Reference decode uses strict `>`: 2^(n-1) stays positive
    * (xor.go dod read). */
  private def signExtend(bits: Long, n: Int): Long =
    if (bits > (1L << (n - 1))) bits - (1L << n) else bits
}
