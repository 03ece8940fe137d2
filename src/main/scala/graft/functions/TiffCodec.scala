package graft.functions

/** Baseline TIFF codec, pure JVM from the published TIFF 6.0
  * specification: both byte orders (II/MM), the classic 8-bit
  * baseline subset — grayscale (PhotometricInterpretation 0/1,
  * including the inverted white-is-zero convention), RGB, and
  * palette-color — strip layout (RowsPerStrip / StripOffsets /
  * StripByteCounts, inline value offsets for short tag payloads),
  * uncompressed (Compression 1) and PackBits (32773). Everything
  * else (LZW/JPEG-in-TIFF, tiles, 16-bit, planar) returns null so
  * ingest counts it, exactly like the sibling decoders.
  *
  * `TiffCodecSpec` gates the decoder two-directionally against the
  * JDK's independent ImageIO TIFF plugin (reads ImageIO-written
  * files bit-exactly; ImageIO reads this encoder's output back to
  * the source pixels).
  *
  * Never throws on foreign bytes; allocations pre-validated against
  * [[MaxPixels]]. */
object TiffCodec {

  private val MaxPixels = 16 << 20

  private final class Err extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Err

  def decode(b: Array[Byte]): PixelDecode.Rgb =
    try decode0(b)
    catch {
      case _: Err => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }

  private def decode0(b: Array[Byte]): PixelDecode.Rgb = {
    if (b == null || b.length < 8) return null
    val le =
      if (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) true
      else if (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42) false
      else return null
    def u16(at: Int): Int =
      if (le) (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
      else ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
    def u32(at: Int): Long =
      if (le) (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
        ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)
      else ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
        ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)

    val ifdAt = u32(4)
    if (ifdAt < 8 || ifdAt + 2 > b.length) fail()
    val nTags = u16(ifdAt.toInt)
    if (nTags <= 0 || ifdAt + 2 + 12L * nTags > b.length) fail()

    var width = -1
    var height = -1
    var bits: Array[Int] = Array(1) // spec default
    var compression = 1
    var photometric = -1
    var stripOffsets: Array[Long] = null
    var samplesPerPixel = 1
    var rowsPerStrip = Long.MaxValue
    var stripCounts: Array[Long] = null
    var colorMap: Array[Int] = null
    var planar = 1

    /** Read a SHORT/LONG tag value array (field types 3 and 4). */
    def values(entry: Int): Array[Long] = {
      val tpe = u16(entry + 2)
      val n = u32(entry + 4)
      if (n <= 0 || n > (1 << 20)) fail()
      val sz = tpe match { case 3 => 2; case 4 => 4; case 1 => 1; case _ => fail() }
      val total = sz * n
      val at = if (total <= 4) entry + 8 else {
        val off = u32(entry + 8)
        if (off + total > b.length) fail()
        off.toInt
      }
      Array.tabulate(n.toInt)(i => tpe match {
        case 1 => (b(at + i) & 0xff).toLong
        case 3 => u16(at + 2 * i).toLong
        case 4 => u32(at + 4 * i)
      })
    }

    var t = 0
    while (t < nTags) {
      val e = ifdAt.toInt + 2 + 12 * t
      val tag = u16(e)
      tag match {
        case 256 => width = values(e)(0).toInt
        case 257 => height = values(e)(0).toInt
        case 258 => bits = values(e).map(_.toInt)
        case 259 => compression = values(e)(0).toInt
        case 262 => photometric = values(e)(0).toInt
        case 273 => stripOffsets = values(e)
        case 277 => samplesPerPixel = values(e)(0).toInt
        case 278 => rowsPerStrip = values(e)(0)
        case 279 => stripCounts = values(e)
        case 284 => planar = values(e)(0).toInt
        case 320 => colorMap = values(e).map(_.toInt)
        case _ => () // unknown tags are skippable by design
      }
      t += 1
    }

    if (width <= 0 || height <= 0 ||
      width.toLong * height > MaxPixels) return null
    if (planar != 1) return null // planar configuration 2 unsupported
    if (compression != 1 && compression != 32773) return null
    if (stripOffsets == null) return null
    val gray = photometric == 0 || photometric == 1
    val rgbP = photometric == 2
    val pal = photometric == 3
    if (!gray && !rgbP && !pal) return null
    val spp = if (rgbP) 3 else 1
    if (samplesPerPixel != spp) return null
    if (bits.length < spp || bits.take(spp).exists(_ != 8)) return null
    if (pal && (colorMap == null || colorMap.length < 3 * 256)) return null

    // assemble the uncompressed sample stream strip by strip
    val rowBytes = width * spp
    val total = rowBytes.toLong * height
    if (total > 3L * MaxPixels) return null
    val out = new Array[Byte](total.toInt)
    var produced = 0
    var strip = 0
    while (strip < stripOffsets.length && produced < total) {
      val off = stripOffsets(strip)
      val rows = math.min(rowsPerStrip, height - strip * rowsPerStrip)
      if (rows <= 0) fail()
      val want = (rows * rowBytes).toInt
      if (off < 0 || off > b.length) fail()
      if (compression == 1) {
        val n = if (stripCounts != null) stripCounts(strip).toInt else want
        if (n < want || off + want > b.length) fail()
        System.arraycopy(b, off.toInt, out, produced, want)
        produced += want
      } else { // PackBits, per strip
        var i = off.toInt
        val end =
          if (stripCounts != null) off.toInt + stripCounts(strip).toInt
          else b.length
        if (end > b.length) fail()
        var got = 0
        while (got < want) {
          if (i >= end) fail()
          val n = b(i)
          i += 1
          if (n >= 0) { // literal run of n+1 bytes
            if (i + n + 1 > end || produced + got + n + 1 > out.length)
              fail()
            System.arraycopy(b, i, out, produced + got, n + 1)
            i += n + 1
            got += n + 1
          } else if (n != -128) { // replicate next byte 1-n times
            if (i >= end) fail()
            val run = 1 - n
            if (produced + got + run > out.length) fail()
            java.util.Arrays.fill(out, produced + got,
              produced + got + run, b(i))
            i += 1
            got += run
          } // -128: no-op
        }
        if (got != want) fail()
        produced += want
      }
      strip += 1
    }
    if (produced < total) fail()

    val px = new Array[Byte](3 * width * height)
    var p = 0
    var i = 0
    while (p < width * height) {
      if (rgbP) {
        px(3 * p) = out(i); px(3 * p + 1) = out(i + 1)
        px(3 * p + 2) = out(i + 2)
        i += 3
      } else if (pal) {
        val idx = out(i) & 0xff
        // TIFF color maps are 16-bit; 8-bit-significant maps are
        // written as v*257, so the high byte recovers the channel
        px(3 * p) = (colorMap(idx) >> 8).toByte
        px(3 * p + 1) = (colorMap(256 + idx) >> 8).toByte
        px(3 * p + 2) = (colorMap(512 + idx) >> 8).toByte
        i += 1
      } else {
        val v =
          if (photometric == 0) (255 - (out(i) & 0xff)).toByte // inverted
          else out(i)
        px(3 * p) = v; px(3 * p + 1) = v; px(3 * p + 2) = v
        i += 1
      }
      p += 1
    }
    new PixelDecode.Rgb(width, height, px)
  }

  // --------------------------------------------------------- encoder

  /** Fixture encoder: one-strip baseline TIFF. `photometric` 1 = gray
    * (data = gray bytes), 2 = RGB (data = 3·w·h). Little- or
    * big-endian, uncompressed or PackBits. */
  def encode(w: Int, h: Int, data: Array[Byte], photometric: Int,
             le: Boolean = true, packBits: Boolean = false): Array[Byte] = {
    val spp = if (photometric == 2) 3 else 1
    require(data.length == w * h * spp)
    val payload = if (packBits) packBitsEncode(data) else data
    val nTags = 9
    val bitsExtraAt = 8 + payload.length // SHORT[3] for RGB BitsPerSample
    val ifdAt = bitsExtraAt + (if (spp == 3) 6 else 0)
    val buf = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (le) { buf.write(v & 0xff); buf.write((v >> 8) & 0xff) }
      else { buf.write((v >> 8) & 0xff); buf.write(v & 0xff) }
    def w32(v: Int): Unit =
      if (le) { buf.write(v & 0xff); buf.write((v >> 8) & 0xff)
        buf.write((v >> 16) & 0xff); buf.write((v >> 24) & 0xff) }
      else { buf.write((v >> 24) & 0xff); buf.write((v >> 16) & 0xff)
        buf.write((v >> 8) & 0xff); buf.write(v & 0xff) }
    def tagShort(tag: Int, v: Int): Unit = {
      w16(tag); w16(3); w32(1)
      if (le) { w16(v); w16(0) } else { w16(v); w16(0) }
    }
    def tagLong(tag: Int, v: Int): Unit = { w16(tag); w16(4); w32(1); w32(v) }
    buf.write(if (le) 'I' else 'M'); buf.write(if (le) 'I' else 'M')
    if (le) { buf.write(42); buf.write(0) } else { buf.write(0); buf.write(42) }
    w32(ifdAt)
    buf.write(payload, 0, payload.length)
    if (spp == 3) { w16(8); w16(8); w16(8) }
    w16(nTags)
    tagLong(256, w)
    tagLong(257, h)
    if (spp == 3) { w16(258); w16(3); w32(3); w32(bitsExtraAt) }
    else tagShort(258, 8)
    tagShort(259, if (packBits) 32773 else 1)
    tagShort(262, photometric)
    tagLong(273, 8) // single strip right after the header
    tagShort(277, spp)
    tagLong(278, h)
    tagLong(279, payload.length)
    w32(0) // no next IFD
    buf.toByteArray
  }

  /** PackBits (one shot over the whole strip — runs never cross what
    * the decoder cares about since it consumes by byte count). */
  private def packBitsEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < data.length) {
      // find a replicate run
      var run = 1
      while (i + run < data.length && run < 128 &&
        data(i + run) == data(i)) run += 1
      if (run >= 2) {
        out.write(1 - run) // -(run-1)
        out.write(data(i))
        i += run
      } else {
        // literal run until the next replicate of >= 3 (or 128 cap)
        var n = 1
        while (i + n < data.length && n < 128 &&
          !(i + n + 2 < data.length && data(i + n) == data(i + n + 1) &&
            data(i + n) == data(i + n + 2))) n += 1
        out.write(n - 1)
        out.write(data, i, n)
        i += n
      }
    }
    out.toByteArray
  }
}
