package graft.functions

import org.apache.spark.sql.catalyst.InternalRow

/** Container-agnostic pixel decode — the single RGB entry point the
  * image expressions share, so perceptual hashing and pixel features
  * work on whatever a real crawl actually contains instead of one
  * format each. All pure JVM, from the published specs: BMP
  * (uncompressed 24bpp), PNG (RFC 2083 — CRC-verified chunks, JDK
  * inflate, all five scanline filters, every 8-bit color type: gray /
  * RGB / palette / gray+alpha / RGBA), GIF (variable-width LZW,
  * global or local palette, sequential or interlaced), JPEG
  * ([[JpegCodec]] — Huffman + dequant + IDCT + YCbCr, sequential AND
  * progressive, EXIF-orientation normalized), and lossless WebP
  * ([[WebpCodec]] — full VP8L: all four transforms, color cache,
  * LZ77, meta-Huffman; lossy VP8 classifies via
  * [[WebpCodec.riffKind]] and is counted, not silently dropped).
  * Every decoder returns null (never throws) on bytes it doesn't own
  * or can't prove whole. */
object PixelDecode {

  /** A decoded image: packed RGB bytes, 3·w·h, row-major TOP-DOWN. */
  final class Rgb(val w: Int, val h: Int, val px: Array[Byte])

  /** Sniff the container by magic and decode: BMP, PNG, GIF, baseline
    * JPEG or lossless WebP; null for anything else. */
  def decode(b: Array[Byte]): Rgb = {
    if (b == null || b.length < 8) return null
    if (b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') decodePng(b)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      decodeGif(b)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      JpegCodec.decode(b)
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      WebpCodec.decode(b)
    else null
  }

  /** Sniffed container name for decode/skip accounting: one of bmp /
    * png / gif / jpeg / webp_lossless / webp_lossy / null (unknown).
    * `webp_lossy` is the one sniffable-but-undecodable class — ingest
    * reports COUNT it so the coverage gap is data, not silence. */
  def container(b: Array[Byte]): String = {
    if (b == null || b.length < 8) return null
    if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') "png"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      WebpCodec.riffKind(b)
    else null
  }

  private def le4(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def le2(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def be4(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** Uncompressed 24bpp BI_RGB; bottom-up and top-down row orders both
    * normalize to image (top-down) coordinates. */
  def decodeBmp(b: Array[Byte]): Rgb = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOffset = le4(b, 10)
    if (le4(b, 14) < 40) return null
    val w = le4(b, 18).toInt
    val hRaw = le4(b, 22).toInt
    val h = math.abs(hRaw)
    val bpp = le2(b, 28)
    val compression = le4(b, 30)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0L) return null
    if (dataOffset < 54 || dataOffset > b.length) return null
    val stride = ((w * 3 + 3) / 4) * 4
    if ((b.length - dataOffset) / stride < h) return null // truncated
    val px = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val fileRow = if (hRaw > 0) h - 1 - y else y
      var x = 0
      var i = dataOffset.toInt + fileRow * stride
      var o = 3 * y * w
      while (x < w) {
        px(o) = b(i + 2); px(o + 1) = b(i + 1); px(o + 2) = b(i) // BGR → RGB
        x += 1; i += 3; o += 3
      }
      y += 1
    }
    new Rgb(w, h, px)
  }

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  /** 8-bit non-interlaced PNG, every color type (gray / RGB / palette
    * / gray+alpha / RGBA — alpha dropped, palette resolved):
    * CRC-verified chunk walk, multi-IDAT inflate, per-row
    * un-filtering (RFC 2083 §6.3-6.6). */
  def decodePng(b: Array[Byte]): Rgb = {
    if (b.length < 8 + 25 || !java.util.Arrays.equals(
        java.util.Arrays.copyOf(b, 8), PngSig)) return null
    var i = 8
    var w = -1; var h = -1
    var color = -1
    var palAt = -1; var palLen = 0
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (i + 12 <= b.length && !sawEnd) {
      val len = be4(b, i)
      if (len < 0 || i + 12 + len > b.length) return null
      val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(b, i + 4, 4 + len.toInt)
      if (crc.getValue != be4(b, i + 8 + len.toInt)) return null // corrupt
      typ match {
        case "IHDR" =>
          if (len != 13) return null
          w = be4(b, i + 8).toInt; h = be4(b, i + 12).toInt
          val depth = b(i + 16) & 0xff
          color = b(i + 17) & 0xff
          val interlace = b(i + 20) & 0xff
          // 8-bit gray / RGB / palette / gray+alpha / RGBA,
          // non-interlaced (Adam7 and sub-byte depths stay out)
          if (depth != 8 || interlace != 0 ||
            !(color == 0 || color == 2 || color == 3 || color == 4 ||
              color == 6)) return null
        case "PLTE" =>
          if (len % 3 != 0) return null
          palAt = i + 8; palLen = len.toInt
        case "IDAT" => idat.write(b, i + 8, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len.toInt
    }
    if (w <= 0 || h <= 0 || idat.size() == 0) return null
    if (color == 3 && palAt < 0) return null
    if (w.toLong * h > (64L << 20)) return null
    val bpp = color match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    val stride = 1 + bpp * w
    val raw = new Array[Byte](stride * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return null // truncated stream
        off += n
      }
      if (off < raw.length) return null
    } catch { case _: java.util.zip.DataFormatException => return null
    } finally inf.end()
    // un-filter into the sample buffer (RFC 2083 6.3-6.6); the filter
    // "left" distance is one PIXEL = bpp bytes
    val ln = new Array[Byte](bpp * w * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * stride) & 0xff
      if (ft > 4) return null
      var x = 0
      while (x < bpp * w) {
        val cur = raw(y * stride + 1 + x) & 0xff
        val left = if (x >= bpp) ln(y * bpp * w + x - bpp) & 0xff else 0
        val up = if (y > 0) ln((y - 1) * bpp * w + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) ln((y - 1) * bpp * w + x - bpp) & 0xff else 0
        val v = ft match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        ln(y * bpp * w + x) = (v & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // expand to packed RGB: palette lookup, gray replication, alpha drop
    val px = new Array[Byte](3 * w * h)
    var k = 0
    while (k < w * h) {
      val at = 3 * k
      color match {
        case 2 =>
          px(at) = ln(3 * k); px(at + 1) = ln(3 * k + 1)
          px(at + 2) = ln(3 * k + 2)
        case 0 =>
          val g = ln(k)
          px(at) = g; px(at + 1) = g; px(at + 2) = g
        case 3 =>
          val idx = ln(k) & 0xff
          if (3 * idx + 2 >= palLen) return null
          px(at) = b(palAt + 3 * idx)
          px(at + 1) = b(palAt + 3 * idx + 1)
          px(at + 2) = b(palAt + 3 * idx + 2)
        case 4 =>
          val g = ln(2 * k) // alpha dropped
          px(at) = g; px(at + 1) = g; px(at + 2) = g
        case 6 =>
          px(at) = ln(4 * k); px(at + 1) = ln(4 * k + 1)
          px(at + 2) = ln(4 * k + 2) // alpha dropped
      }
      k += 1
    }
    new Rgb(w, h, px)
  }

  /** GIF87a/89a, first image block: genuine variable-code-width LZW +
    * palette — global or LOCAL color table, sequential or INTERLACED
    * (the four-pass row order de-woven after decode). */
  def decodeGif(b: Array[Byte]): Rgb = {
    if (b.length < 13 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != '8' || (b(4) != '7' && b(4) != '9') || b(5) != 'a') return null
    val packed = b(10) & 0xff
    var palAt = -1
    var palEntries = 0
    var i = 13
    if ((packed & 0x80) != 0) { // global color table
      palEntries = 2 << (packed & 7)
      if (i + 3 * palEntries > b.length) return null
      palAt = i
      i += 3 * palEntries
    }
    // walk to the first image descriptor, skipping extensions
    while (i < b.length && (b(i) & 0xff) == 0x21) {
      i += 2 // introducer + label
      while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
      i += 1
    }
    if (i >= b.length || (b(i) & 0xff) != 0x2c) return null
    if (i + 10 > b.length) return null
    val w = le2(b, i + 5); val h = le2(b, i + 7)
    val ipacked = b(i + 9) & 0xff
    val interlaced = (ipacked & 0x40) != 0
    i += 10
    if ((ipacked & 0x80) != 0) { // LOCAL color table overrides
      palEntries = 2 << (ipacked & 7)
      if (i + 3 * palEntries > b.length) return null
      palAt = i
      i += 3 * palEntries
    }
    if (palAt < 0) return null // no color table at all
    if (i >= b.length) return null
    val minCode = b(i) & 0xff
    if (minCode < 2 || minCode > 8) return null
    i += 1
    val data = new java.io.ByteArrayOutputStream()
    while (i < b.length && (b(i) & 0xff) != 0) {
      val n = b(i) & 0xff
      if (i + 1 + n > b.length) return null
      data.write(b, i + 1, n)
      i += 1 + n
    }
    val stream = data.toByteArray
    if (w <= 0 || h <= 0 || stream.isEmpty) return null
    if (w.toLong * h > (64L << 20)) return null
    // --- LZW ---
    val Clear = 1 << minCode; val End = Clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Int](4096)
    var next = End + 1; var codeSize = minCode + 1
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var prev = -1
    val out = new Array[Int](w * h)
    var outAt = 0
    val stack = new Array[Int](4097); var sp = 0
    def pushString(code: Int): Int = { // returns the string's FIRST byte
      var c = code
      while (c >= Clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      stack(sp) = c; sp += 1
      c
    }
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= Clear + 2) c = prefix(c)
      c
    }
    var done = false
    while (!done) {
      while (bitCnt < codeSize && pos < stream.length) {
        bitBuf |= (stream(pos) & 0xffL) << bitCnt; bitCnt += 8; pos += 1
      }
      if (bitCnt < codeSize) return null // truncated stream
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>= codeSize; bitCnt -= codeSize
      if (code == Clear) { next = End + 1; codeSize = minCode + 1; prev = -1 }
      else if (code == End) done = true
      else {
        if (prev == -1) {
          if (code >= Clear) return null // first code must be a literal
          if (outAt >= out.length) return null
          out(outAt) = code; outAt += 1
          prev = code
        } else {
          if (code > next || (code == next && next >= 4096)) return null
          val first = if (code == next) {
            // KwKwK: str(prev) + head(prev); head goes at stack BOTTOM
            val f = firstOf(prev)
            stack(sp) = f; sp += 1
            pushString(prev)
            f
          } else pushString(code)
          if (outAt + sp > out.length) return null
          while (sp > 0) { sp -= 1; out(outAt) = stack(sp); outAt += 1 }
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = first
            next += 1
            if (next == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
      if (outAt == out.length && !done) done = true // tolerate missing End
    }
    if (outAt != out.length) return null
    // interlaced rows arrive in the four-pass order; de-weave
    val rowOf: Int => Int =
      if (!interlaced) identity
      else {
        val order = new Array[Int](h)
        var r = 0
        Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (st, sp) =>
          var y = st
          while (y < h) { order(r) = y; r += 1; y += sp }
        }
        order
      }
    val px = new Array[Byte](3 * w * h)
    var k = 0
    while (k < out.length) {
      val idx = out(k)
      if (idx >= palEntries) return null
      val at = 3 * (rowOf(k / w) * w + k % w)
      px(at) = b(palAt + 3 * idx)
      px(at + 1) = b(palAt + 3 * idx + 1)
      px(at + 2) = b(palAt + 3 * idx + 2)
      k += 1
    }
    new Rgb(w, h, px)
  }

  /** The shared order-free features over a decoded image — the
    * [[ImagePixelStatsExpr]] schema (count, per-channel sums, max
    * BT.709 luminance ×10000). */
  def stats(img: Rgb): InternalRow = {
    var n = 0L; var sumR = 0L; var sumG = 0L; var sumB = 0L; var maxLum = 0L
    var k = 0
    val px = img.px
    while (k < px.length) {
      val r = px(k) & 0xff; val g = px(k + 1) & 0xff; val bl = px(k + 2) & 0xff
      sumR += r; sumG += g; sumB += bl
      val lum = 2126L * r + 7152L * g + 722L * bl
      if (lum > maxLum) maxLum = lum
      n += 1; k += 3
    }
    InternalRow(img.w.toLong, img.h.toLong, n, sumR, sumG, sumB, maxLum)
  }

  /** The 56-bit perceptual difference hash over a decoded image — the
    * [[ImageDHashExpr]] grid/bit contract (8×8 BT.709 luminances
    * point-sampled at cell centers, bit = horizontal order). */
  def dhash(img: Rgb): Long = {
    val lum = new Array[Long](64)
    var r = 0
    while (r < 8) {
      val y = (2 * r + 1) * img.h / 16
      var c = 0
      while (c < 8) {
        val x = (2 * c + 1) * img.w / 16
        val i = 3 * (y * img.w + x)
        lum(r * 8 + c) = 2126L * (img.px(i) & 0xff) +
          7152L * (img.px(i + 1) & 0xff) + 722L * (img.px(i + 2) & 0xff)
        c += 1
      }
      r += 1
    }
    var hash = 0L
    var bit = 0
    r = 0
    while (r < 8) {
      var c = 0
      while (c < 7) {
        if (lum(r * 8 + c + 1) > lum(r * 8 + c)) hash |= (1L << bit)
        bit += 1; c += 1
      }
      r += 1
    }
    hash
  }
}
