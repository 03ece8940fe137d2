package graft.functions

import org.apache.spark.sql.catalyst.InternalRow

/** Container-agnostic pixel decode — the single RGB entry point the
  * image expressions share, so perceptual hashing and pixel features
  * work on whatever a real crawl actually contains instead of one
  * format each. All pure JVM, from the published specs: BMP
  * (uncompressed 24bpp), PNG (RFC 2083 — CRC-verified chunks, JDK
  * inflate, all five scanline filters, every legal depth 1/2/4/8/16 ×
  * color type gray / RGB / palette / gray+alpha / RGBA, sequential or
  * Adam7 interlaced), GIF (variable-width LZW,
  * global or local palette, sequential or interlaced), JPEG
  * ([[JpegCodec]] — Huffman + dequant + IDCT + YCbCr, sequential AND
  * progressive, EXIF-orientation normalized), BOTH WebP flavors
  * ([[WebpCodec]] — full VP8L lossless: all four transforms, color
  * cache, LZ77, meta-Huffman; and lossy VP8 keyframes through the
  * RFC 6386 decoder in [[Vp8Codec]], bit-exact with libwebp), and
  * baseline TIFF ([[TiffCodec]] — both byte orders, gray/RGB/palette,
  * strips, uncompressed + PackBits, ImageIO-cross-conformant).
  * Every decoder returns null (never throws) on bytes it doesn't own
  * or can't prove whole. */
object PixelDecode {

  /** A decoded image: packed RGB bytes, 3·w·h, row-major TOP-DOWN. */
  final class Rgb(val w: Int, val h: Int, val px: Array[Byte])

  /** Sniff the container by magic and decode: BMP, PNG, GIF, JPEG,
    * WebP (lossless VP8L or lossy VP8), or baseline TIFF; null for
    * anything else. */
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
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))
      TiffCodec.decode(b)
    else null
  }

  /** Sniffed container name for decode/skip accounting: one of bmp /
    * png / gif / jpeg / webp_lossless / webp_lossy / avif / heic /
    * tiff / null (unknown). The sniffable-but-undecodable classes
    * (AVIF, HEIC — and truncated/partial payloads of any flavor)
    * exist so ingest reports COUNT them and the coverage gap is
    * data, not silence. */
  def container(b: Array[Byte]): String = {
    if (b == null || b.length < 8) return null
    if (b(0) == 'B' && b(1) == 'M') "bmp"
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') "png"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      WebpCodec.riffKind(b)
    else if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')
      ftypKind(b)
    else if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) "tiff"
    else null
  }

  /** ISO-BMFF `ftyp` brand classification (AVIF vs HEIF stills): scan
    * the major brand then every compatible brand; "avif"/"avis" wins
    * over the HEIC family wherever it appears (AVIF files commonly
    * carry major "avif" with compatible "mif1"). */
  private def ftypKind(b: Array[Byte]): String = {
    val size = be4(b, 0)
    if (size < 16 || size > b.length || (size & 3) != 0) return null
    var sawHeic = false
    var i = 8
    while (i + 4 <= size) {
      if (i != 12) { // byte 12 is the minor version, not a brand
        val brand = new String(b, i, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        brand match {
          case "avif" | "avis" => return "avif"
          case "heic" | "heix" | "heim" | "heis" | "hevc" | "hevx" |
               "mif1" | "msf1" => sawHeic = true
          case _ => ()
        }
      }
      i += 4
    }
    if (sawHeic) "heic" else null
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

  /** Adam7 pass geometry: (xStart, yStart, xStep, yStep) per pass. */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** PNG at every legal static depth (1/2/4/8/16 per color type) and
    * color type (gray / RGB / palette / gray+alpha / RGBA — alpha
    * dropped, palette resolved, sub-byte samples MSB-first, 16-bit
    * samples taken at their high byte), sequential or Adam7
    * INTERLACED: CRC-verified chunk walk, multi-IDAT inflate, per-row
    * un-filtering within each pass (RFC 2083 §6.3-6.6, §8.5.2). */
  def decodePng(b: Array[Byte]): Rgb = {
    if (b.length < 8 + 25 || !java.util.Arrays.equals(
        java.util.Arrays.copyOf(b, 8), PngSig)) return null
    var i = 8
    var w = -1; var h = -1
    var color = -1; var depth = -1; var interlace = -1
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
          depth = b(i + 16) & 0xff
          color = b(i + 17) & 0xff
          interlace = b(i + 20) & 0xff
          // the spec's legal (color, depth) matrix, both interlace
          // methods (PNG 1.2 table 11.1)
          val depthOk = color match {
            case 0 => depth == 1 || depth == 2 || depth == 4 ||
              depth == 8 || depth == 16
            case 2 | 4 | 6 => depth == 8 || depth == 16
            case 3 => depth == 1 || depth == 2 || depth == 4 || depth == 8
            case _ => false
          }
          if (!depthOk || interlace > 1) return null
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
    val channels = color match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    // filter "left" distance is one pixel, min one byte (spec §6.2)
    val bpp = math.max(1, channels * depth / 8)
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    def passDim(full: Int, start: Int, step: Int): Int =
      if (full > start) (full - start + step - 1) / step else 0
    def scanBytes(pw: Int): Int = (channels * depth * pw + 7) / 8
    var total = 0L
    passes.foreach { case (xs, ys, xstep, ystep) =>
      val pw = passDim(w, xs, xstep); val ph = passDim(h, ys, ystep)
      if (pw > 0 && ph > 0) total += ph.toLong * (1 + scanBytes(pw))
    }
    if (total > (256L << 20)) return null // decode-bomb cap on raw bytes
    val raw = new Array[Byte](total.toInt)
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
    // gray expansion to 8 bits: max-value replication (85·v for 2-bit,
    // 17·v for 4-bit, 255·v for 1-bit); 16-bit keeps the high byte
    val gscale = depth match {
      case 1 => 255; case 2 => 85; case 4 => 17; case _ => 1
    }
    // sample s (row-local) from an unfiltered scanline
    def sampleAt(line: Array[Byte], s: Int): Int = depth match {
      case 8 => line(s) & 0xff
      case 16 => line(2 * s) & 0xff // high byte
      case d => (line(s * d / 8) >> (8 - d - (s * d & 7))) & ((1 << d) - 1)
    }
    val px = new Array[Byte](3 * w * h)
    var rawAt = 0
    var ok = true
    passes.foreach { case (xs, ys, xstep, ystep) =>
      val pw = passDim(w, xs, xstep); val ph = passDim(h, ys, ystep)
      if (ok && pw > 0 && ph > 0) {
        val sb = scanBytes(pw)
        var prev = new Array[Byte](sb)
        var cur = new Array[Byte](sb)
        var row = 0
        while (ok && row < ph) {
          val ft = raw(rawAt) & 0xff; rawAt += 1
          if (ft > 4) ok = false
          else {
            var x = 0
            while (x < sb) {
              val c = raw(rawAt + x) & 0xff
              val left = if (x >= bpp) cur(x - bpp) & 0xff else 0
              val up = if (row > 0) prev(x) & 0xff else 0
              val ul = if (x >= bpp && row > 0) prev(x - bpp) & 0xff else 0
              val v = ft match {
                case 0 => c
                case 1 => c + left
                case 2 => c + up
                case 3 => c + ((left + up) >> 1)
                case 4 =>
                  val p = left + up - ul
                  val pa = math.abs(p - left); val pb = math.abs(p - up)
                  val pc = math.abs(p - ul)
                  c + (if (pa <= pb && pa <= pc) left
                       else if (pb <= pc) up else ul)
              }
              cur(x) = (v & 0xff).toByte
              x += 1
            }
            rawAt += sb
            val y = ys + row * ystep
            var col = 0
            while (ok && col < pw) {
              val at = 3 * (y * w + (xs + col * xstep))
              color match {
                case 0 =>
                  val g = (sampleAt(cur, col) * gscale).toByte
                  px(at) = g; px(at + 1) = g; px(at + 2) = g
                case 2 =>
                  px(at) = sampleAt(cur, 3 * col).toByte
                  px(at + 1) = sampleAt(cur, 3 * col + 1).toByte
                  px(at + 2) = sampleAt(cur, 3 * col + 2).toByte
                case 3 =>
                  val idx = sampleAt(cur, col)
                  if (3 * idx + 2 >= palLen) ok = false
                  else {
                    px(at) = b(palAt + 3 * idx)
                    px(at + 1) = b(palAt + 3 * idx + 1)
                    px(at + 2) = b(palAt + 3 * idx + 2)
                  }
                case 4 =>
                  val g = (sampleAt(cur, 2 * col) * gscale).toByte // alpha dropped
                  px(at) = g; px(at + 1) = g; px(at + 2) = g
                case 6 =>
                  px(at) = sampleAt(cur, 4 * col).toByte
                  px(at + 1) = sampleAt(cur, 4 * col + 1).toByte
                  px(at + 2) = sampleAt(cur, 4 * col + 2).toByte // alpha dropped
              }
              col += 1
            }
            val t = prev; prev = cur; cur = t
            row += 1
          }
        }
      }
    }
    if (!ok) return null
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
