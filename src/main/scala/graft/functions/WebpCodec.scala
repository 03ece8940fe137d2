package graft.functions

/** WebP codec, pure JVM from the published container and bitstream
  * specifications (RIFF container; "WebP Lossless Bitstream
  * Specification"; RFC 6386 for lossy VP8 via [[Vp8Codec]]). The VP8L
  * decoder covers the full lossless surface: all four transforms
  * (predictor with its 14 modes, cross-color, subtract-green,
  * color-indexing with sub-byte pixel packing), color cache, LZ77
  * backward references with the 120-entry 2D distance map,
  * meta-Huffman entropy images, and both simple and code-length-coded
  * Huffman code representations. Lossy "VP8 " chunks decode through
  * the RFC 6386 keyframe decoder, so BOTH WebP flavors now reach the
  * pixel surface; [[riffKind]] still classifies the flavor for the
  * per-container ingest accounting.
  *
  * The encoder emits a deliberately simple but fully valid stream (no
  * transforms, literal-coded pixels, per-channel canonical codes:
  * complete 256×length-8 codes for varying channels, single-symbol
  * simple codes for constant ones) — real Huffman structure on the
  * wire, byte-exact round trips for the oracle fixtures.
  *
  * Like the sibling decoders ([[PixelDecode]], [[JpegCodec]]): never
  * throws, returns null on bytes it does not own or cannot prove
  * whole; every allocation is pre-validated against [[MaxPixels]]. */
object WebpCodec {

  /** Same decode-bomb cap as [[JpegCodec.MaxPixels]]. */
  private val MaxPixels = 16 << 20

  private final class Err extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Err

  // ------------------------------------------------------------ container

  private def le4(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def fourCc(b: Array[Byte], i: Int, cc: String): Boolean =
    b(i) == cc.charAt(0) && b(i + 1) == cc.charAt(1) &&
      b(i + 2) == cc.charAt(2) && b(i + 3) == cc.charAt(3)

  /** Is this a RIFF/WEBP container at all? */
  def isWebp(b: Array[Byte]): Boolean =
    b != null && b.length >= 16 && fourCc(b, 0, "RIFF") && fourCc(b, 8, "WEBP")

  /** Classify the WebP flavor without decoding: "webp_lossless"
    * (VP8L), "webp_lossy" (VP8), or null for non-WebP / unwalkable
    * containers. VP8X extended containers are walked to their first
    * image chunk, including into the first ANMF frame of an
    * animation. */
  def riffKind(b: Array[Byte]): String = {
    if (!isWebp(b)) return null
    var i = 12
    while (i + 8 <= b.length) {
      val size = le4(b, i + 4)
      if (size < 0 || i + 8 + size > b.length) return null
      if (fourCc(b, i, "VP8L")) return "webp_lossless"
      if (fourCc(b, i, "VP8 ")) return "webp_lossy"
      if (fourCc(b, i, "ANMF") && size >= 16) {
        var j = i + 8 + 16
        val until = i + 8 + size.toInt
        while (j + 8 <= until) {
          val ssz = le4(b, j + 4)
          if (ssz < 0 || j + 8 + ssz > until) return null
          if (fourCc(b, j, "VP8L")) return "webp_lossless"
          if (fourCc(b, j, "VP8 ")) return "webp_lossy"
          j += 8 + ssz.toInt + (ssz.toInt & 1)
        }
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are 2-byte aligned
    }
    null
  }

  /** Decode a WebP payload to RGB: VP8L (lossless) via [[decodeVp8l]],
    * VP8 (lossy keyframe) via [[Vp8Codec]]; animated containers
    * (VP8X + ANIM/ANMF) decode their FIRST frame — the right identity
    * for dedup, matching the GIF first-frame stance; a VP8X EXIF
    * chunk's orientation is normalized exactly like JPEG APP1 (the
    * raster is rotated upright before hashing). Null unless the
    * container carries a whole, valid stream. */
  def decode(b: Array[Byte]): PixelDecode.Rgb = {
    if (!isWebp(b)) return null
    var img: PixelDecode.Rgb = null
    var orientation = 1
    var i = 12
    while (i + 8 <= b.length) {
      val size = le4(b, i + 4)
      if (size < 0 || i + 8 + size > b.length)
        return if (img != null) JpegCodec.orient(img, orientation) else null
      val from = i + 8
      val until = i + 8 + size.toInt
      if (img == null && fourCc(b, i, "VP8L"))
        img = decodeVp8l(b, from, until)
      else if (img == null && fourCc(b, i, "VP8 "))
        img = Vp8Codec.decode(b, from, until)
      else if (img == null && fourCc(b, i, "ANMF") && size >= 16) {
        // first animation frame: 16 bytes of frame params, then the
        // frame's own ALPH?/VP8/VP8L subchunks
        var j = from + 16
        while (img == null && j + 8 <= until) {
          val ssz = le4(b, j + 4)
          if (ssz < 0 || j + 8 + ssz > until) return null
          if (fourCc(b, j, "VP8L"))
            img = decodeVp8l(b, j + 8, j + 8 + ssz.toInt)
          else if (fourCc(b, j, "VP8 "))
            img = Vp8Codec.decode(b, j + 8, j + 8 + ssz.toInt)
          j += 8 + ssz.toInt + (ssz.toInt & 1)
        }
      } else if (fourCc(b, i, "EXIF") && size >= 8) {
        // payload is EXIF metadata, with or without the "Exif\0\0"
        // prefix depending on the muxer
        val tAt =
          if (size >= 14 && b(from) == 'E' && b(from + 1) == 'x' &&
            b(from + 2) == 'i' && b(from + 3) == 'f' &&
            b(from + 4) == 0 && b(from + 5) == 0) from + 6
          else from
        orientation = JpegCodec.exifOrientationTiff(b, tAt,
          until - tAt, orientation)
      }
      i += 8 + size.toInt + (size.toInt & 1)
    }
    if (img != null) JpegCodec.orient(img, orientation) else null
  }

  // --------------------------------------------------------- bit reading

  /** LSB-first bit reader over b[from, until) — the VP8L convention
    * (first bit read is the LSB of a multi-bit value). */
  private final class Br(b: Array[Byte], from: Int, until: Int) {
    private var pos = from
    private var buf = 0L
    private var cnt = 0
    def read(n: Int): Int = {
      while (cnt < n) {
        if (pos >= until) fail()
        buf |= (b(pos) & 0xffL) << cnt
        cnt += 8; pos += 1
      }
      val v = (buf & ((1L << n) - 1)).toInt
      buf >>>= n; cnt -= n
      v
    }
    def readBit(): Int = read(1)
  }

  // ------------------------------------------------------ canonical codes

  /** A prefix code. Simple codes (1-2 stream-ordered symbols) bypass
    * the canonical assignment; canonical codes are DEFLATE-style
    * (codes assigned by increasing length then symbol order, read
    * MSB-of-code-first from the LSB-first stream). */
  private final class Huff private (
      simple: Array[Int], // null unless a simple code
      firstCode: Array[Int], offset: Array[Int], counts: Array[Int],
      sorted: Array[Int], single: Int) {
    def decode(br: Br): Int = {
      if (single >= 0) return single
      if (simple != null)
        return if (simple.length == 1) simple(0) else simple(br.readBit())
      var acc = 0
      var len = 0
      while (len < 15) {
        acc = (acc << 1) | br.readBit()
        len += 1
        if (counts(len) > 0) {
          val d = acc - firstCode(len)
          if (d >= 0 && d < counts(len)) return sorted(offset(len) + d)
        }
      }
      fail()
    }
  }

  private object Huff {
    def simple(syms: Array[Int]): Huff =
      new Huff(syms, null, null, null, null, -1)

    /** Build from code lengths; fails unless the code is complete
      * (Kraft equality) — single-used-symbol codes are the allowed
      * 0-bit exception. */
    def fromLengths(lengths: Array[Int]): Huff = {
      val counts = new Array[Int](16)
      var used = 0
      var lastSym = -1
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l < 0 || l > 15) fail()
        if (l > 0) { counts(l) += 1; used += 1; lastSym = i }
        i += 1
      }
      if (used == 0) fail()
      if (used == 1) return new Huff(null, null, null, null, null, lastSym)
      // completeness: sum over lengths of 2^(15-len) must be exactly 2^15
      var kraft = 0L
      var l = 1
      while (l <= 15) { kraft += counts(l).toLong << (15 - l); l += 1 }
      if (kraft != (1L << 15)) fail()
      // canonical assignment: first code of length l = (first(l-1) +
      // count(l-1)) << 1, symbols of equal length in symbol order
      val firstCode = new Array[Int](16)
      val offset = new Array[Int](16)
      var code = 0
      var off = 0
      var prev = 0
      l = 1
      while (l <= 15) {
        code = (code + prev) << 1
        firstCode(l) = code
        offset(l) = off
        prev = counts(l)
        off += counts(l)
        l += 1
      }
      val sorted = new Array[Int](used)
      val at = offset.clone()
      i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { sorted(at(lengths(i))) = i; at(lengths(i)) += 1 }
        i += 1
      }
      new Huff(null, firstCode, offset, counts, sorted, -1)
    }
  }

  /** Code-length alphabet order (spec kCodeLengthCodeOrder). */
  private[functions] val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  /** Read one prefix code for an `alphabetSize` alphabet. */
  private def readCode(alphabetSize: Int, br: Br): Huff = {
    if (br.readBit() == 1) { // simple representation
      val numSym = br.readBit() + 1
      val first8 = br.readBit()
      val s0 = br.read(if (first8 == 1) 8 else 1)
      val syms =
        if (numSym == 2) Array(s0, br.read(8)) else Array(s0)
      if (syms.exists(_ >= alphabetSize)) fail()
      Huff.simple(syms)
    } else {
      val numCl = 4 + br.read(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.read(3); i += 1 }
      val clCode = Huff.fromLengths(clLens)
      var maxSymbol =
        if (br.readBit() == 1) {
          val lenNBits = 2 + 2 * br.read(3)
          2 + br.read(lenNBits)
        } else alphabetSize
      val lengths = new Array[Int](alphabetSize)
      var sym = 0
      var prevLen = 8 // spec default
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.decode(br)
        if (cl < 16) {
          lengths(sym) = cl; sym += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repLen, rep) = cl match {
            case 16 => (prevLen, 3 + br.read(2))
            case 17 => (0, 3 + br.read(3))
            case 18 => (0, 11 + br.read(7))
            case _ => fail()
          }
          if (sym + rep > alphabetSize) fail()
          var k = 0
          while (k < rep) { lengths(sym) = repLen; sym += 1; k += 1 }
        }
      }
      Huff.fromLengths(lengths)
    }
  }

  // --------------------------------------------------- LZ77 prefix coding

  private def lz77Value(sym: Int, br: Br): Int = {
    if (sym < 4) return sym + 1
    val extra = (sym - 2) >> 1
    if (extra > 24) fail()
    val offset = (2 + (sym & 1)) << extra
    offset + br.read(extra) + 1
  }

  /** The 120-entry 2D distance map: codes 1..120 name near neighbors
    * (dx to the LEFT, dy up), ordered by squared distance, then larger
    * dy first, then positive dx first — the ordering that reproduces
    * the spec's code↔(dx, dy) listing. Domain: dy 0..7 with dx -7..8,
    * dx ≥ 1 on the dy = 0 row. */
  private val PlaneCodes: Array[Int] = { // packed (dy << 8) | (dx + 64)
    val entries =
      for { y <- 0 to 7; dx <- -7 to 8; if !(y == 0 && dx <= 0) }
        yield (dx, y)
    entries.sortBy { case (dx, y) => (dx * dx + y * y, -y, -dx) }
      .map { case (dx, y) => (y << 8) | (dx + 64) }.toArray
  }

  private def planeDist(code: Int, xsize: Int): Int = {
    val p = PlaneCodes(code - 1)
    val dy = p >> 8
    val dx = (p & 0xff) - 64
    math.max(dy * xsize + dx, 1)
  }

  // ----------------------------------------------------- image stream

  private def subSize(n: Int, bits: Int): Int = (n + (1 << bits) - 1) >> bits

  private final case class Transform(ttype: Int, bits: Int,
                                     data: Array[Int], dataW: Int,
                                     origW: Int)

  /** One huffman group: green(+len+cache) / red / blue / alpha / dist. */
  private final class Group(val green: Huff, val red: Huff, val blue: Huff,
                            val alpha: Huff, val dist: Huff)

  private def readGroup(cacheSize: Int, br: Br): Group =
    new Group(
      readCode(256 + 24 + cacheSize, br),
      readCode(256, br), readCode(256, br), readCode(256, br),
      readCode(40, br))

  private val HashMul = 0x1e35a7bd

  /** Decode one image stream (spec DecodeImageStream): transforms and
    * meta-huffman only at level 0. Returns (pixels ARGB, width) — the
    * width can shrink under color-indexing packing. */
  private def imageStream(w0: Int, h: Int, level0: Boolean,
                          br: Br): (Array[Int], Int) = {
    var w = w0
    var transforms = List.empty[Transform]
    if (level0) {
      var seen = 0
      while (br.readBit() == 1) {
        val t = br.read(2)
        if ((seen & (1 << t)) != 0) fail() // each transform at most once
        seen |= 1 << t
        t match {
          case 0 | 1 => // predictor / cross-color: block sub-image
            val bits = br.read(3) + 2
            val (data, dw) =
              imageStream(subSize(w, bits), subSize(h, bits), false, br)
            transforms ::= Transform(t, bits, data, dw, w)
          case 2 => // subtract green
            transforms ::= Transform(2, 0, null, 0, w)
          case 3 => // color indexing
            val n = br.read(8) + 1
            val (raw, _) = imageStream(n, 1, false, br)
            // palette entries are component-wise deltas off the previous
            val pal = new Array[Int](n)
            var prev = 0
            var i = 0
            while (i < n) {
              val d = raw(i)
              val a = ((prev >>> 24) + (d >>> 24)) & 0xff
              val r = (((prev >> 16) & 0xff) + ((d >> 16) & 0xff)) & 0xff
              val g = (((prev >> 8) & 0xff) + ((d >> 8) & 0xff)) & 0xff
              val b = ((prev & 0xff) + (d & 0xff)) & 0xff
              prev = (a << 24) | (r << 16) | (g << 8) | b
              pal(i) = prev
              i += 1
            }
            val widthBits =
              if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
            transforms ::= Transform(3, widthBits, pal, n, w)
            w = subSize(w, widthBits)
          case _ => fail()
        }
      }
    }
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) fail()

    val cacheBits = if (br.readBit() == 1) br.read(4) else 0
    if (cacheBits > 11) fail()
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0

    var metaBits = 0
    var meta: Array[Int] = null
    var metaW = 0
    var numGroups = 1
    if (level0 && br.readBit() == 1) {
      metaBits = br.read(3) + 2
      metaW = subSize(w, metaBits)
      val (mpx, _) = imageStream(metaW, subSize(h, metaBits), false, br)
      meta = mpx
      var i = 0
      while (i < mpx.length) {
        val idx = (mpx(i) >> 8) & 0xffff // (red << 8) | green
        if (idx + 1 > numGroups) numGroups = idx + 1
        i += 1
      }
      if (numGroups > 0x10000) fail()
    }
    val groups = new Array[Group](numGroups)
    var gi = 0
    while (gi < numGroups) { groups(gi) = readGroup(cacheSize, br); gi += 1 }

    // ---- pixel data ----
    val n = w * h
    val px = new Array[Int](n)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    @inline def insert(p: Int): Unit =
      if (cache != null) cache((HashMul * p) >>> (32 - cacheBits)) = p
    var pos = 0
    var x = 0
    while (pos < n) {
      val g =
        if (meta == null) groups(0)
        else {
          val y = pos / w
          val idx = (meta((y >> metaBits) * metaW + (x >> metaBits)) >> 8) & 0xffff
          groups(idx)
        }
      val s = g.green.decode(br)
      if (s < 256) { // literal: green, red, blue, alpha in stream order
        val r = g.red.decode(br)
        val b = g.blue.decode(br)
        val a = g.alpha.decode(br)
        val p = (a << 24) | (r << 16) | (s << 8) | b
        px(pos) = p; insert(p)
        pos += 1; x += 1; if (x == w) x = 0
      } else if (s < 256 + 24) { // backward reference
        val length = lz77Value(s - 256, br)
        val distCode = lz77Value(g.dist.decode(br), br)
        val dist0 =
          if (distCode > 120) distCode - 120 else planeDist(distCode, w)
        val dist = math.max(dist0, 1)
        if (dist > pos || pos + length > n) fail()
        var k = 0
        while (k < length) {
          val p = px(pos - dist)
          px(pos) = p; insert(p)
          pos += 1; k += 1
        }
        x = pos % w
      } else { // color cache reference
        val idx = s - 256 - 24
        if (cache == null || idx >= cacheSize) fail()
        px(pos) = cache(idx)
        pos += 1; x += 1; if (x == w) x = 0
      }
    }

    // ---- inverse transforms, reverse read order ----
    var outW = w
    var out = px
    transforms.foreach { t =>
      t.ttype match {
        case 2 => invSubtractGreen(out)
        case 0 => invPredictor(out, outW, h, t.bits, t.data, t.dataW)
        case 1 => invColorTransform(out, outW, h, t.bits, t.data, t.dataW)
        case 3 =>
          out = invColorIndex(out, outW, t.origW, h, t.bits, t.data)
          outW = t.origW
      }
    }
    (out, outW)
  }

  // ------------------------------------------------- inverse transforms

  private def invSubtractGreen(px: Array[Int]): Unit = {
    var i = 0
    while (i < px.length) {
      val p = px(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      px(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  @inline private def avg2(a: Int, b: Int): Int = {
    // per-channel (a + b) / 2 without unpacking: mask off carry bits
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)
  }

  @inline private def addPixels(a: Int, b: Int): Int = {
    val ag = (a & 0xff00ff00) >>> 8
    val bg = (b & 0xff00ff00) >>> 8
    val rb = ((a & 0x00ff00ff) + (b & 0x00ff00ff)) & 0x00ff00ff
    val gab = (((ag + bg) & 0x00ff00ff) << 8) & 0xff00ff00.toInt // alpha+green
    rb | gab
  }

  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  private def select(l: Int, t: Int, tl: Int): Int = {
    @inline def ch(p: Int, s: Int): Int = (p >>> s) & 0xff
    var pL = 0; var pT = 0
    var s = 0
    while (s < 32) {
      val p = ch(l, s) + ch(t, s) - ch(tl, s)
      pL += math.abs(p - ch(l, s))
      pT += math.abs(p - ch(t, s))
      s += 8
    }
    if (pL < pT) l else t
  }

  private def clampAddSubFull(l: Int, t: Int, tl: Int): Int = {
    @inline def ch(p: Int, s: Int): Int = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      out |= clamp255(ch(l, s) + ch(t, s) - ch(tl, s)) << s
      s += 8
    }
    out
  }

  private def clampAddSubHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    @inline def ch(p: Int, s: Int): Int = (p >>> s) & 0xff
    var out = 0
    var s = 0
    while (s < 32) {
      val a = ch(ave, s)
      out |= clamp255(a + (a - ch(tl, s)) / 2) << s
      s += 8
    }
    out
  }

  private def invPredictor(px: Array[Int], w: Int, h: Int, bits: Int,
                           block: Array[Int], blockW: Int): Unit = {
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (pos == 0) 0xff000000
          else if (y == 0) px(pos - 1) // row 0: L
          else if (x == 0) px(pos - w) // col 0: T
          else {
            val mode =
              (block((y >> bits) * blockW + (x >> bits)) >> 8) & 0xff
            val l = px(pos - 1)
            val t = px(pos - w)
            val tl = px(pos - w - 1)
            // TR of the rightmost pixel wraps to the current row's
            // first pixel (linear-array semantics, already decoded)
            val tr = px(pos - w + 1)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(l, t, tl)
              case 12 => clampAddSubFull(l, t, tl)
              case 13 => clampAddSubHalf(l, t, tl)
              case _ => fail()
            }
          }
        px(pos) = addPixels(px(pos), pred)
        pos += 1; x += 1
      }
      y += 1
    }
  }

  @inline private def ctDelta(t: Int, c: Int): Int =
    (t.toByte * c.toByte) >> 5

  private def invColorTransform(px: Array[Int], w: Int, h: Int, bits: Int,
                                block: Array[Int], blockW: Int): Unit = {
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = block((y >> bits) * blockW + (x >> bits))
        val g2r = cte & 0xff          // blue channel of the element
        val g2b = (cte >> 8) & 0xff   // green channel
        val r2b = (cte >> 16) & 0xff  // red channel
        val p = px(pos)
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) + ctDelta(g2r, g)) & 0xff
        val b = ((p & 0xff) + ctDelta(g2b, g) + ctDelta(r2b, r)) & 0xff
        px(pos) = (p & 0xff00ff00) | (r << 16) | b
        pos += 1; x += 1
      }
      y += 1
    }
  }

  private def invColorIndex(px: Array[Int], packedW: Int, origW: Int,
                            h: Int, widthBits: Int,
                            pal: Array[Int]): Array[Int] = {
    if (widthBits == 0) {
      var i = 0
      while (i < px.length) {
        val idx = (px(i) >> 8) & 0xff
        px(i) = if (idx < pal.length) pal(idx) else 0
        i += 1
      }
      return px
    }
    val bpp = 8 >> widthBits // bits per packed index
    val mask = (1 << bpp) - 1
    val perByte = 1 << widthBits
    if (origW.toLong * h > MaxPixels) fail()
    val out = new Array[Int](origW * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < origW) {
        val g = (px(y * packedW + (x >> widthBits)) >> 8) & 0xff
        val idx = (g >> ((x & (perByte - 1)) * bpp)) & mask
        out(y * origW + x) = if (idx < pal.length) pal(idx) else 0
        x += 1
      }
      y += 1
    }
    out
  }

  // ------------------------------------------------------------ decode

  private def decodeVp8l(b: Array[Byte], from: Int,
                         until: Int): PixelDecode.Rgb = {
    try {
      if (until - from < 5 || (b(from) & 0xff) != 0x2f) return null
      val br = new Br(b, from + 1, until)
      val w = br.read(14) + 1
      val h = br.read(14) + 1
      br.readBit() // alpha hint
      if (br.read(3) != 0) return null // version must be 0
      if (w.toLong * h > MaxPixels) return null
      val (argb, outW) = imageStream(w, h, level0 = true, br)
      if (outW != w || argb.length != w * h) return null
      val px = new Array[Byte](3 * w * h)
      var i = 0
      while (i < w * h) {
        val p = argb(i)
        px(3 * i) = ((p >> 16) & 0xff).toByte
        px(3 * i + 1) = ((p >> 8) & 0xff).toByte
        px(3 * i + 2) = (p & 0xff).toByte
        i += 1
      }
      new PixelDecode.Rgb(w, h, px)
    } catch {
      case _: Err | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException => null
    }
  }

  // ------------------------------------------------------------ encoder

  /** LSB-first bit writer (the VP8L write convention). */
  private[functions] final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0L
    private var cnt = 0
    def write(n: Int, v: Int): Unit = {
      buf |= (v.toLong & ((1L << n) - 1)) << cnt
      cnt += n
      while (cnt >= 8) {
        out.write((buf & 0xff).toInt); buf >>>= 8; cnt -= 8
      }
    }
    /** Emit a canonical code MSB-first (how prefix codes ride the
      * LSB-first stream). */
    def writeCode(len: Int, code: Int): Unit = {
      var i = len - 1
      while (i >= 0) { write(1, (code >> i) & 1); i -= 1 }
    }
    def bytes(): Array[Byte] = {
      if (cnt > 0) { out.write((buf & 0xff).toInt); buf = 0; cnt = 0 }
      out.toByteArray
    }
  }

  /** Write a complete all-256-symbols-at-length-8 code (canonical ⇒
    * code(s) = s on 8 bits) in the code-length-coded representation.
    * For the green alphabet (> 256) the 24 length-code tail symbols
    * get explicit zeros via repeat-code 18 — max_symbol can't bound
    * this (it counts code-length SYMBOLS read, not lengths filled). */
  private[functions] def writeAll8Code(bw: Bw, alphabetSize: Int): Unit = {
    require(alphabetSize == 256 || alphabetSize == 280)
    bw.write(1, 0) // not simple
    bw.write(4, 15) // num_code_lengths = 19 (covers symbols 16 and 18)
    // code-length code {8: len 1, 16: len 2, 18: len 2} — complete;
    // canonical: "8" → 0, "16" → 10, "18" → 11
    val clLens = new Array[Int](19)
    clLens(8) = 1; clLens(16) = 2; clLens(18) = 2
    var i = 0
    while (i < 19) { bw.write(3, clLens(ClOrder(i))); i += 1 }
    bw.write(1, 0) // no max_symbol shortcut
    // "8" once, then repeat-previous(16): 42×6 + 1×3 = 255 more
    bw.writeCode(1, 0)
    var k = 0
    while (k < 42) { bw.writeCode(2, 2); bw.write(2, 3); k += 1 } // 3+3=6
    bw.writeCode(2, 2); bw.write(2, 0) // 3+0=3
    if (alphabetSize == 280) { // 24 explicit zeros: 18 with 11+13
      bw.writeCode(2, 3); bw.write(7, 13)
    }
  }

  private[functions] def writeSingleSymbolCode(bw: Bw, sym: Int): Unit = {
    bw.write(1, 1) // simple
    bw.write(1, 0) // one symbol
    bw.write(1, 1) // 8-bit form
    bw.write(8, sym)
  }

  /** Encode an ARGB image as a fully valid VP8L stream: no transforms,
    * no cache, no LZ77 — literal pixels under complete length-8 codes
    * (constant channels get single-symbol simple codes). */
  def encodeArgb(w: Int, h: Int, argb: Array[Int]): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384 &&
      argb.length == w * h, "bad encode dims")
    val bw = new Bw
    bw.write(8, 0x2f)
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, 0) // no alpha hint
    bw.write(3, 0) // version
    bw.write(1, 0) // no transforms
    bw.write(1, 0) // no color cache
    bw.write(1, 0) // no meta-huffman
    // constant-channel detection for the compact simple-code path
    def constOf(shift: Int): Int = {
      val v = (argb(0) >>> shift) & 0xff
      var i = 1
      while (i < argb.length) {
        if (((argb(i) >>> shift) & 0xff) != v) return -1
        i += 1
      }
      v
    }
    val constG = constOf(8); val constR = constOf(16)
    val constB = constOf(0); val constA = constOf(24)
    if (constG >= 0) writeSingleSymbolCode(bw, constG)
    else writeAll8Code(bw, 256 + 24)
    if (constR >= 0) writeSingleSymbolCode(bw, constR)
    else writeAll8Code(bw, 256)
    if (constB >= 0) writeSingleSymbolCode(bw, constB)
    else writeAll8Code(bw, 256)
    if (constA >= 0) writeSingleSymbolCode(bw, constA)
    else writeAll8Code(bw, 256)
    writeSingleSymbolCode(bw, 0) // distance code, never referenced
    var i = 0
    while (i < argb.length) {
      val p = argb(i)
      if (constG < 0) bw.writeCode(8, (p >> 8) & 0xff)
      if (constR < 0) bw.writeCode(8, (p >> 16) & 0xff)
      if (constB < 0) bw.writeCode(8, p & 0xff)
      if (constA < 0) bw.writeCode(8, (p >>> 24) & 0xff)
      i += 1
    }
    wrapRiff(bw.bytes())
  }

  /** Gray convenience for the scene fixtures. */
  def encodeGray(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    val argb = new Array[Int](w * h)
    var i = 0
    while (i < argb.length) {
      val v = gray(i) & 0xff
      argb(i) = 0xff000000 | (v << 16) | (v << 8) | v
      i += 1
    }
    encodeArgb(w, h, argb)
  }

  private[functions] def wrapRiff(vp8l: Array[Byte]): Array[Byte] = {
    val pad = vp8l.length & 1
    val out = new Array[Byte](12 + 8 + vp8l.length + pad)
    def put4(i: Int, s: String): Unit = {
      out(i) = s.charAt(0).toByte; out(i + 1) = s.charAt(1).toByte
      out(i + 2) = s.charAt(2).toByte; out(i + 3) = s.charAt(3).toByte
    }
    def putLe4(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    put4(0, "RIFF")
    putLe4(4, 4 + 8 + vp8l.length + pad)
    put4(8, "WEBP")
    put4(12, "VP8L")
    putLe4(16, vp8l.length)
    System.arraycopy(vp8l, 0, out, 20, vp8l.length)
    out
  }

  /** A minimal lossy-WebP STUB (a "VP8 " chunk with a plausible frame
    * header) for the skip-counting fixtures — sniffs as webp_lossy,
    * never decodes. */
  def lossyStub(w: Int, h: Int): Array[Byte] = {
    val payload = new Array[Byte](10)
    // VP8 key-frame tag: frame_type=0 (key), version 0, show_frame 1
    payload(0) = 0x10
    payload(1) = 0; payload(2) = 0
    payload(3) = 0x9d.toByte; payload(4) = 0x01; payload(5) = 0x2a // sync
    payload(6) = (w & 0xff).toByte; payload(7) = ((w >> 8) & 0x3f).toByte
    payload(8) = (h & 0xff).toByte; payload(9) = ((h >> 8) & 0x3f).toByte
    val out = new Array[Byte](12 + 8 + 10)
    def put4(i: Int, s: String): Unit = {
      out(i) = s.charAt(0).toByte; out(i + 1) = s.charAt(1).toByte
      out(i + 2) = s.charAt(2).toByte; out(i + 3) = s.charAt(3).toByte
    }
    def putLe4(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    put4(0, "RIFF"); putLe4(4, 4 + 8 + 10); put4(8, "WEBP")
    put4(12, "VP8 "); putLe4(16, 10)
    System.arraycopy(payload, 0, out, 20, 10)
    out
  }
}
