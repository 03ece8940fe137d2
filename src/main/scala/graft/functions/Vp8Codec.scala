package graft.functions

/** VP8 intra-frame (keyframe) codec — the lossy half of WebP — pure
  * JVM from RFC 6386 (the published VP8 data format and decoding
  * guide). A WebP lossy file is exactly one VP8 keyframe, so a
  * keyframe decoder IS the complete lossy-WebP pixel decode: boolean
  * arithmetic decoder (§7), keyframe header (§9), macroblock intra
  * modes with the keyframe probability tables (§11), DCT/WHT token
  * decode with per-band context tracking (§13), dequantization
  * (§14.1), the exact integer inverse WHT/DCT (§14.3-14.4), all 4
  * whole-block and 10 subblock intra predictors (§12), and the normal
  * + simple in-loop deblocking filters (§15). Constant tables live in
  * [[Vp8Tables]].
  *
  * Decoding is bit-exact through the reconstructed Y/U/V planes (the
  * normative output): `Vp8ConformanceSpec` verifies plane-exact
  * agreement with the system libwebp's decoder on libwebp-encoded
  * streams across content, sizes and quality settings, and that
  * libwebp decodes THIS encoder's output to the planes this decoder
  * produces. RGB conversion is the same full-range BT.601 integer
  * arithmetic the sibling [[JpegCodec]] uses (the YUV→RGB step is
  * deliberately implementation-defined in WebP; libwebp's own RGB
  * output differs by its fancy upsampler, so conformance is gated in
  * the YUV domain).
  *
  * The encoder emits a deliberately simple but fully valid keyframe
  * (one partition, no segmentation, filter level 0, 16×16 DC
  * prediction with exact-residual DC-only tokens through the Y2 WHT
  * path) — enough wire structure that every decoder stage runs, and
  * closed-form enough that SQL oracles replay the expected pixels.
  *
  * Like the sibling decoders: never throws on foreign bytes, returns
  * null; all allocations pre-validated against [[MaxPixels]]. */
object Vp8Codec {

  private val MaxPixels = 16 << 20

  private final class Err extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Err

  /** Decoded planes: the normative VP8 output (4:2:0), cropped to the
    * frame size (strides = the cropped widths). */
  final class Planes(val w: Int, val h: Int,
                     val y: Array[Byte], val u: Array[Byte],
                     val v: Array[Byte])

  // ------------------------------------------------------- bool decoder

  /** RFC 6386 §7.3 boolean decoder. Reads past the partition end as
    * zero bytes only up to the value-register slack (encoders flush
    * the full 32-bit register, so a WHOLE stream never needs more) —
    * beyond that the stream is truncated and the decode fails, the
    * same stance libwebp's final-bytes model takes. */
  private[functions] final class Bool(b: Array[Byte], from: Int, until: Int) {
    private var pos = from
    private var range = 255
    private var value = 0
    private var bitCount = 0
    private var virtualBytes = 0
    value = (next() << 8) | next()

    private def next(): Int =
      if (pos < until) { val v = b(pos) & 0xff; pos += 1; v }
      else { virtualBytes += 1; if (virtualBytes > 3) fail(); 0 }

    def bit(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1; range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= next() }
      }
      ret
    }

    /** n-bit unsigned literal, MSB first, each bit at probability 128. */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(128); i += 1 }
      v
    }

    /** Flagged signed value: `flag ? (sign ? -mag : mag) : 0`. */
    def signedFlagged(n: Int): Int =
      if (bit(128) == 0) 0
      else { val m = literal(n); if (bit(128) == 1) -m else m }
  }

  // ------------------------------------------------------------- trees

  // Intra modes (16x16 / chroma): DC=0, V=1, H=2, TM=3, B_PRED=4.
  private[functions] val DC = 0
  private[functions] val V = 1
  private[functions] val H = 2
  private[functions] val TM = 3
  private[functions] val BPRED = 4

  // Subblock modes: B_DC=0 TM=1 VE=2 HE=3 RD=4 VR=5 LD=6 VL=7 HD=8
  // HU=9 — the numbering [[Vp8Tables.KfBModeProb]]'s rows follow (the
  // above/left context indexes that table, so the numeric order is
  // load-bearing; verified behaviorally by the libwebp conformance
  // battery). Trees use leaf values shifted by +1 (so leaf 0 stays
  // negative in the paired-array walk); walkTree subtracts the shift.
  private val KfYModeTree = Array(-(BPRED + 1), 2, 4, 6, -(DC + 1),
    -(V + 1), -(H + 1), -(TM + 1))
  private val KfYModeProb = Array(145, 156, 163, 128)
  private val UvModeTree = Array(-(DC + 1), 2, -(V + 1), 4, -(H + 1),
    -(TM + 1))
  private val KfUvModeProb = Array(142, 114, 183)
  private val BModeTree = Array(
    -1, 2, // B_DC
    -2, 4, // B_TM
    -3, 6, // B_VE
    8, 12,
    -4, 10, // B_HE
    -5, -6, // B_RD, B_VR
    -7, 14, // B_LD
    -8, 16, // B_VL
    -9, -10) // B_HD, B_HU
  private val SegTree = Array(2, 4, -1, -2, -3, -4)

  /** Paired-array tree walk (§8.2); leaves are stored as -(value+1). */
  private def walkTree(br: Bool, t: Array[Int], p: Array[Int],
                       pOff: Int): Int = {
    var i = t(br.bit(p(pOff)))
    while (i > 0) i = t(i + br.bit(p(pOff + (i >> 1))))
    -i - 1
  }

  private val CatProbs: Array[Array[Int]] = Array(
    Array(159), Array(165, 145), Array(173, 148, 140),
    Array(176, 155, 140, 135), Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private val CatBase = Array(5, 7, 11, 19, 35, 67)

  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7,
    11, 14, 15)
  private val Bands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  // ------------------------------------------------------ frame header

  private def clamp127(v: Int): Int =
    if (v < 0) 0 else if (v > 127) 127 else v

  private[functions] final class Header {
    var width = 0
    var height = 0
    var firstPartFrom = 0
    var firstPartUntil = 0
    var segEnabled = false
    var segUpdateMap = false
    var segAbs = false
    val segQ = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    var simpleFilter = false
    var filterLevel = 0
    var sharpness = 0
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    var yacQi = 0
    var ydcDelta = 0
    var y2dcDelta = 0
    var y2acDelta = 0
    var uvdcDelta = 0
    var uvacDelta = 0
    var probSkipFalse = -1 // -1: mb_no_coeff_skip off
    val coeffProbs: Array[Int] = Vp8Tables.CoeffProbs.clone()
    var parts: Array[Int] = null // flattened (from, until) pairs
  }

  /** Parse the uncompressed + compressed keyframe header from the VP8
    * chunk payload b[from, until). */
  private[functions] def parseHeader(b: Array[Byte], from: Int, until: Int)
      : (Header, Bool) = {
    if (until - from < 10 || until > b.length) fail()
    val tag = (b(from) & 0xff) | ((b(from + 1) & 0xff) << 8) |
      ((b(from + 2) & 0xff) << 16)
    val keyFrame = (tag & 1) == 0
    val version = (tag >> 1) & 7
    val firstPartSize = tag >>> 5
    if (!keyFrame || version > 3) fail()
    if ((b(from + 3) & 0xff) != 0x9d || (b(from + 4) & 0xff) != 0x01 ||
      (b(from + 5) & 0xff) != 0x2a) fail()
    val h = new Header
    h.width = ((b(from + 6) & 0xff) | ((b(from + 7) & 0xff) << 8)) & 0x3fff
    h.height = ((b(from + 8) & 0xff) | ((b(from + 9) & 0xff) << 8)) & 0x3fff
    if (h.width <= 0 || h.height <= 0 ||
      h.width.toLong * h.height > MaxPixels) fail()
    h.firstPartFrom = from + 10
    h.firstPartUntil = from + 10 + firstPartSize
    if (h.firstPartUntil > until) fail()
    val br = new Bool(b, h.firstPartFrom, h.firstPartUntil)
    br.literal(1) // color space (0 = YCbCr as specified)
    br.literal(1) // clamping type (we always clamp)
    h.segEnabled = br.literal(1) == 1
    if (h.segEnabled) { // §9.3
      h.segUpdateMap = br.literal(1) == 1
      val updateData = br.literal(1) == 1
      if (updateData) {
        h.segAbs = br.literal(1) == 1
        var i = 0
        while (i < 4) { h.segQ(i) = br.signedFlagged(7); i += 1 }
        i = 0
        while (i < 4) { h.segLf(i) = br.signedFlagged(6); i += 1 }
      }
      if (h.segUpdateMap) {
        var i = 0
        while (i < 3) {
          h.segTreeProbs(i) = if (br.bit(128) == 1) br.literal(8) else 255
          i += 1
        }
      }
    }
    h.simpleFilter = br.literal(1) == 1 // §9.4
    h.filterLevel = br.literal(6)
    h.sharpness = br.literal(3)
    h.lfDeltaEnabled = br.literal(1) == 1
    if (h.lfDeltaEnabled && br.literal(1) == 1) {
      var i = 0
      while (i < 4) { h.refLfDelta(i) = br.signedFlagged(6); i += 1 }
      i = 0
      while (i < 4) { h.modeLfDelta(i) = br.signedFlagged(6); i += 1 }
    }
    val nParts = 1 << br.literal(2) // §9.5
    val sizesAt = h.firstPartUntil
    var off = sizesAt + 3 * (nParts - 1)
    if (off > until) fail()
    h.parts = new Array[Int](2 * nParts)
    var i = 0
    while (i < nParts - 1) {
      val sz = (b(sizesAt + 3 * i) & 0xff) |
        ((b(sizesAt + 3 * i + 1) & 0xff) << 8) |
        ((b(sizesAt + 3 * i + 2) & 0xff) << 16)
      if (off + sz > until) fail()
      h.parts(2 * i) = off
      h.parts(2 * i + 1) = off + sz
      off += sz
      i += 1
    }
    h.parts(2 * nParts - 2) = off
    h.parts(2 * nParts - 1) = until
    h.yacQi = br.literal(7) // §9.6
    h.ydcDelta = br.signedFlagged(4)
    h.y2dcDelta = br.signedFlagged(4)
    h.y2acDelta = br.signedFlagged(4)
    h.uvdcDelta = br.signedFlagged(4)
    h.uvacDelta = br.signedFlagged(4)
    br.literal(1) // refresh entropy probs: keyframe decode unaffected
    var k = 0
    while (k < 1056) { // §13.4
      if (br.bit(Vp8Tables.CoeffUpdateProbs(k)) == 1)
        h.coeffProbs(k) = br.literal(8)
      k += 1
    }
    if (br.literal(1) == 1) h.probSkipFalse = br.literal(8) // §9.10
    (h, br)
  }

  // ----------------------------------------------------- dequantization

  private final class Quant(h: Header, segment: Int) {
    private val qi: Int = clamp127(
      if (!h.segEnabled) h.yacQi
      else if (h.segAbs) h.segQ(segment)
      else h.yacQi + h.segQ(segment))
    val y1dc: Int = Vp8Tables.DcQLookup(clamp127(qi + h.ydcDelta))
    val y1ac: Int = Vp8Tables.AcQLookup(qi)
    val y2dc: Int = Vp8Tables.DcQLookup(clamp127(qi + h.y2dcDelta)) * 2
    val y2ac: Int = {
      val v = Vp8Tables.AcQLookup(clamp127(qi + h.y2acDelta)) * 155 / 100
      if (v < 8) 8 else v
    }
    val uvdc: Int = {
      val i = qi + h.uvdcDelta
      Vp8Tables.DcQLookup(if (i < 0) 0 else if (i > 117) 117 else i)
    }
    val uvac: Int = Vp8Tables.AcQLookup(clamp127(qi + h.uvacDelta))
  }

  // -------------------------------------------------------- transforms

  /** Exact integer inverse DCT (RFC §14.4). All adds/subs wrap at 16
    * bits like the reference decoder's `short` arithmetic — a no-op
    * for legal streams (residuals are bounded far below the wrap
    * point) but it keeps crafted out-of-range coefficients bit-exact
    * with libwebp too. */
  private def idct4x4(in: Array[Int], out: Array[Int]): Unit = {
    @inline def s(v: Int): Int = v.toShort.toInt
    @inline def m1(v: Int): Int = s(v + s((v * 20091) >> 16))
    @inline def m2(v: Int): Int = s((v * 35468) >> 16)
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) { // columns
      val a1 = s(in(i) + in(i + 8))
      val b1 = s(in(i) - in(i + 8))
      val c1 = s(m2(in(i + 4)) - m1(in(i + 12)))
      val d1 = s(m1(in(i + 4)) + m2(in(i + 12)))
      tmp(i) = s(a1 + d1)
      tmp(i + 12) = s(a1 - d1)
      tmp(i + 4) = s(b1 + c1)
      tmp(i + 8) = s(b1 - c1)
      i += 1
    }
    i = 0
    while (i < 4) { // rows
      val o = i * 4
      val dc = s(tmp(o) + 4)
      val a1 = s(dc + tmp(o + 2))
      val b1 = s(dc - tmp(o + 2))
      val c1 = s(m2(tmp(o + 1)) - m1(tmp(o + 3)))
      val d1 = s(m1(tmp(o + 1)) + m2(tmp(o + 3)))
      out(o) = s(a1 + d1) >> 3
      out(o + 3) = s(a1 - d1) >> 3
      out(o + 1) = s(b1 + c1) >> 3
      out(o + 2) = s(b1 - c1) >> 3
      i += 1
    }
  }

  /** Exact inverse Walsh-Hadamard for the Y2 block (RFC §14.3). */
  private def iwht4x4(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(i + 12)
      val b1 = in(i + 4) + in(i + 8)
      val c1 = in(i + 4) - in(i + 8)
      val d1 = in(i) - in(i + 12)
      tmp(i) = a1 + b1
      tmp(i + 4) = c1 + d1
      tmp(i + 8) = a1 - b1
      tmp(i + 12) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val o = i * 4
      val a1 = tmp(o) + tmp(o + 3)
      val b1 = tmp(o + 1) + tmp(o + 2)
      val c1 = tmp(o + 1) - tmp(o + 2)
      val d1 = tmp(o) - tmp(o + 3)
      // outputs land back in 16-bit coefficient storage
      out(o) = ((a1 + b1 + 3) >> 3).toShort.toInt
      out(o + 1) = ((c1 + d1 + 3) >> 3).toShort.toInt
      out(o + 2) = ((a1 - b1 + 3) >> 3).toShort.toInt
      out(o + 3) = ((d1 - c1 + 3) >> 3).toShort.toInt
      i += 1
    }
  }

  // ------------------------------------------------------ token decode

  /** Decode one coefficient block (§13.3) into `out` (DEQUANTIZED,
    * raster order). Returns true iff any nonzero coefficient. */
  private def decodeCoeffs(br: Bool, probs: Array[Int], tpe: Int,
                           first: Int, ctx0: Int, dqDc: Int, dqAc: Int,
                           out: Array[Int]): Boolean = {
    java.util.Arrays.fill(out, 0)
    var n = first
    var ctx = ctx0
    var nonzero = false
    var skipEob = false
    while (n < 16) {
      val base = ((tpe * 8 + Bands(n)) * 3 + ctx) * 11
      if (!skipEob && br.bit(probs(base)) == 0) return nonzero // EOB
      if (br.bit(probs(base + 1)) == 0) {
        ctx = 0
        skipEob = true // EOB cannot follow a zero token
      } else {
        skipEob = false
        var v = 0
        if (br.bit(probs(base + 2)) == 0) { v = 1; ctx = 1 }
        else {
          ctx = 2
          if (br.bit(probs(base + 3)) == 0)
            v =
              if (br.bit(probs(base + 4)) == 0) 2
              else if (br.bit(probs(base + 5)) == 0) 3
              else 4
          else if (br.bit(probs(base + 6)) == 0)
            v = catValue(br, if (br.bit(probs(base + 7)) == 0) 0 else 1)
          else if (br.bit(probs(base + 8)) == 0)
            v = catValue(br, if (br.bit(probs(base + 9)) == 0) 2 else 3)
          else
            v = catValue(br, if (br.bit(probs(base + 10)) == 0) 4 else 5)
        }
        if (br.bit(128) == 1) v = -v
        // dequantized coefficients live in 16-bit storage (the RFC
        // reference decoder's `short`); oversized products wrap
        out(Zigzag(n)) = (v * (if (n == 0) dqDc else dqAc)).toShort.toInt
        nonzero = true
      }
      n += 1
    }
    nonzero
  }

  private def catValue(br: Bool, cat: Int): Int = {
    val p = CatProbs(cat)
    var extra = 0
    var i = 0
    while (i < p.length) { extra = (extra << 1) | br.bit(p(i)); i += 1 }
    CatBase(cat) + extra
  }

  // ---------------------------------------------------------- predictors

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Whole-block (16x16 luma / 8x8 chroma) intra prediction (§12.2).
    * Frame-edge conventions: above row 127, left column 129,
    * above-left 127 on the top MB row and 129 on the left MB column. */
  private def predictBlock(p: Array[Byte], stride: Int, px: Int, py: Int,
                           size: Int, mode: Int): Unit = {
    val hasAbove = py > 0
    val hasLeft = px > 0
    def above(i: Int): Int =
      if (hasAbove) p((py - 1) * stride + px + i) & 0xff else 127
    def left(i: Int): Int =
      if (hasLeft) p((py + i) * stride + px - 1) & 0xff else 129
    val aboveLeft: Int =
      if (!hasAbove) 127
      else if (!hasLeft) 129
      else p((py - 1) * stride + px - 1) & 0xff
    mode match {
      case DC =>
        var sum = 0
        var count = 0
        if (hasAbove) {
          var i = 0; while (i < size) { sum += above(i); i += 1 }
          count += size
        }
        if (hasLeft) {
          var i = 0; while (i < size) { sum += left(i); i += 1 }
          count += size
        }
        val dc =
          if (count == 0) 128
          else (sum + count / 2) / count // count is a power of two
        val b = dc.toByte
        var r = 0
        while (r < size) {
          var c = 0
          while (c < size) { p((py + r) * stride + px + c) = b; c += 1 }
          r += 1
        }
      case V =>
        var r = 0
        while (r < size) {
          var c = 0
          while (c < size) {
            p((py + r) * stride + px + c) = above(c).toByte; c += 1
          }
          r += 1
        }
      case H =>
        var r = 0
        while (r < size) {
          val l = left(r).toByte
          var c = 0
          while (c < size) { p((py + r) * stride + px + c) = l; c += 1 }
          r += 1
        }
      case TM =>
        var r = 0
        while (r < size) {
          val l = left(r)
          var c = 0
          while (c < size) {
            p((py + r) * stride + px + c) =
              clamp255(l + above(c) - aboveLeft).toByte
            c += 1
          }
          r += 1
        }
      case _ => fail()
    }
  }

  /** Subblock (4x4) intra prediction (§12.3). `e` is the 13-entry edge
    * array {L3, L2, L1, L0, P, A0..A7} resolved by the caller (with
    * frame-edge fictitious values and the VP8 above-right rules). */
  private def predict4x4(p: Array[Byte], stride: Int, px: Int, py: Int,
                         mode: Int, e: Array[Int]): Unit = {
    @inline def set(r: Int, c: Int, v: Int): Unit =
      p((py + r) * stride + px + c) = v.toByte
    @inline def a3(x: Int, y: Int, z: Int): Int = (x + 2 * y + z + 2) >> 2
    @inline def a2(x: Int, y: Int): Int = (x + y + 1) >> 1
    // e indices: L(i) = e(3 - i), P = e(4), A(i) = e(5 + i)
    @inline def L(i: Int): Int = e(3 - i)
    @inline def A(i: Int): Int = e(5 + i)
    val P = e(4)
    mode match {
      case 0 => // B_DC: always both sums (fictitious values at edges)
        var sum = 4
        var i = 0
        while (i < 4) { sum += A(i) + L(i); i += 1 }
        val dc = sum >> 3
        var r = 0
        while (r < 4) {
          var c = 0; while (c < 4) { set(r, c, dc); c += 1 }; r += 1
        }
      case 1 => // B_TM
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { set(r, c, clamp255(L(r) + A(c) - P)); c += 1 }
          r += 1
        }
      case 2 => // B_VE
        val v0 = a3(P, A(0), A(1)); val v1 = a3(A(0), A(1), A(2))
        val v2 = a3(A(1), A(2), A(3)); val v3 = a3(A(2), A(3), A(4))
        var r = 0
        while (r < 4) {
          set(r, 0, v0); set(r, 1, v1); set(r, 2, v2); set(r, 3, v3)
          r += 1
        }
      case 3 => // B_HE
        val h0 = a3(P, L(0), L(1)); val h1 = a3(L(0), L(1), L(2))
        val h2 = a3(L(1), L(2), L(3)); val h3 = a3(L(2), L(3), L(3))
        var c = 0
        while (c < 4) {
          set(0, c, h0); set(1, c, h1); set(2, c, h2); set(3, c, h3)
          c += 1
        }
      case 4 => // B_RD (down-right): edge run e(0..12) = {L3..L0,P,A0..A7}
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val i = 4 + c - r // position of the predicted diagonal in e
            set(r, c, a3(e(i - 1), e(i), e(i + 1)))
            c += 1
          }
          r += 1
        }
      case 6 => // B_LD (down-left)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val i = r + c
            set(r, c,
              if (i < 6) a3(A(i), A(i + 1), A(i + 2))
              else a3(A(6), A(7), A(7)))
            c += 1
          }
          r += 1
        }
      case 5 => // B_VR
        set(3, 0, a3(e(1), e(2), e(3)))
        set(2, 0, a3(e(2), e(3), e(4)))
        val x10 = a3(e(3), e(4), e(5)); set(3, 1, x10); set(1, 0, x10)
        val x00 = a2(e(4), e(5)); set(2, 1, x00); set(0, 0, x00)
        val x11 = a3(e(4), e(5), e(6)); set(3, 2, x11); set(1, 1, x11)
        val x01 = a2(e(5), e(6)); set(2, 2, x01); set(0, 1, x01)
        val x12 = a3(e(5), e(6), e(7)); set(3, 3, x12); set(1, 2, x12)
        val x02 = a2(e(6), e(7)); set(2, 3, x02); set(0, 2, x02)
        set(1, 3, a3(e(6), e(7), e(8)))
        set(0, 3, a2(e(7), e(8)))
      case 7 => // B_VL: uses above + above-right only (A0..A7)
        set(0, 0, a2(A(0), A(1)))
        set(1, 0, a3(A(0), A(1), A(2)))
        val x20 = a2(A(1), A(2)); set(2, 0, x20); set(0, 1, x20)
        val x30 = a3(A(1), A(2), A(3)); set(3, 0, x30); set(1, 1, x30)
        val x21 = a2(A(2), A(3)); set(2, 1, x21); set(0, 2, x21)
        val x31 = a3(A(2), A(3), A(4)); set(3, 1, x31); set(1, 2, x31)
        val x22 = a2(A(3), A(4)); set(2, 2, x22); set(0, 3, x22)
        val x32 = a3(A(3), A(4), A(5)); set(3, 2, x32); set(1, 3, x32)
        set(2, 3, a3(A(4), A(5), A(6)))
        set(3, 3, a3(A(5), A(6), A(7)))
      case 8 => // B_HD
        set(3, 0, a2(e(0), e(1)))
        set(3, 1, a3(e(0), e(1), e(2)))
        val x20 = a2(e(1), e(2)); set(2, 0, x20); set(3, 2, x20)
        val x21 = a3(e(1), e(2), e(3)); set(2, 1, x21); set(3, 3, x21)
        val x10 = a2(e(2), e(3)); set(2, 2, x10); set(1, 0, x10)
        val x11 = a3(e(2), e(3), e(4)); set(2, 3, x11); set(1, 1, x11)
        val x02 = a2(e(3), e(4)); set(1, 2, x02); set(0, 0, x02)
        val x03 = a3(e(3), e(4), e(5)); set(1, 3, x03); set(0, 1, x03)
        set(0, 2, a3(e(4), e(5), e(6)))
        set(0, 3, a3(e(5), e(6), e(7)))
      case 9 => // B_HU: uses left only
        set(0, 0, a2(L(0), L(1)))
        set(0, 1, a3(L(0), L(1), L(2)))
        val x02 = a2(L(1), L(2)); set(0, 2, x02); set(1, 0, x02)
        val x03 = a3(L(1), L(2), L(3)); set(0, 3, x03); set(1, 1, x03)
        val x12 = a2(L(2), L(3)); set(1, 2, x12); set(2, 0, x12)
        val x13 = (L(2) + 3 * L(3) + 2) >> 2; set(1, 3, x13); set(2, 1, x13)
        set(2, 2, L(3)); set(2, 3, L(3))
        set(3, 0, L(3)); set(3, 1, L(3)); set(3, 2, L(3)); set(3, 3, L(3))
      case _ => fail()
    }
  }

  // -------------------------------------------------------- decode core

  /** Per-MB state kept for the loop filter pass. */
  private final class MbInfo {
    var filterLevel = 0
    var innerFilter = false // any nonzero coeffs, or 4x4-predicted
  }

  /** Decode a VP8 keyframe payload b[from, until) to planes; null on
    * anything invalid. */
  def decodePlanes(b: Array[Byte], from: Int, until: Int): Planes =
    try decodePlanes0(b, from, until)
    catch {
      case _: Err => null
      case _: ArrayIndexOutOfBoundsException => null
      case _: NegativeArraySizeException => null
    }

  private def decodePlanes0(b: Array[Byte], from: Int, until: Int): Planes = {
    val (h, br) = parseHeader(b, from, until)
    val mbW = (h.width + 15) >> 4
    val mbH = (h.height + 15) >> 4
    val yStride = mbW * 16
    val uvStride = mbW * 8
    val yPlane = new Array[Byte](yStride * mbH * 16)
    val uPlane = new Array[Byte](uvStride * mbH * 8)
    val vPlane = new Array[Byte](uvStride * mbH * 8)
    val quants = Array.tabulate(4)(s => new Quant(h, s))

    // per-MB decoded modes: for B_PRED MBs the 16 subblock modes.
    val segIds = new Array[Int](mbW * mbH)
    val yModes = new Array[Int](mbW * mbH)
    val uvModes = new Array[Int](mbW * mbH)
    val skips = new Array[Boolean](mbW * mbH)
    val bModes = new Array[Array[Int]](mbW * mbH)
    // subblock-mode context rows for keyframe B_PRED decoding (§11.3):
    // implied B_DC for non-B_PRED neighbors per the keyframe rule that
    // maps 16x16 modes to first-class subblock modes.
    val impliedB = Array(0, 2, 3, 1) // DC->B_DC, V->B_VE, H->B_HE, TM->B_TM
    val aboveBMode = Array.fill(mbW * 4)(0)

    var mbIdx = 0
    var mbY = 0
    while (mbY < mbH) {
      val leftBMode = Array.fill(4)(0)
      var mbX = 0
      while (mbX < mbW) {
        // --- mode parse (partition 0), MB raster order ---
        if (h.segEnabled && h.segUpdateMap)
          segIds(mbIdx) = walkTree(br, SegTree, h.segTreeProbs, 0)
        if (h.probSkipFalse >= 0)
          skips(mbIdx) = br.bit(h.probSkipFalse) == 1
        val ym = walkTree(br, KfYModeTree, KfYModeProb, 0)
        yModes(mbIdx) = ym
        if (ym == BPRED) {
          val bm = new Array[Int](16)
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val aCtx =
              if (r == 0) aboveBMode(mbX * 4 + c) else bm((r - 1) * 4 + c)
            val lCtx = if (c == 0) leftBMode(r) else bm(r * 4 + c - 1)
            val pOff = (aCtx * 10 + lCtx) * 9
            bm(sb) = {
              var i = BModeTree(br.bit(Vp8Tables.KfBModeProb(pOff)))
              while (i > 0)
                i = BModeTree(i +
                  br.bit(Vp8Tables.KfBModeProb(pOff + (i >> 1))))
              -i - 1
            }
            sb += 1
          }
          bModes(mbIdx) = bm
          var i = 0
          while (i < 4) {
            aboveBMode(mbX * 4 + i) = bm(12 + i)
            leftBMode(i) = bm(i * 4 + 3)
            i += 1
          }
        } else {
          val imp = impliedB(ym)
          var i = 0
          while (i < 4) {
            aboveBMode(mbX * 4 + i) = imp
            leftBMode(i) = imp
            i += 1
          }
        }
        uvModes(mbIdx) = walkTree(br, UvModeTree, KfUvModeProb, 0)
        mbIdx += 1
        mbX += 1
      }
      mbY += 1
    }

    // --- token decode + reconstruction, MB raster order ---
    val nParts = h.parts.length / 2
    val tokenBr = Array.tabulate(nParts)(i =>
      new Bool(b, h.parts(2 * i), h.parts(2 * i + 1)))
    // nonzero contexts: above per MB column (4Y + 2U + 2V + 1 Y2)
    val aboveNz = Array.fill(mbW * 9)(0)
    val coeff = new Array[Int](16)
    val resid = new Array[Int](16)
    val y2out = new Array[Int](16)
    val yDq = new Array[Array[Int]](16) // per-subblock dequantized coeffs
    var i0 = 0
    while (i0 < 16) { yDq(i0) = new Array[Int](16); i0 += 1 }
    val uvDq = new Array[Array[Int]](8)
    i0 = 0
    while (i0 < 8) { uvDq(i0) = new Array[Int](16); i0 += 1 }
    val mbInfo = Array.fill(mbW * mbH)(new MbInfo)
    val edge = new Array[Int](13)
    val tr = new Array[Int](4)
    val yNz = new Array[Boolean](16) // per-subblock coded-nonzero flags
    val uvNz = new Array[Boolean](8)

    mbIdx = 0
    mbY = 0
    while (mbY < mbH) {
      val tbr = tokenBr(mbY % nParts)
      val leftNz = new Array[Int](9)
      var mbX = 0
      while (mbX < mbW) {
        val seg = segIds(mbIdx)
        val q = quants(seg)
        val ym = yModes(mbIdx)
        val hasY2 = ym != BPRED
        var anyCoeffs = false
        val skipped = skips(mbIdx)

        if (!skipped) {
          var firstY = 0
          if (hasY2) {
            val ctx = leftNz(8) + aboveNz(mbX * 9 + 8)
            val nz = decodeCoeffs(tbr, h.coeffProbs, 1, 0, ctx,
              q.y2dc, q.y2ac, coeff)
            leftNz(8) = if (nz) 1 else 0
            aboveNz(mbX * 9 + 8) = leftNz(8)
            if (nz) anyCoeffs = true
            iwht4x4(coeff, y2out)
            firstY = 1
          }
          val yType = if (hasY2) 0 else 3
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val ctx =
              (if (r == 0) aboveNz(mbX * 9 + c)
               else if (yNz(sb - 4)) 1 else 0) +
              (if (c == 0) leftNz(r)
               else if (yNz(sb - 1)) 1 else 0)
            val nz = decodeCoeffs(tbr, h.coeffProbs, yType, firstY, ctx,
              q.y1dc, q.y1ac, yDq(sb))
            if (hasY2) yDq(sb)(0) = y2out(sb)
            // context flag counts coded coefficients only (a DC merged
            // in from Y2 does not make this block "nonzero")
            yNz(sb) = nz
            if (nz) anyCoeffs = true
            if (r == 3) aboveNz(mbX * 9 + c) = if (nz) 1 else 0
            if (c == 3) leftNz(r) = if (nz) 1 else 0
            sb += 1
          }
          var pl = 0
          while (pl < 2) { // 0 = U, 1 = V
            var csb = 0
            while (csb < 4) {
              val r = csb >> 1
              val c = csb & 1
              val nzIdx = 4 + pl * 2
              val ctx =
                (if (r == 0) aboveNz(mbX * 9 + nzIdx + c)
                 else if (uvNz(pl * 4 + csb - 2)) 1 else 0) +
                (if (c == 0) leftNz(nzIdx + r)
                 else if (uvNz(pl * 4 + csb - 1)) 1 else 0)
              val nz = decodeCoeffs(tbr, h.coeffProbs, 2, 0, ctx,
                q.uvdc, q.uvac, uvDq(pl * 4 + csb))
              uvNz(pl * 4 + csb) = nz
              if (nz) anyCoeffs = true
              if (r == 1) aboveNz(mbX * 9 + nzIdx + c) = if (nz) 1 else 0
              if (c == 1) leftNz(nzIdx + r) = if (nz) 1 else 0
              csb += 1
            }
            pl += 1
          }
        } else {
          // skipped MB: zero coefficients; contexts reset, except the
          // Y2 context which persists when the MB carries no Y2 block.
          var i = 0
          while (i < 8) {
            leftNz(i) = 0; aboveNz(mbX * 9 + i) = 0; i += 1
          }
          if (hasY2) { leftNz(8) = 0; aboveNz(mbX * 9 + 8) = 0 }
          var sb = 0
          while (sb < 16) { java.util.Arrays.fill(yDq(sb), 0); sb += 1 }
          sb = 0
          while (sb < 8) { java.util.Arrays.fill(uvDq(sb), 0); sb += 1 }
        }

        // --- reconstruction ---
        val px = mbX * 16
        val py = mbY * 16
        if (hasY2) {
          predictBlock(yPlane, yStride, px, py, 16, ym)
          var sb = 0
          while (sb < 16) {
            addResidual(yPlane, yStride, px + (sb & 3) * 4,
              py + (sb >> 2) * 4, yDq(sb), resid)
            sb += 1
          }
        } else {
          // frozen above-right for column-3 subblocks (§12.3 rules)
          if (mbY == 0) { tr(0) = 127; tr(1) = 127; tr(2) = 127; tr(3) = 127 }
          else if (mbX == mbW - 1) {
            val v = yPlane((py - 1) * yStride + px + 15) & 0xff
            tr(0) = v; tr(1) = v; tr(2) = v; tr(3) = v
          } else {
            var i = 0
            while (i < 4) {
              tr(i) = yPlane((py - 1) * yStride + px + 16 + i) & 0xff
              i += 1
            }
          }
          val bm = bModes(mbIdx)
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val sx = px + c * 4
            val sy = py + r * 4
            fillEdge(yPlane, yStride, sx, sy, c == 3, tr, edge)
            predict4x4(yPlane, yStride, sx, sy, bm(sb), edge)
            addResidual(yPlane, yStride, sx, sy, yDq(sb), resid)
            sb += 1
          }
        }
        val cx = mbX * 8
        val cy = mbY * 8
        predictBlock(uPlane, uvStride, cx, cy, 8, uvModes(mbIdx))
        predictBlock(vPlane, uvStride, cx, cy, 8, uvModes(mbIdx))
        var sb = 0
        while (sb < 4) {
          val sx = cx + (sb & 1) * 4
          val sy = cy + (sb >> 1) * 4
          addResidual(uPlane, uvStride, sx, sy, uvDq(sb), resid)
          addResidual(vPlane, uvStride, sx, sy, uvDq(4 + sb), resid)
          sb += 1
        }

        // --- loop-filter info (§15.2) ---
        val info = mbInfo(mbIdx)
        var level =
          if (!h.segEnabled) h.filterLevel
          else if (h.segAbs) h.segLf(seg)
          else h.filterLevel + h.segLf(seg)
        if (h.lfDeltaEnabled) {
          level += h.refLfDelta(0) // keyframe: intra-frame reference
          if (ym == BPRED) level += h.modeLfDelta(0)
        }
        info.filterLevel = if (level < 0) 0 else if (level > 63) 63 else level
        info.innerFilter = anyCoeffs || ym == BPRED

        mbIdx += 1
        mbX += 1
      }
      mbY += 1
    }

    if (h.filterLevel > 0)
      loopFilter(h, mbInfo, mbW, mbH, yPlane, yStride, uPlane, vPlane,
        uvStride)

    // crop to frame size
    val yOut = new Array[Byte](h.width * h.height)
    var r = 0
    while (r < h.height) {
      System.arraycopy(yPlane, r * yStride, yOut, r * h.width, h.width)
      r += 1
    }
    val cw = (h.width + 1) >> 1
    val ch = (h.height + 1) >> 1
    val uOut = new Array[Byte](cw * ch)
    val vOut = new Array[Byte](cw * ch)
    r = 0
    while (r < ch) {
      System.arraycopy(uPlane, r * uvStride, uOut, r * cw, cw)
      System.arraycopy(vPlane, r * uvStride, vOut, r * cw, cw)
      r += 1
    }
    new Planes(h.width, h.height, yOut, uOut, vOut)
  }

  private def addResidual(p: Array[Byte], stride: Int, px: Int, py: Int,
                          dq: Array[Int], resid: Array[Int]): Unit = {
    var all0 = true
    var i = 0
    while (i < 16) { if (dq(i) != 0) { all0 = false; i = 16 }; i += 1 }
    if (all0) return
    idct4x4(dq, resid)
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        val o = (py + r) * stride + px + c
        p(o) = clamp255((p(o) & 0xff) + resid(r * 4 + c)).toByte
        c += 1
      }
      r += 1
    }
  }

  /** Resolve the 13-entry subblock prediction edge {L3,L2,L1,L0,P,
    * A0..A7}: frame edges use 127 (above) / 129 (left); A4..A7 follow
    * the VP8 above-right rules (frozen per-MB values for column-3
    * subblocks, natural raster pixels otherwise). */
  private def fillEdge(p: Array[Byte], stride: Int, sx: Int, sy: Int,
                       col3: Boolean, tr: Array[Int],
                       e: Array[Int]): Unit = {
    val hasAbove = sy > 0
    val hasLeft = sx > 0
    var i = 0
    while (i < 4) {
      e(3 - i) = if (hasLeft) p((sy + i) * stride + sx - 1) & 0xff else 129
      e(5 + i) = if (hasAbove) p((sy - 1) * stride + sx + i) & 0xff else 127
      i += 1
    }
    e(4) =
      if (!hasAbove) 127
      else if (!hasLeft) 129
      else p((sy - 1) * stride + sx - 1) & 0xff
    if (col3) { e(9) = tr(0); e(10) = tr(1); e(11) = tr(2); e(12) = tr(3) }
    else {
      i = 0
      while (i < 4) {
        e(9 + i) = if (hasAbove) p((sy - 1) * stride + sx + 4 + i) & 0xff
        else 127
        i += 1
      }
    }
  }

  // --------------------------------------------------------- loop filter

  private def clampS(v: Int): Int =
    if (v < -128) -128 else if (v > 127) 127 else v

  /** In-place deblocking (§15), MB raster order: left edge, inner
    * vertical edges, top edge, inner horizontal edges. */
  private def loopFilter(h: Header, info: Array[MbInfo], mbW: Int,
                         mbH: Int, y: Array[Byte], ys: Int,
                         u: Array[Byte], v: Array[Byte], us: Int): Unit = {
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mi = info(mbY * mbW + mbX)
        val level = mi.filterLevel
        if (level > 0) {
          var interior = level
          if (h.sharpness > 0) {
            interior >>= (if (h.sharpness > 4) 2 else 1)
            if (interior > 9 - h.sharpness) interior = 9 - h.sharpness
          }
          if (interior < 1) interior = 1
          val mbLimit = (level + 2) * 2 + interior
          val subLimit = level * 2 + interior
          val hev = if (level >= 40) 2 else if (level >= 15) 1 else 0
          val px = mbX * 16
          val py = mbY * 16
          val cx = mbX * 8
          val cy = mbY * 8
          if (h.simpleFilter) {
            if (mbX > 0)
              filterEdgeSimple(y, ys, px, py, vertical = true, mbLimit)
            if (mi.innerFilter) {
              filterEdgeSimple(y, ys, px + 4, py, vertical = true, subLimit)
              filterEdgeSimple(y, ys, px + 8, py, vertical = true, subLimit)
              filterEdgeSimple(y, ys, px + 12, py, vertical = true, subLimit)
            }
            if (mbY > 0)
              filterEdgeSimple(y, ys, px, py, vertical = false, mbLimit)
            if (mi.innerFilter) {
              filterEdgeSimple(y, ys, px, py + 4, vertical = false, subLimit)
              filterEdgeSimple(y, ys, px, py + 8, vertical = false, subLimit)
              filterEdgeSimple(y, ys, px, py + 12, vertical = false,
                subLimit)
            }
          } else {
            if (mbX > 0) {
              filterMbEdge(y, ys, px, py, 16, vertical = true, mbLimit,
                interior, hev)
              filterMbEdge(u, us, cx, cy, 8, vertical = true, mbLimit,
                interior, hev)
              filterMbEdge(v, us, cx, cy, 8, vertical = true, mbLimit,
                interior, hev)
            }
            if (mi.innerFilter) {
              filterSubEdge(y, ys, px + 4, py, 16, vertical = true,
                subLimit, interior, hev)
              filterSubEdge(y, ys, px + 8, py, 16, vertical = true,
                subLimit, interior, hev)
              filterSubEdge(y, ys, px + 12, py, 16, vertical = true,
                subLimit, interior, hev)
              filterSubEdge(u, us, cx + 4, cy, 8, vertical = true,
                subLimit, interior, hev)
              filterSubEdge(v, us, cx + 4, cy, 8, vertical = true,
                subLimit, interior, hev)
            }
            if (mbY > 0) {
              filterMbEdge(y, ys, px, py, 16, vertical = false, mbLimit,
                interior, hev)
              filterMbEdge(u, us, cx, cy, 8, vertical = false, mbLimit,
                interior, hev)
              filterMbEdge(v, us, cx, cy, 8, vertical = false, mbLimit,
                interior, hev)
            }
            if (mi.innerFilter) {
              filterSubEdge(y, ys, px, py + 4, 16, vertical = false,
                subLimit, interior, hev)
              filterSubEdge(y, ys, px, py + 8, 16, vertical = false,
                subLimit, interior, hev)
              filterSubEdge(y, ys, px, py + 12, 16, vertical = false,
                subLimit, interior, hev)
              filterSubEdge(u, us, cx, cy + 4, 8, vertical = false,
                subLimit, interior, hev)
              filterSubEdge(v, us, cx, cy + 4, 8, vertical = false,
                subLimit, interior, hev)
            }
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  // Pixel accessors along an edge: for a vertical edge, q0 is the
  // pixel at (x, row) and p0 at (x-1, row); offsets step horizontally.
  // For horizontal edges they step vertically.
  private def filterEdgeSimple(p: Array[Byte], stride: Int, x: Int, y: Int,
                               vertical: Boolean, limit: Int): Unit = {
    val off = if (vertical) 1 else stride
    var i = 0
    while (i < 16) {
      val base = (y + (if (vertical) i else 0)) * stride +
        x + (if (vertical) 0 else i)
      val p1 = p(base - 2 * off) & 0xff
      val p0 = p(base - off) & 0xff
      val q0 = p(base) & 0xff
      val q1 = p(base + off) & 0xff
      if (Math.abs(p0 - q0) * 2 + Math.abs(p1 - q1) / 2 <= limit) {
        val a = clampS(3 * (q0 - p0) + clampS(p1 - 128 - (q1 - 128)))
        val f1 = clampS(a + 4) >> 3
        val f2 = clampS(a + 3) >> 3
        p(base) = clamp255(q0 - f1).toByte
        p(base - off) = clamp255(p0 + f2).toByte
      }
      i += 1
    }
  }

  @inline private def normalFilterMask(limit: Int, interior: Int, p3: Int,
                                       p2: Int, p1: Int, p0: Int, q0: Int,
                                       q1: Int, q2: Int, q3: Int): Boolean =
    Math.abs(p0 - q0) * 2 + Math.abs(p1 - q1) / 2 <= limit &&
      Math.abs(p3 - p2) <= interior && Math.abs(p2 - p1) <= interior &&
      Math.abs(p1 - p0) <= interior && Math.abs(q1 - q0) <= interior &&
      Math.abs(q2 - q1) <= interior && Math.abs(q3 - q2) <= interior

  /** Subblock (4-tap) normal filter (§15.3). */
  private def filterSubEdge(p: Array[Byte], stride: Int, x: Int, y: Int,
                            len: Int, vertical: Boolean, limit: Int,
                            interior: Int, hevT: Int): Unit = {
    val off = if (vertical) 1 else stride
    var i = 0
    while (i < len) {
      val base = (y + (if (vertical) i else 0)) * stride +
        x + (if (vertical) 0 else i)
      val p3 = p(base - 4 * off) & 0xff
      val p2 = p(base - 3 * off) & 0xff
      val p1 = p(base - 2 * off) & 0xff
      val p0 = p(base - off) & 0xff
      val q0 = p(base) & 0xff
      val q1 = p(base + off) & 0xff
      val q2 = p(base + 2 * off) & 0xff
      val q3 = p(base + 3 * off) & 0xff
      if (normalFilterMask(limit, interior, p3, p2, p1, p0, q0, q1, q2,
        q3)) {
        val hev = Math.abs(p1 - p0) > hevT || Math.abs(q1 - q0) > hevT
        val ps1 = p1 - 128; val ps0 = p0 - 128
        val qs0 = q0 - 128; val qs1 = q1 - 128
        val a = clampS(3 * (qs0 - ps0) + (if (hev) clampS(ps1 - qs1) else 0))
        val f1 = clampS(a + 4) >> 3
        val f2 = clampS(a + 3) >> 3
        p(base) = clamp255(q0 - f1).toByte
        p(base - off) = clamp255(p0 + f2).toByte
        if (!hev) {
          val f3 = (f1 + 1) >> 1
          p(base + off) = clamp255(q1 - f3).toByte
          p(base - 2 * off) = clamp255(p1 + f3).toByte
        }
      }
      i += 1
    }
  }

  /** Macroblock-edge (6-tap) normal filter (§15.3). */
  private def filterMbEdge(p: Array[Byte], stride: Int, x: Int, y: Int,
                           len: Int, vertical: Boolean, limit: Int,
                           interior: Int, hevT: Int): Unit = {
    val off = if (vertical) 1 else stride
    var i = 0
    while (i < len) {
      val base = (y + (if (vertical) i else 0)) * stride +
        x + (if (vertical) 0 else i)
      val p3 = p(base - 4 * off) & 0xff
      val p2 = p(base - 3 * off) & 0xff
      val p1 = p(base - 2 * off) & 0xff
      val p0 = p(base - off) & 0xff
      val q0 = p(base) & 0xff
      val q1 = p(base + off) & 0xff
      val q2 = p(base + 2 * off) & 0xff
      val q3 = p(base + 3 * off) & 0xff
      if (normalFilterMask(limit, interior, p3, p2, p1, p0, q0, q1, q2,
        q3)) {
        val hev = Math.abs(p1 - p0) > hevT || Math.abs(q1 - q0) > hevT
        val ps2 = p2 - 128; val ps1 = p1 - 128; val ps0 = p0 - 128
        val qs0 = q0 - 128; val qs1 = q1 - 128; val qs2 = q2 - 128
        if (hev) {
          val a = clampS(3 * (qs0 - ps0) + clampS(ps1 - qs1))
          val f1 = clampS(a + 4) >> 3
          val f2 = clampS(a + 3) >> 3
          p(base) = clamp255(q0 - f1).toByte
          p(base - off) = clamp255(p0 + f2).toByte
        } else {
          val w = clampS(clampS(ps1 - qs1) + 3 * (qs0 - ps0))
          var a = (27 * w + 63) >> 7
          p(base) = clamp255(128 + clampS(qs0 - a)).toByte
          p(base - off) = clamp255(128 + clampS(ps0 + a)).toByte
          a = (18 * w + 63) >> 7
          p(base + off) = clamp255(128 + clampS(qs1 - a)).toByte
          p(base - 2 * off) = clamp255(128 + clampS(ps1 + a)).toByte
          a = (9 * w + 63) >> 7
          p(base + 2 * off) = clamp255(128 + clampS(qs2 - a)).toByte
          p(base - 3 * off) = clamp255(128 + clampS(ps2 + a)).toByte
        }
      }
      i += 1
    }
  }

  // ------------------------------------------------------- bool encoder

  /** RFC 6386 §7.2 boolean encoder (carry-propagating). */
  private[functions] final class BoolEnc {
    private var buf = new Array[Byte](256)
    private var n = 0
    private var range = 255
    private var bottom = 0L // 32-bit window kept in a Long
    private var bitCount = 24

    private def put(v: Int): Unit = {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
      buf(n) = v.toByte
      n += 1
    }
    private def carry(): Unit = {
      var q = n - 1
      while ((buf(q) & 0xff) == 255) { buf(q) = 0; q -= 1 }
      buf(q) = ((buf(q) & 0xff) + 1).toByte
    }

    def bit(prob: Int, value: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (value != 0) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        range <<= 1
        if ((bottom & 0x80000000L) != 0) carry()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          put(((bottom >> 24) & 0xff).toInt)
          bottom &= 0xffffff
          bitCount = 8
        }
      }
    }

    def literal(nBits: Int, v: Int): Unit = {
      var i = nBits - 1
      while (i >= 0) { bit(128, (v >> i) & 1); i -= 1 }
    }

    /** Flush and return the partition bytes. */
    def finish(): Array[Byte] = {
      var c = bitCount
      var v = bottom
      if ((v & (1L << (32 - c))) != 0) carry()
      v = (v << (c & 7)) & 0xffffffffL
      c >>= 3
      while (c > 0) { v = (v << 8) & 0xffffffffL; c -= 1 }
      var i = 0
      while (i < 4) { put(((v >> 24) & 0xff).toInt); v = (v << 8) & 0xffffffffL; i += 1 }
      java.util.Arrays.copyOf(buf, n)
    }
  }

  /** Emit the bit path for `leaf` through a paired-branch tree whose
    * leaves are stored as -(value+1). */
  private def encodeTree(be: BoolEnc, t: Array[Int], p: Array[Int],
                         pOff: Int, leaf: Int): Unit = {
    // depth-first search for the leaf, then emit the collected path
    def find(node: Int, path: List[(Int, Int)]): List[(Int, Int)] = {
      var res: List[(Int, Int)] = null
      var side = 0
      while (side < 2 && res == null) {
        val nxt = t(node + side)
        val step = (node >> 1, side)
        if (nxt <= 0) { if (-nxt - 1 == leaf) res = (step :: path) }
        else res = find(nxt, step :: path)
        side += 1
      }
      res
    }
    val path = find(0, Nil)
    if (path == null) fail()
    path.reverse.foreach { case (pi, b) => be.bit(p(pOff + pi), b) }
  }

  /** Encode one coefficient block's tokens (quantized values, scan
    * order). Mirrors [[decodeCoeffs]] exactly; returns nonzero flag. */
  private def encodeCoeffs(be: BoolEnc, probs: Array[Int], tpe: Int,
                           first: Int, ctx0: Int,
                           scan: Array[Int]): Boolean = {
    var last = -1
    var i = first
    while (i < 16) { if (scan(i) != 0) last = i; i += 1 }
    var n = first
    var ctx = ctx0
    var skipEob = false
    while (n <= last) {
      val base = ((tpe * 8 + Bands(n)) * 3 + ctx) * 11
      if (!skipEob) be.bit(probs(base), 1) // not EOB
      val v = scan(n)
      if (v == 0) { be.bit(probs(base + 1), 0); ctx = 0; skipEob = true }
      else {
        be.bit(probs(base + 1), 1)
        skipEob = false
        val av = Math.abs(v)
        if (av == 1) { be.bit(probs(base + 2), 0); ctx = 1 }
        else {
          be.bit(probs(base + 2), 1)
          ctx = 2
          if (av <= 4) {
            be.bit(probs(base + 3), 0)
            if (av == 2) be.bit(probs(base + 4), 0)
            else {
              be.bit(probs(base + 4), 1)
              be.bit(probs(base + 5), if (av == 4) 1 else 0)
            }
          } else {
            be.bit(probs(base + 3), 1)
            var cat = 5
            var c = 0
            while (c < 6) {
              val hi = if (c == 5) Int.MaxValue else CatBase(c + 1) - 1
              if (av <= hi) { cat = c; c = 6 } else c += 1
            }
            if (cat <= 1) {
              be.bit(probs(base + 6), 0)
              be.bit(probs(base + 7), cat)
            } else if (cat <= 3) {
              be.bit(probs(base + 6), 1)
              be.bit(probs(base + 8), 0)
              be.bit(probs(base + 9), cat - 2)
            } else {
              be.bit(probs(base + 6), 1)
              be.bit(probs(base + 8), 1)
              be.bit(probs(base + 10), cat - 4)
            }
            val p = CatProbs(cat)
            val extra = av - CatBase(cat)
            var bi = p.length - 1
            var k = 0
            while (k < p.length) {
              be.bit(p(k), (extra >> bi) & 1)
              bi -= 1
              k += 1
            }
          }
        }
        be.bit(128, if (v < 0) 1 else 0)
      }
      n += 1
    }
    if (last < 15) {
      // EOB (legal here: the loop never ends on a zero token)
      val base = ((tpe * 8 + Bands(if (last < first) first else last + 1))
        * 3 + ctx) * 11
      be.bit(probs(base), 0)
    }
    last >= first
  }

  // -------------------------------------------------- fixture encoder

  /** Everything the fixture encoder lets a caller choose, per MB. A
    * null bModes entry means a whole-block (16x16) luma mode; residual
    * arrays hold QUANTIZED token values (scan order for the 4x4s). */
  private[functions] final class FrameSpec(val w: Int, val h: Int,
                                           val qi: Int) {
    val mbW: Int = (w + 15) >> 4
    val mbH: Int = (h + 15) >> 4
    val yModes: Array[Int] = Array.fill(mbW * mbH)(DC)
    val uvModes: Array[Int] = Array.fill(mbW * mbH)(DC)
    val bModes: Array[Array[Int]] = new Array[Array[Int]](mbW * mbH)
    /** Non-B_PRED MBs: quantized Y2 coefficients (scan order). */
    val y2: Array[Array[Int]] = new Array[Array[Int]](mbW * mbH)
    /** Per-subblock quantized luma coefficients (16 x scan order). */
    val yCoeff: Array[Array[Array[Int]]] =
      new Array[Array[Array[Int]]](mbW * mbH)
    /** Per-subblock quantized chroma coefficients (8 = 4 U + 4 V). */
    val uvCoeff: Array[Array[Array[Int]]] =
      new Array[Array[Array[Int]]](mbW * mbH)
  }

  /** Encode a keyframe per `spec` into a complete WebP container.
    * Single partition, no segmentation, loop filter level 0, default
    * probabilities, mb_no_coeff_skip on (all-zero MBs are skipped). */
  private[functions] def encodeFrame(spec: FrameSpec): Array[Byte] = {
    val mbW = spec.mbW
    val mbH = spec.mbH
    val zero16 = new Array[Int](16)
    def yc(mb: Int, sb: Int): Array[Int] = {
      val a = spec.yCoeff(mb)
      if (a == null || a(sb) == null) zero16 else a(sb)
    }
    def uvc(mb: Int, sb: Int): Array[Int] = {
      val a = spec.uvCoeff(mb)
      if (a == null || a(sb) == null) zero16 else a(sb)
    }
    def y2c(mb: Int): Array[Int] = {
      val a = spec.y2(mb)
      if (a == null) zero16 else a
    }
    def mbAllZero(mb: Int): Boolean = {
      val hasY2 = spec.bModes(mb) == null
      (!hasY2 || y2c(mb).forall(_ == 0)) &&
        (0 until 16).forall(sb => yc(mb, sb).forall(_ == 0)) &&
        (0 until 8).forall(sb => uvc(mb, sb).forall(_ == 0))
    }

    // --- partition 0: header + modes ---
    val p0 = new BoolEnc
    p0.literal(1, 0) // color space
    p0.literal(1, 0) // clamping
    p0.literal(1, 0) // segmentation off
    p0.literal(1, 0) // normal filter
    p0.literal(6, 0) // filter level 0
    p0.literal(3, 0) // sharpness
    p0.literal(1, 0) // lf deltas off
    p0.literal(2, 0) // one token partition
    p0.literal(7, spec.qi)
    var i = 0
    while (i < 5) { p0.bit(128, 0); i += 1 } // five quant deltas absent
    p0.literal(1, 1) // refresh entropy probs
    var k = 0
    while (k < 1056) { p0.bit(Vp8Tables.CoeffUpdateProbs(k), 0); k += 1 }
    p0.literal(1, 1) // mb_no_coeff_skip on
    p0.literal(8, 128) // prob_skip_false

    val impliedB = Array(0, 2, 3, 1)
    val aboveBMode = Array.fill(mbW * 4)(0)
    var mbY = 0
    while (mbY < mbH) {
      val leftBMode = Array.fill(4)(0)
      var mbX = 0
      while (mbX < mbW) {
        val mb = mbY * mbW + mbX
        p0.bit(128, if (mbAllZero(mb)) 1 else 0) // skip flag
        val bm = spec.bModes(mb)
        if (bm == null) {
          encodeTree(p0, KfYModeTree, KfYModeProb, 0, spec.yModes(mb))
          val imp = impliedB(spec.yModes(mb))
          var j = 0
          while (j < 4) {
            aboveBMode(mbX * 4 + j) = imp; leftBMode(j) = imp; j += 1
          }
        } else {
          encodeTree(p0, KfYModeTree, KfYModeProb, 0, BPRED)
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val aCtx =
              if (r == 0) aboveBMode(mbX * 4 + c) else bm((r - 1) * 4 + c)
            val lCtx = if (c == 0) leftBMode(r) else bm(r * 4 + c - 1)
            encodeTree(p0, BModeTree, Vp8Tables.KfBModeProb,
              (aCtx * 10 + lCtx) * 9, bm(sb))
            sb += 1
          }
          var j = 0
          while (j < 4) {
            aboveBMode(mbX * 4 + j) = bm(12 + j)
            leftBMode(j) = bm(j * 4 + 3)
            j += 1
          }
        }
        encodeTree(p0, UvModeTree, KfUvModeProb, 0, spec.uvModes(mb))
        mbX += 1
      }
      mbY += 1
    }

    // --- token partition ---
    val tp = new BoolEnc
    val probs = Vp8Tables.CoeffProbs
    val aboveNz = Array.fill(mbW * 9)(0)
    val yNz = new Array[Boolean](16)
    val uvNz = new Array[Boolean](8)
    mbY = 0
    while (mbY < mbH) {
      val leftNz = new Array[Int](9)
      var mbX = 0
      while (mbX < mbW) {
        val mb = mbY * mbW + mbX
        val hasY2 = spec.bModes(mb) == null
        if (mbAllZero(mb)) {
          var j = 0
          while (j < 8) { leftNz(j) = 0; aboveNz(mbX * 9 + j) = 0; j += 1 }
          if (hasY2) { leftNz(8) = 0; aboveNz(mbX * 9 + 8) = 0 }
        } else {
          var firstY = 0
          if (hasY2) {
            val ctx = leftNz(8) + aboveNz(mbX * 9 + 8)
            val nz = encodeCoeffs(tp, probs, 1, 0, ctx, y2c(mb))
            leftNz(8) = if (nz) 1 else 0
            aboveNz(mbX * 9 + 8) = leftNz(8)
            firstY = 1
          }
          val yType = if (hasY2) 0 else 3
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val ctx =
              (if (r == 0) aboveNz(mbX * 9 + c)
               else if (yNz(sb - 4)) 1 else 0) +
              (if (c == 0) leftNz(r) else if (yNz(sb - 1)) 1 else 0)
            val nz = encodeCoeffs(tp, probs, yType, firstY, ctx, yc(mb, sb))
            yNz(sb) = nz
            if (r == 3) aboveNz(mbX * 9 + c) = if (nz) 1 else 0
            if (c == 3) leftNz(r) = if (nz) 1 else 0
            sb += 1
          }
          var pl = 0
          while (pl < 2) {
            var csb = 0
            while (csb < 4) {
              val r = csb >> 1
              val c = csb & 1
              val nzIdx = 4 + pl * 2
              val ctx =
                (if (r == 0) aboveNz(mbX * 9 + nzIdx + c)
                 else if (uvNz(pl * 4 + csb - 2)) 1 else 0) +
                (if (c == 0) leftNz(nzIdx + r)
                 else if (uvNz(pl * 4 + csb - 1)) 1 else 0)
              val nz = encodeCoeffs(tp, probs, 2, 0, ctx,
                uvc(mb, pl * 4 + csb))
              uvNz(pl * 4 + csb) = nz
              if (r == 1) aboveNz(mbX * 9 + nzIdx + c) = if (nz) 1 else 0
              if (c == 1) leftNz(nzIdx + r) = if (nz) 1 else 0
              csb += 1
            }
            pl += 1
          }
        }
        mbX += 1
      }
      mbY += 1
    }

    val part0 = p0.finish()
    val tokens = tp.finish()
    val vp8 = new java.io.ByteArrayOutputStream
    val tag = (part0.length << 5) | 0x10 // keyframe, version 0, shown
    vp8.write(tag & 0xff); vp8.write((tag >> 8) & 0xff)
    vp8.write((tag >> 16) & 0xff)
    vp8.write(0x9d); vp8.write(0x01); vp8.write(0x2a)
    vp8.write(spec.w & 0xff); vp8.write((spec.w >> 8) & 0x3f)
    vp8.write(spec.h & 0xff); vp8.write((spec.h >> 8) & 0x3f)
    vp8.write(part0, 0, part0.length)
    vp8.write(tokens, 0, tokens.length)
    val payload = vp8.toByteArray
    val out = new java.io.ByteArrayOutputStream
    def le4(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write('R'); out.write('I'); out.write('F'); out.write('F')
    val chunk = 8 + payload.length + (payload.length & 1)
    le4(4 + chunk)
    out.write('W'); out.write('E'); out.write('B'); out.write('P')
    out.write('V'); out.write('P'); out.write('8'); out.write(' ')
    le4(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0)
    out.toByteArray
  }

  /** Closed-form oracle fixture: a grayscale keyframe whose luma is
    * flat per 16x16 macroblock at exactly `vals` (MB raster order),
    * chroma 128. Each MB is DC-predicted with a single Y2 DC token
    * chosen so the WHT→DCT reconstruction lands exactly on the target
    * (dc2 = 8·r − 4 makes the per-pixel residual exactly r at qi=0,
    * where y2dc = 8): decoded pixels ARE `vals`, so a SQL oracle can
    * replay them without modelling the codec. The RGB view is also
    * exact: gray (v,128,128) → (v,v,v) under the BT.601 math. */
  def encodeGrayMbFlat(w: Int, h: Int, vals: Array[Int]): Array[Byte] = {
    val spec = new FrameSpec(w, h, 0) // qi 0: y1dc=4, y2dc=8
    val mbW = spec.mbW
    val mbH = spec.mbH
    require(vals.length == mbW * mbH, s"${vals.length} != ${mbW * mbH}")
    // replay DC_PRED over the exactly-reconstructed flat MBs
    val recon = new Array[Int](mbW * mbH)
    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val mb = mbY * mbW + mbX
        val v = vals(mb)
        require(v >= 0 && v <= 255, s"luma $v out of range")
        val pred =
          if (mbX == 0 && mbY == 0) 128
          else if (mbY == 0) recon(mb - 1)
          else if (mbX == 0) recon(mb - mbW)
          else (recon(mb - 1) + recon(mb - mbW) + 1) >> 1
        val r = v - pred
        if (r != 0) {
          val dc2 = 8 * r - 4
          spec.y2(mb) = Array(dc2) ++ new Array[Int](15)
        }
        recon(mb) = pred + r
        mbX += 1
      }
      mbY += 1
    }
    encodeFrame(spec)
  }

  /** Closed-form oracle fixture for per-4x4-flat grayscale content
    * (e.g. the 8x8-block oracle scenes): every MB is B_PRED with
    * all-B_DC subblocks and a per-subblock DC-only residual chosen so
    * reconstruction is exact (type-3 DC dequant is 4 at qi=0, so
    * dc = 2·r − 1 puts the IDCT output exactly at r). Decoded pixels
    * ARE the input scene; frame padding replicates the edge. The
    * input must be flat within each 4x4 (edge-extended) cell. */
  def encodeGrayB4x4(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h)
    val spec = new FrameSpec(w, h, 0)
    val mbW = spec.mbW
    val mbH = spec.mbH
    val sbW = mbW * 4
    val sbH = mbH * 4
    // per-4x4 target values, edge-extended; require flatness
    val v = new Array[Int](sbW * sbH)
    var sy = 0
    while (sy < sbH) {
      var sx = 0
      while (sx < sbW) {
        val x0 = math.min(sx * 4, w - 1)
        val y0 = math.min(sy * 4, h - 1)
        val t = gray(y0 * w + x0) & 0xff
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val x = math.min(sx * 4 + c, w - 1)
            val y = math.min(sy * 4 + r, h - 1)
            require((gray(y * w + x) & 0xff) == t,
              s"scene not flat in 4x4 cell ($sx,$sy)")
            c += 1
          }
          r += 1
        }
        v(sy * sbW + sx) = t
        sx += 1
      }
      sy += 1
    }
    var mb = 0
    while (mb < mbW * mbH) {
      spec.bModes(mb) = new Array[Int](16) // all B_DC
      spec.yCoeff(mb) = new Array[Array[Int]](16)
      mb += 1
    }
    sy = 0
    while (sy < sbH) {
      var sx = 0
      while (sx < sbW) {
        // replay B_DC: 4 above + 4 left samples, fictitious 127/129
        val above = if (sy == 0) 127 * 4 else v((sy - 1) * sbW + sx) * 4
        val left = if (sx == 0) 129 * 4 else v(sy * sbW + sx - 1) * 4
        val pred = (above + left + 4) >> 3
        val r = v(sy * sbW + sx) - pred
        if (r != 0) {
          val mbIdx = (sy >> 2) * mbW + (sx >> 2)
          val sb = (sy & 3) * 4 + (sx & 3)
          val a = new Array[Int](16)
          a(0) = 2 * r - 1
          spec.yCoeff(mbIdx)(sb) = a
        }
        sx += 1
      }
      sy += 1
    }
    encodeFrame(spec)
  }

  // ----------------------------------------------------------- RGB view

  /** Decode to RGB: nearest-neighbor chroma upsampling + the same
    * full-range BT.601 integer conversion [[JpegCodec]] uses. */
  def decode(b: Array[Byte], from: Int, until: Int): PixelDecode.Rgb = {
    val pl = decodePlanes(b, from, until)
    if (pl == null) return null
    val w = pl.w
    val h = pl.h
    val cw = (w + 1) >> 1
    val px = new Array[Byte](3 * w * h)
    var r = 0
    while (r < h) {
      var c = 0
      while (c < w) {
        val yy = (pl.y(r * w + c) & 0xff).toDouble
        val cb = ((pl.u((r >> 1) * cw + (c >> 1)) & 0xff) - 128).toDouble
        val cr = ((pl.v((r >> 1) * cw + (c >> 1)) & 0xff) - 128).toDouble
        val o = 3 * (r * w + c)
        px(o) = clamp255(math.rint(yy + 1.402 * cr).toInt).toByte
        px(o + 1) = clamp255(
          math.rint(yy - 0.344136 * cb - 0.714136 * cr).toInt).toByte
        px(o + 2) = clamp255(math.rint(yy + 1.772 * cb).toInt).toByte
        c += 1
      }
      r += 1
    }
    new PixelDecode.Rgb(w, h, px)
  }
}
