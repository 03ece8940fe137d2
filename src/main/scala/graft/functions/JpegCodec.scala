package graft.functions

/** Baseline JPEG codec — pure JVM, no codec library, written from the
  * published ITU-T T.81 spec (the same codec-free discipline as the
  * PNG inflate and GIF LZW decoders one file over).
  *
  * Decoder: SOI marker walk (DQT 8/16-bit, DHT, SOF0/SOF1, DRI, SOS),
  * canonical Huffman decode per T.81 F.2.2 (MINCODE/MAXCODE/VALPTR),
  * byte-stuffing-aware bit reader with RSTn restart handling, run-
  * length AC decode with EXTEND sign recovery, dequantize + dezigzag,
  * separable double-precision IDCT (T.81 A.3.3), box chroma upsampling
  * for arbitrary sampling factors (4:4:4, 4:2:0, 4:2:2, …), and JFIF
  * YCbCr→RGB. Grayscale (1 component), color (3 components — JFIF
  * YCbCr, or Adobe RGB under APP14 transform 0), and Adobe
  * 4-component CMYK/YCCK (APP14 transform 0/2, inverted-ink
  * convention) frames, sequential (SOF0/SOF1) AND progressive (SOF2 —
  * T.81 G.1.2:
  * interleaved/single-component DC scans with successive
  * approximation, spectral AC bands with EOB-run accounting, AC
  * refinement correction bits), so the ~third of real crawl JPEGs
  * that are progressive decode too; conformance is against
  * ImageIO-written SOF2 streams. Arithmetic-coded, lossless and
  * hierarchical frames null out. Returns null, never throws, on any
  * corrupt or unsupported payload.
  *
  * Encoder: level shift, separable FDCT, quantization against a
  * caller-supplied or quality-scaled table, zigzag, run-length AC
  * symbols, and per-image OPTIMAL Huffman tables (package-merge,
  * 16-bit cap, all-ones code kept free per F.1.4.4.1) — so no spec
  * constant tables ride along and every emitted stream is
  * self-describing. Supports gray, 4:4:4 and 4:2:0; used by the test
  * fixtures and the re-encode transforms in the recall queries.
  * A flat 8×8 block with a DC quant step of 8 round-trips bit-exactly
  * (FDCT of a constant block has a single DC coefficient `8·(v−128)`),
  * which is what makes closed-form SQL oracles over JPEG possible. */
object JpegCodec {

  /** Zigzag index: zig(k) = natural position of the k-th scan coef. */
  private val Zig: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private val CosT: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  // ---------------------------------------------------------------- decode

  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    // T.81 F.2.2.3: canonical code bounds per length
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values = vals
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = code - 1
        if (bits(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader: strips 0xFF00 stuffing, stops at any
    * other marker (position left ON the 0xFF). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var hitMarker = false

    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) { hitMarker = true; return -1 }
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if (pos + 1 >= b.length) { hitMarker = true; return -1 }
          val m = b(pos + 1) & 0xff
          if (m == 0x00) { pos += 2 } // stuffed data byte
          else { hitMarker = true; return -1 } // real marker: stop
        } else pos += 1
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Boolean = {
      cnt = 0
      hitMarker = false
      // tolerate fill bytes before the marker
      while (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }

    def decodeHuff(t: Huff): Int = { // T.81 F.2.2.3 DECODE
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.values(t.valPtr(l) + code - t.minCode(l))
        val x = bit()
        if (x < 0) return -1
        code = (code << 1) | x
        l += 1
      }
      -1
    }

    /** T.81 F.2.2.1 EXTEND: s-bit magnitude to signed value. */
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      val v = bits(s)
      if (v < 0) return Int.MinValue
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  private def be2(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  /** Decoded planes before color conversion. */
  private final class Component {
    var id = 0
    var h = 1; var v = 1; var tq = 0
    var dcTab = 0; var acTab = 0
    var planeW = 0; var planeH = 0
    var plane: Array[Byte] = null
    var pred = 0
    // progressive state: full-image coefficient store (natural order
    // per block) and block geometry
    var coefs: Array[Int] = null
    var blocksW = 0; var blocksH = 0 // padded (MCU multiples)
    var nbW = 0; var nbH = 0         // used blocks (ceil of comp dims)
  }

  def decode(b: Array[Byte]): PixelDecode.Rgb = {
    // no OutOfMemoryError catch: every allocation below is pre-validated
    // against MaxPixels-derived caps, so an OOME here would be genuine
    // executor heap exhaustion that must not be masked as "not a JPEG"
    try decode0(b)
    catch { case _: ArrayIndexOutOfBoundsException |
                 _: NegativeArraySizeException => null }
  }

  // format caps: a decode bomb must not allocate unboundedly (the
  // progressive path keeps 4 B per coefficient per component live)
  private val MaxPixels = 16 << 20

  private def decode0(b: Array[Byte]): PixelDecode.Rgb = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return null
    val qt = Array.ofDim[Int](4, 64) // natural order
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var w = 0; var h = 0
    var comps: Array[Component] = null
    var restartInterval = 0
    var orientation = 1
    var adobeTransform = -1 // APP14: 0 CMYK/RGB, 1 YCbCr, 2 YCCK
    var progressive = false
    var hmax = 1; var vmax = 1
    var mcusX = 0; var mcusY = 0
    var scansDone = 0
    var scanAt = -1   // baseline: position of the single scan's data
    var eoi = false
    var i = 2
    while (scanAt < 0 && !eoi) {
      if (i + 2 > b.length) return null
      if ((b(i) & 0xff) != 0xff) return null
      var m = b(i + 1) & 0xff
      while (m == 0xff) { i += 1; if (i + 1 >= b.length) return null
        m = b(i + 1) & 0xff }
      i += 2
      if (m == 0xd9) { // EOI: valid end for a progressive stream
        if (progressive && scansDone > 0) eoi = true else return null
      }
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) () // no payload
      else {
        if (i + 2 > b.length) return null
        val len = be2(b, i)
        if (len < 2 || i + len > b.length) return null
        var nextI = -1
        m match {
          case 0xdb => // DQT
            var j = i + 2
            while (j < i + len) {
              val pq = (b(j) & 0xff) >> 4
              val tq = b(j) & 0x0f
              if (pq > 1 || tq > 3) return null
              j += 1
              var k = 0
              while (k < 64) {
                val q = if (pq == 0) b(j + k) & 0xff else be2(b, j + 2 * k)
                if (q == 0) return null
                qt(tq)(Zig(k)) = q
                k += 1
              }
              j += (if (pq == 0) 64 else 128)
            }
          case 0xc4 => // DHT
            var j = i + 2
            while (j < i + len) {
              val tc = (b(j) & 0xff) >> 4
              val th = b(j) & 0x0f
              if (tc > 1 || th > 3) return null
              val bits = new Array[Int](16)
              var total = 0
              var l = 0
              while (l < 16) { bits(l) = b(j + 1 + l) & 0xff
                total += bits(l); l += 1 }
              if (total > 256 || j + 17 + total > i + len) return null
              val vals = new Array[Int](total)
              var k = 0
              while (k < total) { vals(k) = b(j + 17 + k) & 0xff; k += 1 }
              val t = new Huff(bits, vals)
              if (tc == 0) dcHuff(th) = t else acHuff(th) = t
              j += 17 + total
            }
          case 0xc0 | 0xc1 | 0xc2 => // baseline / ext sequential / PROGRESSIVE
            if (comps != null) return null
            progressive = m == 0xc2
            if ((b(i + 2) & 0xff) != 8) return null // precision
            h = be2(b, i + 3); w = be2(b, i + 5)
            val n = b(i + 7) & 0xff
            if (w <= 0 || h <= 0 || (n != 1 && n != 3 && n != 4))
              return null
            if (w.toLong * h > MaxPixels) return null
            comps = Array.fill(n)(new Component)
            var c = 0
            while (c < n) {
              val at = i + 8 + 3 * c
              comps(c).id = b(at) & 0xff
              comps(c).h = (b(at + 1) & 0xff) >> 4
              comps(c).v = b(at + 1) & 0x0f
              comps(c).tq = b(at + 2) & 0xff
              if (comps(c).h < 1 || comps(c).h > 4 || comps(c).v < 1 ||
                comps(c).v > 4 || comps(c).tq > 3) return null
              c += 1
            }
            comps.foreach { cm =>
              hmax = math.max(hmax, cm.h); vmax = math.max(vmax, cm.v) }
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            comps.foreach { cm =>
              cm.blocksW = mcusX * cm.h
              cm.blocksH = mcusY * cm.v
              cm.nbW = ((w * cm.h + hmax - 1) / hmax + 7) / 8
              cm.nbH = ((h * cm.v + vmax - 1) / vmax + 7) / 8
              if (progressive) {
                // MCU padding adds at most one MCU row/column of slack,
                // so a legitimate component never exceeds ~(w+32)(h+32)
                // coefficients; 2·MaxPixels caps crafted sampling-factor
                // bombs at O(MaxPixels) instead of 16× it
                if (cm.blocksW.toLong * cm.blocksH * 64 > 2L * MaxPixels)
                  return null
                cm.coefs = new Array[Int](cm.blocksW * cm.blocksH * 64)
              }
            }
          case x if x >= 0xc3 && x <= 0xcf && x != 0xc4 && x != 0xc8 &&
            x != 0xcc => return null // arithmetic / lossless / hierarchical
          case 0xe1 => // APP1: Exif orientation (tag 0x0112 in IFD0)
            orientation = exifOrientation(b, i + 2, len - 2, orientation)
          case 0xee => // APP14 Adobe: color-transform byte
            if (len >= 14 && b(i + 2) == 'A' && b(i + 3) == 'd' &&
              b(i + 4) == 'o' && b(i + 5) == 'b' && b(i + 6) == 'e')
              adobeTransform = b(i + 13) & 0xff
          case 0xdd => // DRI
            if (len < 4) return null
            restartInterval = be2(b, i + 2)
          case 0xda => // SOS
            if (comps == null) return null
            val ns = b(i + 2) & 0xff
            if (ns < 1 || ns > comps.length) return null
            val scanComps = new Array[Component](ns)
            var c = 0
            while (c < ns) {
              val cs = b(i + 3 + 2 * c) & 0xff
              // match by component id; positional fallback for writers
              // that number 0-based
              val ci = comps.indexWhere(_.id == cs)
              scanComps(c) = if (ci >= 0) comps(ci) else comps(c)
              scanComps(c).dcTab = (b(i + 4 + 2 * c) & 0xff) >> 4
              scanComps(c).acTab = b(i + 4 + 2 * c) & 0x0f
              if (scanComps(c).dcTab > 3 || scanComps(c).acTab > 3) return null
              c += 1
            }
            if (!progressive) {
              if (ns != comps.length) return null // interleaved only
              scanAt = i + len
            } else {
              val ss = b(i + 3 + 2 * ns) & 0xff
              val se = b(i + 4 + 2 * ns) & 0xff
              val ah = (b(i + 5 + 2 * ns) & 0xff) >> 4
              val al = b(i + 5 + 2 * ns) & 0x0f
              val r = new BitReader(b, i + len)
              if (!decodeProgressiveScan(r, scanComps, ss, se, ah, al,
                dcHuff, acHuff, restartInterval, mcusX, mcusY)) return null
              scansDone += 1
              nextI = r.pos
            }
          case _ => () // APPn / COM
        }
        i = if (nextI >= 0) nextI else i + len
      }
    }
    if (progressive) {
      // all scans in: dequantize + IDCT every used block per component
      val coef = new Array[Int](64)
      val out = new Array[Double](64)
      comps.foreach { cm =>
        cm.planeW = cm.blocksW * 8
        cm.planeH = cm.blocksH * 8
        cm.plane = new Array[Byte](cm.planeW * cm.planeH)
        val q = qt(cm.tq)
        var by = 0
        while (by < cm.nbH) {
          var bx = 0
          while (bx < cm.nbW) {
            val base = (by * cm.blocksW + bx) * 64
            var k = 0
            while (k < 64) { coef(k) = cm.coefs(base + k) * q(k); k += 1 }
            idct(coef, out)
            var y = 0
            while (y < 8) {
              val rowAt = (by * 8 + y) * cm.planeW + bx * 8
              var x = 0
              while (x < 8) {
                val v = math.rint(out(y * 8 + x) + 128.0).toInt
                cm.plane(rowAt + x) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        cm.coefs = null
      }
      val rgbP = toRgb(w, h, comps, hmax, vmax, adobeTransform)
      return if (rgbP == null) null else orient(rgbP, orientation)
    }
    // ---- baseline: single interleaved scan, block-at-a-time ----
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      if (c.planeW.toLong * c.planeH > 2L * MaxPixels) return null
      c.plane = new Array[Byte](c.planeW * c.planeH)
      if (dcHuff(c.dcTab) == null || acHuff(c.acTab) == null) return null
    }
    val r = new BitReader(b, scanAt)
    val coef = new Array[Int](64)
    val out = new Array[Double](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!r.restart()) return null
          comps.foreach(_.pred = 0)
        }
        var c = 0
        while (c < comps.length) {
          val cm = comps(c)
          var bv = 0
          while (bv < cm.v) {
            var bh = 0
            while (bh < cm.h) {
              if (!decodeBlock(r, cm, dcHuff(cm.dcTab), acHuff(cm.acTab),
                qt(cm.tq), coef, out)) return null
              // place the 8x8 block
              val px0 = (mx * cm.h + bh) * 8
              val py0 = (my * cm.v + bv) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                val rowAt = (py0 + y) * cm.planeW + px0
                while (x < 8) {
                  val v = math.rint(out(y * 8 + x) + 128.0).toInt
                  cm.plane(rowAt + x) =
                    (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                  x += 1
                }
                y += 1
              }
              bh += 1
            }
            bv += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    val rgb = toRgb(w, h, comps, hmax, vmax, adobeTransform)
    if (rgb == null) null else orient(rgb, orientation)
  }

  /** EXIF orientation from an APP1 payload: "Exif\0\0" + TIFF header
    * (II/MM byte order), IFD0 entry walk for tag 0x0112 (SHORT).
    * Returns `dflt` when absent or malformed — orientation metadata is
    * advisory, never a reason to fail a decode. */
  private def exifOrientation(b: Array[Byte], at: Int, len: Int,
                              dflt: Int): Int = {
    if (len < 14) return dflt
    if (b(at) != 'E' || b(at + 1) != 'x' || b(at + 2) != 'i' ||
      b(at + 3) != 'f' || b(at + 4) != 0 || b(at + 5) != 0) return dflt
    exifOrientationTiff(b, at + 6, len - 6, dflt)
  }

  /** Same walk from a bare TIFF header (WebP EXIF chunks may carry
    * the payload with or without the "Exif\0\0" prefix). */
  private[functions] def exifOrientationTiff(b: Array[Byte], tAt: Int,
                                             tLen: Int, dflt: Int): Int = {
    val t = tAt
    val at = tAt
    val len = tLen
    if (len < 8) return dflt
    val little =
      if (b(t) == 'I' && b(t + 1) == 'I') true
      else if (b(t) == 'M' && b(t + 1) == 'M') false
      else return dflt
    def u16(p: Int): Int =
      if (little) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (little) (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
      else ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
        ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
    if (t + 8 > at + len || u16(t + 2) != 42) return dflt
    val ifd0 = u32(t + 4)
    if (ifd0 < 0 || t + ifd0 + 2 > at + len) return dflt
    val e0 = (t + ifd0).toInt
    val n = u16(e0)
    var e = 0
    while (e < n) {
      val p = e0 + 2 + 12 * e
      if (p + 12 > at + len) return dflt
      if (u16(p) == 0x0112 && u16(p + 2) == 3) {
        val v = u16(p + 8)
        return if (v >= 1 && v <= 8) v else dflt
      }
      e += 1
    }
    dflt
  }

  /** Normalize pixels to EXIF orientation 1 — crawls are full of
    * camera images whose raster is stored rotated; a hash over the
    * un-normalized raster would miss the same image re-saved upright.
    * Shared with [[WebpCodec]] (VP8X EXIF chunks). */
  private[functions] def orient(img: PixelDecode.Rgb, o: Int): PixelDecode.Rgb = {
    if (img == null || o <= 1 || o > 8) return img
    val (w, h) = (img.w, img.h)
    val swap = o >= 5
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new Array[Byte](3 * ow * oh)
    var dy = 0
    while (dy < oh) {
      var dx = 0
      while (dx < ow) {
        val (sx, sy) = o match {
          case 2 => (w - 1 - dx, dy)
          case 3 => (w - 1 - dx, h - 1 - dy)
          case 4 => (dx, h - 1 - dy)
          case 5 => (dy, dx)
          case 6 => (dy, h - 1 - dx)
          case 7 => (w - 1 - dy, h - 1 - dx)
          case _ => (w - 1 - dy, dx) // 8
        }
        val si = 3 * (sy * w + sx)
        val di = 3 * (dy * ow + dx)
        out(di) = img.px(si); out(di + 1) = img.px(si + 1)
        out(di + 2) = img.px(si + 2)
        dx += 1
      }
      dy += 1
    }
    new PixelDecode.Rgb(ow, oh, out)
  }

  /** One progressive scan (T.81 G.1.2): DC first/refine (interleaved
    * or single-component), AC first/refine with EOB-run accounting
    * (single-component only, block raster over the component's used
    * blocks). Coefficients accumulate UNQUANTIZED into the
    * component's full-image store; restart markers reset predictors
    * and the EOB run. */
  private def decodeProgressiveScan(r: BitReader, scanComps: Array[Component],
                                    ss: Int, se: Int, ah: Int, al: Int,
                                    dcHuff: Array[Huff], acHuff: Array[Huff],
                                    restartInterval: Int,
                                    mcusX: Int, mcusY: Int): Boolean = {
    val ns = scanComps.length
    if (ss < 0 || se > 63 || ss > se || al > 13) return false
    val isDc = ss == 0
    if (isDc && se != 0 && ns > 1) return false // interleaved AC is illegal
    if (!isDc && ns != 1) return false
    if (ah == 0) scanComps.foreach(_.pred = 0) // fresh predictors per scan
    var eobrun = 0
    var mcu = 0

    def checkRestart(): Boolean = {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!r.restart()) return false
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }
      true
    }

    def dcBlock(cm: Component, base: Int): Boolean = {
      if (ah == 0) { // first DC scan
        val dc = dcHuff(cm.dcTab)
        if (dc == null) return false
        val t = r.decodeHuff(dc)
        if (t < 0 || t > 15) return false
        val diff = r.receiveExtend(t)
        if (diff == Int.MinValue) return false
        cm.pred += diff
        cm.coefs(base) = cm.pred << al
      } else { // refinement: one bit
        val bit = r.bit()
        if (bit < 0) return false
        if (bit == 1) cm.coefs(base) |= (1 << al)
      }
      true
    }

    def acFirstBlock(cm: Component, base: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      val ac = acHuff(cm.acTab)
      if (ac == null) return false
      var k = ss
      while (k <= se) {
        val rs = r.decodeHuff(ac)
        if (rs < 0) return false
        val run = rs >> 4
        val sz = rs & 15
        if (sz == 0) {
          if (run == 15) k += 16 // ZRL
          else {
            eobrun = 1 << run
            if (run > 0) {
              val extra = r.bits(run)
              if (extra < 0) return false
              eobrun += extra
            }
            eobrun -= 1 // this block is part of the run
            return true
          }
        } else {
          k += run
          if (k > se) return false
          val v = r.receiveExtend(sz)
          if (v == Int.MinValue) return false
          cm.coefs(base + Zig(k)) = v << al
          k += 1
        }
      }
      true
    }

    def acRefineBlock(cm: Component, base: Int): Boolean = {
      val ac = acHuff(cm.acTab)
      if (ac == null) return false
      val p1 = 1 << al
      val m1 = -1 << al
      var k = ss
      if (eobrun == 0) {
        var stop = false
        while (k <= se && !stop) {
          val rs = r.decodeHuff(ac)
          if (rs < 0) return false
          var run = rs >> 4
          val sz = rs & 15
          var newVal = 0
          if (sz == 0) {
            if (run != 15) { // EOBn: run of end-of-band blocks begins
              eobrun = 1 << run
              if (run > 0) {
                val extra = r.bits(run)
                if (extra < 0) return false
                eobrun += extra
              }
              stop = true
            }
            // run == 15 (ZRL): skip 16 zero-history coefficients
          } else {
            if (sz != 1) return false
            val bit = r.bit()
            if (bit < 0) return false
            newVal = if (bit == 1) p1 else m1
          }
          if (!stop) {
            // advance over `run` zero-history coefficients, applying
            // correction bits to every nonzero-history one passed
            var placed = false
            while (k <= se && !placed) {
              val z = base + Zig(k)
              if (cm.coefs(z) != 0) {
                val bit = r.bit()
                if (bit < 0) return false
                if (bit == 1 && (cm.coefs(z) & p1) == 0)
                  cm.coefs(z) += (if (cm.coefs(z) >= 0) p1 else m1)
                k += 1
              } else {
                if (run == 0) {
                  if (newVal != 0) { cm.coefs(z) = newVal; placed = true }
                  else placed = true // ZRL consumed its 16 zeros
                  k += 1
                } else { run -= 1; k += 1 }
              }
            }
          }
        }
      }
      if (eobrun > 0) {
        // end-of-band: correction bits for the remaining nonzero
        // coefficients of this block
        while (k <= se) {
          val z = base + Zig(k)
          if (cm.coefs(z) != 0) {
            val bit = r.bit()
            if (bit < 0) return false
            if (bit == 1 && (cm.coefs(z) & p1) == 0)
              cm.coefs(z) += (if (cm.coefs(z) >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    if (isDc && ns > 1) { // interleaved DC scan: MCU order
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (!checkRestart()) return false
          var c = 0
          while (c < ns) {
            val cm = scanComps(c)
            var bv = 0
            while (bv < cm.v) {
              var bh = 0
              while (bh < cm.h) {
                val bx = mx * cm.h + bh
                val by = my * cm.v + bv
                if (!dcBlock(cm, (by * cm.blocksW + bx) * 64)) return false
                bh += 1
              }
              bv += 1
            }
            c += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else { // single-component scan: raster over used blocks
      val cm = scanComps(0)
      var by = 0
      while (by < cm.nbH) {
        var bx = 0
        while (bx < cm.nbW) {
          if (!checkRestart()) return false
          val base = (by * cm.blocksW + bx) * 64
          val ok =
            if (isDc && se == 0) dcBlock(cm, base)
            else if (ah == 0) acFirstBlock(cm, base)
            else acRefineBlock(cm, base)
          if (!ok) return false
          mcu += 1
          bx += 1
        }
        by += 1
      }
    }
    true
  }

  /** Shared chroma upsampling + color conversion + crop. 3-component
    * frames are JFIF YCbCr unless APP14 says transform 0 (Adobe RGB,
    * stored directly). 4-component frames need an Adobe APP14 and are
    * CMYK (transform 0) or YCCK (transform 2) in Adobe's INVERTED-ink
    * convention: stored 255 = no ink, so R = c·k/255 (rounded) on the
    * stored values, with YCCK first passing its three chroma-coded
    * channels through the YCbCr math; anything else returns null
    * (bare 4-component files don't declare their ink polarity). */
  private def toRgb(w: Int, h: Int, comps: Array[Component],
                    hmax: Int, vmax: Int, adobe: Int): PixelDecode.Rgb = {
    val px = new Array[Byte](3 * w * h)
    @inline def samp(cm: Component, x: Int, y: Int): Int =
      cm.plane((y * cm.v / vmax) * cm.planeW + x * cm.h / hmax) & 0xff
    if (comps.length == 1) {
      val cm = comps(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = cm.plane(y * cm.planeW + x)
          val at = 3 * (y * w + x)
          px(at) = g; px(at + 1) = g; px(at + 2) = g
          x += 1
        }
        y += 1
      }
    } else if (comps.length == 3 && adobe == 0) {
      // Adobe transform 0 with three components: RGB stored directly
      val cr0 = comps(0); val cg0 = comps(1); val cb0 = comps(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val at = 3 * (y * w + x)
          px(at) = samp(cr0, x, y).toByte
          px(at + 1) = samp(cg0, x, y).toByte
          px(at + 2) = samp(cb0, x, y).toByte
          x += 1
        }
        y += 1
      }
    } else if (comps.length == 3) {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = samp(cy, x, y)
          val u = samp(cb, x, y) - 128
          val v = samp(cr, x, y) - 128
          val at = 3 * (y * w + x)
          px(at) = clamp(math.rint(yy + 1.402 * v))
          px(at + 1) = clamp(math.rint(yy - 0.344136 * u - 0.714136 * v))
          px(at + 2) = clamp(math.rint(yy + 1.772 * u))
          x += 1
        }
        y += 1
      }
    } else { // 4 components: Adobe CMYK / YCCK only
      if (adobe != 0 && adobe != 2) return null
      val c0 = comps(0); val c1 = comps(1); val c2 = comps(2)
      val ck = comps(3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = samp(c0, x, y)
          var m = samp(c1, x, y)
          var yl = samp(c2, x, y)
          val k = samp(ck, x, y)
          if (adobe == 2) { // YCCK: chroma-coded inverted CMY
            val u = m - 128
            val v = yl - 128
            val nc = iclamp(math.rint(c + 1.402 * v))
            val nm = iclamp(math.rint(c - 0.344136 * u - 0.714136 * v))
            yl = iclamp(math.rint(c + 1.772 * u))
            c = nc; m = nm
          }
          val at = 3 * (y * w + x)
          px(at) = ((c * k + 127) / 255).toByte
          px(at + 1) = ((m * k + 127) / 255).toByte
          px(at + 2) = ((yl * k + 127) / 255).toByte
          x += 1
        }
        y += 1
      }
    }
    new PixelDecode.Rgb(w, h, px)
  }

  private def clamp(d: Double): Byte = {
    val v = d.toInt
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte
  }

  private def decodeBlock(r: BitReader, cm: Component, dc: Huff, ac: Huff,
                          q: Array[Int], coef: Array[Int],
                          out: Array[Double]): Boolean = {
    java.util.Arrays.fill(coef, 0)
    val t = r.decodeHuff(dc)
    if (t < 0 || t > 15) return false
    val diff = r.receiveExtend(t)
    if (diff == Int.MinValue) return false
    cm.pred += diff
    coef(0) = cm.pred * q(0)
    var k = 1
    var done = false
    while (!done && k < 64) {
      val rs = r.decodeHuff(ac)
      if (rs < 0) return false
      val run = rs >> 4
      val s = rs & 15
      if (s == 0) {
        if (run == 15) k += 16 // ZRL
        else done = true // EOB
      } else {
        k += run
        if (k > 63) return false
        val v = r.receiveExtend(s)
        if (v == Int.MinValue) return false
        coef(Zig(k)) = v * q(Zig(k))
        k += 1
      }
    }
    idct(coef, out)
    true
  }

  /** Separable double-precision inverse DCT (T.81 A.3.3). */
  private def idct(coef: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: over u
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          s += cu * coef(y * 8 + u) * CosT(u * 8 + x)
          u += 1
        }
        tmp(y * 8 + x) = s * 0.5
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // cols: over v
      var y2 = 0
      while (y2 < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val cv = if (v == 0) InvSqrt2 else 1.0
          s += cv * tmp(v * 8 + x) * CosT(v * 8 + y2)
          v += 1
        }
        out(y2 * 8 + x) = s * 0.5
        y2 += 1
      }
      x += 1
    }
  }

  // ---------------------------------------------------------------- encode

  /** T.81 Annex K.1 luminance table (the published reference quality
    * baseline), linearly scaled like every mainstream encoder:
    * `quality` 1..100, 50 = the table as printed. */
  def quantTable(quality: Int): Array[Int] = {
    val base = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map(v => math.max(1, math.min(255, (v * scale + 50) / 100)))
  }

  /** A table whose flat-block decode is bit-exact: DC step 8 makes the
    * quantized DC of a constant block `v − 128` with zero loss; AC
    * steps are irrelevant for flat content. */
  def flatExactTable(acStep: Int = 16): Array[Int] = {
    val t = Array.fill(64)(math.max(1, math.min(255, acStep)))
    t(0) = 8
    t
  }

  def encodeGray(w: Int, h: Int, gray: Array[Byte], quant: Array[Int],
                 restartInterval: Int = 0): Array[Byte] = {
    val p = new Array[Int](w * h)
    var i = 0
    while (i < w * h) { p(i) = gray(i) & 0xff; i += 1 }
    encodePlanes(w, h, Array(pad8(w, h, p)), Array(1), Array(1), quant,
      restartInterval)
  }

  /** 4:4:4 color from packed RGB (3wh, top-down). */
  def encode444(w: Int, h: Int, rgb: Array[Byte], quant: Array[Int],
                restartInterval: Int = 0): Array[Byte] = {
    val (py, pu, pv) = toYcbcr(w, h, rgb)
    encodePlanes(w, h,
      Array(pad8(w, h, py), pad8(w, h, pu), pad8(w, h, pv)),
      Array(1, 1, 1), Array(1, 1, 1), quant, restartInterval)
  }

  /** 4:2:0 color from packed RGB: chroma box-averaged 2×2. */
  def encode420(w: Int, h: Int, rgb: Array[Byte], quant: Array[Int],
                restartInterval: Int = 0): Array[Byte] = {
    val (py, pu, pv) = toYcbcr(w, h, rgb)
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    def sub(p: Array[Int]): Array[Int] = {
      val o = new Array[Int](cw * ch)
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) {
          var s = 0; var n = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val sx = 2 * x + dx; val sy = 2 * y + dy
              if (sx < w && sy < h) { s += p(sy * w + sx); n += 1 }
              dx += 1
            }
            dy += 1
          }
          o(y * cw + x) = (s + n / 2) / n
          x += 1
        }
        y += 1
      }
      o
    }
    encodePlanes(w, h,
      Array(pad16(w, h, py), pad8(cw, ch, sub(pu)), pad8(cw, ch, sub(pv))),
      Array(2, 1, 1), Array(2, 1, 1), quant, restartInterval)
  }

  private def toYcbcr(w: Int, h: Int,
                      rgb: Array[Byte]): (Array[Int], Array[Int], Array[Int]) = {
    val py = new Array[Int](w * h)
    val pu = new Array[Int](w * h)
    val pv = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      py(i) = iclamp(math.rint(0.299 * r + 0.587 * g + 0.114 * b))
      pu(i) = iclamp(math.rint(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b))
      pv(i) = iclamp(math.rint(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b))
      i += 1
    }
    (py, pu, pv)
  }

  private def iclamp(d: Double): Int = {
    val v = d.toInt
    if (v < 0) 0 else if (v > 255) 255 else v
  }

  private final class Plane(val w: Int, val h: Int, val data: Array[Int])

  /** Replicate-pad a plane to 8-multiple dims (block boundary). */
  private def pad8(w: Int, h: Int, p: Array[Int]): Plane = padTo(w, h, p, 8)
  /** Pad the LUMA plane of 4:2:0 to 16-multiples (MCU boundary). */
  private def pad16(w: Int, h: Int, p: Array[Int]): Plane = padTo(w, h, p, 16)

  private def padTo(w: Int, h: Int, p: Array[Int], m: Int): Plane = {
    val pw = (w + m - 1) / m * m
    val ph = (h + m - 1) / m * m
    val o = new Array[Int](pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) {
        o(y * pw + x) = p(sy * w + math.min(x, w - 1))
        x += 1
      }
      y += 1
    }
    new Plane(pw, ph, o)
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { // pad with 1-bits (F.1.2.3)
      buf = (buf << (8 - cnt)) | ((1 << (8 - cnt)) - 1)
      out.write(buf & 0xff)
      if ((buf & 0xff) == 0xff) out.write(0x00)
      buf = 0; cnt = 0
    }
  }

  /** Package-merge length-limited Huffman over symbol frequencies; a
    * zero-frequency sentinel symbol takes the longest all-ones code
    * and is then dropped, keeping that code unassigned (F.1.4.4.1).
    * Returns (bitsPerLen[16], valuesInCodeOrder, codeOf, lenOf). */
  private def buildHuff(freq: Array[Long])
    : (Array[Int], Array[Int], Array[Int], Array[Int]) = {
    val syms = (0 until freq.length).filter(freq(_) > 0).toArray
    val maxLen = 16
    val items: Array[(Long, Int)] =
      (syms.map(s => (freq(s), s)) :+ ((0L, freq.length)))
        .sortBy(t => (t._1, t._2))
    val lens = new Array[Int](freq.length + 1)
    if (items.length == 1) lens(items.head._2) = 1
    else {
      val base: Array[(Long, List[Int])] =
        items.map { case (f, s) => (f, List(s)) }
      var sol = base
      var i = 1
      while (i < maxLen) {
        val pk = sol.grouped(2).filter(_.length == 2)
          .map(p => (p(0)._1 + p(1)._1, p(0)._2 ::: p(1)._2)).toArray
        sol = (base ++ pk).sortBy(_._1)
        i += 1
      }
      // the 2(n-1) cheapest entries of the final solution; each
      // appearance of a symbol adds one to its code length
      sol.take(2 * items.length - 2).foreach(_._2.foreach(s => lens(s) += 1))
    }
    // drop the sentinel: it sorts after every real symbol at the max
    // length, so removing it frees exactly the all-ones code
    val bits = new Array[Int](16)
    syms.foreach(s => bits(lens(s) - 1) += 1)
    val order = syms.sortBy(s => (lens(s), s))
    val codeOf = new Array[Int](freq.length)
    var code = 0
    var prevLen = 0
    order.foreach { s =>
      code <<= (lens(s) - prevLen)
      codeOf(s) = code
      code += 1
      prevLen = lens(s)
    }
    (bits, order, codeOf, java.util.Arrays.copyOf(lens, freq.length))
  }

  private def csize(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  private def fdct(in: Array[Int], out: Array[Int], q: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) { // rows
      var y = 0
      while (y < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += (in(y * 8 + x) - 128) * CosT(u * 8 + x); x += 1 }
        tmp(y * 8 + u) = s * (if (u == 0) InvSqrt2 else 1.0) * 0.5
        y += 1
      }
      u += 1
    }
    var v = 0
    while (v < 8) { // cols
      var u2 = 0
      while (u2 < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) { s += tmp(y * 8 + u2) * CosT(v * 8 + y); y += 1 }
        val coef = s * (if (v == 0) InvSqrt2 else 1.0) * 0.5
        out(v * 8 + u2) = math.rint(coef / q(v * 8 + u2)).toInt
        u2 += 1
      }
      v += 1
    }
  }

  /** Adobe 4-component 4:4:4:4 CMYK (transform 0) or YCCK (transform
    * 2): `chans` are the four STORED planes (Adobe inverted-ink
    * convention — the caller supplies YCC-coded values for YCCK). */
  def encodeAdobe4(w: Int, h: Int, chans: Array[Array[Byte]],
                   quant: Array[Int], transform: Int): Array[Byte] = {
    require(chans.length == 4 && (transform == 0 || transform == 2))
    val planes = chans.map { ch =>
      val p = new Array[Int](w * h)
      var i = 0
      while (i < w * h) { p(i) = ch(i) & 0xff; i += 1 }
      pad8(w, h, p)
    }
    encodePlanes(w, h, planes, Array(1, 1, 1, 1), Array(1, 1, 1, 1),
      quant, 0, transform)
  }

  private def encodePlanes(w: Int, h: Int, planes: Array[Plane],
                           hs: Array[Int], vs: Array[Int],
                           quant: Array[Int],
                           restartInterval: Int,
                           adobeTransform: Int = -1): Array[Byte] = {
    val n = planes.length
    val hmax = hs.max; val vmax = vs.max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // pass 1: quantized blocks in MCU order + symbol frequencies
    val dcFreq = new Array[Long](257)
    val acFreq = new Array[Long](257)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    val pred = new Array[Int](n)
    val blk = new Array[Int](64)
    var mcuIdx = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 &&
          mcuIdx % restartInterval == 0)
          java.util.Arrays.fill(pred, 0, n, 0)
        mcuIdx += 1
        var c = 0
        while (c < n) {
          val p = planes(c)
          var bv = 0
          while (bv < vs(c)) {
            var bh = 0
            while (bh < hs(c)) {
              val px0 = (mx * hs(c) + bh) * 8
              val py0 = (my * vs(c) + bv) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  blk(y * 8 + x) = p.data(
                    math.min(py0 + y, p.h - 1) * p.w + math.min(px0 + x, p.w - 1))
                  x += 1
                }
                y += 1
              }
              val out = new Array[Int](64)
              fdct(blk, out, quant)
              // count symbols
              val diff = out(0) - pred(c)
              pred(c) = out(0)
              dcFreq(csize(diff)) += 1
              var k = 1
              var lastNz = 0
              var kk = 1
              while (kk < 64) { if (out(Zig(kk)) != 0) lastNz = kk; kk += 1 }
              var run = 0
              k = 1
              while (k <= lastNz) {
                val v = out(Zig(k))
                if (v == 0) { run += 1 }
                else {
                  while (run > 15) { acFreq(0xf0) += 1; run -= 16 }
                  acFreq((run << 4) | csize(v)) += 1
                  run = 0
                }
                k += 1
              }
              if (lastNz < 63) acFreq(0x00) += 1 // EOB
              blocks += out.clone()
              bh += 1
            }
            bv += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    val (dcBits, dcOrder, dcCode, dcLen) = buildHuff(dcFreq)
    val (acBits, acOrder, acCode, acLen) = buildHuff(acFreq)
    // headers
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w16(0xffd8) // SOI
    if (adobeTransform >= 0) {
      // APP14 Adobe (JFIF forbids 4 components): version 100, flags 0
      w16(0xffee); w16(14)
      "Adobe".foreach(ch => w8(ch))
      w16(100); w16(0); w16(0); w8(adobeTransform)
    } else {
      // APP0 JFIF
      w16(0xffe0); w16(16)
      "JFIF".foreach(ch => w8(ch))
      w8(0); w8(1); w8(1); w8(0); w16(1); w16(1); w8(0); w8(0)
    }
    // DQT (one table, id 0, 8-bit)
    w16(0xffdb); w16(2 + 1 + 64); w8(0)
    var k = 0
    while (k < 64) { w8(quant(Zig(k))); k += 1 }
    // SOF0
    w16(0xffc0); w16(8 + 3 * n); w8(8); w16(h); w16(w); w8(n)
    var c = 0
    while (c < n) { w8(c + 1); w8((hs(c) << 4) | vs(c)); w8(0); c += 1 }
    // DHT: DC table 0 then AC table 0 (both classes share across comps)
    def dht(cls: Int, bits: Array[Int], order: Array[Int]): Unit = {
      w16(0xffc4); w16(2 + 1 + 16 + order.length); w8(cls << 4)
      bits.foreach(w8)
      order.foreach(w8)
    }
    dht(0, dcBits, dcOrder)
    dht(1, acBits, acOrder)
    if (restartInterval > 0) { w16(0xffdd); w16(4); w16(restartInterval) }
    // SOS
    w16(0xffda); w16(6 + 2 * n); w8(n)
    c = 0
    while (c < n) { w8(c + 1); w8(0x00); c += 1 } // DC 0 / AC 0
    w8(0); w8(63); w8(0)
    // pass 2: entropy-coded data
    val bw = new BitWriter(out)
    java.util.Arrays.fill(pred, 0, n, 0)
    var bi = 0
    mcuIdx = 0
    my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuIdx > 0 &&
          mcuIdx % restartInterval == 0) {
          bw.flush()
          w16(0xffd0 + ((mcuIdx / restartInterval - 1) & 7))
          java.util.Arrays.fill(pred, 0, n, 0)
        }
        mcuIdx += 1
        c = 0
        while (c < n) {
          var b2 = 0
          val per = hs(c) * vs(c)
          while (b2 < per) {
            val blkQ = blocks(bi); bi += 1
            val diff = blkQ(0) - pred(c)
            pred(c) = blkQ(0)
            val s = csize(diff)
            bw.put(dcCode(s), dcLen(s))
            if (s > 0)
              bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
            var lastNz = 0
            var kk = 1
            while (kk < 64) { if (blkQ(Zig(kk)) != 0) lastNz = kk; kk += 1 }
            var run = 0
            var k2 = 1
            while (k2 <= lastNz) {
              val v = blkQ(Zig(k2))
              if (v == 0) run += 1
              else {
                while (run > 15) { bw.put(acCode(0xf0), acLen(0xf0)); run -= 16 }
                val ss = csize(v)
                val sym = (run << 4) | ss
                bw.put(acCode(sym), acLen(sym))
                bw.put(if (v < 0) v + (1 << ss) - 1 else v, ss)
                run = 0
              }
              k2 += 1
            }
            if (lastNz < 63) bw.put(acCode(0x00), acLen(0x00))
            b2 += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    w16(0xffd9) // EOI
    out.toByteArray
  }
}
