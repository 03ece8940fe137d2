package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** VP8L conformance: encoder↔decoder round trips, hand-built streams
  * for every decoder feature the simple encoder never emits
  * (subtract-green, predictor modes, cross-color, color-indexing with
  * sub-byte packing, LZ77 backward references, color cache), container
  * walking (VP8X), lossy classification, and a mutation fuzz battery
  * (decode must never throw). */
class WebpCodecSpec extends AnyFunSuite {

  private def argbOf(rgb: PixelDecode.Rgb): Array[Int] = {
    val out = new Array[Int](rgb.w * rgb.h)
    var i = 0
    while (i < out.length) {
      out(i) = ((rgb.px(3 * i) & 0xff) << 16) |
        ((rgb.px(3 * i + 1) & 0xff) << 8) | (rgb.px(3 * i + 2) & 0xff)
      i += 1
    }
    out
  }

  // deterministic pixel soup (LCG — no Random seeds to chase)
  private def lcgPixels(n: Int, seed: Int): Array[Int] = {
    var s = seed
    Array.fill(n) {
      s = s * 1103515245 + 12345
      0xff000000 | (s >>> 8 & 0xffffff)
    }
  }

  test("encodeArgb round-trips exactly across shapes") {
    for ((w, h) <- Seq((1, 1), (7, 3), (16, 16), (33, 9), (64, 1), (1, 40))) {
      val px = lcgPixels(w * h, w * 1000 + h)
      val enc = WebpCodec.encodeArgb(w, h, px)
      val dec = WebpCodec.decode(enc)
      assert(dec != null, s"${w}x$h decode failed")
      assert(dec.w == w && dec.h == h)
      assert(argbOf(dec).toSeq == px.map(_ & 0xffffff).toSeq, s"${w}x$h pixels")
    }
  }

  test("encodeGray round-trips and constant images take the simple-code path") {
    val gray = Array.tabulate(24 * 16)(i => ((i * 31) % 200).toByte)
    val dec = WebpCodec.decode(WebpCodec.encodeGray(24, 16, gray))
    assert(dec != null && dec.w == 24 && dec.h == 16)
    var i = 0
    while (i < gray.length) {
      val v = gray(i) & 0xff
      assert((dec.px(3 * i) & 0xff) == v && (dec.px(3 * i + 1) & 0xff) == v &&
        (dec.px(3 * i + 2) & 0xff) == v)
      i += 1
    }
    // fully constant image: all five codes single-symbol, still valid
    val const = WebpCodec.decode(
      WebpCodec.encodeArgb(5, 4, Array.fill(20)(0xff102030)))
    assert(const != null && argbOf(const).forall(_ == 0x102030))
  }

  test("PixelDecode routes WebP and classifies containers") {
    val gray = Array.tabulate(16 * 16)(i => (i % 97).toByte)
    val webp = WebpCodec.encodeGray(16, 16, gray)
    val viaAny = PixelDecode.decode(webp)
    assert(viaAny != null && viaAny.w == 16)
    assert(PixelDecode.container(webp) == "webp_lossless")
    assert(PixelDecode.container(WebpCodec.lossyStub(64, 48)) == "webp_lossy")
    assert(PixelDecode.decode(WebpCodec.lossyStub(64, 48)) == null)
    assert(PixelDecode.container("RIFFxxxxWAVEfmt ".getBytes("US-ASCII")) == null)
    val bmp = graft.ops.MediaScenes.bmpBytes(8, 8, new Array[Byte](64))
    assert(PixelDecode.container(bmp) == "bmp")
  }

  test("VP8X extended container walks to the VP8L chunk") {
    val gray = Array.tabulate(8 * 8)(i => (i * 3).toByte)
    val plain = WebpCodec.encodeGray(8, 8, gray)
    // rebuild: RIFF [ VP8X(10 bytes) + VP8L(payload from plain) ]
    val vp8l = java.util.Arrays.copyOfRange(plain, 20, plain.length)
    val out = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le4(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    cc("RIFF"); le4(4 + 8 + 10 + 8 + vp8l.length + (vp8l.length & 1)); cc("WEBP")
    cc("VP8X"); le4(10)
    out.write(0); out.write(0); out.write(0); out.write(0) // flags+reserved
    out.write(7); out.write(0); out.write(0) // canvas w-1 = 7
    out.write(7); out.write(0); out.write(0) // canvas h-1 = 7
    cc("VP8L"); le4(vp8l.length); out.write(vp8l)
    if ((vp8l.length & 1) == 1) out.write(0)
    val b = out.toByteArray
    assert(WebpCodec.riffKind(b) == "webp_lossless")
    val dec = WebpCodec.decode(b)
    assert(dec != null && dec.w == 8 && dec.h == 8)
  }

  // VP8X container assembly for the EXIF / animation tests
  private def vp8x(canvasW: Int, canvasH: Int, flags: Int,
                   chunks: (String, Array[Byte])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le4(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    val body = chunks.map { case (_, p) => 8 + p.length + (p.length & 1) }.sum
    cc("RIFF"); le4(4 + 8 + 10 + body); cc("WEBP")
    cc("VP8X"); le4(10)
    out.write(flags); out.write(0); out.write(0); out.write(0)
    out.write((canvasW - 1) & 0xff); out.write(((canvasW - 1) >> 8) & 0xff)
    out.write(((canvasW - 1) >> 16) & 0xff)
    out.write((canvasH - 1) & 0xff); out.write(((canvasH - 1) >> 8) & 0xff)
    out.write(((canvasH - 1) >> 16) & 0xff)
    for ((name, p) <- chunks) {
      cc(name); le4(p.length); out.write(p)
      if ((p.length & 1) == 1) out.write(0)
    }
    out.toByteArray
  }

  private def exifPayload(orientation: Int, prefix: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (prefix) { out.write("Exif".getBytes("US-ASCII")); out.write(0); out.write(0) }
    out.write('I'); out.write('I'); out.write(42); out.write(0)
    out.write(8); out.write(0); out.write(0); out.write(0) // IFD0 at 8
    out.write(1); out.write(0) // one entry
    out.write(0x12); out.write(0x01) // tag 0x0112
    out.write(3); out.write(0) // SHORT
    out.write(1); out.write(0); out.write(0); out.write(0) // count 1
    out.write(orientation); out.write(0); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(0); out.write(0) // next IFD
    out.toByteArray
  }

  test("VP8X EXIF orientation normalizes the lossy raster like JPEG") {
    // an asymmetric per-4x4 scene so rotation is observable
    val w = 24; val h = 16
    val g = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      g(y * w + x) = (20 + (x / 4) * 30 + (y / 4) * 7).toByte
    val plain = Vp8Codec.encodeGrayB4x4(w, h, g)
    val vp8 = java.util.Arrays.copyOfRange(plain, 20, plain.length)
    for (prefix <- Seq(true, false)) {
      val b = vp8x(w, h, 0x08, "EXIF" -> exifPayload(6, prefix),
        "VP8 " -> vp8)
      assert(WebpCodec.riffKind(b) == "webp_lossy")
      val img = WebpCodec.decode(b)
      assert(img != null, s"prefix=$prefix")
      // orientation 6: 90° clockwise — dims swap, (dx,dy) <- (dy, h-1-dx)
      assert(img.w == h && img.h == w, s"prefix=$prefix dims")
      for (dy <- 0 until img.h; dx <- 0 until img.w) {
        val sx = dy
        val sy = h - 1 - dx
        assert((img.px(3 * (dy * img.w + dx)) & 0xff) ==
          (g(sy * w + sx) & 0xff), s"prefix=$prefix ($dx,$dy)")
      }
    }
    // orientation 1 (or absent) leaves the raster alone
    val b1 = vp8x(w, h, 0x08, "EXIF" -> exifPayload(1, true), "VP8 " -> vp8)
    val img1 = WebpCodec.decode(b1)
    assert(img1 != null && img1.w == w && img1.h == h)
  }

  test("animated WebP decodes its first frame (the dedup identity)") {
    val w = 16; val h = 16
    val g = Array.tabulate(w * h)(i => (30 + ((i % w) / 4) * 40).toByte)
    val plain = Vp8Codec.encodeGrayB4x4(w, h, g)
    val vp8 = java.util.Arrays.copyOfRange(plain, 20, plain.length)
    // ANMF frame params: x/3 y/3 (w-1)/3 (h-1)/3 duration/3 flags/1
    val params = new java.io.ByteArrayOutputStream()
    def le3(v: Int): Unit = { params.write(v & 0xff)
      params.write((v >> 8) & 0xff); params.write((v >> 16) & 0xff) }
    le3(0); le3(0); le3(w - 1); le3(h - 1); le3(100); params.write(0)
    val anmf = new java.io.ByteArrayOutputStream()
    anmf.write(params.toByteArray)
    anmf.write("VP8 ".getBytes("US-ASCII"))
    anmf.write(vp8.length & 0xff); anmf.write((vp8.length >> 8) & 0xff)
    anmf.write((vp8.length >> 16) & 0xff); anmf.write((vp8.length >> 24) & 0xff)
    anmf.write(vp8)
    if ((vp8.length & 1) == 1) anmf.write(0)
    val anim = Array[Byte](0, 0, 0, 0, 0, 0) // bg color + loop count
    val b = vp8x(w, h, 0x02, "ANIM" -> anim, "ANMF" -> anmf.toByteArray)
    assert(WebpCodec.riffKind(b) == "webp_lossy")
    assert(PixelDecode.container(b) == "webp_lossy")
    val img = WebpCodec.decode(b)
    assert(img != null && img.w == w && img.h == h)
    for (i <- 0 until w * h)
      assert((img.px(3 * i) & 0xff) == (g(i) & 0xff), s"px $i")
  }

  // ------------------------------------------------ hand-built streams

  /** Canonical code assignment (DEFLATE rule) for emitting symbols. */
  private def canonical(lens: Array[Int]): Array[Int] = {
    val counts = new Array[Int](16)
    lens.foreach(l => if (l > 0) counts(l) += 1)
    val first = new Array[Int](16)
    var code = 0; var prev = 0
    for (l <- 1 to 15) { code = (code + prev) << 1; first(l) = code
      prev = counts(l) }
    val next = first.clone()
    val out = new Array[Int](lens.length)
    for (s <- lens.indices if lens(s) > 0) { out(s) = next(lens(s))
      next(lens(s)) += 1 }
    out
  }

  /** Write a full (non-simple) prefix code for the given lengths using
    * a fixed complete code-length code: symbols {0..12, 16, 17, 18}
    * all at length 4 ⇒ 4-bit codes 0..12, 13, 14, 15 in symbol order. */
  private def writeLens(bw: WebpCodec.Bw, lens: Array[Int]): Unit = {
    bw.write(1, 0) // not simple
    bw.write(4, 15) // 19 code-length entries
    val cl = new Array[Int](19)
    for (s <- 0 to 12) cl(s) = 4
    cl(16) = 4; cl(17) = 4; cl(18) = 4
    for (i <- 0 until 19) bw.write(3, cl(WebpCodec.ClOrder(i)))
    bw.write(1, 0) // no max-symbol shortcut
    var i = 0
    while (i < lens.length) {
      if (lens(i) == 0) {
        var run = 0
        while (i + run < lens.length && lens(i + run) == 0) run += 1
        var r = run
        while (r >= 11) {
          val take = math.min(138, if (r - 138 == 1 || r - 138 == 2) r - 3 else r)
          bw.writeCode(4, 15); bw.write(7, take - 11); r -= take
        }
        if (r >= 3) { bw.writeCode(4, 14); bw.write(3, r - 3); r = 0 }
        while (r > 0) { bw.writeCode(4, 0); r -= 1 }
        i += run
      } else {
        assert(lens(i) <= 12)
        bw.writeCode(4, lens(i))
        i += 1
      }
    }
  }

  /** Emit the five-code group + literal pixel data for tiny hand
    * streams: channels coded with explicit length tables so symbols
    * ≥ 256 (lengths) and cache symbols are reachable. */
  private class StreamBuilder(cacheBits: Int) {
    val bw = new WebpCodec.Bw
    private var greenLens: Array[Int] = _
    private var greenCodes: Array[Int] = _
    private var chanLens: Array[Int] = _
    private var chanCodes: Array[Int] = _
    private var distLens: Array[Int] = _
    private var distCodes: Array[Int] = _

    def header(w: Int, h: Int): this.type = {
      bw.write(8, 0x2f); bw.write(14, w - 1); bw.write(14, h - 1)
      bw.write(1, 0); bw.write(3, 0)
      this
    }
    /** after transforms: cache bit(+bits), meta bit, and the codes. */
    def codes(greenSyms: Seq[Int], chanSyms: Seq[Int],
              distSyms: Seq[Int] = Seq(0), level0: Boolean = true): this.type = {
      if (cacheBits > 0) { bw.write(1, 1); bw.write(4, cacheBits) }
      else bw.write(1, 0)
      if (level0) bw.write(1, 0) // no meta-huffman
      def balanced(syms: Seq[Int], alphabet: Int): Array[Int] = {
        // complete code: pad the symbol set to a power of two (min 2 —
        // a 1-symbol non-simple code would be 0-bit on the decode side
        // while this writer always emits ≥ 1 bit) with throwaway
        // symbols, all at length log2(n)
        val distinct = syms.distinct.sorted
        var n = 2
        while (n < distinct.length) n *= 2
        val pad = (0 until alphabet).filterNot(distinct.contains)
          .take(n - distinct.length)
        val lens = new Array[Int](alphabet)
        val bits = (math.log(n.toDouble) / math.log(2)).round.toInt
        (distinct ++ pad).foreach(s => lens(s) = bits)
        lens
      }
      greenLens = balanced(greenSyms, 256 + 24 + (if (cacheBits > 0) 1 << cacheBits else 0))
      chanLens = balanced(chanSyms, 256)
      distLens = balanced(distSyms, 40)
      writeLens(bw, greenLens); greenCodes = canonical(greenLens)
      writeLens(bw, chanLens); chanCodes = canonical(chanLens)
      writeLens(bw, chanLens) // blue = same table
      writeLens(bw, chanLens) // alpha = same table
      writeLens(bw, distLens); distCodes = canonical(distLens)
      this
    }
    def green(s: Int): this.type = { bw.writeCode(greenLens(s), greenCodes(s)); this }
    def chan(s: Int): this.type = { bw.writeCode(chanLens(s), chanCodes(s)); this }
    def dist(s: Int): this.type = { bw.writeCode(distLens(s), distCodes(s)); this }
    def bits(n: Int, v: Int): this.type = { bw.write(n, v); this }
    /** literal pixel: green, red, blue, alpha stream order. */
    def lit(a: Int, r: Int, g: Int, b: Int): this.type = {
      green(g); chan(r); chan(b); chan(a); this
    }
    def build(): Array[Byte] = WebpCodec.wrapRiff(bw.bytes())
  }

  test("hand stream: subtract-green transform inverts") {
    val sb = new StreamBuilder(0)
    sb.header(2, 1)
    sb.bits(1, 1).bits(2, 2) // one transform: subtract-green
    sb.bits(1, 0) // end of transforms
    sb.codes(greenSyms = Seq(20, 5), chanSyms = Seq(10, 30, 255, 7, 100))
    sb.lit(255, 10, 20, 30) // → r=10+20, g=20, b=30+20
    sb.lit(255, 7, 5, 100)  // → r=12, g=5, b=105
    val dec = WebpCodec.decode(sb.build())
    assert(dec != null && dec.w == 2 && dec.h == 1)
    assert(argbOf(dec).toSeq == Seq(
      (30 << 16) | (20 << 8) | 50, (12 << 16) | (5 << 8) | 105))
  }

  test("hand stream: predictor transform, every mode inverts its formula") {
    // 2x2 image, block bits 2 (4x4 blocks → single 1x1 mode image).
    // Residuals chosen so the reconstruction exercises the mode at the
    // one free pixel (1,1); (0,0)=black-pred, row 0 = L, col 0 = T.
    def run(mode: Int, res11: (Int, Int, Int, Int)): Array[Int] = {
      val sb = new StreamBuilder(0)
      sb.header(2, 2)
      sb.bits(1, 1).bits(2, 0) // predictor transform
      sb.bits(3, 0) // size_bits - 2 = 0 → blocks 4x4
      // 1x1 mode sub-image (level0=false): no transforms; cache bit,
      // then 5 codes, then the one pixel with green = mode
      sb.bits(1, 0) // sub: no cache
      // sub-image codes: single-symbol simple codes keep this tiny
      def simple(sym: Int): Unit = {
        sb.bits(1, 1); sb.bits(1, 0); sb.bits(1, 1); sb.bits(8, sym)
      }
      simple(mode) // green = mode
      simple(0); simple(0); simple(0) // red, blue, alpha
      simple(0) // distance
      sb.bits(1, 0) // main: no more transforms
      val (ra, rr, rg, rb) = res11
      sb.codes(
        greenSyms = Seq(40, 0, 7, rg),
        chanSyms = Seq(60, 0, 9, 200, 1, ra, rr, rb).distinct)
      // residual pixels: (0,0) a=1,r=60,g=40,b=200 → +black(ff000000)
      sb.lit(1, 60, 40, 200)
      // (1,0): pred = L → choose zero residual ⇒ copies (0,0)
      sb.lit(0, 0, 0, 0)
      // (0,1): pred = T → residual (0, 9, 7, 1)
      sb.lit(0, 9, 7, 1)
      // (1,1): mode-specific residual
      sb.lit(ra, rr, rg, rb)
      val dec = WebpCodec.decode(sb.build())
      assert(dec != null, s"mode $mode decode failed")
      argbOf(dec)
    }
    // reconstructed neighbors (alpha, r, g, b):
    // P00 = (0x100&.. : a=1+255=0, r=60, g=40, b=200) → a=0!
    // keep alpha math visible: a00 = (1 + 0xff) & 0xff = 0
    val p00 = (60, 40, 200)
    val p10 = p00 // copied via L
    val p01 = (60 + 9, 40 + 7, 200 + 1)
    def rgbInt(t: (Int, Int, Int)) = (t._1 << 16) | (t._2 << 8) | t._3
    // mode 1 = L(p01... careful: at (1,1) L=(0,1)? no: L of (1,1) is
    // pixel (0,1); T is (1,0); TL is (0,0); TR wraps to row start (0,1)
    val l = p01; val t = p10; val tl = p00; val tr0 = p01
    def avg(a: Int, b: Int) = (a + b) >> 1
    def avg3(a: (Int, Int, Int), b: (Int, Int, Int)) =
      (avg(a._1, b._1), avg(a._2, b._2), avg(a._3, b._3))
    val expected: Map[Int, (Int, Int, Int)] = Map(
      0 -> (0, 0, 0),
      1 -> l, 2 -> t, 3 -> tr0, 4 -> tl,
      5 -> avg3(avg3(l, tr0), t),
      6 -> avg3(l, tl), 7 -> avg3(l, t), 8 -> avg3(tl, t),
      9 -> avg3(t, tr0), 10 -> avg3(avg3(l, tl), avg3(t, tr0)))
    for (mode <- 0 to 10) {
      val px = run(mode, (0, 0, 0, 0))
      assert(px(0) == rgbInt(p00) && px(1) == rgbInt(p10) &&
        px(2) == rgbInt(p01), s"mode $mode corner pixels")
      assert(px(3) == rgbInt(expected(mode)), s"mode $mode at (1,1)")
    }
    // mode 11 Select: p = L + T - TL per channel (incl. alpha).
    // pL = Σ|p-L| = Σ|T-TL| = 0 here (T copied TL), pT = Σ|L-TL| = 17
    // ⇒ pL < pT ⇒ L
    assert(run(11, (0, 0, 0, 0))(3) == rgbInt(l), "mode 11 picks the closer L")
    // mode 12 ClampAddSubtractFull: clamp(L + T - TL)
    val m12 = (l._1 + t._1 - tl._1, l._2 + t._2 - tl._2,
      math.min(255, math.max(0, l._3 + t._3 - tl._3)))
    assert(run(12, (0, 0, 0, 0))(3) == rgbInt(m12), "mode 12")
    // mode 13 ClampAddSubtractHalf: ave = avg2(L, T); clamp(ave + (ave-TL)/2)
    val ave = avg3(l, t)
    val m13 = (
      math.min(255, math.max(0, ave._1 + (ave._1 - tl._1) / 2)),
      math.min(255, math.max(0, ave._2 + (ave._2 - tl._2) / 2)),
      math.min(255, math.max(0, ave._3 + (ave._3 - tl._3) / 2)))
    assert(run(13, (0, 0, 0, 0))(3) == rgbInt(m13), "mode 13")
  }

  test("hand stream: color-indexing with 1-bit packing expands") {
    // palette {dark, light}, 6 pixels in one packed byte (widthBits=3)
    val sb = new StreamBuilder(0)
    sb.header(6, 1)
    sb.bits(1, 1).bits(2, 3) // color-indexing transform
    sb.bits(8, 1) // palette size - 1 = 1 → 2 entries → 1-bit indices
    // palette sub-image (2x1, level0=false), delta-coded:
    // raw0 = (255,10,20,30), raw1 = (0, 30, 40, 50) ⇒ pal1 = (255,40,60,80)
    // (codes() writes the sub-stream's cache bit itself)
    sb.codes(greenSyms = Seq(20, 40), chanSyms = Seq(10, 30, 255, 0, 50),
      level0 = false)
    sb.lit(255, 10, 20, 30)
    sb.lit(0, 30, 40, 50)
    sb.bits(1, 0) // main: no more transforms
    // packed main image: 1x1 pixel, green byte = indices LSB-first:
    // [1,0,1,1,0,1] → 0b101101 = 45
    sb.codes(greenSyms = Seq(45), chanSyms = Seq(0))
    sb.lit(0, 0, 45, 0)
    val dec = WebpCodec.decode(sb.build())
    assert(dec != null && dec.w == 6 && dec.h == 1)
    val dark = (10 << 16) | (20 << 8) | 30
    val light = (40 << 16) | (60 << 8) | 80
    assert(argbOf(dec).toSeq ==
      Seq(light, dark, light, light, dark, light))
  }

  test("hand stream: LZ77 backward reference and color cache") {
    // 6x1: literal P, copy(len 3, dist 1) ⇒ P×4, cache-hit(P), literal Q.
    // The cache reference comes BEFORE the Q literal so the only
    // inserted color is P — no slot-collision luck needed.
    val cacheBits = 4
    val pG = 77; val qG = 200
    val lenSym = 256 + 2 // length value 3 (sym < 4 ⇒ value sym+1)
    val p = 0xff000000 | (3 << 16) | (pG << 8) | 9
    val cacheIdx = (0x1e35a7bd * p) >>> (32 - cacheBits)
    val cacheSym = 256 + 24 + cacheIdx
    val sb = new StreamBuilder(cacheBits)
    sb.header(6, 1)
    sb.bits(1, 0) // no transforms
    sb.codes(greenSyms = Seq(pG, qG, lenSym, cacheSym),
      chanSyms = Seq(3, 9, 255, 1, 2, 4), distSyms = Seq(1))
    sb.lit(255, 3, pG, 9) // P at x=0
    sb.green(lenSym) // copy length 3
    sb.dist(1) // prefix sym 1 → value 2 → plane entry 2 = (1, 0) → dist 1
    sb.green(cacheSym) // cache hit → P again at x=4
    sb.lit(255, 1, qG, 2) // Q at x=5
    val dec = WebpCodec.decode(sb.build())
    assert(dec != null && dec.w == 6)
    val pRgb = (3 << 16) | (pG << 8) | 9
    val qRgb = (1 << 16) | (qG << 8) | 2
    assert(argbOf(dec).toSeq == Seq(pRgb, pRgb, pRgb, pRgb, pRgb, qRgb))
  }

  test("hand stream: cross-color transform inverts") {
    // 1x1 image, color transform with block bits 2, single element:
    // g2r = 64 (blue byte), g2b = 32 (green byte), r2b = 16 (red byte)
    val sb = new StreamBuilder(0)
    sb.header(1, 1)
    sb.bits(1, 1).bits(2, 1) // cross-color
    sb.bits(3, 0) // block bits 2
    sb.bits(1, 0) // sub: no cache
    def simple(sym: Int): Unit = {
      sb.bits(1, 1); sb.bits(1, 0); sb.bits(1, 1); sb.bits(8, sym)
    }
    simple(32) // green byte = g2b
    simple(16) // red byte = r2b
    simple(64) // blue byte = g2r
    simple(0)  // alpha
    simple(0)  // distance
    sb.bits(1, 0) // no more transforms
    sb.codes(greenSyms = Seq(100), chanSyms = Seq(50, 80, 255))
    sb.lit(255, 50, 100, 80)
    val dec = WebpCodec.decode(sb.build())
    assert(dec != null)
    // delta(t, c) = (int8(t) * int8(c)) >> 5
    def d(t: Int, c: Int) = (t.toByte * c.toByte) >> 5
    val g = 100
    val r = (50 + d(64, g)) & 0xff
    val b = (80 + d(32, g) + d(16, r)) & 0xff
    assert(argbOf(dec)(0) == ((r << 16) | (g << 8) | b))
  }

  test("fuzz: byte flips and truncations never throw") {
    val gray = Array.tabulate(16 * 24)(i => ((i * 7) % 251).toByte)
    val good = WebpCodec.encodeGray(16, 24, gray)
    assert(WebpCodec.decode(good) != null)
    for (i <- good.indices) {
      val mut = good.clone()
      mut(i) = (mut(i) ^ 0x55).toByte
      WebpCodec.decode(mut) // must not throw
      PixelDecode.container(mut)
    }
    for (len <- 0 until good.length by 3)
      WebpCodec.decode(java.util.Arrays.copyOf(good, len))
    // random-looking garbage with a RIFF/WEBP/VP8L prelude
    val junk = good.clone()
    for (i <- 20 until junk.length) junk(i) = (i * 37).toByte
    WebpCodec.decode(junk)
  }

  test("distance plane map: spot anchors from the published table") {
    // accessed indirectly: code 1 ↔ (0,1), code 2 ↔ (1,0) — asserted
    // through a copy at plane code 2 above; here pin a longer-range
    // anchor: dist code 9 = (2,1) ⇒ linear dist = xsize + 2
    val cache = 0
    val sb = new StreamBuilder(cache)
    sb.header(5, 2)
    sb.bits(1, 0)
    val lenSym = 256 + 0 // length 1
    // dist prefix symbol for value 9: sym 4.. value: sym<4 → sym+1 so
    // value 9 needs sym ≥ 4: sym 6 ⇒ extra=(6-2)>>1=2, offset=(2+0)<<2=8,
    // value = 8 + read(2) + 1 = 9 with read=0
    val distSym = 6
    sb.codes(greenSyms = Seq(1, 2, 3, 4, 5, 6, 7, lenSym),
      chanSyms = Seq(0, 255), distSyms = Seq(distSym))
    // row 0: literals g=1..5; row 1: literals g=6,7 then copy dist
    // code 9 → (dx=2, dy=1) → 1*5+2 = 7 back from pos 7 → pixel 0
    sb.lit(255, 0, 1, 0); sb.lit(255, 0, 2, 0); sb.lit(255, 0, 3, 0)
    sb.lit(255, 0, 4, 0); sb.lit(255, 0, 5, 0)
    sb.lit(255, 0, 6, 0); sb.lit(255, 0, 7, 0)
    sb.green(lenSym) // length 1
    sb.dist(distSym); sb.bits(2, 0) // dist value 9 → plane entry 9
    // plane entry 9 (1-based): entries are (0,1),(1,0),(1,1),(-1,1),
    // (0,2),(2,0),(1,2),(-1,2),(2,1) → code 9 = (2,1) ✓
    sb.lit(255, 0, 7, 0); sb.lit(255, 0, 7, 0) // fill the rest of row 1
    val dec = WebpCodec.decode(sb.build())
    assert(dec != null)
    val px = argbOf(dec)
    assert(px(7) == px(0), "plane code 9 = (dx 2, dy 1)")
  }
}
