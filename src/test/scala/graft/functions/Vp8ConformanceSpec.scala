package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** External conformance for the VP8 codec against the system's
  * BSD-licensed libwebp, driven over `tools/webp_ref.py` (python3 +
  * ctypes): the role ImageIO plays for the JPEG codec. VP8 decoding
  * is normative through the Y/U/V planes, so every comparison here is
  * plane-EXACT, in three directions:
  *
  *  1. libwebp-encoded scenes (content x size x quality, including
  *     segmentation-enabled and filter-level-63 streams) must decode
  *     to libwebp's own planes;
  *  2. crafted unit streams from this codec's encoder — isolating
  *     every subblock mode, whole-block mode, chroma mode, token
  *     category and context chain — must decode identically in both
  *     decoders;
  *  3. the exact-fixture encoders must produce streams libwebp
  *     decodes to the closed-form target pixels (the property the
  *     SQL oracles lean on).
  *
  * Skipped (not failed) when python3 or libwebp.so.7 is unavailable.
  */
class Vp8ConformanceSpec extends AnyFunSuite {

  private val refTool = {
    val repo = new java.io.File("tools/webp_ref.py")
    if (repo.exists()) repo.getAbsolutePath else "/root/repo/tools/webp_ref.py"
  }

  private lazy val refAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c",
        "import ctypes; ctypes.CDLL('libwebp.so.7')")
        .redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  private val tmp = java.nio.file.Files
    .createTempDirectory("vp8conf").toFile
  tmp.deleteOnExit()

  private def ref(args: String*): Int = {
    val cmd = Seq("python3", refTool) ++ args
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    p.waitFor()
  }

  private final case class Yuv(w: Int, h: Int, uvw: Int, uvh: Int,
                               y: Array[Byte], u: Array[Byte],
                               v: Array[Byte])

  private def readYuv(path: String): Yuv = {
    val d = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = java.nio.ByteBuffer.wrap(d)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = bb.getInt(); val h = bb.getInt()
    val uvw = bb.getInt(); val uvh = bb.getInt()
    bb.getInt(); bb.getInt()
    val y = new Array[Byte](w * h)
    val u = new Array[Byte](uvw * uvh)
    val v = new Array[Byte](uvw * uvh)
    bb.get(y); bb.get(u); bb.get(v)
    Yuv(w, h, uvw, uvh, y, u, v)
  }

  /** Decode webp bytes with OUR decoder to planes. */
  private def mine(webp: Array[Byte]): Vp8Codec.Planes = {
    var i = 12
    while (i + 8 <= webp.length) {
      val size = ((webp(i + 4) & 0xffL) | ((webp(i + 5) & 0xffL) << 8) |
        ((webp(i + 6) & 0xffL) << 16) | ((webp(i + 7) & 0xffL) << 24)).toInt
      if (webp(i) == 'V' && webp(i + 1) == 'P' && webp(i + 2) == '8' &&
        webp(i + 3) == ' ')
        return Vp8Codec.decodePlanes(webp, i + 8, i + 8 + size)
      i += 8 + size + (size & 1)
    }
    null
  }

  private def assertPlanesEqual(name: String, webp: Array[Byte]): Unit = {
    val wf = new java.io.File(tmp, s"$name.webp")
    java.nio.file.Files.write(wf.toPath, webp)
    val yf = new java.io.File(tmp, s"$name.yuv")
    assert(ref("decode_yuv", wf.getPath, yf.getPath) == 0,
      s"$name: libwebp rejected the stream")
    val refP = readYuv(yf.getPath)
    val p = mine(webp)
    assert(p != null, s"$name: our decoder rejected the stream")
    assert(p.w == refP.w && p.h == refP.h, s"$name: dims")
    def diff(plane: String, a: Array[Byte], b: Array[Byte]): Unit = {
      assert(a.length == b.length, s"$name/$plane length")
      var i = 0
      var bad = -1
      while (i < a.length && bad < 0) { if (a(i) != b(i)) bad = i; i += 1 }
      if (bad >= 0)
        fail(s"$name/$plane first mismatch at $bad: " +
          s"got ${a(bad) & 0xff} want ${b(bad) & 0xff}")
    }
    diff("Y", p.y, refP.y)
    diff("U", p.u, refP.u)
    diff("V", p.v, refP.v)
  }

  private def rgbScene(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int))
      : Array[Byte] = {
    val rgb = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      val o = 3 * (y * w + x)
      rgb(o) = r.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = b.toByte
    }
    rgb
  }

  private def libwebpEncode(name: String, w: Int, h: Int, q: Int,
                            rgb: Array[Byte]): Array[Byte] = {
    val rf = new java.io.File(tmp, s"$name.rgb")
    java.nio.file.Files.write(rf.toPath, rgb)
    val wf = new java.io.File(tmp, s"$name.webp")
    assert(ref("encode", rf.getPath, w.toString, h.toString, q.toString,
      wf.getPath) == 0, s"$name: libwebp encode failed")
    java.nio.file.Files.readAllBytes(wf.toPath)
  }

  test("libwebp-encoded scenes decode plane-exact (content x size x q)") {
    assume(refAvailable, "python3 + libwebp.so.7 not available")
    val rnd = new scala.util.Random(42)
    val cases = Seq[(String, Int, Int, Int, (Int, Int) => (Int, Int, Int))](
      ("noise", 64, 48, 75,
        (_, _) => (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))),
      ("photo", 127, 93, 75, (x, y) => (
        128 + (100 * math.sin(x / 23.0) * math.cos(y / 17.0)).toInt,
        128 + (90 * math.sin((x + y) / 31.0)).toInt,
        128 + (70 * math.cos(x * y / 700.0)).toInt)),
      ("lowq", 160, 120, 5, (x, y) => (
        128 + (100 * math.sin(x / 23.0) * math.cos(y / 17.0)).toInt,
        (x * 3) % 256, (y * 5) % 256)),
      ("hiq-noise", 96, 80, 95,
        (_, _) => (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256))),
      ("blocks", 31, 17, 30,
        (x, y) => { val v = ((x / 8) * 37 + (y / 8) * 101) % 256
          (v, (v * 3) % 256, 255 - v) }),
      ("text", 160, 160, 95,
        (x, y) => { val on = (x * y + x / 3) % 7 == 0 || x % 11 == 0
          val v = if (on) 20 else 235; (v, v, v) }),
      ("tall", 16, 240, 60, (x, y) => ((x * 16) % 256, (y * 2) % 256, 128)),
      ("wide", 240, 16, 60, (x, y) => ((y * 16) % 256, (x * 2) % 256, 128)),
      ("tiny", 3, 5, 75, (x, y) => (x * 40, y * 30, (x + y) * 20)),
      ("one", 1, 1, 75, (_, _) => (200, 100, 50)))
    for ((name, w, h, q, f) <- cases) {
      def clamp(v: (Int, Int, Int)) = (
        math.max(0, math.min(255, v._1)), math.max(0, math.min(255, v._2)),
        math.max(0, math.min(255, v._3)))
      val webp = libwebpEncode(name, w, h, q,
        rgbScene(w, h)((x, y) => clamp(f(x, y))))
      assertPlanesEqual(name, webp)
    }
  }

  // crafted streams: a 3x2-MB frame with varied flat neighbors so the
  // probed element at MB (1,1) sees real above/left/above-right edges
  private def baseSpec(): Vp8Codec.FrameSpec = {
    val s = new Vp8Codec.FrameSpec(48, 32, 20)
    val y2dc = Array(12, -9, 5, -15, 8, 0)
    val uvdc = Array(3, -4, 6, -2, 0, 5)
    for (mb <- 0 until 6) {
      s.y2(mb) = Array(y2dc(mb)) ++ new Array[Int](15)
      s.uvCoeff(mb) = Array.tabulate(8)(sb =>
        Array(uvdc((mb + sb) % 6)) ++ new Array[Int](15))
      s.yModes(mb) = mb % 4
      s.uvModes(mb) = (mb + 1) % 4
    }
    s
  }

  test("crafted unit streams: every intra mode, both decoders agree") {
    assume(refAvailable, "python3 + libwebp.so.7 not available")
    for (m <- 0 until 10) { // each subblock mode, uniform across the MB
      val s = baseSpec()
      s.bModes(4) = Array.fill(16)(m)
      s.y2(4) = null
      assertPlanesEqual(s"bm$m", Vp8Codec.encodeFrame(s))
    }
    for (m <- 0 until 4) { // each 16x16 luma mode
      val s = baseSpec()
      s.yModes(4) = m
      assertPlanesEqual(s"ym$m", Vp8Codec.encodeFrame(s))
    }
    for (m <- 0 until 4) { // each chroma mode
      val s = baseSpec()
      s.uvModes(4) = m
      assertPlanesEqual(s"uv$m", Vp8Codec.encodeFrame(s))
    }
  }

  test("crafted unit streams: token categories, contexts, zero runs") {
    assume(refAvailable, "python3 + libwebp.so.7 not available")
    // single-coefficient probes across every token category and sign,
    // capped at |dequant| <= ~16k (the legal-content envelope: beyond
    // it libwebp's SIMD lanes and scalar arithmetic legitimately
    // diverge, and no real encoder can reach it)
    for ((v, i) <- Seq(5, -6, 7, -10, 11, -18, 19, -34, 35, -66, 67,
      -400, 600, -650, 500, 1000).zipWithIndex) {
      val s = baseSpec()
      s.yCoeff(4) = new Array[Array[Int]](16)
      s.yCoeff(4)(5) = { val a = new Array[Int](16); a(1) = v; a }
      assertPlanesEqual(s"tv$i", Vp8Codec.encodeFrame(s))
    }
    // dense multi-coefficient blocks: zero runs, end positions, the
    // no-EOB-after-zero rule, context chains across subblocks
    val s = baseSpec()
    val vals = Array(1, -2, 3, -4, 5, -8, 11, -18, 19, -34, 35, -66, 67,
      -400, 600, -500)
    s.yCoeff(4) = Array.tabulate(16)(sb => {
      val a = new Array[Int](16)
      a(1) = vals(sb)
      if (sb % 3 == 0) a(5) = -vals(sb)
      if (sb % 5 == 0) a(15) = 7
      a
    })
    s.y2(4) = Array(3, -1, 0, 0, 2) ++ new Array[Int](11)
    assertPlanesEqual("tok", Vp8Codec.encodeFrame(s))
  }

  test("exact fixtures decode to the closed-form pixels UNDER LIBWEBP") {
    assume(refAvailable, "python3 + libwebp.so.7 not available")
    // flat-MB path
    val mbVals = Array.tabulate(6)(i => 20 + 37 * i)
    val mbBytes = Vp8Codec.encodeGrayMbFlat(48, 32, mbVals)
    val wf = new java.io.File(tmp, "fxmb.webp")
    java.nio.file.Files.write(wf.toPath, mbBytes)
    val yf = new java.io.File(tmp, "fxmb.yuv")
    assert(ref("decode_yuv", wf.getPath, yf.getPath) == 0)
    val p = readYuv(yf.getPath)
    for (y <- 0 until 32; x <- 0 until 48)
      assert((p.y(y * 48 + x) & 0xff) == mbVals((y / 16) * 3 + x / 16),
        s"flat-MB ($x,$y)")
    assert(p.u.forall(b => (b & 0xff) == 128))
    // per-4x4 B_PRED path
    val g = new Array[Byte](40 * 24)
    for (y <- 0 until 24; x <- 0 until 40)
      g(y * 40 + x) = ((7 * (x / 8) * 37 + (y / 8) * 101) % 200).toByte
    val b4 = Vp8Codec.encodeGrayB4x4(40, 24, g)
    val wf2 = new java.io.File(tmp, "fxb4.webp")
    java.nio.file.Files.write(wf2.toPath, b4)
    val yf2 = new java.io.File(tmp, "fxb4.yuv")
    assert(ref("decode_yuv", wf2.getPath, yf2.getPath) == 0)
    val p2 = readYuv(yf2.getPath)
    for (y <- 0 until 24; x <- 0 until 40)
      assert((p2.y(y * 40 + x) & 0xff) == (g(y * 40 + x) & 0xff),
        s"b4x4 ($x,$y)")
  }

  test("libwebp rejects what we reject: the truncated stub") {
    assume(refAvailable, "python3 + libwebp.so.7 not available")
    val stub = WebpCodec.lossyStub(24, 16)
    val wf = new java.io.File(tmp, "stub.webp")
    java.nio.file.Files.write(wf.toPath, stub)
    val yf = new java.io.File(tmp, "stub.yuv")
    assert(ref("decode_yuv", wf.getPath, yf.getPath) != 0,
      "libwebp accepted the stub")
    assert(WebpCodec.decode(stub) == null)
  }
}
