package graft.functions

/** Temporary dev harness for VP8 bring-up: decode a .webp with
  * [[Vp8Codec]] and diff against a libwebp-dumped YUV reference
  * (tools/webp_ref.py decode_yuv format). Removed once the
  * conformance spec owns this loop. */
object Vp8Debug {
  def main(args: Array[String]): Unit = {
    if (args(0) == "gen") { gen(args(1)); return }
    val webp = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(0)))
    val ref = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args(1)))
    val bb = java.nio.ByteBuffer.wrap(ref)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = bb.getInt(); val h = bb.getInt()
    val uvw = bb.getInt(); val uvh = bb.getInt()
    bb.getInt(); bb.getInt()
    val refY = new Array[Byte](w * h)
    val refU = new Array[Byte](uvw * uvh)
    val refV = new Array[Byte](uvw * uvh)
    bb.get(refY); bb.get(refU); bb.get(refV)

    // locate the VP8 chunk
    var i = 12
    var from = -1
    var until = -1
    while (i + 8 <= webp.length && from < 0) {
      val size = (webp(i + 4) & 0xffL) | ((webp(i + 5) & 0xffL) << 8) |
        ((webp(i + 6) & 0xffL) << 16) | ((webp(i + 7) & 0xffL) << 24)
      if (webp(i) == 'V' && webp(i + 1) == 'P' && webp(i + 2) == '8' &&
        webp(i + 3) == ' ') { from = i + 8; until = i + 8 + size.toInt }
      else i += 8 + size.toInt + (size.toInt & 1)
    }
    println(s"chunk [$from,$until) ref ${w}x$h uv ${uvw}x$uvh")
    Vp8Codec.debugSink = new StringBuilder
    val pl = Vp8Codec.decodePlanes(webp, from, until)
    print(Vp8Codec.debugSink.toString)
    Vp8Codec.debugSink = null
    if (pl == null) { println("DECODE NULL"); sys.exit(1) }
    println(s"decoded ${pl.w}x${pl.h}")
    def diff(name: String, a: Array[Byte], b: Array[Byte], pw: Int)
        : Unit = {
      if (a.length != b.length) {
        println(s"$name LEN ${a.length} vs ${b.length}"); return
      }
      var n = 0
      var worst = 0
      var firstAt = -1
      var i = 0
      while (i < a.length) {
        val d = Math.abs((a(i) & 0xff) - (b(i) & 0xff))
        if (d > 0) {
          n += 1
          if (firstAt < 0) firstAt = i
          if (d > worst) worst = d
        }
        i += 1
      }
      val at =
        if (firstAt < 0) "" else s" first@(${firstAt % pw},${firstAt / pw})" +
          s" got ${a(firstAt) & 0xff} want ${b(firstAt) & 0xff}"
      println(s"$name: $n/${a.length} mismatches, worst $worst$at")
    }
    diff("Y", pl.y, refY, w)
    diff("U", pl.u, refU, uvw)
    diff("V", pl.v, refV, uvw)
    if (args.length > 2) { // dump my planes in the same layout
      val out = java.nio.ByteBuffer
        .allocate(24 + pl.y.length + pl.u.length + pl.v.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.putInt(pl.w).putInt(pl.h).putInt((pl.w + 1) / 2)
        .putInt((pl.h + 1) / 2).putInt(1).putInt(0)
      out.put(pl.y).put(pl.u).put(pl.v)
      java.nio.file.Files.write(java.nio.file.Paths.get(args(2)),
        out.array())
    }
  }

  /** Craft unit streams: per subblock-mode (bm_0..bm_9), per 16x16
    * mode (ym_0..ym_3), chroma modes (uv_0..uv_3), and a token-range
    * stream (tok). 3x2 MBs; the probed MB sits at (1,1) so it has
    * real above/left/above-right neighbors. */
  private def gen(dir: String): Unit = {
    val qi = 20
    def base(): Vp8Codec.FrameSpec = {
      val s = new Vp8Codec.FrameSpec(48, 32, qi)
      // varied flat neighbors via Y2 DCs and chroma DCs
      val y2dc = Array(12, -9, 5, -15, 8, 0)
      val uvdc = Array(3, -4, 6, -2, 0, 5)
      var mb = 0
      while (mb < 6) {
        s.y2(mb) = Array(y2dc(mb)) ++ new Array[Int](15)
        s.uvCoeff(mb) = Array.tabulate(8)(sb =>
          Array(uvdc((mb + sb) % 6)) ++ new Array[Int](15))
        s.yModes(mb) = mb % 4 // DC,V,H,TM around
        s.uvModes(mb) = (mb + 1) % 4
        mb += 1
      }
      s
    }
    def write(name: String, s: Vp8Codec.FrameSpec): Unit = {
      val bytes = Vp8Codec.encodeFrame(s)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/$name.webp"), bytes)
    }
    for (m <- 0 until 10) {
      val s = base()
      s.bModes(4) = Array.fill(16)(m) // MB (1,1)
      s.y2(4) = null
      write(s"bm_$m", s)
    }
    for (m <- 0 until 4) {
      val s = base()
      s.yModes(4) = m
      write(s"ym_$m", s)
    }
    for (m <- 0 until 4) {
      val s = base()
      s.uvModes(4) = m
      write(s"uv_$m", s)
    }
    // isolation streams: zero chroma everywhere (pure chroma pred),
    // textured luma canary in the MB after the probe
    for (m <- Seq(0, 4, 5, 6)) {
      val s = base()
      var mb = 0
      while (mb < 6) { s.uvCoeff(mb) = null; mb += 1 }
      s.bModes(4) = Array.fill(16)(m)
      s.y2(4) = null
      s.yCoeff(5) = Array.tabulate(16)(sb => {
        val a = new Array[Int](16)
        a(1) = 1 + (sb % 3); a(4) = -(1 + (sb % 2)); a
      })
      write(s"iso_$m", s)
    }
    // token coverage: category values on luma AC + Y2 + chroma
    val s = base()
    // capped at |dequant| <= ~16k (the legal-content envelope): real
    // encoders cannot emit larger dequantized coefficients, and beyond
    // it libwebp's SIMD lanes and the RFC reference arithmetic diverge
    val vals = Array(1, -2, 3, -4, 5, -8, 11, -18, 19, -34, 35, -66, 67,
      -400, 600, -500)
    s.yCoeff(4) = Array.tabulate(16)(sb => {
      val a = new Array[Int](16)
      a(1) = vals(sb) // AC position (type 0 starts at 1)
      if (sb % 3 == 0) a(5) = -vals(sb)
      if (sb % 5 == 0) a(15) = 7
      a
    })
    s.y2(4) = Array(3, -1, 0, 0, 2) ++ new Array[Int](11)
    write("tok", s)
    // single-coefficient probes for each token category and sign
    for ((v, i) <- Seq(5, -6, 7, -10, 11, -18, 19, -34, 35, -66, 67,
      -400, 600, -650, 500, 1000).zipWithIndex) {
      val s2 = base()
      s2.yCoeff(4) = new Array[Array[Int]](16)
      s2.yCoeff(4)(5) = { val a = new Array[Int](16); a(1) = v; a }
      write(s"tv_$i", s2)
    }
    // combination probes around the int16-wrap region
    val combos = Seq(
      ("ca", Seq(1 -> -600, 5 -> 600)),
      ("cb", Seq(1 -> -600, 15 -> 7)),
      ("cc", Seq(5 -> 600, 15 -> 7)),
      ("cd", Seq(1 -> -600, 5 -> 600, 15 -> 7)),
      ("ce", Seq(1 -> 650, 5 -> -650, 15 -> 7)),
      ("cf", Seq(1 -> -640, 5 -> 640, 15 -> 7)))
    for ((nm, coeffs) <- combos) {
      val s3 = base()
      s3.yCoeff(4) = new Array[Array[Int]](16)
      s3.yCoeff(4)(15) = {
        val a = new Array[Int](16)
        coeffs.foreach { case (p, v) => a(p) = v }
        a
      }
      write(nm, s3)
    }
    // exact-fixture paths: flat-MB gray + per-4x4 B_DC gray
    val mbVals = Array.tabulate(3 * 2)(i => 20 + 37 * i)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/fx_mb.webp"),
      Vp8Codec.encodeGrayMbFlat(48, 32, mbVals))
    val g = new Array[Byte](40 * 24)
    for (y <- 0 until 24; x <- 0 until 40)
      g(y * 40 + x) = ((7 * (x / 8) * 37 + (y / 8) * 101) % 200).toByte
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/fx_b4.webp"),
      Vp8Codec.encodeGrayB4x4(40, 24, g))
    println("generated")
  }
}
