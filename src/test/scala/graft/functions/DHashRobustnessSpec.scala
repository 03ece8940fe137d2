package graft.functions

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** Measured dHash robustness on NON-flat content vs JPEG quality.
  *
  * The mixed-container oracles use flat 8×8-block scenes precisely
  * because they survive JPEG bit-exactly — which demonstrates
  * cross-format hamming-0 recall only on JPEG-friendly content. This
  * sweep measures recall@3 (the banded join's exact radius) on
  * gradient and noise scenes across JPEG quality {95, 75, 50} and the
  * transform battery {none, bright, upscale2}, with every decoded
  * raster cross-checked against the JDK's independent ImageIO decode
  * (dHash agreement within 1 bit) so the numbers aren't an artifact
  * of this codec.
  *
  * Measured table (48 scenes per cell, 64×48, deterministic):
  *
  *  | content  | transform       | q95  | q75  | q50  |
  *  |----------|-----------------|------|------|------|
  *  | gradient | none/bright/up2 | 1.00 | 1.00 | 1.00 |
  *  | noise    | none / bright   | 1.00 | 0.60 | 0.21 |
  *  | noise    | upscale2        | 1.00 | 0.71 | 0.42 |
  *
  * Reading: smooth content is fully recall-stable at any realistic
  * quality, and q95 holds even for white noise; but noise — the
  * adversarial worst case for a 56-bit neighbor-order hash, where
  * every JPEG block boundary is fair game for reordering adjacent
  * luminances — loses 40% of pairs at q75 and most at q50. That is
  * the documented operating envelope: radius-3 image dedup survives
  * strong re-encodes for natural content; noise-like content needs a
  * higher radius, a coarser hash, or a second key (the temporal and
  * audio fingerprints fill that role for media). 2× upscaling HELPS
  * under heavy quantization (each sampled cell is interior to a
  * smooth-ish upsampled region instead of straddling block noise). */
class DHashRobustnessSpec extends AnyFunSuite {

  private val W = 64
  private val H = 48
  private val Scenes = 48

  private def mix(a: Long): Long = {
    var x = a; x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L; x ^= x >>> 33; x
  }

  /** Scene classes: smooth directional gradient / white noise. Values
    * kept ≤ 200 so the +16 brightness transform never clamps. */
  private def scene(cls: String, id: Int, transform: String): (Int, Int, Array[Byte]) = {
    val scale = if (transform == "upscale2") 2 else 1
    val w = W * scale; val h = H * scale
    val g = new Array[Byte](w * h)
    val ax = 1 + id % 5
    val ay = 1 + id % 7
    val span = (ax * (W - 1) + ay * (H - 1)).toDouble
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val sx = x / scale; val sy = y / scale
        var v = cls match {
          case "gradient" => ((ax * sx + ay * sy) * 200 / span).toInt
          case "noise" => (mix(id * 92821L + sy * W + sx) & 0xffL).toInt * 200 / 255
        }
        if (transform == "bright") v += 16
        g(y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    (w, h, g)
  }

  private def dhashOf(img: PixelDecode.Rgb): Long = PixelDecode.dhash(img)

  private def imageIoDhash(jpg: Array[Byte]): Long = {
    val bi = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val px = new Array[Byte](3 * bi.getWidth * bi.getHeight)
    var y = 0
    while (y < bi.getHeight) {
      var x = 0
      while (x < bi.getWidth) {
        val rgb = bi.getRGB(x, y)
        val at = 3 * (y * bi.getWidth + x)
        px(at) = ((rgb >> 16) & 0xff).toByte
        px(at + 1) = ((rgb >> 8) & 0xff).toByte
        px(at + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    dhashOf(new PixelDecode.Rgb(bi.getWidth, bi.getHeight, px))
  }

  test("recall@3 by content class, transform, and JPEG quality") {
    val transforms = Seq("none", "bright", "upscale2")
    val qualities = Seq(95, 75, 50)
    val recall = scala.collection.mutable.Map.empty[(String, String, Int), Double]
    var decoderDisagreements = 0
    for (cls <- Seq("gradient", "noise"); t <- transforms; q <- qualities) {
      var hit = 0
      for (id <- 0 until Scenes) {
        val (bw, bh, base) = scene(cls, id, "none")
        val baseHash = dhashOf(
          PixelDecode.decode(graft.ops.MediaScenes.pngBytes(bw, bh, base)))
        val (tw, th, tg) = scene(cls, id, t)
        val jpg = JpegCodec.encodeGray(tw, th, tg, JpegCodec.quantTable(q))
        val ours = JpegCodec.decode(jpg)
        assert(ours != null, s"$cls/$t/q$q id $id decode failed")
        val h = dhashOf(ours)
        // independent-decoder cross-check: ImageIO's raster must land
        // on (almost) the same hash — the sweep measures the HASH's
        // robustness, not a decoder artifact
        val ref = imageIoDhash(jpg)
        if (java.lang.Long.bitCount(h ^ ref) > 1) decoderDisagreements += 1
        if (java.lang.Long.bitCount(baseHash ^ h) <= 3) hit += 1
      }
      recall((cls, t, q)) = hit.toDouble / Scenes
    }
    // render the measured table into the test log
    val lines = for (cls <- Seq("gradient", "noise"); t <- transforms) yield
      f"$cls%-9s $t%-9s " + qualities.map(q =>
        f"q$q=${recall((cls, t, q))}%.3f").mkString("  ")
    info("recall@3 (48 scenes/cell):")
    lines.foreach(info(_))
    assert(decoderDisagreements == 0,
      s"$decoderDisagreements cells disagreed with ImageIO by > 1 bit")
    // thresholds = the measured table (documented in the Scaladoc)
    for (t <- transforms; q <- qualities)
      assert(recall(("gradient", t, q)) == 1.0, s"gradient/$t/q$q")
    for (t <- transforms) {
      assert(recall(("noise", t, 95)) == 1.0, s"noise/$t/q95")
      // floors sit just under the deterministic measured values so a
      // REGRESSION (hash or codec change hurting recall) fails loudly
      // while the table above stays the source of truth
      val (f75, f50) = if (t == "upscale2") (0.70, 0.41) else (0.60, 0.20)
      assert(recall(("noise", t, 75)) >= f75, s"noise/$t/q75 = ${recall(("noise", t, 75))}")
      assert(recall(("noise", t, 50)) >= f50, s"noise/$t/q50 = ${recall(("noise", t, 50))}")
    }
  }

  // ---- the same sweep against REAL libwebp lossy encodes ----------

  private lazy val libwebpAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c",
        "import ctypes; ctypes.CDLL('libwebp.so.7')")
        .redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: Exception => false }

  private def libwebpLossy(w: Int, h: Int, gray: Array[Byte], q: Int)
      : Array[Byte] = {
    val dir = java.nio.file.Files.createTempDirectory("dhwebp")
    val rgb = new Array[Byte](3 * w * h)
    var i = 0
    while (i < w * h) {
      rgb(3 * i) = gray(i); rgb(3 * i + 1) = gray(i)
      rgb(3 * i + 2) = gray(i)
      i += 1
    }
    val rf = dir.resolve("s.rgb"); val wf = dir.resolve("s.webp")
    java.nio.file.Files.write(rf, rgb)
    val tool =
      if (new java.io.File("tools/webp_ref.py").exists()) "tools/webp_ref.py"
      else "/root/repo/tools/webp_ref.py"
    val p = new ProcessBuilder("python3", tool, "encode", rf.toString,
      w.toString, h.toString, q.toString, wf.toString)
      .redirectErrorStream(true).start()
    assert(p.waitFor() == 0, "libwebp encode failed")
    val out = java.nio.file.Files.readAllBytes(wf)
    java.nio.file.Files.delete(rf); java.nio.file.Files.delete(wf)
    java.nio.file.Files.delete(dir)
    out
  }

  /** Measured table (24 scenes/cell, gray 64×48, deterministic input;
    * skipped cleanly without python3 + libwebp):
    *
    *  | content  | q95  | q75   | q50   |
    *  |----------|------|-------|-------|
    *  | gradient | 1.00 | 1.000 | 1.000 |
    *  | noise    | 1.00 | 0.958 | 0.875 |
    *
    * Same shape as the JPEG sweep but markedly MORE recall-stable:
    * at the same nominal quality, VP8 keeps noise recall at 0.958/
    * 0.875 (q75/q50) where JPEG drops to 0.604/0.208 — the loop
    * filter plus spatial prediction quantizes structure more
    * uniformly than JPEG's independent 8x8 blocks, so radius-3 dedup
    * genuinely survives lossy-WebP re-encodes even for adversarial
    * content. The floors below pin the measured values. */
  test("recall@3 vs REAL libwebp lossy-WebP quality (external)") {
    assume(libwebpAvailable, "python3 + libwebp.so.7 not available")
    val qualities = Seq(95, 75, 50)
    val n = 24
    val recall = scala.collection.mutable.Map.empty[(String, Int), Double]
    for (cls <- Seq("gradient", "noise"); q <- qualities) {
      var hit = 0
      for (id <- 0 until n) {
        val (w, h, g) = scene(cls, id, "none")
        val baseHash = dhashOf(
          PixelDecode.decode(graft.ops.MediaScenes.pngBytes(w, h, g)))
        val webp = libwebpLossy(w, h, g, q)
        val img = PixelDecode.decode(webp)
        assert(img != null, s"$cls/q$q id $id: VP8 decode failed")
        if (java.lang.Long.bitCount(baseHash ^ dhashOf(img)) <= 3) hit += 1
      }
      recall((cls, q)) = hit.toDouble / n
    }
    info("lossy-WebP recall@3 (24 scenes/cell):")
    for (cls <- Seq("gradient", "noise"))
      info(f"$cls%-9s " + qualities.map(q =>
        f"q$q=${recall((cls, q))}%.3f").mkString("  "))
    for (q <- qualities)
      assert(recall(("gradient", q)) == 1.0, s"gradient/q$q")
    assert(recall(("noise", 95)) == 1.0, s"noise/q95 = ${recall(("noise", 95))}")
    assert(recall(("noise", 75)) >= 0.90, s"noise/q75 = ${recall(("noise", 75))}")
    assert(recall(("noise", 50)) >= 0.80, s"noise/q50 = ${recall(("noise", 50))}")
  }
}
