package graft.functions

import java.awt.image.BufferedImage
import javax.imageio.{ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** Baseline TIFF codec: exact round trips through the fixture
  * encoder, two-directional conformance against the JDK's
  * independent ImageIO TIFF plugin, PackBits, both byte orders, the
  * inverted-gray and palette conventions, and a mutation battery. */
class TiffCodecSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val g = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) g(y * w + x) = f(x, y).toByte
    g
  }

  private def rgb(w: Int, h: Int)
                 (f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val g = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, gg, b) = f(x, y)
      val o = 3 * (y * w + x)
      g(o) = r.toByte; g(o + 1) = gg.toByte; g(o + 2) = b.toByte
    }
    g
  }

  test("gray round trip: both byte orders, both compressions") {
    val w = 37; val h = 23
    val g = gray(w, h)((x, y) => (x * 7 + y * 31) % 256)
    for (le <- Seq(true, false); pb <- Seq(false, true)) {
      val bytes = TiffCodec.encode(w, h, g, photometric = 1, le = le,
        packBits = pb)
      assert(PixelDecode.container(bytes) == "tiff")
      val img = PixelDecode.decode(bytes)
      assert(img != null && img.w == w && img.h == h, s"le=$le pb=$pb")
      for (i <- 0 until w * h) {
        assert(img.px(3 * i) == g(i), s"le=$le pb=$pb px $i")
        assert(img.px(3 * i + 1) == g(i) && img.px(3 * i + 2) == g(i))
      }
    }
  }

  test("RGB round trip incl. PackBits") {
    val w = 20; val h = 14
    val px = rgb(w, h)((x, y) => ((x * 11) % 256, (y * 17) % 256,
      (x * y) % 256))
    for (pb <- Seq(false, true)) {
      val bytes = TiffCodec.encode(w, h, px, photometric = 2, packBits = pb)
      val img = PixelDecode.decode(bytes)
      assert(img != null && img.w == w && img.h == h)
      assert(java.util.Arrays.equals(img.px, px), s"pb=$pb")
    }
  }

  test("white-is-zero grayscale inverts") {
    val g = gray(8, 8)((x, _) => x * 30)
    val bytes = TiffCodec.encode(8, 8, g, photometric = 0)
    val img = TiffCodec.decode(bytes)
    assert(img != null)
    for (i <- 0 until 64)
      assert((img.px(3 * i) & 0xff) == 255 - (g(i) & 0xff))
  }

  test("ImageIO reads this encoder's output back to the source") {
    val w = 33; val h = 21
    val g = gray(w, h)((x, y) => (x * 13 + y * 41) % 256)
    for (le <- Seq(true, false); pb <- Seq(false, true)) {
      val bytes = TiffCodec.encode(w, h, g, photometric = 1, le = le,
        packBits = pb)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected le=$le pb=$pb")
      assert(img.getWidth == w && img.getHeight == h)
      // compare raster samples: getRGB would gamma-map Java's linear
      // gray colorspace and hide the raw byte identity
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == (g(y * w + x) & 0xff),
          s"le=$le pb=$pb ($x,$y)")
    }
    val px = rgb(16, 12)((x, y) => ((x * 11) % 256, (y * 17) % 256,
      (x + y) % 256))
    val bytes = TiffCodec.encode(16, 12, px, photometric = 2)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null)
    for (y <- 0 until 12; x <- 0 until 16) {
      val v = img.getRGB(x, y)
      val o = 3 * (y * 16 + x)
      assert(((v >> 16) & 0xff) == (px(o) & 0xff) &&
        ((v >> 8) & 0xff) == (px(o + 1) & 0xff) &&
        (v & 0xff) == (px(o + 2) & 0xff), s"($x,$y)")
    }
  }

  test("this decoder reads ImageIO-written TIFFs (none + PackBits)") {
    val w = 29; val h = 17
    for (compression <- Seq(null, "PackBits"); grayMode <- Seq(true, false)) {
      val bi = new BufferedImage(w, h,
        if (grayMode) BufferedImage.TYPE_BYTE_GRAY
        else BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (x * 7 + y * 13) % 256
        val g = (x * 3 + y * 29) % 256
        val b = (x * 17 + y) % 256
        if (grayMode) bi.getRaster.setSample(x, y, 0, r)
        else bi.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val out = new java.io.ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("tiff").next()
      val ios = ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      val param = writer.getDefaultWriteParam
      if (compression != null) {
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(compression)
      }
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      ios.close()
      val bytes = out.toByteArray
      val mine = TiffCodec.decode(bytes)
      assert(mine != null, s"rejected ImageIO tiff " +
        s"(gray=$grayMode comp=$compression)")
      assert(mine.w == w && mine.h == h)
      for (y <- 0 until h; x <- 0 until w) {
        val o = 3 * (y * w + x)
        if (grayMode) {
          val s = bi.getRaster.getSample(x, y, 0)
          assert(s == (mine.px(o) & 0xff) && s == (mine.px(o + 1) & 0xff),
            s"gray comp=$compression ($x,$y)")
        } else {
          val v = bi.getRGB(x, y)
          assert(((v >> 16) & 0xff) == (mine.px(o) & 0xff) &&
            ((v >> 8) & 0xff) == (mine.px(o + 1) & 0xff) &&
            (v & 0xff) == (mine.px(o + 2) & 0xff),
            s"rgb comp=$compression ($x,$y)")
        }
      }
    }
  }

  test("unsupported shapes return null, never throw") {
    // the dims-only stub keeps sniffing as tiff but cannot decode
    assert(TiffCodec.decode(graft.ops.MediaScenes.tiffStub()) == null)
    // forge the compression tag to LZW (5) on a valid base: the tag
    // entry is 03 01 03 00 01 00 00 00 <value> in the LE IFD
    val base = TiffCodec.encode(8, 8, gray(8, 8)((x, y) => x + y),
      photometric = 1)
    assert(TiffCodec.decode(base) != null)
    val lzw = base.clone()
    var forged = false
    for (i <- 0 until lzw.length - 9 if !forged)
      if (lzw(i) == 0x03 && lzw(i + 1) == 0x01 && lzw(i + 2) == 0x03 &&
        lzw(i + 3) == 0x00 && lzw(i + 4) == 0x01) {
        lzw(i + 8) = 5 // Compression = LZW
        forged = true
      }
    assert(forged)
    assert(TiffCodec.decode(lzw) == null)
  }

  test("mutation battery: bit flips never throw") {
    val base = TiffCodec.encode(24, 16,
      gray(24, 16)((x, y) => (x * 37 + y * 101) % 256), photometric = 1,
      packBits = true)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 600) {
      val m = base.clone()
      for (_ <- 0 to rnd.nextInt(4)) {
        val at = rnd.nextInt(m.length)
        m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      TiffCodec.decode(m) // must not throw
    }
    for (_ <- 0 until 200) {
      val g = new Array[Byte](16 + rnd.nextInt(128))
      rnd.nextBytes(g)
      g(0) = 'I'; g(1) = 'I'; g(2) = 42; g(3) = 0
      TiffCodec.decode(g) // must not throw
    }
  }
}
