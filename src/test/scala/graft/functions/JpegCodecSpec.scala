package graft.functions

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG codec: flat-block exactness (the property the SQL
  * oracles lean on), two-directional conformance against the JDK's
  * independent ImageIO JPEG implementation, restart markers, 4:2:0,
  * and a mutation battery. */
class JpegCodecSpec extends AnyFunSuite {

  private def flatGray(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val g = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { g(y * w + x) = v(x / 8, y / 8).toByte; x += 1 }
      y += 1
    }
    g
  }

  test("flat 8x8 blocks round-trip bit-exactly with a DC-8 table") {
    val (w, h) = (24, 16)
    def v(bx: Int, by: Int): Int = (37 + 41 * bx + 83 * by) % 256
    val gray = flatGray(w, h)(v)
    val jpg = JpegCodec.encodeGray(w, h, gray, JpegCodec.flatExactTable())
    val img = JpegCodec.decode(jpg)
    assert(img != null && img.w == w && img.h == h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val want = v(x / 8, y / 8)
        val at = 3 * (y * w + x)
        assert((img.px(at) & 0xff) == want, s"pixel ($x,$y)")
        assert(img.px(at) == img.px(at + 1) && img.px(at) == img.px(at + 2))
        x += 1
      }
      y += 1
    }
  }

  test("restart markers: DRI stream decodes identically to the plain one") {
    val (w, h) = (40, 24) // 15 MCUs; interval 4 → RST0..RST2
    def v(bx: Int, by: Int): Int = (11 + 29 * bx + 67 * by) % 256
    val gray = flatGray(w, h)(v)
    val plain = JpegCodec.encodeGray(w, h, gray, JpegCodec.flatExactTable())
    val rst = JpegCodec.encodeGray(w, h, gray, JpegCodec.flatExactTable(),
      restartInterval = 4)
    assert(rst.containsSlice(Array(0xff.toByte, 0xdd.toByte))) // DRI present
    val a = JpegCodec.decode(plain)
    val b = JpegCodec.decode(rst)
    assert(a != null && b != null)
    assert(java.util.Arrays.equals(a.px, b.px))
  }

  private def smoothGray(w: Int, h: Int): Array[Byte] = {
    val g = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        g(y * w + x) =
          ((128 + 80 * math.sin(x / 7.0) * math.cos(y / 5.0)).toInt & 0xff).toByte
        x += 1
      }
      y += 1
    }
    g
  }

  test("our encoder vs the JDK decoder: ImageIO reads our gray stream") {
    val (w, h) = (37, 23) // non-multiples: pad path under test
    val gray = smoothGray(w, h)
    val jpg = JpegCodec.encodeGray(w, h, gray, JpegCodec.quantTable(92))
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h)
    val ours = JpegCodec.decode(jpg)
    assert(ours != null)
    var maxDiff = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ref.getRaster.getSample(x, y, 0)
        val o = ours.px(3 * (y * w + x)) & 0xff
        maxDiff = math.max(maxDiff, math.abs(r - o))
        x += 1
      }
      y += 1
    }
    // same bitstream, two IDCT implementations: ±1 rounding at most
    assert(maxDiff <= 1, s"maxDiff=$maxDiff")
  }

  test("the JDK encoder vs our decoder: we read an ImageIO stream") {
    val (w, h) = (48, 32)
    val bi = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val gray = smoothGray(w, h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        bi.getRaster.setSample(x, y, 0, gray(y * w + x) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(bi, "jpg", bos))
    val jpg = bos.toByteArray
    val ours = JpegCodec.decode(jpg)
    assert(ours != null && ours.w == w && ours.h == h)
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    var maxDiff = 0
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ref.getRaster.getSample(x, y, 0)
        val o = ours.px(3 * (y * w + x)) & 0xff
        maxDiff = math.max(maxDiff, math.abs(r - o))
        x += 1
      }
      y += 1
    }
    assert(maxDiff <= 1, s"maxDiff=$maxDiff")
  }

  test("color 4:4:4 and 4:2:0: ImageIO agrees within upsampling slack") {
    val (w, h) = (32, 24)
    val rgb = new Array[Byte](3 * w * h)
    var i = 0
    while (i < w * h) {
      val x = i % w; val y = i / w
      rgb(3 * i) = ((100 + 60 * math.sin(x / 6.0)).toInt & 0xff).toByte
      rgb(3 * i + 1) = ((120 + 50 * math.cos(y / 5.0)).toInt & 0xff).toByte
      rgb(3 * i + 2) = ((90 + 40 * math.sin((x + y) / 8.0)).toInt & 0xff).toByte
      i += 1
    }
    for ((jpg, tol) <- Seq(
      (JpegCodec.encode444(w, h, rgb, JpegCodec.quantTable(95)), 2),
      (JpegCodec.encode420(w, h, rgb, JpegCodec.quantTable(95)), 12))) {
      val ours = JpegCodec.decode(jpg)
      assert(ours != null && ours.w == w && ours.h == h)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(ref != null)
      var worst = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = ref.getRGB(x, y)
          val at = 3 * (y * w + x)
          worst = math.max(worst, math.abs(((p >> 16) & 0xff) -
            (ours.px(at) & 0xff)))
          worst = math.max(worst, math.abs(((p >> 8) & 0xff) -
            (ours.px(at + 1) & 0xff)))
          worst = math.max(worst, math.abs((p & 0xff) -
            (ours.px(at + 2) & 0xff)))
          x += 1
        }
        y += 1
      }
      // 4:4:4 differs only by IDCT/YCbCr rounding; 4:2:0 also by the
      // upsampling filter choice (box here, interpolating in ImageIO)
      assert(worst <= tol, s"worst=$worst tol=$tol")
    }
  }

  test("4:2:0 flat MCUs: chroma constant per 16x16 decodes near-exactly") {
    val (w, h) = (32, 32)
    val rgb = new Array[Byte](3 * w * h)
    var i = 0
    while (i < w * h) {
      val mx = (i % w) / 16; val my = (i / w) / 16
      rgb(3 * i) = (60 + 50 * mx).toByte
      rgb(3 * i + 1) = (80 + 40 * my).toByte
      rgb(3 * i + 2) = (100 + 30 * (mx + my)).toByte
      i += 1
    }
    val jpg = JpegCodec.encode420(w, h, rgb, JpegCodec.flatExactTable())
    val img = JpegCodec.decode(jpg)
    assert(img != null)
    var worst = 0
    i = 0
    while (i < 3 * w * h) {
      worst = math.max(worst, math.abs((img.px(i) & 0xff) - (rgb(i) & 0xff)))
      i += 1
    }
    // flat DCT path is lossless; only the YCbCr round-trip rounds
    assert(worst <= 2, s"worst=$worst")
  }

  test("progressive JPEG: ImageIO-written SOF2 streams decode within ±1") {
    // gray and color, non-multiple-of-8 dims, ImageIO's default
    // progression script (DC first+refine, AC spectral bands + refines)
    val (w, h) = (53, 37)
    def check(img: BufferedImage, channels: Int, tol: Int): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      val jpg = bos.toByteArray
      // it really is progressive: SOF2 marker present, SOF0 absent
      def hasMarker(mk: Int): Boolean = {
        var i = 2
        var found = false
        while (i + 4 <= jpg.length && !found && (jpg(i) & 0xff) == 0xff) {
          val m = jpg(i + 1) & 0xff
          if (m == mk) found = true
          else if (m == 0xda) i = jpg.length
          else i += 2 + (((jpg(i + 2) & 0xff) << 8) | (jpg(i + 3) & 0xff))
        }
        found
      }
      assert(hasMarker(0xc2) && !hasMarker(0xc0), "stream is not SOF2")
      val ours = JpegCodec.decode(jpg)
      assert(ours != null && ours.w == w && ours.h == h)
      val ref = ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      var worst = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val at = 3 * (y * w + x)
          if (channels == 1) {
            // raw sample — getRGB would gamma-convert the gray space
            worst = math.max(worst, math.abs(ref.getRaster.getSample(x, y, 0) -
              (ours.px(at) & 0xff)))
          } else {
            val p = ref.getRGB(x, y)
            worst = math.max(worst, math.abs(((p >> 16) & 0xff) -
              (ours.px(at) & 0xff)))
            worst = math.max(worst, math.abs(((p >> 8) & 0xff) -
              (ours.px(at + 1) & 0xff)))
            worst = math.max(worst, math.abs((p & 0xff) -
              (ours.px(at + 2) & 0xff)))
          }
          x += 1
        }
        y += 1
      }
      assert(worst <= tol, s"worst=$worst tol=$tol channels=$channels")
    }
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val g = smoothGray(w, h)
    for (y <- 0 until h; x <- 0 until w)
      gray.getRaster.setSample(x, y, 0, g(y * w + x) & 0xff)
    check(gray, channels = 1, tol = 1)
    val color = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (128 + 80 * math.sin(x / 6.0)).toInt & 0xff
      val gg = (128 + 70 * math.cos(y / 5.0)).toInt & 0xff
      val b = (128 + 60 * math.sin((x + y) / 9.0)).toInt & 0xff
      color.setRGB(x, y, (r << 16) | (gg << 8) | b)
    }
    // ImageIO writes 4:2:0 color by default: upsampling filters differ
    // (box here, interpolating there) — chroma-edge slack only
    check(color, channels = 3, tol = 16)
  }

  test("EXIF orientation normalizes the raster") {
    val (w, h) = (24, 16)
    val gray = smoothGray(w, h)
    val plain = JpegCodec.encodeGray(w, h, gray, JpegCodec.flatExactTable())
    val base = JpegCodec.decode(plain)
    assert(base != null)
    def withExif(o: Int): Array[Byte] = {
      // APP1: "Exif\0\0" + little-endian TIFF, one IFD0 entry (0x0112)
      val tiff = Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0, // header, IFD@8
        1, 0, // one entry
        0x12, 0x01, 3, 0, 1, 0, 0, 0, o.toByte, 0, 0, 0,
        0, 0, 0, 0) // next-IFD = none
      val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
      val seg = Array(0xff.toByte, 0xe1.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte,
        ((payload.length + 2) & 0xff).toByte) ++ payload
      plain.take(2) ++ seg ++ plain.drop(2) // splice after SOI
    }
    // orientation 6 (rotate 90 CW): dims swap, pixels move exactly
    val r6 = JpegCodec.decode(withExif(6))
    assert(r6 != null && r6.w == h && r6.h == w)
    for (y <- 0 until base.h; x <- 0 until base.w) {
      // src (x,y) lands at dst (h-1-y, x)
      val d = 3 * (x * r6.w + (h - 1 - y))
      assert(r6.px(d) == base.px(3 * (y * w + x)), s"rot90 ($x,$y)")
    }
    // orientation 2 (mirror): same dims, horizontally flipped
    val r2 = JpegCodec.decode(withExif(2))
    assert(r2 != null && r2.w == w && r2.h == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(r2.px(3 * (y * w + x)) == base.px(3 * (y * w + (w - 1 - x))))
    // orientation 3 then 3 == identity on dims; and a hash check: the
    // same physical scene saved rotated + upright near-dups at 0 only
    // AFTER normalization
    assert(JpegCodec.decode(withExif(3)).w == w)
    // garbage EXIF: advisory only — decode proceeds upright
    val junk = plain.take(2) ++ Array[Byte](0xff.toByte, 0xe1.toByte, 0, 8,
      'J', 'u', 'n', 'k', 0, 0) ++ plain.drop(2)
    val rj = JpegCodec.decode(junk)
    assert(rj != null && java.util.Arrays.equals(rj.px, base.px))
  }

  test("mutation battery: corrupt streams null out, never throw") {
    val (w, h) = (24, 16)
    val jpg = JpegCodec.encodeGray(w, h, smoothGray(w, h),
      JpegCodec.quantTable(80), restartInterval = 2)
    val rnd = new scala.util.Random(1107)
    var nulls = 0
    (0 until 200).foreach { _ =>
      val b = jpg.clone()
      (0 to rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
      val r = JpegCodec.decode(b) // must not throw
      if (r == null) nulls += 1
      else assert(r.w > 0 && r.h > 0 && r.px.length == 3 * r.w * r.h)
    }
    (0 until 40).foreach { i =>
      assert(JpegCodec.decode(jpg.take(i * jpg.length / 40)) == null ||
        true) // truncation: no throw is the property
    }
    assert(nulls > 0) // the battery actually corrupted framing sometimes
    // foreign bytes
    assert(JpegCodec.decode(Array[Byte](1, 2, 3)) == null)
    assert(JpegCodec.decode("GIF89a".getBytes("US-ASCII")) == null)
  }

  test("PixelDecode.decode dispatches all four containers by magic") {
    val (w, h) = (16, 8)
    def v(bx: Int, by: Int): Int = (50 + 70 * bx + 90 * by) % 256
    val gray = flatGray(w, h)(v)
    val jpg = JpegCodec.encodeGray(w, h, gray, JpegCodec.flatExactTable())
    val viaSniff = PixelDecode.decode(jpg)
    val direct = JpegCodec.decode(jpg)
    assert(viaSniff != null && direct != null)
    assert(java.util.Arrays.equals(viaSniff.px, direct.px))
    assert(PixelDecode.decode(Array[Byte]()) == null)
    assert(PixelDecode.decode(null) == null)
  }

  // flat per-8x8-block 4-channel planes: value closed-form per block
  private def flatChans(w: Int, h: Int): Array[Array[Byte]] =
    Array.tabulate(4) { ch =>
      flatGray(w, h)((bx, by) => (40 + 30 * ch + 50 * bx + 90 * by) % 200 + 30)
    }

  test("Adobe CMYK (APP14 transform 0): inverted-ink conversion is exact") {
    val (w, h) = (16, 16)
    val chans = flatChans(w, h)
    val jpg = JpegCodec.encodeAdobe4(w, h, chans,
      JpegCodec.flatExactTable(), transform = 0)
    val img = JpegCodec.decode(jpg)
    assert(img != null && img.w == w && img.h == h)
    // flat blocks + DC-8 table: stored channels round-trip bit-exactly,
    // so RGB is exactly (c·k + 127) / 255 on the SOURCE values
    var i = 0
    while (i < w * h) {
      val k = chans(3)(i) & 0xff
      var ch = 0
      while (ch < 3) {
        val want = ((chans(ch)(i) & 0xff) * k + 127) / 255
        assert((img.px(3 * i + ch) & 0xff) == want, s"px $i chan $ch")
        ch += 1
      }
      i += 1
    }
    // the sniffing entry point routes it too
    assert(PixelDecode.decode(jpg) != null)
    assert(PixelDecode.container(jpg) == "jpeg")
  }

  test("Adobe YCCK (APP14 transform 2): chroma-coded channels invert") {
    val (w, h) = (16, 8)
    // stored channels = YCC-coded inverted CMY + raw K; flat blocks so
    // the store round-trips exactly and the expected math is closed
    val chans = flatChans(w, h)
    val jpg = JpegCodec.encodeAdobe4(w, h, chans,
      JpegCodec.flatExactTable(), transform = 2)
    val img = JpegCodec.decode(jpg)
    assert(img != null)
    def iclamp(d: Double): Int = {
      val v = d.toInt; if (v < 0) 0 else if (v > 255) 255 else v
    }
    var i = 0
    while (i < w * h) {
      val c = chans(0)(i) & 0xff
      val u = (chans(1)(i) & 0xff) - 128
      val v = (chans(2)(i) & 0xff) - 128
      val k = chans(3)(i) & 0xff
      val rr = iclamp(math.rint(c + 1.402 * v))
      val gg = iclamp(math.rint(c - 0.344136 * u - 0.714136 * v))
      val bb = iclamp(math.rint(c + 1.772 * u))
      assert((img.px(3 * i) & 0xff) == (rr * k + 127) / 255, s"r $i")
      assert((img.px(3 * i + 1) & 0xff) == (gg * k + 127) / 255, s"g $i")
      assert((img.px(3 * i + 2) & 0xff) == (bb * k + 127) / 255, s"b $i")
      i += 1
    }
  }

  test("4-component stream: ImageIO raster agrees with our stored planes") {
    // readRaster bypasses color conversion, so the JDK's independent
    // Huffman+IDCT must reproduce our flat stored channels exactly
    val (w, h) = (16, 16)
    val chans = flatChans(w, h)
    val jpg = JpegCodec.encodeAdobe4(w, h, chans,
      JpegCodec.flatExactTable(), transform = 0)
    val reader = ImageIO.getImageReadersByFormatName("jpg").next()
    val iis = ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(jpg))
    reader.setInput(iis)
    val raster = reader.readRaster(0, null)
    assert(raster.getWidth == w && raster.getHeight == h)
    assert(raster.getNumBands == 4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var band = 0
        while (band < 4) {
          assert(raster.getSample(x, y, band) ==
            (chans(band)(y * w + x) & 0xff), s"($x,$y) band $band")
          band += 1
        }
        x += 1
      }
      y += 1
    }
    reader.dispose()
  }

  test("4-component without a usable APP14 returns null") {
    val (w, h) = (16, 8)
    val jpg = JpegCodec.encodeAdobe4(w, h, flatChans(w, h),
      JpegCodec.flatExactTable(), transform = 0)
    // strip the APP14 segment (SOI + 16-byte segment): bare 4-comp
    assert((jpg(2) & 0xff) == 0xff && (jpg(3) & 0xff) == 0xee)
    val bare = jpg.take(2) ++ jpg.drop(2 + 16)
    assert(JpegCodec.decode(bare) == null)
    // transform byte 1 (YCbCr) is meaningless for 4 components
    val t1 = jpg.clone()
    t1(17) = 1 // SOI(2) + marker(2) + len(2) + "Adobe"(5) + ver/flags(6)
    assert(JpegCodec.decode(t1) == null)
  }
}
