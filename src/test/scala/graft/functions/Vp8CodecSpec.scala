package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** VP8 (lossy WebP) codec, self-contained half: exact-fixture
  * round-trips through both intra paths (16x16 DC + Y2 WHT; B_PRED
  * with per-subblock DC residuals), container routing through the
  * sniffing decoder, truncation rejection, and a mutation battery.
  * External bit-exactness against libwebp lives in
  * [[Vp8ConformanceSpec]]. */
class Vp8CodecSpec extends AnyFunSuite {

  private def mbFlatVals(mbW: Int, mbH: Int)(f: (Int, Int) => Int)
      : Array[Int] =
    Array.tabulate(mbW * mbH)(mb => f(mb % mbW, mb / mbW) & 0xff)

  test("flat-MB frames (16x16 DC pred + Y2 WHT) reconstruct exactly") {
    for ((w, h) <- Seq((16, 16), (48, 32), (64, 64), (32, 48))) {
      val vals = mbFlatVals(w / 16, h / 16)((x, y) => 17 + 31 * x + 73 * y)
      val bytes = Vp8Codec.encodeGrayMbFlat(w, h, vals)
      val rgb = PixelDecode.decode(bytes)
      assert(rgb != null && rgb.w == w && rgb.h == h)
      for (y <- 0 until h; x <- 0 until w) {
        val expect = vals((y / 16) * (w / 16) + x / 16)
        val o = 3 * (y * w + x)
        assert((rgb.px(o) & 0xff) == expect, s"Y($x,$y)")
        assert(rgb.px(o) == rgb.px(o + 1) && rgb.px(o) == rgb.px(o + 2))
      }
    }
  }

  test("skipped macroblocks: a constant frame is all-skip and exact") {
    // every MB after the first predicts its neighbor exactly, so all
    // residuals vanish and the skip flag carries the whole frame
    val bytes = Vp8Codec.encodeGrayMbFlat(64, 32, Array.fill(8)(128))
    val rgb = PixelDecode.decode(bytes)
    assert(rgb != null)
    assert(rgb.px.forall(b => (b & 0xff) == 128))
  }

  test("per-4x4 B_PRED frames reconstruct exactly, incl. odd sizes") {
    for ((w, h) <- Seq((16, 16), (40, 24), (24, 40), (20, 12), (36, 20))) {
      val g = new Array[Byte](w * h)
      for (y <- 0 until h; x <- 0 until w)
        g(y * w + x) = ((11 + (x / 4) * 53 + (y / 4) * 29) % 256).toByte
      val bytes = Vp8Codec.encodeGrayB4x4(w, h, g)
      val rgb = PixelDecode.decode(bytes)
      assert(rgb != null && rgb.w == w && rgb.h == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((rgb.px(3 * (y * w + x)) & 0xff) == (g(y * w + x) & 0xff),
          s"($x,$y) ${w}x$h")
    }
  }

  test("container routing: VP8 chunks sniff as webp_lossy and decode") {
    val bytes = Vp8Codec.encodeGrayMbFlat(32, 16, Array(10, 200))
    assert(WebpCodec.riffKind(bytes) == "webp_lossy")
    assert(PixelDecode.container(bytes) == "webp_lossy")
    assert(WebpCodec.decode(bytes) != null)
  }

  test("truncated streams are rejected, not fabricated") {
    // the dims-only stub (zero-size first partition)
    assert(WebpCodec.decode(WebpCodec.lossyStub(24, 16)) == null)
    // a real stream cut anywhere inside the partitions
    val bytes = Vp8Codec.encodeGrayB4x4(24, 16, {
      val g = new Array[Byte](24 * 16)
      for (i <- g.indices) g(i) = ((i / 97) * 41 % 200).toByte
      // make it per-4x4 flat
      for (y <- 0 until 16; x <- 0 until 24)
        g(y * 24 + x) = (((x / 4) * 41 + (y / 4) * 59) % 200).toByte
      g
    })
    assert(WebpCodec.decode(bytes) != null)
    // rebuild the container around a payload truncated INSIDE the
    // first partition (header/modes) so the RIFF walk stays
    // consistent and the BOOL DECODER does the reject; mid-token
    // truncations are not asserted — whether the tail decodes from
    // the register slack is legitimately content-dependent
    val payloadLen = bytes.length - 20
    assert(payloadLen > 40)
    for (keep <- Seq(4, 12, 24)) {
      val out = new Array[Byte](20 + keep)
      System.arraycopy(bytes, 0, out, 0, 20 + keep)
      def le4(at: Int, v: Int): Unit = {
        out(at) = v.toByte; out(at + 1) = (v >> 8).toByte
        out(at + 2) = (v >> 16).toByte; out(at + 3) = (v >> 24).toByte
      }
      le4(4, 4 + 8 + keep)
      le4(16, keep)
      assert(WebpCodec.decode(out) == null, s"kept $keep decoded")
    }
  }

  test("mutation battery: bit flips and garbage never throw") {
    val base = Vp8Codec.encodeGrayB4x4(40, 24, {
      val g = new Array[Byte](40 * 24)
      for (y <- 0 until 24; x <- 0 until 40)
        g(y * 40 + x) = (((x / 4) * 37 + (y / 4) * 101) % 200).toByte
      g
    })
    val rnd = new scala.util.Random(7)
    var decoded = 0
    for (_ <- 0 until 500) {
      val m = base.clone()
      val flips = 1 + rnd.nextInt(4)
      for (_ <- 0 until flips) {
        val at = rnd.nextInt(m.length)
        m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      val r = WebpCodec.decode(m) // must not throw
      if (r != null) decoded += 1
    }
    for (_ <- 0 until 200) {
      val g = new Array[Byte](64 + rnd.nextInt(256))
      rnd.nextBytes(g)
      assert(PixelDecode.decode(g) == null || g.length >= 8)
    }
    assert(decoded >= 0) // the battery's assertion is "no throw"
  }

  test("frames too large for the decode-bomb cap return null") {
    // forge the uncompressed header of a 16k x 16k keyframe
    val bytes = Vp8Codec.encodeGrayMbFlat(32, 16, Array(10, 20))
    // VP8 chunk payload starts at 20; dims at +6
    val big = bytes.clone()
    big(26) = 0xff.toByte; big(27) = 0x3f.toByte // width 16383
    big(28) = 0xff.toByte; big(29) = 0x3f.toByte // height 16383
    assert(WebpCodec.decode(big) == null)
  }
}
