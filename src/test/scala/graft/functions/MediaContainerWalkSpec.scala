package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.MediaScenes

/** The header-walk surface for the containers the pixel decoders
  * don't own: WebP/TIFF/AVIF/HEIC dimensions through
  * [[MediaHeaderExpr]], Matroska/WebM through [[EbmlHeaderExpr]], and
  * Ogg (Opus/Vorbis) through [[OggHeaderExpr]] — exact parses of
  * independently-built fixtures, edge rules, and mutation fuzz
  * batteries (never throw, null or parse). */
class MediaContainerWalkSpec extends AnyFunSuite {

  private val media = MediaHeaderExpr(null)
  private val ebml = EbmlHeaderExpr(null)
  private val ogg = OggHeaderExpr(null)

  private def dims(r: InternalRow): (String, Int, Int, Int) =
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3))

  // ------------------------------------------------------------- images

  test("webp dims: VP8L header, VP8 keyframe, VP8X canvas") {
    val gray = new Array[Byte](33 * 21)
    val vp8l = media.compute(WebpCodec.encodeGray(33, 21, gray))
    assert(dims(vp8l) == ("webp", 33, 21, 3))

    val vp8 = media.compute(WebpCodec.lossyStub(612, 408))
    assert(dims(vp8) == ("webp", 612, 408, 3))

    // non-keyframe (frame tag bit 0 set) carries no dims -> null
    val inter = WebpCodec.lossyStub(612, 408)
    inter(20) = (inter(20) | 1).toByte
    assert(media.compute(inter) == null)

    // hand-built VP8X: canvas 300x200, alpha flag set
    val vp8x = new Array[Byte](30)
    "RIFF".getBytes.copyToArray(vp8x, 0)
    vp8x(4) = 22 // riff size
    "WEBP".getBytes.copyToArray(vp8x, 8)
    "VP8X".getBytes.copyToArray(vp8x, 12)
    vp8x(16) = 10 // chunk size
    vp8x(20) = 0x10 // alpha
    vp8x(24) = (300 - 1).toByte; vp8x(25) = ((300 - 1) >> 8).toByte
    vp8x(27) = (200 - 1).toByte; vp8x(28) = ((200 - 1) >> 8).toByte
    assert(dims(media.compute(vp8x)) == ("webp", 300, 200, 4))

    // VP8L alpha hint bit -> 4 channels (hand-built 5-byte header)
    val la = new Array[Byte](25)
    "RIFF".getBytes.copyToArray(la, 0)
    la(4) = 17
    "WEBP".getBytes.copyToArray(la, 8)
    "VP8L".getBytes.copyToArray(la, 12)
    la(16) = 5
    la(20) = 0x2f
    // w-1 = 15, h-1 = 9, alpha = 1: LSB-first 14+14+1 bits
    val v = 15 | (9 << 14) | (1 << 28)
    la(21) = v.toByte; la(22) = (v >> 8).toByte
    la(23) = (v >> 16).toByte; la(24) = (v >> 24).toByte
    assert(dims(media.compute(la)) == ("webp", 16, 10, 4))
  }

  test("tiff dims: both byte orders, SHORT and LONG, default samples") {
    assert(dims(media.compute(MediaScenes.tiffDimsStub(800, 600, 3,
      bigEndian = false))) == ("tiff", 800, 600, 3))
    assert(dims(media.compute(MediaScenes.tiffDimsStub(123, 45, 1,
      bigEndian = true))) == ("tiff", 123, 45, 1))
    // the bare header stub (no IFD entries readable) stays null
    assert(media.compute(MediaScenes.tiffStub()) == null)
    // drop SamplesPerPixel (entry count 2): default samples = 1
    val t = MediaScenes.tiffDimsStub(50, 40, 9, bigEndian = false)
    t(8) = 2
    assert(dims(media.compute(t)) == ("tiff", 50, 40, 1))
  }

  test("avif/heic dims: the meta/iprp/ipco/ispe walk") {
    assert(dims(media.compute(MediaScenes.avifIspeStub("avif", 1920, 1080)))
      == ("avif", 1920, 1080, 3))
    assert(dims(media.compute(MediaScenes.avifIspeStub("heic", 640, 480)))
      == ("heic", 640, 480, 3))
    // a bare ftyp (no meta box) classifies but has no dims -> null
    assert(media.compute(MediaScenes.ftypStub("avif")) == null)
    assert(PixelDecode.container(MediaScenes.ftypStub("avif")) == "avif")
  }

  // -------------------------------------------------------------- flac

  private val audio = AudioHeaderExpr(null)

  test("flac STREAMINFO: packed rate/channels/bits/total, block walk") {
    val r = audio.compute(MediaScenes.flacStub(44100, 2, 16, 123456789L))
    assert(r != null)
    assert(r.getUTF8String(0).toString == "flac")
    assert(r.getInt(1) == 44100 && r.getInt(2) == 2 && r.getInt(3) == 16)
    assert(r.getLong(4) == 123456789L)
    // a 36-bit total crosses the 4-byte boundary
    val big = audio.compute(MediaScenes.flacStub(96000, 8, 24, 0xBcdef0123L))
    assert(big.getLong(4) == 0xBcdef0123L && big.getInt(2) == 8 &&
      big.getInt(3) == 24)
    // bare magic with no STREAMINFO is null, not a throw
    assert(audio.compute("fLaC....".getBytes("US-ASCII")) == null)
  }

  // --------------------------------------------------------- mp4 tracks

  private val video = VideoHeaderExpr(null)

  test("mp4 track walk: tkhd dims, hdlr routing, stsd codec fourcc") {
    val r = video.compute(MediaScenes.mp4TrackStub(1280, 720, "avc1",
      90000L, 900000L, nAudio = 1))
    assert(r != null)
    assert(r.getUTF8String(1).toString == "isom")
    assert(r.getLong(2) == 90000L && r.getLong(3) == 900000L)
    assert(r.getInt(4) == 2) // one video + one audio trak
    assert(r.getInt(6) == 1280 && r.getInt(7) == 720)
    assert(r.getUTF8String(8).toString == "avc1")
    // zero audio tracks; a different codec fourcc
    val av1 = video.compute(MediaScenes.mp4TrackStub(640, 360, "av01",
      600L, 1200L, nAudio = 0))
    assert(av1.getInt(4) == 1 && av1.getInt(6) == 640 &&
      av1.getUTF8String(8).toString == "av01")
    // audio-only trak (the synthesizeVideo shape): dims 0, codec empty
    val audioOnly = MediaScenes.mp4TrackStub(0, 0, "mp4a", 600L, 600L, 0)
    // rewrite its hdlr 'vide' to 'soun' so no video track exists
    var k = 0
    var found = false
    while (!found && k + 4 <= audioOnly.length) {
      if (audioOnly(k) == 'v' && audioOnly(k + 1) == 'i' &&
        audioOnly(k + 2) == 'd' && audioOnly(k + 3) == 'e') {
        "soun".getBytes("US-ASCII").copyToArray(audioOnly, k)
        found = true
      }
      k += 1
    }
    assert(found)
    val noVid = video.compute(audioOnly)
    assert(noVid.getInt(6) == 0 && noVid.getInt(7) == 0 &&
      noVid.getUTF8String(8).toString == "")
  }

  // -------------------------------------------------------------- ebml

  private def ebmlRow(b: Array[Byte]): (String, Long, Long, Int, Long, Long) = {
    val r = ebml.compute(b)
    assert(r != null)
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2), r.getInt(3),
      r.getLong(4), r.getLong(5))
  }

  test("webm/matroska: timescale, float duration, tracks, clusters") {
    val b = MediaScenes.webmStub("webm", 1000000L, 12345.0, 2, Seq(64, 32))
    assert(ebmlRow(b) == ("webm", 1000000L, 12345L, 2, 2L, 96L))

    // 250 us ticks: 4 ticks per ms
    val mkv = MediaScenes.webmStub("matroska", 250000L, 4000.0, 1, Nil)
    assert(ebmlRow(mkv) == ("mkv", 250000L, 1000L, 1, 0L, 0L))

    // foreign DocType -> null
    assert(ebml.compute(MediaScenes.webmStub("ogv", 1000000L, 1.0, 1,
      Nil)) == null)
  }

  test("ebml: unknown-size segment extends to end of payload") {
    val b = MediaScenes.webmStub("webm", 1000000L, 777.0, 1, Seq(16))
    // find the Segment id (18 53 80 67) and make its 4-byte size the
    // all-ones (= unknown) form
    var at = -1
    var i = 0
    while (at < 0 && i + 4 <= b.length) {
      if ((b(i) & 0xff) == 0x18 && (b(i + 1) & 0xff) == 0x53 &&
        (b(i + 2) & 0xff) == 0x80 && (b(i + 3) & 0xff) == 0x67) at = i
      i += 1
    }
    assert(at > 0)
    b(at + 4) = 0x1f; b(at + 5) = 0xff.toByte
    b(at + 6) = 0xff.toByte; b(at + 7) = 0xff.toByte
    assert(ebmlRow(b) == ("webm", 1000000L, 777L, 1, 1L, 16L))
  }

  test("ebml: duration absent reports -1; missing Info is null") {
    // hand-built: EBML header (DocType webm) + Segment{Info{scale}}
    def elem(id: Array[Int], body: Array[Byte]): Array[Byte] =
      id.map(_.toByte).toArray ++
        Array[Byte]((0x10 | (body.length >> 24)).toByte,
          (body.length >> 16).toByte, (body.length >> 8).toByte,
          body.length.toByte) ++ body
    val hdr = elem(Array(0x1a, 0x45, 0xdf, 0xa3),
      elem(Array(0x42, 0x82), "webm".getBytes("US-ASCII")))
    val info = elem(Array(0x15, 0x49, 0xa9, 0x66),
      elem(Array(0x2a, 0xd7, 0xb1), Array[Byte](0x0f, 0x42, 0x40)))
    val r = ebml.compute(hdr ++ elem(Array(0x18, 0x53, 0x80, 0x67), info))
    assert(r != null && r.getLong(2) == -1L)
    val noInfo = ebml.compute(hdr ++
      elem(Array(0x18, 0x53, 0x80, 0x67), Array.emptyByteArray))
    assert(noInfo == null)
  }

  // --------------------------------------------------------------- ogg

  private def oggRow(b: Array[Byte]): (String, Int, Long, Int, Long, Long, Long) = {
    val r = ogg.compute(b)
    assert(r != null)
    (r.getUTF8String(0).toString, r.getInt(1), r.getLong(2), r.getInt(3),
      r.getLong(4), r.getLong(5), r.getLong(6))
  }

  test("ogg opus: pre-skip subtracted, 48 kHz granules") {
    val b = MediaScenes.oggStub(MediaScenes.opusHead(2, 312, 48000L),
      Seq(24000L, 48312L + 96000L))
    assert(oggRow(b) ==
      ("opus", 2, 48000L, 312, 3L, 48312L + 96000L,
        (48312L + 96000L - 312) * 1000 / 48000))
  }

  test("ogg vorbis: granules at the declared rate") {
    val b = MediaScenes.oggStub(MediaScenes.vorbisId(2, 44100L),
      Seq(44100L * 3))
    assert(oggRow(b) == ("vorbis", 2, 44100L, 0, 2L, 132300L, 3000L))
  }

  test("ogg: CRC corruption, truncation, unknown first packet are null") {
    val good = MediaScenes.oggStub(MediaScenes.opusHead(1, 0, 48000L),
      Seq(48000L))
    val bad = good.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x55).toByte
    assert(ogg.compute(bad) == null, "payload flip must fail the CRC")
    assert(ogg.compute(java.util.Arrays.copyOf(good, good.length - 3)) == null)
    assert(ogg.compute(MediaScenes.oggStub(
      "FLAC....ignored....".getBytes("US-ASCII"), Seq(1L))) == null)
  }

  // -------------------------------------------------------------- fuzz

  test("fuzz: every walk survives mutation and truncation") {
    val rnd = new scala.util.Random(0xC0FFEE)
    val fixtures: Seq[(Array[Byte], Array[Byte] => AnyRef)] = Seq(
      (WebpCodec.lossyStub(612, 408), media.compute _),
      (MediaScenes.tiffDimsStub(800, 600, 3, bigEndian = false),
        media.compute _),
      (MediaScenes.tiffDimsStub(12, 34, 1, bigEndian = true),
        media.compute _),
      (MediaScenes.avifIspeStub("avif", 1920, 1080), media.compute _),
      (MediaScenes.flacStub(44100, 2, 16, 1000000L), audio.compute _),
      (MediaScenes.mp4TrackStub(1280, 720, "avc1", 90000L, 900000L, 1),
        video.compute _),
      (MediaScenes.webmStub("webm", 1000000L, 5000.0, 2, Seq(32, 16)),
        ebml.compute _),
      (MediaScenes.oggStub(MediaScenes.opusHead(2, 312, 48000L),
        Seq(1000L, 96312L)), ogg.compute _),
      (MediaScenes.oggStub(MediaScenes.vorbisId(2, 44100L), Seq(44100L)),
        ogg.compute _))
    fixtures.foreach { case (base, walk) =>
      var k = 0
      while (k < 400) {
        val b = base.clone()
        val flips = 1 + rnd.nextInt(4)
        var f = 0
        while (f < flips) {
          b(rnd.nextInt(b.length)) =
            (b(rnd.nextInt(b.length)) ^ (1 << rnd.nextInt(8))).toByte
          f += 1
        }
        walk(b) // parse or null; never throw
        walk(java.util.Arrays.copyOf(b, rnd.nextInt(b.length + 1)))
        k += 1
      }
    }
  }

  // ---- WebM/VP8 frame extraction (VideoFrameHashesExpr dispatch) ----

  private def webmHashes(b: Array[Byte]): Array[Long] = {
    val r = VideoFrameHashesExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(b), 4).compute(b)
    if (r == null) null
    else r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
  }

  test("WebM walk: VP8 keyframes hash; flags and codec gate correctly") {
    val id = 3L // n = 4 + 3%4 = 7 frames
    val base = MediaScenes.buildWebmVp8Scene(id)
    val hs = webmHashes(base)
    assert(hs != null && hs.length == 4, "sampled 4 of the 7 frames")
    // Y4M and WebM carrying the SAME per-frame content would differ
    // only by container — here the content differs by design, but the
    // trimmed WebM re-mux must equal the from-scratch trim build:
    // flipping frame 0's keyframe flag drops exactly that frame, and
    // the remaining frames are bytewise the t=1.. builds
    val patched = base.clone()
    var at = -1
    var i = 0
    while (at < 0 && i < patched.length - 6) {
      if ((patched(i) & 0xff) == 0xa3) {
        val sz = Ebml.varint(patched, i + 1, patched.length,
          keepMarker = false)
        if (sz != null && sz._2 + 4 <= patched.length &&
          (patched(sz._2) & 0xff) == 0x81 &&
          (patched(sz._2 + 3) & 0xff) == 0x80) at = sz._2 + 3
      }
      i += 1
    }
    assert(at > 0, "found the first SimpleBlock's flags byte")
    patched(at) = 0 // not a keyframe any more
    val hsPatched = webmHashes(patched)
    val hsTrim = webmHashes(MediaScenes.buildWebmVp8Scene(id, trim = 1))
    assert(hsPatched != null && hsTrim != null)
    assert(hsPatched.toSeq == hsTrim.toSeq,
      "non-keyframe block skipped == the trimmed re-mux")
    // a non-VP8 CodecID gates the whole track out -> null
    val vp9 = base.clone()
    val cIdx = new String(vp9.map(_.toChar)).indexOf("V_VP8")
    assert(cIdx > 0)
    vp9(cIdx + 4) = '9'.toByte
    assert(webmHashes(vp9) == null, "V_VP9 track must not decode")
    // Y4M payloads still route through the original path
    val y4m = graft.ops.Multimodal.buildY4mScene(5L)
    assert(webmHashes(y4m) != null)
  }
}
