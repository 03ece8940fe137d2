package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.scalatest.funsuite.AnyFunSuite

/** Frame-walk conformance: MP3 and ADTS header math, ID3 tag handling,
  * truncation/trailing-garbage rules, CRC-present ADTS, VBR flagging,
  * and a mutation fuzz battery (never throws). */
class AudioFrameWalkSpec extends AnyFunSuite {

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  private def f(r: InternalRow, i: Int): Long = r.getLong(i)

  test("MP3: frame length, samples, duration, channels") {
    // MPEG1 L3, 128 kbps (idx 9), 44100 Hz (idx 0), stereo, 3 frames
    val frame = AudioFrameWalk.mp3Frame(9, 0, mono = false)
    assert(frame.length == 144 * 128000 / 44100) // = 417
    val r = AudioFrameWalk.walk(cat(frame, frame, frame))
    assert(r != null)
    assert(r.getUTF8String(0).toString == "mp3")
    assert(f(r, 1) == 3 && f(r, 2) == 44100 && f(r, 3) == 2)
    assert(f(r, 4) == 3 * 1152)
    assert(f(r, 5) == 3 * 1152 * 1000L / 44100)
    assert(f(r, 6) == 3L * frame.length)
    assert(!r.getBoolean(7)) // constant bitrate
    // mono bit
    val mono = AudioFrameWalk.walk(AudioFrameWalk.mp3Frame(9, 1, mono = true))
    assert(f(mono, 2) == 48000 && f(mono, 3) == 1)
  }

  test("MP3: VBR flag set when bitrates differ") {
    val r = AudioFrameWalk.walk(cat(
      AudioFrameWalk.mp3Frame(9, 0, false), AudioFrameWalk.mp3Frame(11, 0, false)))
    assert(r != null && r.getBoolean(7))
    assert(f(r, 6) == 144 * 128000 / 44100 + 144 * 192000 / 44100)
  }

  test("ID3v2 prefix is skipped; ID3v1 trailer ends the walk") {
    val frame = AudioFrameWalk.mp3Frame(10, 2, false)
    val id3v1 = cat("TAG".getBytes("US-ASCII"), new Array[Byte](125))
    val r = AudioFrameWalk.walk(cat(
      AudioFrameWalk.id3v2(57), frame, frame, id3v1))
    assert(r != null && f(r, 1) == 2 && f(r, 2) == 32000)
    assert(f(r, 6) == 2L * frame.length) // tag bytes not counted
  }

  test("truncated final frame is dropped; bare garbage is null") {
    val frame = AudioFrameWalk.mp3Frame(9, 0, false)
    val r = AudioFrameWalk.walk(cat(frame,
      java.util.Arrays.copyOf(frame, frame.length - 10)))
    assert(r != null && f(r, 1) == 1)
    assert(AudioFrameWalk.walk("not audio at all".getBytes("US-ASCII")) == null)
    assert(AudioFrameWalk.walk(java.util.Arrays.copyOf(frame, 3)) == null)
    // a whole stream shorter than one frame: null, not a partial count
    assert(AudioFrameWalk.walk(java.util.Arrays.copyOf(frame, 100)) == null)
  }

  test("ADTS: header math, multi-frame, CRC-present form") {
    val a = AudioFrameWalk.adtsFrame(4, 2, 30) // 44100, stereo, 37 bytes
    assert(a.length == 37)
    val r = AudioFrameWalk.walk(cat(a, a))
    assert(r != null && r.getUTF8String(0).toString == "aac_adts")
    assert(f(r, 1) == 2 && f(r, 2) == 44100 && f(r, 3) == 2)
    assert(f(r, 4) == 2 * 1024 && f(r, 6) == 74)
    assert(!r.getBoolean(7))
    // varying frame sizes flag VBR
    val v = AudioFrameWalk.walk(cat(a, AudioFrameWalk.adtsFrame(4, 2, 31)))
    assert(v.getBoolean(7))
    // protection_absent = 0: 2 CRC bytes inside the frame length
    val crc = AudioFrameWalk.adtsFrame(4, 2, 30).clone()
    crc(1) = 0xf0.toByte // clear protection_absent
    val rc = AudioFrameWalk.walk(crc)
    assert(rc != null && f(rc, 1) == 1 && f(rc, 6) == 37)
  }

  test("format switches mid-stream end the walk") {
    val mp3 = AudioFrameWalk.mp3Frame(9, 0, false)
    val adts = AudioFrameWalk.adtsFrame(4, 2, 30)
    val r = AudioFrameWalk.walk(cat(mp3, adts))
    assert(r != null && r.getUTF8String(0).toString == "mp3" && f(r, 1) == 1)
  }

  test("reserved version / samplerate / free-format bitrate stop the walk") {
    val base = AudioFrameWalk.mp3Frame(9, 0, false)
    def mut(b1: Int, b2: Int): Array[Byte] = {
      val m = base.clone(); m(1) = b1.toByte; m(2) = b2.toByte; m
    }
    assert(AudioFrameWalk.walk(mut(0xeb, base(2) & 0xff)) == null) // version 01
    assert(AudioFrameWalk.walk(mut(0xfb, 0x9c)) == null) // srIdx 3
    assert(AudioFrameWalk.walk(mut(0xfb, 0x00)) == null) // free format
    assert(AudioFrameWalk.walk(mut(0xfb, 0xf0)) == null) // bitrate idx 15
  }

  test("fuzz: byte flips and truncations never throw") {
    val stream = cat(AudioFrameWalk.id3v2(20),
      AudioFrameWalk.mp3Frame(9, 0, false), AudioFrameWalk.mp3Frame(10, 0, false),
      AudioFrameWalk.mp3Frame(11, 0, false))
    for (i <- stream.indices) {
      val m = stream.clone(); m(i) = (m(i) ^ 0xff).toByte
      AudioFrameWalk.walk(m) // must not throw
    }
    for (len <- 0 until stream.length)
      AudioFrameWalk.walk(java.util.Arrays.copyOf(stream, len))
    val adts = cat(AudioFrameWalk.adtsFrame(4, 2, 30),
      AudioFrameWalk.adtsFrame(7, 1, 45))
    for (i <- adts.indices) {
      val m = adts.clone(); m(i) = (m(i) ^ 0x5a).toByte
      AudioFrameWalk.walk(m)
    }
  }
}
