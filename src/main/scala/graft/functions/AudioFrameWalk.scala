package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compressed-audio FRAME-HEADER walk — MPEG audio (MP3 and its Layer
  * I/II siblings, ISO/IEC 11172-3 / 13818-3) and ADTS-framed AAC
  * (ISO/IEC 13818-7). No PCM is produced: the walk validates sync,
  * version/layer, bitrate and sample-rate fields frame by frame and
  * reduces to the features an audio curation gate keys on — frame
  * count, total samples, exact integer duration, byte size, sample
  * rate, channel count, and a VBR flag. This is what makes the sample
  * gate honest on the formats crawl audio actually arrives in (WAV is
  * nearly nonexistent there); full decode stays out of scope.
  *
  * Walk rules: a leading ID3v2 tag is skipped (syncsafe size); frames
  * must be back-to-back (the trailing non-frame region — e.g. an
  * ID3v1 "TAG" block — ends the walk); a truncated final frame is
  * dropped; at least one whole frame is required, else null. */
object AudioFrameWalk {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),        // "mp3" | "mp2" | "mp1" | "aac_adts"
    StructField("n_frames", LongType),
    StructField("sample_rate", LongType),     // Hz, first frame's
    StructField("channels", LongType),
    StructField("n_samples", LongType),       // PCM samples per channel
    StructField("duration_ms", LongType),     // n_samples*1000 / sample_rate
    StructField("total_bytes", LongType),     // sum of frame lengths
    StructField("vbr", BooleanType)))         // any frame bitrate differs

  // kbps by [versionGroup(0=MPEG1,1=MPEG2/2.5)][layer(1..3)][index 1..14]
  private val Bitrates: Array[Array[Array[Int]]] = Array(
    Array(null,
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),
    Array(null,
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))

  // Hz by [version(0=2.5, 2=MPEG2, 3=MPEG1)][index 0..2]
  private val SampleRates: Array[Array[Int]] = Array(
    Array(11025, 12000, 8000), null,
    Array(22050, 24000, 16000), Array(44100, 48000, 32000))

  private val AdtsRates: Array[Int] = Array(
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350, 0, 0, 0)

  /** Leading ID3v2 tag length (0 when absent): "ID3", 2 version
    * bytes, 1 flag byte, 4 syncsafe size bytes; a footer (flag bit 4)
    * adds 10 more. */
  private def id3v2Len(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    if ((b(6) | b(7) | b(8) | b(9)) < 0) return 0 // syncsafe: high bit clear
    val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
      ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
    10 + size + (if ((b(5) & 0x10) != 0) 10 else 0)
  }

  /** Walk the frames; null unless at least one whole valid frame. */
  def walk(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    var pos = id3v2Len(b)
    if (pos < 0 || pos + 4 > b.length) return null
    var format: String = null
    var frames = 0L
    var samples = 0L
    var bytes = 0L
    var rate = 0L
    var channels = 0L
    var firstBitrate = -1
    var vbr = false
    var done = false
    while (!done && pos + 4 <= b.length) {
      val b0 = b(pos) & 0xff; val b1 = b(pos + 1) & 0xff
      if (b0 != 0xff || (b1 & 0xe0) != 0xe0) done = true
      else {
        val layerBits = (b1 >> 1) & 3
        if (layerBits == 0) {
          // ---- ADTS AAC: 12-bit sync + layer 00 ----
          if ((b1 & 0xf0) != 0xf0 || pos + 7 > b.length) { done = true }
          else {
            val fmt = "aac_adts"
            if (format == null) format = fmt
            if (format != fmt) done = true
            else {
              val b2 = b(pos + 2) & 0xff
              val freqIdx = (b2 >> 2) & 0xf
              val hz = AdtsRates(freqIdx)
              val chanCfg = ((b2 & 1) << 2) | ((b(pos + 3) & 0xc0) >>> 6)
              val frameLen = ((b(pos + 3) & 0x03) << 11) |
                ((b(pos + 4) & 0xff) << 3) | ((b(pos + 5) & 0xff) >>> 5)
              val blocks = (b(pos + 6) & 0x03) + 1
              val crcLen = if ((b1 & 1) == 0) 2 else 0
              if (hz == 0 || chanCfg == 0 || frameLen < 7 + crcLen ||
                pos + frameLen > b.length) done = true
              else {
                if (frames == 0) { rate = hz; channels = chanCfg }
                // ADTS carries no bitrate field: VBR = frame sizes vary
                if (firstBitrate < 0) firstBitrate = frameLen
                else if (firstBitrate != frameLen) vbr = true
                frames += 1
                samples += 1024L * blocks
                bytes += frameLen
                pos += frameLen
              }
            }
          }
        } else {
          // ---- MPEG audio frame ----
          val version = (b1 >> 3) & 3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
          val layer = 4 - layerBits   // 1, 2, 3
          val b2 = b(pos + 2) & 0xff
          val brIdx = (b2 >> 4) & 0xf
          val srIdx = (b2 >> 2) & 3
          val padding = (b2 >> 1) & 1
          val mode = ((b(pos + 3) & 0xff) >> 6) & 3
          // reject reserved version/rate and free-format/invalid bitrate
          if (version == 1 || srIdx == 3 || brIdx == 0 || brIdx == 15)
            done = true
          else {
            val fmt = layer match {
              case 1 => "mp1"; case 2 => "mp2"; case _ => "mp3"
            }
            if (format == null) format = fmt
            if (format != fmt) done = true
            else {
              val vGroup = if (version == 3) 0 else 1
              val kbps = Bitrates(vGroup)(layer)(brIdx)
              val hz = SampleRates(version)(srIdx)
              val frameLen = layer match {
                case 1 => (12 * kbps * 1000 / hz + padding) * 4
                case 2 => 144 * kbps * 1000 / hz + padding
                case _ =>
                  if (version == 3) 144 * kbps * 1000 / hz + padding
                  else 72 * kbps * 1000 / hz + padding // MPEG2/2.5 L3
              }
              val perFrame = layer match {
                case 1 => 384L
                case 2 => 1152L
                case _ => if (version == 3) 1152L else 576L
              }
              if (frameLen < 4 || pos + frameLen > b.length) done = true
              else {
                if (frames == 0) {
                  rate = hz
                  channels = if (mode == 3) 1L else 2L
                }
                if (firstBitrate < 0) firstBitrate = kbps
                else if (firstBitrate != kbps) vbr = true
                frames += 1
                samples += perFrame
                bytes += frameLen
                pos += frameLen
              }
            }
          }
        }
      }
    }
    if (frames == 0) return null
    InternalRow(UTF8String.fromString(format), frames, rate, channels,
      samples, samples * 1000L / rate, bytes, vbr)
  }

  // --------------------------------------------------- fixture builders

  /** One valid MPEG1 Layer III frame header + zero payload. */
  def mp3Frame(brIdx: Int, srIdx: Int, mono: Boolean): Array[Byte] = {
    val kbps = Bitrates(0)(3)(brIdx)
    val hz = SampleRates(3)(srIdx)
    val len = 144 * kbps * 1000 / hz
    val f = new Array[Byte](len)
    f(0) = 0xff.toByte
    f(1) = 0xfb.toByte // sync + MPEG1 + Layer III + no CRC
    f(2) = ((brIdx << 4) | (srIdx << 2)).toByte
    f(3) = (if (mono) 0xc0 else 0x00).toByte
    f
  }

  /** One valid ADTS (MPEG-4 AAC-LC) frame header + `payload` zero
    * bytes, one raw data block. */
  def adtsFrame(freqIdx: Int, chanCfg: Int, payload: Int): Array[Byte] = {
    val len = 7 + payload
    val f = new Array[Byte](len)
    f(0) = 0xff.toByte
    f(1) = 0xf1.toByte // sync + MPEG-4 + layer 00 + no CRC
    f(2) = ((1 << 6) | (freqIdx << 2) | ((chanCfg >> 2) & 1)).toByte // AAC-LC
    f(3) = (((chanCfg & 3) << 6) | ((len >> 11) & 3)).toByte
    f(4) = ((len >> 3) & 0xff).toByte
    f(5) = (((len & 7) << 5) | 0x1f).toByte
    f(6) = 0xfc.toByte // fullness tail + 1 raw block
    f
  }

  /** ID3v2.3 tag of `size` payload bytes (zeroed). */
  def id3v2(size: Int): Array[Byte] = {
    val t = new Array[Byte](10 + size)
    t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 3
    t(6) = ((size >> 21) & 0x7f).toByte; t(7) = ((size >> 14) & 0x7f).toByte
    t(8) = ((size >> 7) & 0x7f).toByte; t(9) = (size & 0x7f).toByte
    t
  }
}

/** [[AudioFrameWalk.walk]] as a codegen'd unary expression — the
  * compressed-audio sibling of [[AudioHeaderExpr]] (which owns
  * WAV/RIFF). Null for payloads with no whole valid frame. */
case class AudioFrameWalkExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AudioFrameWalk.schema
  override def nullable: Boolean = true
  override def prettyName: String = "audio_frame_walk"

  override def nullSafeEval(input: Any): Any =
    AudioFrameWalk.walk(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("afw")
      s"""
         |InternalRow $tmp = graft.functions.AudioFrameWalk.walk($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFrameWalkExpr {
  /** Column wrapper: MP3/ADTS frame-header walk features. */
  def audio_frame_walk(payload: Column): Column =
    GraftSqlBridge.column(AudioFrameWalkExpr(GraftSqlBridge.expression(payload)))
}
