package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.JpegCodec

/** Cross-container image-scene fixtures for the media-dedup oracles:
  * one SCENE per id — a flat-8×8-block grayscale image whose block
  * values are closed-form in (id, bx, by) — rendered into any of the
  * five supported containers (BMP, PNG, GIF, baseline JPEG, lossless
  * WebP) and
  * through a family of planted TRANSFORMS (brightness shift, 2×
  * nearest upscale, JPEG re-encode, block jitter).
  *
  * Flat 8×8 blocks are the one image class every container round-trips
  * bit-exactly — including JPEG under a DC-step-8 quant table
  * ([[JpegCodec.flatExactTable]]) — so a DuckDB oracle recomputes
  * pixels, features and dHashes from the formula alone while the Spark
  * side exercises five REAL decoders. The same-scene different-
  * container rows are guaranteed hamming-0 near-dups, which is exactly
  * the cross-format recall property crawl-scale image dedup needs. */
object MediaScenes {

  /** Scene dims: multiples of 8 so every block is whole in every
    * container (and of 16 so 4:2:0 JPEG MCUs stay flat). */
  def sceneW(id: Long): Int = 16 + 8 * (id % 3).toInt // 16 | 24 | 32
  def sceneH(id: Long): Int = 16 + 8 * (id % 2).toInt // 16 | 24

  /** Block value, kept ≤ 199 so every transform (+16 / +48) stays
    * clamp-free. */
  def blockVal(id: Long, bx: Int, by: Int): Int =
    (((id * 7 + bx * 37 + by * 101) % 200 + 200) % 200).toInt

  /** The planted transform family for the recall query. */
  val Transforms: Seq[String] =
    Seq("none", "bright", "upscale2", "reenc", "jitter1", "jitter3")

  /** Render the (possibly transformed) scene as a gray buffer. */
  def sceneGray(id: Long, transform: String): (Int, Int, Array[Byte]) = {
    val scale = if (transform == "upscale2") 2 else 1
    val w = sceneW(id) * scale
    val h = sceneH(id) * scale
    val block = 8 * scale
    val g = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val bx = x / block; val by = y / block
        var v = blockVal(id, bx, by)
        transform match {
          case "bright" => v += 16
          case "jitter1" => if ((bx + by) % 5 == 0) v += 48
          case "jitter3" => if ((bx + by) % 2 == 0) v += 48
          case _ => ()
        }
        g(y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    (w, h, g)
  }

  // ------------------------------------------------------ gray encoders

  /** 24bpp bottom-up BMP of a gray buffer. */
  def bmpBytes(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * h)
    def le4(at: Int, v: Int): Unit = { out(at) = v.toByte
      out(at + 1) = (v >> 8).toByte; out(at + 2) = (v >> 16).toByte
      out(at + 3) = (v >> 24).toByte }
    out(0) = 'B'; out(1) = 'M'
    le4(2, 54 + stride * h); le4(10, 54); le4(14, 40)
    le4(18, w); le4(22, h)
    out(26) = 1; out(28) = 24
    var y = 0
    while (y < h) {
      val fileRow = h - 1 - y
      var x = 0
      while (x < w) {
        val v = gray(y * w + x)
        val at = 54 + fileRow * stride + 3 * x
        out(at) = v; out(at + 1) = v; out(at + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  /** 8-bit RGB PNG (filter 0 rows, one IDAT) of a gray buffer. */
  def pngBytes(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    val raw = new Array[Byte]((1 + 3 * w) * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = gray(y * w + x)
        val at = y * (1 + 3 * w) + 1 + 3 * x
        raw(at) = v; raw(at + 1) = v; raw(at + 2) = v
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    def be4(v: Long): Array[Byte] = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      be4(data.length.toLong) ++ t ++ data ++ be4(crc.getValue)
    }
    val ihdr = be4(w.toLong) ++ be4(h.toLong) ++ Array[Byte](8, 2, 0, 0, 0)
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** GIF89a with a gray identity palette (entry i = (i,i,i)) of a gray
    * buffer — real variable-width LZW, like [[Multimodal.buildGif]]. */
  def gifBytes(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le2(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le2(w); le2(h)
    out.write(0xf7); out.write(0); out.write(0)
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
    out.write(0x2c)
    le2(0); le2(0); le2(w); le2(h)
    out.write(0)
    out.write(8) // LZW min code size
    val Clear = 256; val End = 257
    val bits = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeSize
      while (bitCnt >= 8) {
        bits.write((bitBuf & 0xff).toInt); bitBuf >>= 8; bitCnt -= 8 }
    }
    var table = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var next = End + 1
    emit(Clear)
    var cur = gray(0) & 0xff
    var i = 1
    while (i < gray.length) {
      val c = gray(i) & 0xff
      table.get((cur, c)) match {
        case Some(code) => cur = code
        case None =>
          emit(cur)
          if (next < 4096) {
            table.update((cur, c), next)
            next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          } else {
            emit(Clear)
            table = scala.collection.mutable.HashMap.empty
            next = End + 1; codeSize = 9
          }
          cur = c
      }
      i += 1
    }
    emit(cur); emit(End)
    if (bitCnt > 0) bits.write((bitBuf & 0xff).toInt)
    val stream = bits.toByteArray
    var off = 0
    while (off < stream.length) {
      val n = math.min(255, stream.length - off)
      out.write(n); out.write(stream, off, n); off += n
    }
    out.write(0); out.write(0x3b)
    out.toByteArray
  }

  /** Baseline JPEG under the flat-exact table: bit-exact for flat
    * blocks, a REAL Huffman/DCT stream on the wire. */
  def jpegBytes(w: Int, h: Int, gray: Array[Byte]): Array[Byte] =
    JpegCodec.encodeGray(w, h, gray, JpegCodec.flatExactTable())

  /** Lossless WebP (VP8L literal stream) — bit-exact for any content. */
  def webpBytes(w: Int, h: Int, gray: Array[Byte]): Array[Byte] =
    graft.functions.WebpCodec.encodeGray(w, h, gray)

  def containerBytes(container: String, w: Int, h: Int,
                     gray: Array[Byte]): Array[Byte] = container match {
    case "bmp" => bmpBytes(w, h, gray)
    case "png" => pngBytes(w, h, gray)
    case "gif" => gifBytes(w, h, gray)
    case "jpeg" => jpegBytes(w, h, gray)
    case "webp" => webpBytes(w, h, gray)
    case other => sys.error(s"unknown container: $other")
  }

  val Containers: Seq[String] = Seq("bmp", "png", "gif", "jpeg", "webp")

  private def mime(container: String): String = container match {
    case "jpeg" => "image/jpeg"
    case c => s"image/$c"
  }

  /** Media table of scenes in ONE container (JVM-side per row, fixture
    * cost — the per-row map is the same shape as `synthesizePng`). */
  def synthesize(df: DataFrame, idCol: String, sourceCol: String,
                 container: String,
                 transform: String = "none"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(sourceCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, src) =>
        val (w, h, g) = sceneGray(id, transform)
        val bytes = containerBytes(container, w, h, g)
        (id, "image", bytes, src, mime(container), bytes.length.toLong) }
      .toDF("media_id", "kind", "payload", "source", "mime", "n_bytes")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("source"), col("mime"), col("n_bytes")).as("meta"))
  }

  /** The MIXED-format corpus: every scene in all five containers,
    * `media_id = 10·id + containerIndex` — the same planted scene is a
    * guaranteed hamming-0 near-dup across containers, so banded-join
    * recall across formats is itself under oracle. */
  def synthesizeMixed(df: DataFrame, idCol: String,
                      sourceCol: String): DataFrame =
    Containers.zipWithIndex.map { case (c, i) =>
      synthesize(df, idCol, sourceCol, c)
        .withColumn("media_id", col("media_id") * 10L + i.toLong)
    }.reduce(_.unionByName(_))
}
