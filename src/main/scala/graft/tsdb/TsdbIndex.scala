package graft.tsdb

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32C
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** TSDB index-file format v1 — reader + writer for the migration/ingest
  * path (SURVEY.md §2.1 S4). Clean-room implementation of the published
  * format (`vendor/github.com/prometheus/tsdb/index.go`: magic 0xBAAAD700
  * + version byte; sections: symbol table, series, label-value indices,
  * postings lists, two offset tables, TOC at EOF; doc comment
  * `index.go:34-149`):
  *
  * {{{
  *   symbols:   len u32 | #symbols u32 | (uvarint strlen | utf8)* | crc32c
  *   series@16-aligned offset; entry: uvarint len | content | crc32c where
  *     content = uvarint #labels | (uvarint nameSym | uvarint valSym)*
  *             | uvarint #chunks
  *             | first:  varint mint | uvarint (maxt-mint) | uvarint ref
  *             | rest:   uvarint (mint-prevMaxt) | uvarint (maxt-mint) | varint refDelta
  *   postings:  len u32 | #ids u32 | (u32 seriesRef)* | crc32c
  *   offset tbl: len u32 | #entries u32 |
  *               (uvarint #keys | (uvarint keylen | utf8)* | uvarint off)* | crc32c
  *   TOC (last 52 bytes): 6 × u64 section offsets | crc32c
  * }}}
  *
  * A series "reference" (used in postings) is its byte offset / 16
  * (`index.go:262-324`).
  */
object TsdbIndex {
  val Magic: Int = 0xbaaad700
  val Version: Int = 1

  final case class ChunkMeta(minTime: Long, maxTime: Long, ref: Long)
  final case class IndexSeries(labels: Seq[Label], chunks: Seq[ChunkMeta])

  // ---------- low-level buffer helpers ----------
  private final class Writer {
    val out = new java.io.ByteArrayOutputStream()
    def pos: Int = out.size()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def be32(v: Int): Unit = {
      val b = ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN); b.putInt(v); out.write(b.array())
    }
    def be64(v: Long): Unit = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN); b.putLong(v); out.write(b.array())
    }
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
    def uvarint(v0: Long): Unit = {
      var v = v0
      while (java.lang.Long.compareUnsigned(v, 0x80L) >= 0) { u8(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      u8(v.toInt)
    }
    def varint(v: Long): Unit = uvarint((v << 1) ^ (v >> 63))
    def pad16(): Unit = while (pos % 16 != 0) u8(0)
  }

  private final class Reader(val buf: Array[Byte], var pos: Int) {
    def u8(): Int = { val v = buf(pos) & 0xff; pos += 1; v }
    def be32(): Int = { val v = ByteBuffer.wrap(buf, pos, 4).order(ByteOrder.BIG_ENDIAN).getInt; pos += 4; v }
    def be64(): Long = { val v = ByteBuffer.wrap(buf, pos, 8).order(ByteOrder.BIG_ENDIAN).getLong; pos += 8; v }
    def uvarint(): Long = {
      var v = 0L; var shift = 0; var b = u8()
      while ((b & 0x80) != 0) { v |= (b & 0x7fL) << shift; shift += 7; b = u8() }
      v | ((b & 0x7fL) << shift)
    }
    def varint(): Long = { val u = uvarint(); (u >>> 1) ^ -(u & 1L) }
    def utf8(n: Int): String = { val s = new String(buf, pos, n, StandardCharsets.UTF_8); pos += n; s }
  }

  private def crc(buf: Array[Byte], from: Int, until: Int): Int = {
    val c = new CRC32C; c.update(buf, from, until - from); c.getValue.toInt
  }

  // ---------- write ----------
  /** Serialize an index for `series`. Labels are canonicalized and the
    * series sorted into canonical label order here (the write-time
    * invariant of the reference format, `index.go:266`); duplicate label
    * sets are rejected. Returns the index bytes. */
  def write(seriesIn: Seq[IndexSeries]): Array[Byte] = {
    val series = seriesIn.map(s => s.copy(labels = Labels.canonical(s.labels)))
      .sortBy(_.labels)(Labels.ordering)
    require(series.map(_.labels).sliding(2).forall(w =>
      w.size < 2 || Labels.ordering.compare(w.head, w(1)) < 0),
      "duplicate series label sets")

    val w = new Writer
    w.be32(Magic); w.u8(Version)

    // symbol table: all label names+values, sorted
    val symbols = series.flatMap(_.labels.flatMap(l => Seq(l.name, l.value))).distinct.sorted
    val symIdx: Map[String, Int] = symbols.zipWithIndex.toMap
    val tocSymbols = w.pos
    locally {
      val body = new Writer
      body.be32(symbols.size)
      symbols.foreach { s =>
        val b = s.getBytes(StandardCharsets.UTF_8); body.uvarint(b.length); body.bytes(b)
      }
      val bb = body.out.toByteArray
      w.be32(bb.length); w.bytes(bb); w.be32(crc(bb, 0, bb.length))
    }

    // series section: 16-aligned entries; ref = offset/16
    w.pad16()
    val tocSeries = w.pos
    val seriesRefs = ArrayBuffer[Long]()
    series.foreach { s =>
      w.pad16()
      seriesRefs += (w.pos / 16).toLong
      val body = new Writer
      body.uvarint(s.labels.size)
      s.labels.foreach { l => body.uvarint(symIdx(l.name)); body.uvarint(symIdx(l.value)) }
      body.uvarint(s.chunks.size)
      var prevMaxt = 0L; var prevRef = 0L; var first = true
      s.chunks.foreach { c =>
        if (first) { body.varint(c.minTime); body.uvarint(c.maxTime - c.minTime); body.uvarint(c.ref); first = false }
        else { body.uvarint(c.minTime - prevMaxt); body.uvarint(c.maxTime - c.minTime); body.varint(c.ref - prevRef) }
        prevMaxt = c.maxTime; prevRef = c.ref
      }
      val bb = body.out.toByteArray
      w.uvarint(bb.length); w.bytes(bb); w.be32(crc(bb, 0, bb.length))
    }

    // label-value index + postings per (name,value), plus the all-postings
    def writePostings(refs: Seq[Long]): Int = {
      val off = w.pos
      val body = new Writer
      body.be32(refs.size)
      refs.foreach(r => body.be32(r.toInt))
      val bb = body.out.toByteArray
      w.be32(bb.length); w.bytes(bb); w.be32(crc(bb, 0, bb.length))
      off
    }

    val tocLabelIndices = w.pos // label-value index sections (one per name)
    val byName = series.flatMap(_.labels).groupBy(_.name).view.mapValues(_.map(_.value).distinct.sorted).toMap
    val labelIndexOffsets = mutable.LinkedHashMap[String, Int]()
    byName.toSeq.sortBy(_._1).foreach { case (name, values) =>
      labelIndexOffsets(name) = w.pos
      val body = new Writer
      body.be32(1) // #names per entry
      body.be32(values.size)
      values.foreach(v => body.be32(symIdx(v)))
      val bb = body.out.toByteArray
      w.be32(bb.length); w.bytes(bb); w.be32(crc(bb, 0, bb.length))
    }

    val tocPostings = w.pos
    val postingsOffsets = mutable.LinkedHashMap[(String, String), Int]()
    // the all-postings list is keyed by ("","")
    postingsOffsets(("", "")) = writePostings(seriesRefs.toSeq)
    val pairs = series.zip(seriesRefs).flatMap { case (s, ref) => s.labels.map(l => (l.name, l.value) -> ref) }
    pairs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (key, rs) =>
      postingsOffsets(key) = writePostings(rs.map(_._2).sorted)
    }

    // label offset table
    val tocLabelOffsets = w.pos
    locally {
      val body = new Writer
      body.be32(labelIndexOffsets.size)
      labelIndexOffsets.foreach { case (name, off) =>
        body.uvarint(1)
        val b = name.getBytes(StandardCharsets.UTF_8); body.uvarint(b.length); body.bytes(b)
        body.uvarint(off)
      }
      val bb = body.out.toByteArray
      w.be32(bb.length); w.bytes(bb); w.be32(crc(bb, 0, bb.length))
    }

    // postings offset table
    val tocPostingsOffsets = w.pos
    locally {
      val body = new Writer
      body.be32(postingsOffsets.size)
      postingsOffsets.foreach { case ((n, v), off) =>
        body.uvarint(2)
        val nb = n.getBytes(StandardCharsets.UTF_8); body.uvarint(nb.length); body.bytes(nb)
        val vb = v.getBytes(StandardCharsets.UTF_8); body.uvarint(vb.length); body.bytes(vb)
        body.uvarint(off)
      }
      val bb = body.out.toByteArray
      w.be32(bb.length); w.bytes(bb); w.be32(crc(bb, 0, bb.length))
    }

    // TOC
    locally {
      val body = new Writer
      body.be64(tocSymbols); body.be64(tocSeries); body.be64(tocLabelIndices)
      body.be64(tocLabelOffsets); body.be64(tocPostings); body.be64(tocPostingsOffsets)
      val bb = body.out.toByteArray
      w.bytes(bb); w.be32(crc(bb, 0, bb.length))
    }
    w.out.toByteArray
  }

  // ---------- read ----------
  final case class Toc(symbols: Long, series: Long, labelIndices: Long,
                       labelOffsets: Long, postings: Long, postingsOffsets: Long)

  final class IndexReader(buf: Array[Byte]) {
    require(ByteBuffer.wrap(buf, 0, 4).order(ByteOrder.BIG_ENDIAN).getInt == Magic, "bad index magic")
    require((buf(4) & 0xff) == Version, "bad index version")

    val toc: Toc = {
      val r = new Reader(buf, buf.length - 52)
      val t = Toc(r.be64(), r.be64(), r.be64(), r.be64(), r.be64(), r.be64())
      val expect = r.be32()
      require(expect == crc(buf, buf.length - 52, buf.length - 4), "toc crc mismatch")
      t
    }

    val symbols: IndexedSeq[String] = {
      val r = new Reader(buf, toc.symbols.toInt)
      val len = r.be32()
      val start = r.pos
      val n = r.be32()
      val out = (0 until n).map { _ => r.utf8(r.uvarint().toInt) }
      require(r.be32() == crc(buf, start, start + len), "symbols crc mismatch")
      out.toIndexedSeq
    }

    /** Postings offset table: (name, value) → postings section offset. */
    val postingsTable: Map[(String, String), Long] = {
      val r = new Reader(buf, toc.postingsOffsets.toInt)
      val len = r.be32()
      val start = r.pos
      val n = r.be32()
      val out = (0 until n).map { _ =>
        val k = r.uvarint().toInt
        val keys = (0 until k).map(_ => r.utf8(r.uvarint().toInt))
        val off = r.uvarint()
        (if (keys.size == 2) (keys(0), keys(1)) else ("", "")) -> off
      }.toMap
      r.pos = start + len
      require(r.be32() == crc(buf, start, start + len),
        "postings offset table crc mismatch")
      out
    }

    /** Label offset table: name → label-value index offset. */
    val labelTable: Map[String, Long] = {
      val r = new Reader(buf, toc.labelOffsets.toInt)
      val len = r.be32()
      val start = r.pos
      val n = r.be32()
      val out = (0 until n).map { _ =>
        val k = r.uvarint().toInt
        val keys = (0 until k).map(_ => r.utf8(r.uvarint().toInt))
        keys.head -> r.uvarint()
      }.toMap
      r.pos = start + len
      require(r.be32() == crc(buf, start, start + len),
        "label offset table crc mismatch")
      out
    }

    /** Sorted distinct label names present in this block (from the label
      * offset table — no series decode). */
    def labelNames: Seq[String] = labelTable.keys.filter(_.nonEmpty).toSeq.sorted

    def labelValues(name: String): Seq[String] =
      labelTable.get(name).map { off =>
        val r = new Reader(buf, off.toInt)
        val len = r.be32()
        val start = r.pos
        r.be32() // #names
        val n = r.be32()
        val out = (0 until n).map(_ => symbols(r.be32()))
        r.pos = start + len
        require(r.be32() == crc(buf, start, start + len),
          s"label index crc mismatch for '$name'")
        out
      }.getOrElse(Seq.empty)

    def postings(name: String, value: String): Seq[Long] =
      postingsTable.get((name, value)).map { off =>
        val r = new Reader(buf, off.toInt)
        val len = r.be32()
        val start = r.pos
        val n = r.be32()
        val out = (0 until n).map(_ => r.be32().toLong)
        r.pos = start + len
        require(r.be32() == crc(buf, start, start + len),
          s"postings crc mismatch for ($name, $value)")
        out
      }.getOrElse(Seq.empty)

    def allPostings: Seq[Long] = postings("", "")

    /** Decode the series entry at reference `ref` (= offset/16). */
    def series(ref: Long): IndexSeries = {
      val r = new Reader(buf, (ref * 16).toInt)
      val len = r.uvarint().toInt
      val start = r.pos
      val nl = r.uvarint().toInt
      val labels = (0 until nl).map(_ => Label(symbols(r.uvarint().toInt), symbols(r.uvarint().toInt)))
      val nc = r.uvarint().toInt
      val chunks = ArrayBuffer[ChunkMeta]()
      var prevMaxt = 0L; var prevRef = 0L
      (0 until nc).foreach { i =>
        if (i == 0) {
          val mint = r.varint(); val maxt = mint + r.uvarint(); val cref = r.uvarint()
          chunks += ChunkMeta(mint, maxt, cref); prevMaxt = maxt; prevRef = cref
        } else {
          val mint = prevMaxt + r.uvarint(); val maxt = mint + r.uvarint(); val cref = prevRef + r.varint()
          chunks += ChunkMeta(mint, maxt, cref); prevMaxt = maxt; prevRef = cref
        }
      }
      r.pos = start + len
      require(r.be32() == crc(buf, start, start + len), s"series crc mismatch at ref $ref")
      IndexSeries(labels, chunks.toSeq)
    }

    def allSeries: Seq[IndexSeries] = allPostings.map(series)
  }
}
