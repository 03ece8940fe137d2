package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tsdb.BlockIO

/** WARC (Web ARChive, ISO 28500) record reader — the ingest front of a
  * Common-Crawl-shaped curation pipeline: WARC segments → HTTP response
  * records → [[graft.ops.WebText.htmlToText]] → the documents schema →
  * dedup/quality/decontamination.
  *
  * Scale shape: WARC files are NOT splittable (Common Crawl ships ~1 GiB
  * segments of per-record gzip members with no index), so the unit of
  * parallelism is the FILE — a 100 TB crawl is ~100k segments, far more
  * than any cluster's task slots. Each task STREAMS its file through a
  * bounded buffer (Hadoop `FileSystem.open`, so `file://`/`hdfs://`/
  * `s3a://` all work) and emits records lazily; per-task memory is
  * O(maxPayloadBytes), never O(file). `GZIPInputStream` natively
  * concatenates the multi-member gzip stream that per-record compression
  * produces.
  *
  * Output columns: (file, rec_no, warc_type, target_uri, warc_date,
  * record_id, content_type, http_status, http_content_type, payload,
  * payload_len, truncated) — payload is the HTTP BODY for
  * response/request records (headers already lifted into columns), the
  * raw block otherwise; `payload_len` is the pre-truncation length.
  */
object WarcReader {

  final case class Rec(
      file: String, rec_no: Long, warc_type: String, target_uri: String,
      warc_date: String, record_id: String, content_type: String,
      http_status: Int, http_content_type: String, payload: Array[Byte],
      payload_len: Long, truncated: Boolean)

  /** All WARC records under `dir` (non-recursive glob, default every
    * `*.warc` / `*.warc.gz`), one Spark task per file. */
  def records(spark: SparkSession, dir: String,
              maxPayloadBytes: Int = 2 << 20): DataFrame = {
    val files = BlockIO.listNames(dir)
      .filter(n => n.endsWith(".warc") || n.endsWith(".warc.gz"))
      .sorted.map(n => BlockIO.child(dir, n))
    recordsForFiles(spark, files, maxPayloadBytes)
  }

  /** WARC records of an explicit segment list (the unit the streaming
    * ingest hands over per micro-batch), one Spark task per file. */
  def recordsForFiles(spark: SparkSession, files: Seq[String],
                      maxPayloadBytes: Int = 2 << 20): DataFrame = {
    val conf = new BlockIO.SerConf(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val parallelism =
      math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(files)
      .repartition(parallelism)
      .mapPartitions { it =>
        it.flatMap(p => parseFile(p, conf, maxPayloadBytes)) }
      .toDF()
  }

  /** HTTP response records rendered to the documents shape:
    * (url, date, status, mime, html, text, title) — html decoded as
    * UTF-8 (Common Crawl convention), text/title via [[graft.ops.WebText]].
    * Feed this straight into dedup/quality ops. */
  def htmlDocuments(records: DataFrame): DataFrame = {
    val html = col("payload").cast("string")
    records
      .where(col("warc_type") === "response" &&
        col("http_content_type").startsWith("text/html"))
      .select(col("target_uri").as("url"), col("warc_date").as("date"),
        col("http_status").as("status"),
        col("http_content_type").as("mime"), html.as("html"),
        graft.ops.WebText.htmlToText(html).as("text"),
        graft.ops.WebText.htmlTitle(html).as("title"))
  }

  /** WET-style extracted-text records ([[WarcWriter.writeConversions]]'s
    * output, or Common Crawl's own `.warc.wet.gz` conversion records)
    * rendered to (url, date, text). */
  def textDocuments(records: DataFrame): DataFrame =
    records
      .where(col("warc_type") === "conversion" &&
        col("content_type").startsWith("text/plain"))
      .select(col("target_uri").as("url"), col("warc_date").as("date"),
        col("payload").cast("string").as("text"))

  // ---- streaming record parser ----------------------------------------

  /** Lazily parse one WARC file into records; the stream is closed on
    * exhaustion. Malformed trailing garbage ends the file (Common Crawl
    * segments are occasionally truncated mid-record) rather than failing
    * the task. */
  private[sources] def parseFile(path: String, conf: BlockIO.SerConf,
                                 maxPayloadBytes: Int): Iterator[Rec] = {
    val hp = new HPath(path)
    val raw = hp.getFileSystem(conf.value).open(hp)
    val in = new BufferedInputStream(
      if (path.endsWith(".gz")) new GZIPInputStream(raw, 64 * 1024) else raw,
      64 * 1024)
    // a task that stops early (limit, take) must not leak the stream
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        try in.close() catch { case _: java.io.IOException => () }))
    var recNo = -1L
    new Iterator[Rec] {
      private var nextRec: Rec = null
      private var done = false
      private def advance(): Unit = {
        if (nextRec != null || done) return
        try {
          nextRec = readRecord(in, path, { recNo += 1; recNo },
            maxPayloadBytes).orNull
        } catch { case _: EOFException | _: java.io.IOException =>
          nextRec = null
        }
        if (nextRec == null) { done = true; in.close() }
      }
      def hasNext: Boolean = { advance(); !done }
      def next(): Rec = { advance(); val r = nextRec; nextRec = null; r }
    }
  }

  /** One record: version line, headers, Content-Length payload block,
    * trailing CRLF CRLF. None at clean end-of-stream. */
  private def readRecord(in: InputStream, file: String, recNo: => Long,
                         maxPayload: Int): Option[Rec] = {
    // skip inter-record blank lines, find the version line
    var line = readLine(in)
    while (line != null && line.isEmpty) line = readLine(in)
    if (line == null) return None
    if (!line.startsWith("WARC/")) return None // trailing garbage → stop
    val n = recNo
    val headers = scala.collection.mutable.HashMap.empty[String, String]
    var h = readLine(in)
    while (h != null && h.nonEmpty) {
      val i = h.indexOf(':')
      if (i > 0) headers.update(h.substring(0, i).trim.toLowerCase,
        h.substring(i + 1).trim)
      h = readLine(in)
    }
    // a garbled Content-Length means the stream can no longer be framed
    // — stop the file (same stance as trailing garbage), never fail the
    // task on one corrupt record
    val len = headers.get("content-length") match {
      case None => 0L
      case Some(v) => v.toLongOption match {
        case Some(l) if l >= 0 => l
        case _ => return None
      }
    }
    val warcType = headers.getOrElse("warc-type", "")
    val block = readBlock(in, len, maxPayload)
    // trailing record separator: CRLF CRLF (tolerate missing at EOF)
    readLine(in); readLine(in)
    // response/request payloads carry an HTTP message: lift its headers
    val isHttp = (warcType == "response" || warcType == "request") &&
      headers.getOrElse("content-type", "").startsWith("application/http")
    val (status, httpCt, payload, payloadLen) =
      if (isHttp) splitHttp(block, len) else (0, "", block, len)
    Some(Rec(file, n, warcType,
      headers.getOrElse("warc-target-uri", ""),
      headers.getOrElse("warc-date", ""),
      headers.getOrElse("warc-record-id", ""),
      headers.getOrElse("content-type", ""),
      status, httpCt, payload, payloadLen,
      truncated = payloadLen > payload.length))
  }

  /** Read `len` block bytes, keeping at most `maxPayload` (the rest is
    * consumed and dropped — per-task memory stays O(maxPayload)). */
  private def readBlock(in: InputStream, len: Long, maxPayload: Int): Array[Byte] = {
    val keep = math.min(len, maxPayload.toLong).toInt
    val buf = new Array[Byte](keep)
    var off = 0
    while (off < keep) {
      val r = in.read(buf, off, keep - off)
      if (r < 0) return java.util.Arrays.copyOf(buf, off)
      off += r
    }
    var toSkip = len - keep
    while (toSkip > 0) {
      val s = in.skip(toSkip)
      if (s <= 0) { if (in.read() < 0) return buf else toSkip -= 1 }
      else toSkip -= s
    }
    buf
  }

  /** Split an HTTP message block into (status, content-type, body,
    * full body length). `blockLen` is the pre-truncation block length so
    * the reported body length stays truthful for truncated payloads. */
  private def splitHttp(block: Array[Byte],
                        blockLen: Long): (Int, String, Array[Byte], Long) = {
    val sep = indexOfDoubleCrlf(block)
    if (sep < 0) return (0, "", block, blockLen)
    val head = new String(block, 0, sep, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r\n")
    val status = lines.headOption.map(_.split(" ", 3)) match {
      case Some(Array(_, code, _*)) if code.forall(_.isDigit) => code.toInt
      case _ => 0
    }
    val ct = lines.find(_.toLowerCase.startsWith("content-type:"))
      .map(l => l.substring(l.indexOf(':') + 1).trim).getOrElse("")
    val body = java.util.Arrays.copyOfRange(block, sep + 4, block.length)
    (status, ct, body, blockLen - (sep + 4))
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** Read one CRLF/LF-terminated ISO-8859-1 line; null at EOF. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(96)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    sb.toString
  }
}
