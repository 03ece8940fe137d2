package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.tsdb.BlockIO

/** WARC segment writer — the output half of the crawl-tooling loop
  * ([[WarcReader]] is the input half): curated corpora leave the engine
  * in the same format they arrived in, so downstream consumers (other
  * crawls, other engines, archival) need no new reader. Two record
  * shapes:
  *
  *  - `response`: full HTTP message (status line + Content-Type +
  *    body) inside an `application/http` block — a re-crawlable page;
  *  - `conversion`: bare `text/plain` payload — the WET convention for
  *    extracted text (what Common Crawl ships next to every WARC).
  *
  * Scale shape mirrors the reader: one SEGMENT per task, streamed
  * record by record (per-record gzip members, so any reader can seek a
  * member boundary), per-task memory O(one record). Files land under
  * `dir` via Hadoop `FileSystem`, so `file://`/`hdfs://`/`s3a://` all
  * work; names are `seg-<partition>-<uuid>.warc.gz` — write-once
  * unique, never overwriting a concurrent writer's output. */
object WarcWriter {

  /** Write `df` rows as WARC records, one segment per partition.
    * Expected columns: `url` (string), `payload` (string or binary);
    * optional `date` (string, default a fixed epoch date), `mime`
    * (string, response Content-Type, default text/html), `status`
    * (int, default 200). Returns the number of segments written. */
  def write(df: DataFrame, dir: String, recordType: String = "response",
            gzip: Boolean = true): Int = {
    require(recordType == "response" || recordType == "conversion",
      s"unsupported WARC record type: $recordType")
    val conf = new BlockIO.SerConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    BlockIO.mkdirs(dir, conf.value)
    val cols = df.columns.toSet
    val prepared = df.select(
      col("url").cast("string").as("url"),
      col("payload").cast("binary").as("payload"),
      (if (cols("date")) col("date").cast("string")
       else lit("2026-01-01T00:00:00Z")).as("date"),
      (if (cols("mime")) col("mime").cast("string")
       else lit("text/html; charset=utf-8")).as("mime"),
      (if (cols("status")) col("status").cast("int") else lit(200)).as("status"))
    val ext = if (gzip) ".warc.gz" else ".warc"
    val job = SinkCommit.jobToken()
    val n = df.sparkSession.sparkContext.longAccumulator("warc_segments")
    prepared.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // deterministic (job, partition) name + rename-on-success: task
        // retries and speculative twins commit exactly one segment
        val won = SinkCommit.committed(dir, f"seg-$job-$pid%05d$ext",
          conf) { out =>
          it.foreach { r =>
            val bytes = record(recordType, r.getString(0),
              r.getAs[Array[Byte]](1), r.getString(2), r.getString(3),
              r.getInt(4))
            if (gzip) {
              // one gzip MEMBER per record (the Common Crawl layout); a
              // fresh closed stream per member frees its deflater
              val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
              val gz = new GZIPOutputStream(bos)
              gz.write(bytes); gz.close()
              out.write(bos.toByteArray)
            } else out.write(bytes)
          }
        }
        if (won) n.add(1L)
      }
    }
    n.value.toInt
  }

  /** WET-style extracted-text segments: `conversion` records with
    * `text/plain` payloads, from (url, text) rows. */
  def writeConversions(docs: DataFrame, dir: String,
                       gzip: Boolean = true): Int =
    write(docs.select(col("url"), col("text").cast("string").as("payload"),
        lit("text/plain").as("mime")),
      dir, recordType = "conversion", gzip = gzip)

  private def record(recordType: String, url: String, payload: Array[Byte],
                     date: String, mime: String, status: Int): Array[Byte] = {
    val block =
      if (recordType == "response")
        (s"HTTP/1.1 $status OK\r\nContent-Type: $mime\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1) ++
          payload
      else payload
    val blockCt =
      if (recordType == "response") "application/http; msgtype=response"
      else mime
    val recordId = java.util.UUID.nameUUIDFromBytes(
      (url + "\u0000" + date).getBytes(UTF_8))
    val head = (s"WARC/1.0\r\nWARC-Type: $recordType\r\n" +
      s"WARC-Record-ID: <urn:uuid:$recordId>\r\n" +
      s"WARC-Date: $date\r\nWARC-Target-URI: $url\r\n" +
      s"Content-Type: $blockCt\r\nContent-Length: ${block.length}\r\n\r\n")
      .getBytes(ISO_8859_1)
    head ++ block ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }
}
