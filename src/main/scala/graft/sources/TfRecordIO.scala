package graft.sources

import java.io.{BufferedInputStream, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.tsdb.BlockIO

/** TFRecord shard reader/writer — the `tf.data` handoff format, pure
  * framing over opaque payloads (the published layout: little-endian
  * u64 length, masked CRC32C of the length bytes, data, masked CRC32C
  * of the data; mask = `((c >> 15) | (c << 17)) + 0xa282ead8`). The
  * JDK ships CRC32C, so like tar/WARC this needs no library.
  *
  * Same scale idioms as the other shard formats: one file per
  * non-empty partition on write (write-once unique names, Hadoop FS),
  * one task per shard on read, streamed record-by-record with
  * O(maxPayload) task memory; `.tfrecord.gz` via the JDK gunzip.
  * Corrupt CRCs terminate that shard's iteration (records after a
  * corruption are unframeable — lengths can't be trusted) with the
  * valid prefix kept, mirroring the tar reader's stance. */
object TfRecordIO {

  private val MaskDelta = 0xa282ead8L

  private def maskedCrc(bytes: Array[Byte], len: Int): Long = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, 0, len)
    val v = c.getValue
    (((v >>> 15) | (v << 17)) + MaskDelta) & 0xffffffffL
  }

  /** Write (payload: binary) rows as TFRecord shards, one per
    * non-empty partition. Returns shards written. */
  def write(df: DataFrame, dir: String, gzip: Boolean = false,
            prefix: String = "shard"): Int = {
    val conf = new BlockIO.SerConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    BlockIO.mkdirs(dir, conf.value)
    val prepared = df.select(col("payload").cast("binary").as("payload"))
    val ext = if (gzip) ".tfrecord.gz" else ".tfrecord"
    val job = SinkCommit.jobToken()
    val n = df.sparkSession.sparkContext.longAccumulator("tfrecord_shards")
    prepared.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // deterministic (job, partition) name + rename-on-success: task
        // retries and speculative twins commit exactly one shard
        val won = SinkCommit.committed(dir, f"$prefix-$job-$pid%05d$ext",
          conf) { raw =>
          val out = if (gzip)
            new java.util.zip.GZIPOutputStream(raw, 64 * 1024) else raw
          val lenBuf = new Array[Byte](8)
          it.foreach { r =>
            val payload = r.getAs[Array[Byte]](0)
            var i = 0
            var len = payload.length.toLong
            while (i < 8) { lenBuf(i) = (len & 0xff).toByte; len >>>= 8; i += 1 }
            out.write(lenBuf)
            writeLe4(out, maskedCrc(lenBuf, 8))
            out.write(payload)
            writeLe4(out, maskedCrc(payload, payload.length))
          }
          out match {
            case g: java.util.zip.GZIPOutputStream => g.finish()
            case _ => ()
          }
        }
        if (won) n.add(1L)
      }
    }
    n.value.toInt
  }

  private def writeLe4(out: java.io.OutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >>> 8) & 0xff).toInt)
    out.write(((v >>> 16) & 0xff).toInt); out.write(((v >>> 24) & 0xff).toInt)
  }

  /** All records of every `*.tfrecord` / `*.tfrecord.gz` shard under
    * `dir`: (shard, idx, payload, length_crc_ok, data_crc_ok). One
    * task per shard. */
  def records(spark: SparkSession, dir: String,
              maxPayloadBytes: Int = 16 << 20): DataFrame = {
    val files = BlockIO.listNames(dir)
      .filter(n => n.endsWith(".tfrecord") || n.endsWith(".tfrecord.gz"))
      .sorted.map(n => BlockIO.child(dir, n))
    val conf = new BlockIO.SerConf(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val parallelism =
      math.max(1, math.min(math.max(files.size, 1),
        spark.sparkContext.defaultParallelism))
    spark.createDataset(files)
      .repartition(parallelism)
      .mapPartitions(_.flatMap(p => parseShard(p, conf, maxPayloadBytes)))
      .toDF("shard", "idx", "payload", "length_crc_ok", "data_crc_ok")
  }

  private def parseShard(path: String, conf: BlockIO.SerConf,
                         maxPayload: Int)
    : Iterator[(String, Long, Array[Byte], Boolean, Boolean)] = {
    val hp = new HPath(path)
    val raw = hp.getFileSystem(conf.value).open(hp)
    val in = new BufferedInputStream(
      if (path.endsWith(".gz")) new GZIPInputStream(raw, 64 * 1024) else raw,
      64 * 1024)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        try in.close() catch { case _: java.io.IOException => () }))
    var idx = 0L
    var done = false
    new Iterator[(String, Long, Array[Byte], Boolean, Boolean)] {
      private var nextR: (String, Long, Array[Byte], Boolean, Boolean) = null
      private def advance(): Unit = {
        if (nextR != null || done) return
        try {
          val lenBuf = new Array[Byte](8)
          if (!readFully(in, lenBuf, 8)) { done = true; in.close(); return }
          val lenCrcBuf = new Array[Byte](4)
          if (!readFully(in, lenCrcBuf, 4)) { done = true; in.close(); return }
          val lenOk = le4(lenCrcBuf) == maskedCrc(lenBuf, 8)
          var len = 0L
          var i = 7
          while (i >= 0) { len = (len << 8) | (lenBuf(i) & 0xffL); i -= 1 }
          if (!lenOk || len < 0 || len > maxPayload) {
            // unframeable from here on: lengths can't be trusted
            done = true; in.close(); return
          }
          val payload = new Array[Byte](len.toInt)
          if (!readFully(in, payload, len.toInt)) { done = true; in.close(); return }
          val dataCrcBuf = new Array[Byte](4)
          if (!readFully(in, dataCrcBuf, 4)) { done = true; in.close(); return }
          val dataOk = le4(dataCrcBuf) == maskedCrc(payload, payload.length)
          nextR = (path, idx, payload, lenOk, dataOk)
          idx += 1
        } catch { case _: java.io.IOException => done = true }
      }
      def hasNext: Boolean = { advance(); nextR != null }
      def next(): (String, Long, Array[Byte], Boolean, Boolean) = {
        advance(); val r = nextR; nextR = null; r
      }
    }
  }

  private def le4(b: Array[Byte]): Long =
    (b(0) & 0xffL) | ((b(1) & 0xffL) << 8) |
      ((b(2) & 0xffL) << 16) | ((b(3) & 0xffL) << 24)

  private def readFully(in: InputStream, buf: Array[Byte], n: Int): Boolean = {
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) return false
      off += r
    }
    true
  }
}
