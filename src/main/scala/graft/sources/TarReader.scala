package graft.sources

import java.io.{BufferedInputStream, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tsdb.BlockIO

/** TAR shard reader — WebDataset-style ingestion: the standard layout
  * for multimodal training corpora is tar shards whose members share a
  * sample KEY with per-modality extensions (`000123.jpg`, `000123.txt`,
  * `000123.json`); [[webdatasetSamples]] regroups members into one row
  * per sample with an extension→payload map.
  *
  * The tar format is pure structure (ustar, POSIX.1-1988): 512-byte
  * headers with an octal size field, data padded to 512-byte blocks,
  * two zero blocks at the end — no codec, no index. Like WARC, shards
  * are the unit of parallelism (one task per file, `.tar` or `.tar.gz`
  * via the JDK gunzip), streamed with O(maxPayload) memory and
  * truncation flags. Non-file members (directories, links, PAX/GNU
  * extension headers) are skipped with their data consumed.
  *
  * Output: (shard, name, size, payload, truncated). */
object TarReader {

  final case class Entry(shard: String, name: String, size: Long,
                         payload: Array[Byte], truncated: Boolean,
                         idx: Long)

  /** All regular-file members of every `*.tar` / `*.tar.gz` under
    * `dir`, one Spark task per shard. */
  def entries(spark: SparkSession, dir: String,
              maxPayloadBytes: Int = 16 << 20): DataFrame = {
    val files = BlockIO.listNames(dir)
      .filter(n => n.endsWith(".tar") || n.endsWith(".tar.gz"))
      .sorted.map(n => BlockIO.child(dir, n))
    entriesForFiles(spark, files, maxPayloadBytes)
  }

  /** Members of an explicit shard list (the streaming-ingest unit). */
  def entriesForFiles(spark: SparkSession, files: Seq[String],
                      maxPayloadBytes: Int = 16 << 20): DataFrame = {
    val conf = new BlockIO.SerConf(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val parallelism =
      math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(files)
      .repartition(parallelism)
      .mapPartitions { it =>
        it.flatMap(p => parseShard(p, conf, maxPayloadBytes)) }
      .toDF()
  }

  /** WebDataset regrouping: members → one row per (shard, sample key),
    * key = member name minus its final extension, with
    * `parts: map<ext, payload>` plus kept part count and byte mass. The
    * grouping shuffles only within shards in practice (keys are
    * shard-local by construction), and payloads cross the exchange
    * ONCE — there is no cheaper shape for a regroup.
    *
    * A shard may legally carry two members with the same key+ext (tar
    * extract keeps the later one); this regroup applies the same
    * last-wins rule — by archive position — instead of tripping
    * Spark's default `EXCEPTION` map-key dedup policy. The dedup runs
    * inside the already-grouped member array (sample-sized, a few
    * modalities), so it adds no exchange. */
  def webdatasetSamples(entries: DataFrame): DataFrame =
    entries
      .withColumn("key", regexp_replace(col("name"), "\\.[^./]+$", ""))
      .withColumn("ext", lower(regexp_extract(col("name"), "\\.([^./]+)$", 1)))
      .groupBy(col("shard"), col("key"))
      .agg(sort_array(collect_list(struct(col("idx"), col("ext"),
        col("payload"), col("size")))).as("ms"))
      // keep member i only if no LATER member repeats its ext (the array
      // is idx-sorted, so "later" = archive order); O(k²) over a
      // per-sample k of a few modalities
      .withColumn("kept", expr(
        "filter(ms, (m, i) -> !exists(slice(ms, i + 2, size(ms) - i - 1), " +
          "l -> l.ext = m.ext))"))
      .select(col("shard"), col("key"),
        map_from_entries(expr("transform(kept, m -> struct(m.ext, m.payload))"))
          .as("parts"),
        expr("size(kept)").cast("long").as("n_parts"),
        expr("aggregate(kept, 0L, (a, m) -> a + m.size)").as("n_bytes"))

  // ---- streaming shard parser ------------------------------------------

  private[sources] def parseShard(path: String, conf: BlockIO.SerConf,
                                  maxPayloadBytes: Int): Iterator[Entry] = {
    val hp = new HPath(path)
    val raw = hp.getFileSystem(conf.value).open(hp)
    val in = new BufferedInputStream(
      if (path.endsWith(".gz")) new GZIPInputStream(raw, 64 * 1024) else raw,
      64 * 1024)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ =>
        try in.close() catch { case _: java.io.IOException => () }))
    new Iterator[Entry] {
      private var nextE: Entry = null
      private var done = false
      private var memberIdx = -1L
      private def advance(): Unit = {
        if (nextE != null || done) return
        try {
          var e: Entry = null
          while (e == null && !done) {
            e = readMember(in, path, maxPayloadBytes,
              { memberIdx += 1; memberIdx }).orNull
            if (e == null) done = true
            else if (e.name == null) e = null // skipped non-file member
          }
          nextE = e
        } catch { case _: java.io.IOException => nextE = null; done = true }
        if (done) in.close()
      }
      def hasNext: Boolean = { advance(); !done }
      def next(): Entry = { advance(); val r = nextE; nextE = null; r }
    }
  }

  /** One member; None at end-of-archive (zero block or EOF); a
    * placeholder with `name == null` for skipped non-file members. */
  private def readMember(in: InputStream, shard: String,
                         maxPayload: Int, idx: Long): Option[Entry] = {
    val hdr = new Array[Byte](512)
    if (!readFully(in, hdr)) return None
    if (hdr.forall(_ == 0)) return None // end-of-archive zero block
    val name0 = cstr(hdr, 0, 100)
    val size = octal(hdr, 124, 12)
    if (size < 0) return None // corrupt size field → stop
    val typeflag = hdr(156).toChar
    // ustar long-path prefix (POSIX): prepended with '/'
    val prefix = if (cstr(hdr, 257, 6).startsWith("ustar")) cstr(hdr, 345, 155)
      else ""
    val name = if (prefix.nonEmpty) s"$prefix/$name0" else name0
    val padded = ((size + 511) / 512) * 512
    if (typeflag == '0' || typeflag == '\u0000') {
      val keep = math.min(size, maxPayload.toLong).toInt
      val buf = new Array[Byte](keep)
      if (!readFully(in, buf)) return None
      skipFully(in, padded - keep)
      Some(Entry(shard, name, size, buf, truncated = size > keep, idx))
    } else { // dirs, links, PAX/GNU extensions: consume and skip
      skipFully(in, padded)
      Some(Entry(shard, null, size, Array.empty, truncated = false, idx))
    }
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return false
      off += n
    }
    true
  }

  private def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) { if (in.read() < 0) return else left -= 1 }
      else left -= s
    }
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** Octal numeric field (space/NUL terminated); -1 when malformed. */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var i = off; var seen = false
    while (i < off + len) {
      val c = b(i).toChar
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c != ' ' && c != 0) return -1
      i += 1
    }
    if (seen) v else -1
  }
}
