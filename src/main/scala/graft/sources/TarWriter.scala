package graft.sources

import java.util.zip.GZIPOutputStream

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.tsdb.BlockIO

/** TAR shard writer — the output half of the WebDataset loop
  * ([[TarReader]] is the input half): curated multimodal corpora leave
  * the engine as the tar shards every WebDataset-style training loader
  * consumes, so the handoff to a trainer needs no new format.
  *
  * Scale shape mirrors [[WarcWriter]]: one SHARD per task, streamed
  * member by member with O(one member) task memory, landed through
  * Hadoop `FileSystem` (`file://`/`hdfs://`/`s3a://`). Shards commit
  * through [[SinkCommit]] (temp name + rename-on-success, final names
  * deterministic per job token + partition) so task retries and
  * speculative twins yield exactly one visible file per shard and a
  * failed attempt's partial bytes never match a reader's extension
  * filter. Separate `write` calls draw fresh job tokens and coexist
  * in one directory (bench reps, incremental appends).
  *
  * Headers are POSIX.1-1988 ustar: octal size, correct checksum, data
  * padded to 512-byte blocks, two zero blocks at the end — byte-level
  * compatible with any `tar x`, asserted round-trip against
  * [[TarReader]] in `TarSpec`. */
object TarWriter {

  /** Write (name, payload) rows as tar members, one shard per
    * non-empty partition (size the shards upstream with
    * `repartition`/`repartitionByRange`). Returns shards written. */
  def write(df: DataFrame, dir: String, gzip: Boolean = false,
            prefix: String = "shard"): Int = {
    val conf = new BlockIO.SerConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    BlockIO.mkdirs(dir, conf.value)
    val prepared = df.select(col("name").cast("string").as("name"),
      col("payload").cast("binary").as("payload"))
    val ext = if (gzip) ".tar.gz" else ".tar"
    val job = SinkCommit.jobToken()
    val n = df.sparkSession.sparkContext.longAccumulator("tar_shards")
    prepared.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val won = SinkCommit.committed(dir, f"$prefix-$job-$pid%05d$ext",
          conf) { raw =>
          val out = if (gzip) new GZIPOutputStream(raw, 64 * 1024) else raw
          it.foreach(r => emit(out, r.getString(0), r.getAs[Array[Byte]](1)))
          out.write(new Array[Byte](1024)) // end-of-archive
          out match { case g: GZIPOutputStream => g.finish(); case _ => () }
        }
        if (won) n.add(1L)
      }
    }
    n.value.toInt
  }

  private def emit(out: java.io.OutputStream, name: String,
                   payload: Array[Byte]): Unit = {
    out.write(header(name, payload.length.toLong))
    out.write(payload)
    val pad = (512 - payload.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** WebDataset layout: one row per sample `(key, parts: map<ext,
    * payload>)` → members `<key>.<ext>` written ADJACENTLY (the
    * convention sequential loaders rely on), shards cut by an explicit
    * `shard` column — EXACTLY one file per distinct shard value, named
    * after it, so the sample→shard mapping is deterministic and
    * auditable (unlike hash-partition counts, which vary with
    * parallelism). Hash repartition on `shard` co-locates each shard's
    * rows; the task then breaks files on shard-value change within its
    * sorted partition, so shards sharing a partition still get their
    * own files. */
  def writeSamples(samples: DataFrame, dir: String, gzip: Boolean = false,
                   prefix: String = "shard"): Int = {
    val conf = new BlockIO.SerConf(
      samples.sparkSession.sparkContext.hadoopConfiguration)
    BlockIO.mkdirs(dir, conf.value)
    val members = samples
      .select(col("shard").cast("string").as("shard"),
        col("key").cast("string").as("key"),
        explode(col("parts")).as(Seq("ext", "payload")))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("key"), col("ext"))
      .select(col("shard"),
        concat(col("key"), lit("."), col("ext")).as("name"),
        col("payload").cast("binary").as("payload"))
    val ext = if (gzip) ".tar.gz" else ".tar"
    val job = SinkCommit.jobToken()
    val n = samples.sparkSession.sparkContext.longAccumulator("tar_shards")
    members.foreachPartition { (it: Iterator[Row]) =>
      var cur: String = null
      var pending: SinkCommit.Pending = null
      var out: java.io.OutputStream = null
      // shard names are unique per file (hash repartition on shard), so
      // the final name is deterministic per (job, shard) and retries /
      // speculative twins race the same rename — exactly-once per shard
      def finish(): Unit = if (pending != null) {
        out.write(new Array[Byte](1024)) // end-of-archive
        out match { case g: GZIPOutputStream => g.finish(); case _ => () }
        if (pending.commit()) n.add(1L)
        pending = null; out = null
      }
      try {
        it.foreach { r =>
          val shard = r.getString(0)
          if (shard != cur) {
            finish(); cur = shard
            val safe = shard.replaceAll("[^A-Za-z0-9._-]", "_")
            // sanitization can collide ("a/b" and "a:b" both become
            // "a_b"); a digest of the ORIGINAL value keeps final names
            // distinct while staying deterministic per (job, shard)
            val tag = java.security.MessageDigest.getInstance("MD5")
              .digest(shard.getBytes("UTF-8")).take(3)
              .map(x => f"$x%02x").mkString
            pending = SinkCommit.start(dir,
              s"$prefix-$safe-$tag-$job$ext", conf)
            out = if (gzip) new GZIPOutputStream(pending.raw, 64 * 1024)
                  else pending.raw
          }
          emit(out, r.getString(1), r.getAs[Array[Byte]](2))
        }
        finish()
      } finally if (pending != null) pending.abort()
    }
    n.value.toInt
  }

  /** One 512-byte ustar header (POSIX.1-1988) with its checksum. */
  private[sources] def header(name: String, size: Long): Array[Byte] = {
    require(size >= 0, s"negative member size for $name")
    val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // names longer than the 100-byte field split at a '/' into the
    // ustar prefix field (155 bytes), the format's long-path mechanism
    val (prefix, base) =
      if (nameBytes.length <= 100) ("", name)
      else {
        val cut = name.lastIndexOf('/', name.length - 1)
        require(cut > 0, s"member name too long for ustar: $name")
        val (p, b) = (name.substring(0, cut), name.substring(cut + 1))
        // the 100/155 ustar limits are BYTE limits — validate the UTF-8
        // encodings, not character counts, or a multi-byte base segment
        // would be silently truncated mid-codepoint by later field puts
        require(
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8).length <= 100 &&
          p.getBytes(java.nio.charset.StandardCharsets.UTF_8).length <= 155,
          s"member name too long for ustar (byte limits 155/100): $name")
        (p, b)
      }
    val h = new Array[Byte](512)
    put(h, 0, base); put(h, 100, "0000644\u0000")
    put(h, 108, "0000000\u0000"); put(h, 116, "0000000\u0000") // uid gid
    put(h, 124, f"$size%011o ")
    put(h, 136, "00000000000 ") // mtime: fixed epoch, reproducible shards
    h(156) = '0'.toByte // regular file
    put(h, 257, "ustar\u0000"); put(h, 263, "00")
    put(h, 345, prefix)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum
    put(h, 148, f"$sum%06o")
    h(154) = 0; h(155) = ' '
    h
  }

  private def put(h: Array[Byte], off: Int, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    b.copyToArray(h, off)
  }
}
