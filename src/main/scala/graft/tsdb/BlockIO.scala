package graft.tsdb

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Filesystem abstraction for the native TSDB block path.
  *
  * The reference's defining deployment is blocks in object storage —
  * range-read chunks (`chunks.go:47-101`), index/meta sync from a bucket
  * (`db.go:93-102`), shipper uploads (`shipper.go:252-325`). The
  * Spark-native answer is Hadoop's `FileSystem` API: every block path is
  * a string URI (`/local/path`, `file:///...`, `s3a://bucket/...`,
  * `hdfs://...`) resolved through the session's Hadoop configuration, so
  * the same code serves local disk in tests and an object store in
  * production. Bounded positional reads ([[RangeIn]]) keep the
  * O(needed-bytes) chunk populate; the per-JVM caches in [[ChunkFile]] /
  * `TsdbIndexCache` sit in front unchanged.
  *
  * Listings skip dot-prefixed names (Hadoop hidden-file convention —
  * also covers `LocalFileSystem`'s `.crc` checksum sidecars).
  */
object BlockIO {

  /** Driver-side default configuration: the active session's Hadoop conf
    * (carries `spark.hadoop.*` overrides, e.g. s3a credentials); a fresh
    * `Configuration` when no session is active (bare utility use). */
  def defaultConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def resolved(conf: Configuration): Configuration =
    if (conf == null) defaultConf else conf

  /** Java-serializable Hadoop conf wrapper (the standard Writable
    * round-trip) — broadcast to executors so distributed block writes and
    * DSv2 partition readers resolve `s3a://`-style URIs with the
    * driver's credentials/settings instead of an empty default conf. */
  final class SerConf(@transient private var conf: Configuration)
    extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  /** Child path under `dir` (URI-aware join). */
  def child(dir: String, name: String): String = new HPath(dir, name).toString

  private def fsPath(p: String, conf: Configuration): (FileSystem, HPath) = {
    val hp = new HPath(p)
    (hp.getFileSystem(resolved(conf)), hp)
  }

  /** Fully-qualified form (scheme + authority) — stable per-JVM cache key
    * for the same file reached via `/x`, `file:/x`, `file:///x`. */
  def qualified(p: String, conf: Configuration = null): String = {
    val (fs, hp) = fsPath(p, conf)
    fs.makeQualified(hp).toString
  }

  def exists(p: String, conf: Configuration = null): Boolean = {
    val (fs, hp) = fsPath(p, conf); fs.exists(hp)
  }

  def isDirectory(p: String, conf: Configuration = null): Boolean = {
    val (fs, hp) = fsPath(p, conf)
    try fs.getFileStatus(hp).isDirectory catch {
      case _: java.io.FileNotFoundException => false
    }
  }

  /** Names of non-hidden children (dot-prefix skipped), sorted. */
  def listNames(dir: String, conf: Configuration = null): Seq[String] = {
    val (fs, hp) = fsPath(dir, conf)
    fs.listStatus(hp).iterator
      .map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .toSeq.sorted
  }

  /** Names of non-hidden child DIRECTORIES, sorted. */
  def listDirNames(dir: String, conf: Configuration = null): Seq[String] = {
    val (fs, hp) = fsPath(dir, conf)
    fs.listStatus(hp).iterator
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .toSeq.sorted
  }

  def fileSize(p: String, conf: Configuration = null): Long = {
    val (fs, hp) = fsPath(p, conf); fs.getFileStatus(hp).getLen
  }

  def readAllBytes(p: String, conf: Configuration = null): Array[Byte] = {
    val (fs, hp) = fsPath(p, conf)
    val len = fs.getFileStatus(hp).getLen
    require(len <= Int.MaxValue, s"$p too large to buffer: $len bytes")
    val buf = new Array[Byte](len.toInt)
    val in = fs.open(hp)
    try in.readFully(0L, buf) finally in.close()
    buf
  }

  def readString(p: String, conf: Configuration = null): String =
    new String(readAllBytes(p, conf), java.nio.charset.StandardCharsets.UTF_8)

  /** Create/overwrite `p` with `bytes` (parents auto-created). */
  def writeBytes(p: String, bytes: Array[Byte], conf: Configuration = null): Unit = {
    val (fs, hp) = fsPath(p, conf)
    val out = fs.create(hp, true)
    try out.write(bytes) finally out.close()
  }

  def writeString(p: String, s: String, conf: Configuration = null): Unit =
    writeBytes(p, s.getBytes(java.nio.charset.StandardCharsets.UTF_8), conf)

  def mkdirs(p: String, conf: Configuration = null): Unit = {
    val (fs, hp) = fsPath(p, conf); fs.mkdirs(hp)
  }

  def delete(p: String, recursive: Boolean, conf: Configuration = null): Boolean = {
    val (fs, hp) = fsPath(p, conf); fs.delete(hp, recursive)
  }

  def rename(src: String, dst: String, conf: Configuration = null): Unit = {
    val (fs, hp) = fsPath(src, conf)
    require(fs.rename(hp, new HPath(dst)), s"rename $src -> $dst failed")
  }

  /** Recursive directory copy (`FileUtil.copy`, no delete of source) —
    * the snapshot primitive. Driver-side file IO: callers copy block
    * dirs whose file COUNT is bounded (segments per block), never
    * per-row data through the driver. */
  def copyDir(src: String, dst: String, conf: Configuration = null): Unit = {
    val (sfs, sp) = fsPath(src, conf)
    val (dfs, dp) = fsPath(dst, conf)
    require(org.apache.hadoop.fs.FileUtil.copy(
      sfs, sp, dfs, dp, false, resolved(conf)),
      s"copy $src -> $dst failed")
  }

  /** Positional-read handle over one file — the object-store range-GET
    * primitive (`FSDataInputStream.readFully(pos, …)`; on s3a each call
    * is one ranged GET). */
  final class RangeIn(p: String, conf: Configuration = null) extends AutoCloseable {
    private val (fs, hp) = fsPath(p, conf)
    val size: Long = fs.getFileStatus(hp).getLen
    private val in = fs.open(hp)
    def readFully(pos: Long, len: Int): Array[Byte] = {
      val buf = new Array[Byte](len)
      in.readFully(pos, buf, 0, len)
      buf
    }
    override def close(): Unit = in.close()
  }
}
