package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.tsdb.BlockIO

/** Task-commit protocol for the side-effect shard sinks ([[TarWriter]],
  * [[WarcWriter]], [[TfRecordIO]], [[ArrowIO]]) — the piece Spark's
  * FileFormat writers get from `FileOutputCommitter` and
  * `foreachPartition` sinks must carry themselves.
  *
  * Contract: every attempt streams into a hidden temp name
  * (`.<final>.<taskAttemptId>.inprogress`) and RENAMES to the final
  * name only on clean completion. Final names are DETERMINISTIC per
  * (job token, partition/shard) — no per-attempt UUID — so under task
  * retry or speculative execution all attempts race to the same final
  * name and exactly one rename wins; losers delete their temp. A
  * failed attempt's partial file keeps its `.inprogress` suffix, which
  * no reader's extension filter matches, so re-ingest never sees
  * partial or duplicated shards. Separate `write(...)` calls into the
  * same directory draw fresh job tokens and coexist (bench reps,
  * incremental appends).
  *
  * Rename-as-commit is atomic on HDFS and local file systems; on S3A
  * it is copy+delete but still yields exactly-once *visibility* for
  * extension-filtered listings (the temp never matches). */
object SinkCommit {

  /** Driver-side per-write job token baked into final shard names. */
  def jobToken(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  /** An in-progress shard: stream into [[raw]] (wrap in gzip/etc. as
    * needed and `finish()` the wrapper before committing), then call
    * exactly one of [[commit]] / [[abort]]. */
  final class Pending private[sources] (fs: FileSystem, tmp: HPath,
                                        fin: HPath, claim: HPath) {
    val raw: java.io.OutputStream = fs.create(tmp, true)

    /** Close the temp and rename it to the final name. False when a
      * sibling attempt already committed (this attempt's bytes are
      * discarded — the committed file is byte-equivalent).
      *
      * Exactly-once claim: bare exists+rename is racy on local/POSIX
      * file systems (rename OVERWRITES an existing destination, so two
      * speculative twins could both "win" and double-count). A hidden
      * `.claim` marker created with `createNewFile` — O_EXCL, atomic
      * on local FS and HDFS alike — elects exactly one committer; the
      * claim stays behind (readers' extension filters never match it)
      * so a late retry can never re-elect after a commit. */
    def commit(): Boolean = {
      raw.close()
      if (fs.exists(fin) || !fs.createNewFile(claim)) {
        fs.delete(tmp, false)
        false
      } else if (fs.rename(tmp, fin)) true
      else { fs.delete(tmp, false); false }
    }

    /** Best-effort cleanup on failure; never throws. */
    def abort(): Unit = {
      try raw.close() catch { case _: java.io.IOException => () }
      try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
    }
  }

  def start(dir: String, name: String, conf: BlockIO.SerConf): Pending = {
    val fin = new HPath(BlockIO.child(dir, name))
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId()).getOrElse(0L)
    val tmp = new HPath(BlockIO.child(dir, s".$name.$attempt.inprogress"))
    val claim = new HPath(BlockIO.child(dir, s".$name.claim"))
    new Pending(fin.getFileSystem(conf.value), tmp, fin, claim)
  }

  /** Run `write` against a pending shard and commit it. Returns true
    * iff THIS attempt's rename won (count shards from that). */
  def committed(dir: String, name: String, conf: BlockIO.SerConf)
               (write: java.io.OutputStream => Unit): Boolean = {
    val p = start(dir, name, conf)
    var ok = false
    try { write(p.raw); ok = true } finally if (!ok) p.abort()
    p.commit()
  }
}
