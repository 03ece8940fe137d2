package graft.sources

import java.nio.file.{Files, FileAlreadyExistsException, Paths}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.tsdb.BlockIO

/** Task-commit protocol for the side-effect shard sinks ([[TarWriter]],
  * [[WarcWriter]], [[TfRecordIO]], [[ArrowIO]]) — the piece Spark's
  * FileFormat writers get from `FileOutputCommitter` and
  * `foreachPartition` sinks must carry themselves.
  *
  * Contract: every attempt streams into a hidden temp name
  * (`.<final>.<taskAttemptId>.inprogress`) and publishes to the final
  * name only on clean completion. Final names are DETERMINISTIC per
  * (job token, partition/shard) — no per-attempt UUID — so under task
  * retry or speculative execution all attempts race to the same final
  * name and exactly one publish wins; losers delete their temp. A
  * failed attempt's partial file keeps its `.inprogress` suffix, which
  * no reader's extension filter matches, so re-ingest never sees
  * partial or duplicated shards. Separate `write(...)` calls into the
  * same directory draw fresh job tokens and coexist (bench reps,
  * incremental appends).
  *
  * The publish step is chosen per file system so the election is a
  * SINGLE atomic-exclusive primitive — there is no separate marker
  * file whose holder can die mid-protocol and orphan the shard:
  *
  *  - local (`file:`): `link(tmp, final)` — POSIX hard-link creation
  *    fails with EEXIST atomically, unlike POSIX rename which silently
  *    OVERWRITES an existing destination (the race a marker file was
  *    previously needed to close). An attempt that dies before the
  *    link leaves only an `.inprogress` temp; one that dies after has
  *    already published, and every retry then loses cleanly.
  *  - HDFS-like: `rename(tmp, final)` — exclusive by the FileSystem
  *    contract (returns false when the destination exists), atomic on
  *    the namenode.
  *  - S3A: rename is a client-side exists-check + copy + delete, so
  *    two in-flight speculative twins can BOTH publish. The final
  *    object is still byte-identical (deterministic name, same input
  *    partition), so visibility stays exactly-once; only the winner
  *    COUNT can over-report there. Documented, not fixable client-side
  *    without an S3 conditional-put API.
  *
  * A publish that fails while the final name is still absent throws
  * (failing the task so Spark retries it) instead of silently
  * reporting "lost the race" — a shard can never be dropped with the
  * job still succeeding. */
object SinkCommit {

  /** Driver-side per-write job token baked into final shard names. */
  def jobToken(): String =
    java.util.UUID.randomUUID().toString.replace("-", "").take(8)

  /** An in-progress shard: stream into [[raw]] (wrap in gzip/etc. as
    * needed and `finish()` the wrapper before committing), then call
    * exactly one of [[commit]] / [[abort]]. */
  final class Pending private[sources] (fs: FileSystem, tmp: HPath,
                                        fin: HPath) {
    val raw: java.io.OutputStream = fs.create(tmp, true)

    /** Close the temp and publish it under the final name. False when
      * a sibling attempt already committed (this attempt's bytes are
      * discarded — the committed file is byte-equivalent). Throws when
      * the publish fails with no committed file visible, so the task
      * retries rather than dropping the shard. */
    def commit(): Boolean = {
      raw.close()
      if (fs.exists(fin)) { fs.delete(tmp, false); return false }
      if (fs.getScheme == "file") {
        // atomic-exclusive publish: hard link, then drop the temp name
        try {
          Files.createLink(Paths.get(fin.toUri.getPath),
            Paths.get(tmp.toUri.getPath))
          fs.delete(tmp, false)
          true
        } catch {
          case _: FileAlreadyExistsException =>
            fs.delete(tmp, false); false
        }
      } else if (fs.rename(tmp, fin)) true
      else if (fs.exists(fin)) { fs.delete(tmp, false); false }
      else throw new java.io.IOException(
        s"shard publish failed with no committed file at $fin; " +
          "failing the attempt so the task retries")
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
    new Pending(fin.getFileSystem(conf.value), tmp, fin)
  }

  /** Run `write` against a pending shard and commit it. Returns true
    * iff THIS attempt's publish won (count shards from that). */
  def committed(dir: String, name: String, conf: BlockIO.SerConf)
               (write: java.io.OutputStream => Unit): Boolean = {
    val p = start(dir, name, conf)
    var ok = false
    try { write(p.raw); ok = true } finally if (!ok) p.abort()
    p.commit()
  }
}
