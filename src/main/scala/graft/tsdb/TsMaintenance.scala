package graft.tsdb

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Store maintenance: compaction and retention.
  *
  * The reference delegates both to upstream Prometheus (it only ships
  * level-1 blocks, `shipper.go:39-43`, and never deletes). A lakehouse
  * store accumulates small files from streaming/batch appends instead of
  * small blocks — compaction rewrites partitions to a bounded file count;
  * retention drops whole `block_start` partitions (the 2h alignment makes
  * retention a pure partition delete — no data rewrite, same reason the
  * reference keeps blocks time-disjoint). */
object TsMaintenance {

  /** Partitions (block_start values) present in a store (any Hadoop-FS
    * URI). */
  def blocks(store: String): Seq[Long] =
    BlockIO.listNames(store)
      .filter(_.startsWith("block_start="))
      .map(_.stripPrefix("block_start=").toLong)
      .sorted

  private def dataFileCount(dir: String): Int =
    BlockIO.listNames(dir).count(_.endsWith(".parquet"))

  /** Rewrite any partition whose file count exceeds `maxFilesPerBlock`
    * down to `targetFiles` files. Partition-local: reads and rewrites one
    * block at a time (atomic swap via temp dir + rename), never touching
    * other partitions — at scale this parallelizes per block and
    * sidesteps a full-table shuffle. Returns compacted block_starts. */
  def compact(spark: SparkSession, store: String,
              maxFilesPerBlock: Int = 8, targetFiles: Int = 1): Seq[Long] = {
    val out = blocks(store).filter { b =>
      val dir = BlockIO.child(store, s"block_start=$b")
      if (dataFileCount(dir) <= maxFilesPerBlock) false
      else {
        val tmp = BlockIO.child(store, s".compact-$b")
        spark.read.parquet(dir)
          .repartition(targetFiles)
          .write.mode(SaveMode.Overwrite).parquet(tmp)
        // atomic-ish swap: move old out, promote new, drop old
        val old = BlockIO.child(store, s".old-$b")
        BlockIO.rename(dir, old)
        BlockIO.rename(tmp, dir)
        BlockIO.delete(old, recursive = true)
        true
      }
    }
    // Spark caches file listings session-globally (FileStatusCache);
    // without a refresh, later reads resolve deleted pre-compaction files
    spark.catalog.refreshByPath(store)
    out
  }

  /** Drop all blocks strictly older than `retainAfterMs` (whole-partition
    * deletes; markers for fully-dropped blocks are retained so a
    * re-shipped old block is still deduped). Returns dropped blocks. */
  def applyRetention(spark: SparkSession, store: String, retainAfterMs: Long): Seq[Long] = {
    val dropped = blocks(store).filter(b => b + TsSchema.BlockMs <= retainAfterMs).map { b =>
      BlockIO.delete(BlockIO.child(store, s"block_start=$b"), recursive = true)
      b
    }
    if (dropped.nonEmpty) spark.catalog.refreshByPath(store)
    dropped
  }

  /** Thanos-style retention ladder: raw samples age out first, each
    * downsampled resolution keeps its own (longer) horizon — the storage
    * contract that makes a year of 1h aggregates cost less than a week
    * of raw samples. `ladder` maps resolution (ms) → retain-after cutoff
    * (drop windows entirely before it); `rawRetainAfterMs` is the raw
    * store's cutoff. Every drop is a whole-partition delete (2h-aligned
    * block dirs), never a rewrite. Returns (resolution → dropped
    * block_starts), with resolution 0 = raw. */
  def applyRetentionLadder(spark: SparkSession, store: String,
                           rawRetainAfterMs: Long,
                           ladder: Map[Long, Long]): Map[Long, Seq[Long]] = {
    val rawDropped = applyRetention(spark, store, rawRetainAfterMs)
    val downDropped = ladder.map { case (resMs, cutoff) =>
      val dir = BlockIO.child(BlockIO.child(store, "_downsample"), s"res=$resMs")
      if (!BlockIO.isDirectory(dir)) resMs -> Seq.empty[Long]
      else {
        val dropped = blocks(dir)
          .filter(b => b + TsSchema.BlockMs <= cutoff).map { b =>
            BlockIO.delete(BlockIO.child(dir, s"block_start=$b"), recursive = true)
            b
          }
        if (dropped.nonEmpty) spark.catalog.refreshByPath(dir)
        resMs -> dropped
      }
    }
    downDropped + (0L -> rawDropped)
  }

  /** Consistent on-disk SNAPSHOT of a store (the `/api/v1/admin/tsdb/
    * snapshot` semantic): copy every `block_start=*` partition dir —
    * blocks are immutable once written, so a file-level copy of each
    * is internally consistent — into `store/_snapshots/<name>` and
    * return the name (`<utc-stamp>-<nanos>`, the upstream shape). The
    * underscore prefix keeps Spark partition discovery (and so every
    * reader) out of the snapshot tree, same convention as
    * `_deletions`. The deletion log is copied too unless
    * `skipPending` — a snapshot should see the same mask queries see;
    * downsample dirs and markers ride along for the same reason.
    * Driver-side file IO bounded by file COUNT (segments per block),
    * not rows; on an object store this is a server-side copy per
    * object. */
  def snapshot(spark: SparkSession, store: String,
               skipPending: Boolean = false, nowMs: Long = 0L): String = {
    val at = if (nowMs != 0L) nowMs else System.currentTimeMillis()
    val stamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(at))
    val name = s"$stamp-${System.nanoTime()}"
    val dst = BlockIO.child(BlockIO.child(store, "_snapshots"), name)
    val parts = BlockIO.listNames(store).filter(n =>
      n.startsWith("block_start=") || n.startsWith("_downsample") ||
        (!skipPending && n == "_deletions"))
    parts.foreach { n =>
      BlockIO.copyDir(BlockIO.child(store, n), BlockIO.child(dst, n))
    }
    name
  }
}
