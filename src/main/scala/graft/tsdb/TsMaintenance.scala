package graft.tsdb

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

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

  /** Partitions (block_start values) present in a store. */
  def blocks(store: String): Seq[Long] =
    Files.list(Paths.get(store)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("block_start="))
      .map(_.getFileName.toString.stripPrefix("block_start=").toLong)
      .toSeq.sorted

  private def dataFiles(dir: Path): Seq[Path] =
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq

  /** Rewrite any partition whose file count exceeds `maxFilesPerBlock`
    * down to `targetFiles` files. Partition-local: reads and rewrites one
    * block at a time (atomic swap via temp dir + rename), never touching
    * other partitions — at scale this parallelizes per block and
    * sidesteps a full-table shuffle. Returns compacted block_starts. */
  def compact(spark: SparkSession, store: String,
              maxFilesPerBlock: Int = 8, targetFiles: Int = 1): Seq[Long] = {
    val out = blocks(store).filter { b =>
      val dir = Paths.get(store, s"block_start=$b")
      if (dataFiles(dir).size <= maxFilesPerBlock) false
      else {
        val tmp = Paths.get(store, s".compact-$b")
        spark.read.parquet(dir.toString)
          .repartition(targetFiles)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        // atomic-ish swap: move old out, promote new, drop old
        val old = Paths.get(store, s".old-$b")
        Files.move(dir, old)
        Files.move(tmp, dir)
        old.toFile.listFiles().foreach(_.delete()); Files.delete(old)
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
      val dir = Paths.get(store, s"block_start=$b")
      dataFiles(dir).foreach(Files.delete)
      Files.list(dir).iterator().asScala.toSeq.foreach(Files.delete) // crc/_SUCCESS remnants
      Files.delete(dir)
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
      val dir = Paths.get(store, "_downsample", s"res=$resMs")
      if (!Files.isDirectory(dir)) resMs -> Seq.empty[Long]
      else {
        val dropped = blocks(dir.toString)
          .filter(b => b + TsSchema.BlockMs <= cutoff).map { b =>
            val pdir = dir.resolve(s"block_start=$b")
            dataFiles(pdir).foreach(Files.delete)
            Files.list(pdir).iterator().asScala.toSeq.foreach(Files.delete)
            Files.delete(pdir)
            b
          }
        if (dropped.nonEmpty) spark.catalog.refreshByPath(dir.toString)
        resMs -> dropped
      }
    }
    downDropped + (0L -> rawDropped)
  }
}
