package graft.tsdb

import org.apache.spark.sql.SparkSession

/** The shipper's OUTBOUND direction (`shipper.go:22-113,252-325`):
  * package finished 2-hour windows as immutable native TSDB blocks.
  *
  * The reference watches a local TSDB for completed level-1 blocks and
  * uploads them; here the lakehouse store IS the source of truth, and
  * shipping converts closed `block_start` partitions into native block
  * dirs (index + XOR chunk segments + meta.json) that any
  * reference-compatible reader — or our own DSv2 source — can consume.
  *
  * Idempotency mirrors the reference's marker objects
  * (`shipper.go:257-259`): a `_shipped/<block_start>` marker is written
  * AFTER the block completes, so a crashed ship re-runs; re-shipping an
  * already-marked window is a no-op. ULIDs are deterministic in
  * `block_start`, so a re-run produces the same block dir name.
  *
  * Scale: each shipped window is one [[TsdbBlock.writeDistributed]] —
  * executors XOR-encode and write segment files; the driver assembles
  * only index + meta. Windows ship independently (embarrassingly
  * parallel across a cluster of drivers if needed).
  *
  * Streaming use: run [[shipClosed]] from `foreachBatch` after the
  * ingest append, with `beforeMs` = the batch watermark — closed
  * windows ship as the stream advances; open windows wait.
  */
object BlockShipper {

  private def markerDir(blocksDir: String) = BlockIO.child(blocksDir, "_shipped")

  /** Block starts already shipped to `blocksDir` (any Hadoop-FS URI —
    * the reference's marker objects in the upload bucket,
    * `shipper.go:257-259`). */
  def shipped(blocksDir: String): Set[Long] = {
    val d = markerDir(blocksDir)
    if (!BlockIO.isDirectory(d)) return Set.empty
    BlockIO.listNames(d).map(_.toLong).toSet
  }

  /** Ship every store partition with `block_start + 2h <= beforeMs` not
    * yet marked. Returns the shipped block starts (in order). */
  def shipClosed(spark: SparkSession, storePath: String, blocksDir: String,
                 beforeMs: Long): Seq[Long] = {
    val done = shipped(blocksDir)
    val closed = TsMaintenance.blocks(storePath)
      .filter(b => b + TsSchema.BlockMs <= beforeMs && !done.contains(b))
    closed.foreach { b =>
      // partition files hold the full canonical schema minus the
      // partition column itself; writeDistributed needs only
      // (fingerprint, labels, t, v), all present. PENDING deletions
      // must be masked here: shipped blocks are immutable and marked,
      // so a deleted sample that leaks into one is resurrected forever
      // (a PII-removal hazard) — the mask is the same compiled
      // predicate readers apply, a map-side filter, no extra pass.
      val part = TsDeletions.masked(spark, storePath, spark.read.parquet(
        BlockIO.child(storePath, s"block_start=$b")))
      val ulid = TsdbBlock.syntheticUlid(b)
      TsdbBlock.writeDistributed(part, BlockIO.child(blocksDir, ulid), ulid)
      BlockIO.mkdirs(markerDir(blocksDir))
      BlockIO.writeString(BlockIO.child(markerDir(blocksDir), b.toString), ulid)
    }
    closed
  }
}
