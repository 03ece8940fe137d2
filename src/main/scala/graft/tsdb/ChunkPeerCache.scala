package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The peer tier of the chunk cache — the reference's groupcache layer
  * (`pkg/chunkr/groupcache.go:36-130`: a consistent-hash ring where a
  * miss on one node is served from the peer that owns the key before
  * falling back to object storage) re-expressed in Spark's storage
  * model.
  *
  * Spark already ships the peer machinery: a persisted relation lives
  * in the executors' BlockManagers, and ANY task that needs one of its
  * partitions first asks the local BlockManager, then fetches the
  * block REMOTELY from the executor that holds it, and only recomputes
  * (re-reads object storage) if no peer has it. That lookup chain —
  * local hit → peer hit → origin — is groupcache's, with the
  * BlockManager master playing the ring. So the idiomatic Spark peer
  * cache is not a custom RPC layer; it is "persist the decoded scan".
  *
  * This registry makes that a first-class, *bounded* tier over
  * `graft-tsdb` scans, keyed by the scan's canonicalized plan (root
  * path + pushed matchers + time window + columns): repeated queries
  * over the same selection — the hot-dashboard shape the reference
  * built groupcache for — decode chunks ONCE cluster-wide and serve
  * every later run from executor memory, cross-executor via remote
  * block fetch. Entries evict LRU with `unpersist` (never stale:
  * blocks are immutable ULID dirs, and a new block changes the scan's
  * plan through the block list, so a grown store simply misses).
  *
  * Tiering vs [[ChunkFile.RecordCache]]: RecordCache is the
  * executor-local hot tier (decoded records, zero-IO re-decode within
  * one JVM); this relation tier is the cluster-wide layer above it.
  * Counters mirror the reference's gets/hits observability
  * (`groupcache.go:17-27`). */
object ChunkPeerCache {

  private val MaxEntries = 32

  private val relations = new java.util.LinkedHashMap[
      (org.apache.spark.sql.SparkSession,
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
      DataFrame](16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(org.apache.spark.sql.SparkSession,
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), DataFrame])
        : Boolean =
      size > MaxEntries && { e.getValue.unpersist(false); true }
  }

  private val hitCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private val missCount = new java.util.concurrent.atomic.AtomicLong(0L)
  def hits: Long = hitCount.get()
  def misses: Long = missCount.get()
  def entryCount: Int = relations.synchronized { relations.size }

  /** Route `scan` through the peer tier: the first call per distinct
    * (session, canonical plan) persists the decoded relation
    * (`MEMORY_AND_DISK` — spill, don't recompute, on memory pressure);
    * every later call with an equivalent plan returns the SAME cached
    * relation, so its partitions are served from whichever executor's
    * BlockManager holds them. Works for any DataFrame, but is designed
    * for `graft-tsdb` scans, whose plan embeds the block root, pushed
    * matchers and time window. */
  def cached(scan: DataFrame,
             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    relations.synchronized {
      val key = (scan.sparkSession, scan.queryExecution.analyzed.canonicalized)
      val got = relations.get(key)
      if (got != null) { hitCount.incrementAndGet(); got }
      else {
        missCount.incrementAndGet()
        val p = scan.persist(level)
        relations.put(key, p)
        p
      }
    }

  /** Drop every cached relation (all sessions) and reset nothing else —
    * counters are lifetime, like the reference's. */
  def clear(): Unit = relations.synchronized {
    relations.values.forEach(v => v.unpersist(false))
    relations.clear()
  }
}
