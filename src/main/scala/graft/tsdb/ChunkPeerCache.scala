package graft.tsdb

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
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
  * `graft-tsdb` scans, keyed at (root path + block set + time window +
  * columns) with label matchers applied ABOVE the cached decoded
  * relation — the reference's sharing granularity, which keys on chunk
  * ranges rather than whole queries, so overlapping-but-distinct
  * selections share cache. Repeated and overlapping queries — the
  * hot-dashboard shape the reference built groupcache for — decode
  * chunks ONCE cluster-wide and serve every later run from executor
  * memory, cross-executor via remote block fetch. Entries evict LRU
  * with `unpersist` against a BYTE budget — 8 GiB by default, the
  * reference's groupcache budget (`groupcache.go:40`) — measured as
  * the bytes the BlockManagers actually hold, not an entry count or a
  * plan estimate (never stale: blocks are immutable ULID dirs, and
  * a new block changes the table's block set, so a grown store simply
  * misses).
  *
  * Tiering vs [[ChunkFile.RecordCache]]: RecordCache is the
  * executor-local hot tier (decoded records, zero-IO re-decode within
  * one JVM); this relation tier is the cluster-wide layer above it.
  * Counters mirror the reference's gets/hits observability
  * (`groupcache.go:17-27`). */
object ChunkPeerCache {

  /** The budget is BYTES, not entries — groupcache parity: the reference
    * sizes its chunk cache in bytes (`pkg/chunkr/groupcache.go:40`,
    * `8 << 30` = 8 GiB), because cache entries (decoded chunk ranges /
    * relations here) have wildly unequal sizes and an entry-count cap
    * lets 32 huge relations hold unbounded storage. Overridable per
    * session via `spark.graft.tsdb.peerCacheMaxBytes`. */
  private val DefaultMaxBytes = 8L << 30

  private val relations = new java.util.LinkedHashMap[
      (org.apache.spark.sql.SparkSession,
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
      DataFrame](16, 0.75f, /*accessOrder=*/ true)

  private val hitCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private val missCount = new java.util.concurrent.atomic.AtomicLong(0L)
  private val evictionCount = new java.util.concurrent.atomic.AtomicLong(0L)
  def hits: Long = hitCount.get()
  def misses: Long = missCount.get()
  def evictions: Long = evictionCount.get()
  def entryCount: Int = relations.synchronized { relations.size }

  /** Sum of ACTUAL materialized bytes across cached relations (entries
    * whose cache hasn't materialized yet count 0 — they hold no storage). */
  def usedBytes: Long = relations.synchronized {
    var total = 0L
    relations.values.forEach(v => total += GraftSqlBridge.persistedBytes(v))
    total
  }

  /** Evict least-recently-used entries until materialized bytes fit the
    * budget. Must be called holding the `relations` lock. The
    * most-recently-touched entry (the one the current query is about to
    * read) is never evicted, even if it alone exceeds the budget — its
    * `MEMORY_AND_DISK` level degrades to spill, not failure, and evicting
    * it would just force an immediate re-decode. */
  private def enforceBudget(budget: Long): Unit = {
    val sizes = new java.util.IdentityHashMap[DataFrame, java.lang.Long]()
    var total = 0L
    relations.values.forEach { v =>
      val b = GraftSqlBridge.persistedBytes(v); sizes.put(v, b); total += b
    }
    val it = relations.entrySet().iterator()
    while (total > budget && relations.size > 1 && it.hasNext) {
      val e = it.next() // access-ordered: eldest first
      e.getValue.unpersist(false)
      total -= sizes.get(e.getValue)
      it.remove()
      evictionCount.incrementAndGet()
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** Decompose `Filter*(SubqueryAlias*(tsdb relation))` into the relation
    * and the flat conjunct list; anything else (projections, joins,
    * non-tsdb sources) is left to the exact-plan path. */
  private def split(p: LogicalPlan): Option[(LogicalPlan, Seq[Expression])] =
    p match {
      case Filter(cond, child) =>
        split(child).map { case (b, cs) => (b, conjuncts(cond) ++ cs) }
      case a: SubqueryAlias => split(a.child)
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[datasource.TsdbBlockTable] => Some((r, Nil))
      case _ => None
    }

  /** Route `scan` through the peer tier.
    *
    * Sharing granularity mirrors the reference's groupcache, which keys
    * on chunk RANGES, not queries (`groupcache.go:36-130`) — two
    * different selections over the same chunks share cache. Here the
    * shared unit is the decoded relation at (root, block set, time
    * window, columns): a `Filter*(tsdb relation)` scan is decomposed,
    * conjuncts over the time column `t` stay BELOW the cache (the time
    * window drives block/chunk pruning and bounds what is decoded —
    * caching above it would decode the whole store for a 2h dashboard),
    * and label-matcher conjuncts are re-applied ABOVE the cached
    * relation, remapped by column name. So a NEW matcher over an
    * already-cached (root, window) is a peer hit served from executor
    * memory — zero chunk IO — exactly the overlapping-selection shape
    * groupcache accelerates. A changed window, grown block set or
    * different column schema misses (the canonical key embeds all
    * three; blocks are immutable ULID dirs, so entries are never
    * stale).
    *
    * The first call per key persists (`MEMORY_AND_DISK` — spill, don't
    * recompute, on memory pressure); plans this decomposition doesn't
    * cover fall back to exact-canonical-plan reuse. */
  def cached(scan: DataFrame,
             level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    relations.synchronized {
      val analyzed = scan.queryExecution.analyzed
      val lifted = split(analyzed).flatMap { case (rel, conds) =>
        val (timeConds, matcherConds) =
          conds.partition(_.references.forall(_.name == "t"))
        if (matcherConds.isEmpty) None
        else {
          // base = relation + time window, built from this scan's own
          // attributes (no remap needed); canonicalization normalizes
          // exprIds and conjunct order, so an equivalent window over an
          // equal table (TsdbBlockTable equality = root + schema +
          // block set) from a separate load keys identically
          val baseDf = timeConds.foldLeft(
            GraftSqlBridge.ofRows(scan.sparkSession, rel))(
            (d, c) => d.where(GraftSqlBridge.column(c)))
          Some((baseDf, matcherConds))
        }
      }
      val (keyDf, above) = lifted.getOrElse((scan, Seq.empty[Expression]))
      val key = (scan.sparkSession, keyDf.queryExecution.analyzed.canonicalized)
      val got = relations.get(key)
      val base =
        if (got != null) { hitCount.incrementAndGet(); got }
        else {
          missCount.incrementAndGet()
          val p = keyDf.persist(level)
          relations.put(key, p)
          p
        }
      // byte-budgeted LRU (groupcache parity): entries materialize lazily,
      // so the budget is enforced on every route-through against the
      // bytes the BlockManagers ACTUALLY hold right now
      enforceBudget(scala.util.Try(scan.sparkSession.conf
        .get("spark.graft.tsdb.peerCacheMaxBytes").toLong)
        .getOrElse(DefaultMaxBytes))
      // matchers re-apply above the cached relation: rebind their
      // attribute references (this scan's exprIds) to the cached base's
      // output by name — the relation schema is flat and names unique
      val byName = base.queryExecution.analyzed.output.map(a => a.name -> a).toMap
      above.foldLeft(base)((d, c) => d.where(GraftSqlBridge.column(c.transform {
        case a: AttributeReference => byName.getOrElse(a.name, a)
      })))
    }

  /** Drop every cached relation (all sessions) and reset nothing else —
    * counters are lifetime, like the reference's. */
  def clear(): Unit = relations.synchronized {
    relations.values.forEach(v => v.unpersist(false))
    relations.clear()
  }
}
