package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Session-scoped fixture-cache registry — the shared key + lifecycle
  * for every per-(session, sf-dir) fixture cache in [[TsQueries]] and
  * [[PipelineQueries]].
  *
  * Why not `System.identityHashCode(session)`: an identity hash can be
  * REUSED after the session is GC'd, so a later session could key into
  * a cached `DataFrame` bound to a dead session (and the `.cache()`d
  * frames would stay referenced forever). `sessionUUID` is never
  * reused, and the first use per session installs a shutdown listener
  * that purges the session's entries, releasing the driver-side
  * references (the cached blocks themselves die with the context). */
object SessionFixtures {

  private val caches =
    new java.util.concurrent.CopyOnWriteArrayList[TrieMap[_ <: Product, _]]()
  private val hooked = TrieMap[String, Boolean]()

  /** Register a fixture cache whose keys are tuples with
    * [[key]]`(session)` as the FIRST element, so [[invalidate]] can
    * purge per-session entries. Returns the map, for inline use at the
    * declaration site. */
  def register[K <: Product, V](m: TrieMap[K, V]): TrieMap[K, V] = {
    caches.add(m); m
  }

  /** Stable cache key for a session (its `sessionUUID`); installs the
    * purge-on-shutdown listener on first use per session. */
  def key(s: SparkSession): String = {
    val uuid = org.apache.spark.sql.GraftSqlBridge.sessionUUID(s)
    if (hooked.putIfAbsent(uuid, true).isEmpty) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          invalidate(uuid)
      })
    }
    uuid
  }

  /** Drop every registered entry belonging to session `uuid`. */
  def invalidate(uuid: String): Unit = {
    caches.forEach { m =>
      val tm = m.asInstanceOf[TrieMap[Product, Any]]
      tm.keySet.filter(_.productElement(0) == uuid).foreach(tm.remove)
    }
    hooked.remove(uuid)
    ()
  }
}
