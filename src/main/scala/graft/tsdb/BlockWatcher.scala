package graft.tsdb

import java.nio.file.{FileSystems, Files, Path, Paths, StandardWatchEventKinds, WatchService}
import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession

/** Reactive block-sync loop — the reference shipper's fsnotify watcher
  * with a 5 s ticker fallback (`/root/reference/shipper.go:189-249`):
  * a filesystem CREATE event under `blocksRoot` triggers an immediate
  * [[TsdbBlock.syncDir]] refresh and re-arms the timer (the Go loop's
  * `ticker.Stop(); ticker = time.NewTicker(...)`); the ticker alone
  * guarantees progress when events are dropped (both fsnotify and
  * WatchService lose events under queue overflow) or unavailable.
  *
  * `WatchService` is inotify-backed on Linux exactly like fsnotify and
  * shares its constraint: LOCAL paths only. For object-store roots
  * (`s3a://…`) the loop degrades to pure ticker polling — which is
  * also what the reference does on its bucket side (`db.go:93-102`
  * syncs on an interval; only the local data dir gets fsnotify).
  *
  * Producers should write a block into a temp dir and `mv` it into
  * `blocksRoot` (the Prometheus convention — block creation must be
  * atomic): the CREATE event then fires with `meta.json` already in
  * place. A block dir still being written when the event arrives is
  * simply skipped by [[TsdbBlock.syncDir]]'s meta.json filter and
  * picked up by the next tick — same behavior as the reference's
  * `refresh` scan racing an unfinished `write`.
  *
  * The loop is DRIVER-side orchestration (one thread, no per-row
  * work); each ingest it triggers is a distributed Spark job. At
  * cluster scale exactly one such watcher runs per store, the same
  * singleton shape as the reference's shipper process.
  */
object BlockWatcher {

  /** Running watcher handle: counters for tests/metrics + `close()`. */
  final class Handle private[BlockWatcher] (
      thread: Thread, stop: AtomicBoolean,
      /** total block dirs ingested by this watcher */
      val ingested: AtomicLong,
      /** syncs triggered by a filesystem CREATE event */
      val eventSyncs: AtomicLong,
      /** syncs triggered by the ticker (incl. the initial refresh) */
      val tickSyncs: AtomicLong,
      /** syncs (or onIngest callbacks) that threw — the loop survives
        * them; a growing count with flat `ingested` is the alert signal */
      val syncErrors: AtomicLong,
      /** false when the root is non-local and the loop is polling-only */
      val watching: Boolean) {
    def close(): Unit = {
      stop.set(true); thread.interrupt(); thread.join(10000)
    }
  }

  /** The local java.nio path of `root`, when `root` is a local path or
    * file:// URI that exists as a directory — else None (poll-only). */
  private def localDir(root: String): Option[Path] = {
    val uri = new org.apache.hadoop.fs.Path(root).toUri
    val p =
      if (uri.getScheme == null) Some(Paths.get(uri.getPath))
      else if (uri.getScheme == "file") Some(Paths.get(uri.getPath))
      else None
    p.filter(Files.isDirectory(_))
  }

  /** Start the watch loop on a daemon thread; returns its [[Handle]].
    * `onIngest` runs on the watcher thread after each non-empty sync. */
  def watch(spark: SparkSession, blocksRoot: String, storePath: String,
            tickMs: Long = 5000L,
            onIngest: Seq[String] => Unit = _ => ()): Handle = {
    val stop = new AtomicBoolean(false)
    val nIngested = new AtomicLong(0)
    val nEvent = new AtomicLong(0)
    val nTick = new AtomicLong(0)
    val nErrors = new AtomicLong(0)
    val watched = localDir(blocksRoot)
    val thread = new Thread(() => {
      val ws: Option[WatchService] = watched.map { p =>
        val w = FileSystems.getDefault.newWatchService()
        p.register(w, StandardWatchEventKinds.ENTRY_CREATE)
        w
      }
      // a failed sync (transient FS error, a block readable only on the
      // next tick, a throwing onIngest callback) must not kill the loop —
      // the reference's shipper logs sync errors and keeps its ticker
      // running (shipper.go sync error path); a dead watcher is strictly
      // worse than a late one
      def sync(counter: AtomicLong): Unit = {
        counter.incrementAndGet()
        try {
          val got = TsdbBlock.syncDir(spark, blocksRoot, storePath)
          if (got.nonEmpty) { nIngested.addAndGet(got.size.toLong); onIngest(got) }
        } catch {
          case ie: InterruptedException => throw ie
          case scala.util.control.NonFatal(_) => nErrors.incrementAndGet()
        }
      }
      try {
        sync(nTick) // initial refresh — the shipper syncs pre-existing blocks first
        while (!stop.get()) {
          ws match {
            case Some(w) =>
              // poll-with-timeout IS the select{event, ticker}: an event
              // re-arms the timeout, a timeout is the ticker firing
              val key = w.poll(tickMs, TimeUnit.MILLISECONDS)
              if (key == null) sync(nTick)
              else {
                val events = key.pollEvents()
                key.reset()
                // ENTRY_CREATE is the only registered kind (plus possible
                // OVERFLOW, which also warrants a refresh)
                if (!events.isEmpty) sync(nEvent)
              }
            case None =>
              Thread.sleep(tickMs)
              sync(nTick)
          }
        }
      } catch {
        case _: InterruptedException => ()
        case _: java.nio.file.ClosedWatchServiceException => ()
      } finally ws.foreach(_.close())
    })
    thread.setDaemon(true)
    thread.setName("graft-block-watcher")
    thread.start()
    new Handle(thread, stop, nIngested, nEvent, nTick, nErrors, watched.isDefined)
  }
}
