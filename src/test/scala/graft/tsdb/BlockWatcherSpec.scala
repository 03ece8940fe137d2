package graft.tsdb

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** fsnotify-parity reactive sync (`shipper.go:189-249`): a CREATE event
  * under the blocks root triggers an immediate syncDir; the ticker is
  * only the lost-event fallback. */
class BlockWatcherSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def corpus(shiftMs: Long = 0L): Seq[(Seq[Label], Seq[Sample])] =
    for (inst <- (0 to 2).map("i-" + _)) yield (
      Seq(Label("__name__", "up"), Label("job", "api"), Label("instance", inst)),
      (0 until 50).map(i => Sample(1700000000000L + shiftMs + i * 15000L, i.toDouble)))

  private def await(deadlineMs: Long = 20000L)(cond: => Boolean): Boolean = {
    val t0 = System.nanoTime()
    while (!cond && (System.nanoTime() - t0) / 1e6 < deadlineMs) Thread.sleep(50)
    cond
  }

  test("a block moved into the root is ingested via the EVENT path, not the ticker") {
    val root = Files.createTempDirectory("graft-watch")
    val store = root.resolve("store").toString
    val blocks = Files.createDirectory(root.resolve("blocks"))
    // tick far beyond the test deadline: only the event path can explain
    // an ingest inside it
    val h = BlockWatcher.watch(spark, blocks.toString, store, tickMs = 120000L)
    try {
      assert(h.watching)
      assert(await()(h.tickSyncs.get() >= 1), "initial refresh must run")
      // producer convention: write the block OUTSIDE the watched root,
      // then atomically move it in (meta.json is complete when the
      // CREATE event fires)
      val ulid = TsdbBlock.syntheticUlid(61)
      val staging = Files.createTempDirectory("graft-watch-staging").resolve(ulid)
      TsdbBlock.write(Files.createDirectory(staging), corpus(), ulid)
      Files.move(staging, blocks.resolve(ulid))
      assert(await()(h.ingested.get() == 1L),
        s"event-path ingest timed out (eventSyncs=${h.eventSyncs.get()})")
      assert(h.eventSyncs.get() >= 1L, "ingest must be event-triggered")
      assert(TsStore.read(spark, store)
        .selectLong(0, Long.MaxValue, Seq(LabelMatcher.eq("job", "api"))).count() == 150)
      // a second moved-in block (disjoint time range) is also picked up
      val ulid2 = TsdbBlock.syntheticUlid(62)
      val staging2 = Files.createTempDirectory("graft-watch-staging2").resolve(ulid2)
      TsdbBlock.write(Files.createDirectory(staging2), corpus(shiftMs = 72000000L), ulid2)
      Files.move(staging2, blocks.resolve(ulid2))
      assert(await()(h.ingested.get() == 2L), "second event-path ingest timed out")
    } finally h.close()
  }

  test("pre-existing blocks are ingested by the initial refresh") {
    val root = Files.createTempDirectory("graft-watch-pre")
    val store = root.resolve("store").toString
    val blocks = Files.createDirectory(root.resolve("blocks"))
    val ulid = TsdbBlock.syntheticUlid(63)
    TsdbBlock.write(Files.createDirectory(blocks.resolve(ulid)), corpus(), ulid)
    val h = BlockWatcher.watch(spark, blocks.toString, store, tickMs = 120000L)
    try {
      assert(await()(h.ingested.get() == 1L), "initial refresh must ingest")
      assert(h.eventSyncs.get() == 0L)
    } finally h.close()
  }

  test("a throwing onIngest callback does not kill the loop") {
    val root = Files.createTempDirectory("graft-watch-err")
    val store = root.resolve("store").toString
    val blocks = Files.createDirectory(root.resolve("blocks"))
    val h = BlockWatcher.watch(spark, blocks.toString, store, tickMs = 120000L,
      onIngest = got => if (got.contains(TsdbBlock.syntheticUlid(64)))
        sys.error("downstream hook failure"))
    try {
      assert(await()(h.tickSyncs.get() >= 1))
      val ulid = TsdbBlock.syntheticUlid(64)
      val st = Files.createTempDirectory("graft-watch-err-st").resolve(ulid)
      TsdbBlock.write(Files.createDirectory(st), corpus(), ulid)
      Files.move(st, blocks.resolve(ulid))
      assert(await()(h.syncErrors.get() == 1L), "callback failure must be counted")
      // the block WAS ingested before the hook threw, and the loop survives
      // to ingest the next one
      val ulid2 = TsdbBlock.syntheticUlid(65)
      val st2 = Files.createTempDirectory("graft-watch-err-st2").resolve(ulid2)
      TsdbBlock.write(Files.createDirectory(st2), corpus(shiftMs = 72000000L), ulid2)
      Files.move(st2, blocks.resolve(ulid2))
      assert(await()(h.ingested.get() == 2L),
        s"loop must survive the failed hook (errors=${h.syncErrors.get()})")
    } finally h.close()
  }

  test("a missing/non-local root degrades to ticker-only polling") {
    val root = Files.createTempDirectory("graft-watch-none")
    val h = BlockWatcher.watch(spark, root.resolve("nonexistent").toString,
      root.resolve("store").toString, tickMs = 50L)
    try {
      assert(!h.watching)
      assert(await()(h.tickSyncs.get() >= 2), "poll loop must keep ticking")
      assert(h.ingested.get() == 0L)
    } finally h.close()
  }
}
