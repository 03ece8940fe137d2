package graft.tsdb

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The peer tier over graft-tsdb scans (the reference's groupcache
  * layer, `pkg/chunkr/groupcache.go:36-130`, re-expressed as a
  * persisted relation in the executors' BlockManagers): a repeated
  * selection must be served entirely from cached partitions — no chunk
  * IO, and not even a local RecordCache lookup, because the scan never
  * runs again. */
class ChunkPeerCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private lazy val root: String = {
    val dir = Files.createTempDirectory("peercache")
    val corpus = for {
      job <- Seq("api", "web"); inst <- (0 to 2).map("i-" + _)
    } yield (
      Seq(Label("__name__", "up"), Label("job", job), Label("instance", inst)),
      (0 until 200).map(i => Sample(1700000000000L + i * 15000L, i.toDouble)))
    TsdbBlock.write(dir.resolve("b"), corpus, TsdbBlock.syntheticUlid(77))
    dir.resolve("b").toString
  }

  private def sel = spark.read.format("graft-tsdb").load(root)
    .where(col("job") === "api")

  test("repeat query is a peer-tier hit: same relation, zero scan work") {
    val (h0, m0) = (ChunkPeerCache.hits, ChunkPeerCache.misses)
    val first = ChunkPeerCache.cached(sel)
    assert(ChunkPeerCache.misses == m0 + 1)
    assert(first.count() == 3 * 200) // materializes into the BlockManager

    // a fresh, structurally identical query resolves to the SAME cached
    // relation (canonical key: root + block set + window + columns)
    val second = ChunkPeerCache.cached(sel)
    assert(ChunkPeerCache.hits == h0 + 1)
    assert(second.count() == first.count())

    // the repeat run reads cached partitions — it must not touch the
    // segment files NOR the executor-local RecordCache: the tsdb reader
    // simply never runs again
    val (rh0, rm0) = (ChunkFile.RecordCache.hits, ChunkFile.RecordCache.misses)
    ChunkFile.bytesFetched.set(0)
    assert(second.count() == 3 * 200)
    assert(ChunkFile.bytesFetched.get() == 0, "peer-tier hit must do zero chunk IO")
    assert(ChunkFile.RecordCache.hits == rh0 && ChunkFile.RecordCache.misses == rm0,
      "peer-tier hit must not consult the local record cache")
    assert(second.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "repeat query must be served from the cached relation")

    // a DIFFERENT matcher over the same (root, window, columns) shares
    // the cached decoded relation — the reference's groupcache keys on
    // chunk ranges, not queries (`groupcache.go:36-130`), so
    // overlapping-but-distinct selections must be peer hits, not origin
    // reads: zero chunk IO, matcher applied above the cached relation
    ChunkFile.bytesFetched.set(0)
    val other = ChunkPeerCache.cached(
      spark.read.format("graft-tsdb").load(root).where(col("job") === "web"))
    assert(ChunkPeerCache.hits == h0 + 2, "new matcher over cached blocks must be a peer hit")
    assert(other.count() == 3 * 200)
    assert(ChunkFile.bytesFetched.get() == 0,
      "distinct-matcher peer hit must do zero chunk IO")
    assert(other.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "distinct matcher must be served from the cached relation")

    // a different TIME window is its own entry (and a miss): the window
    // bounds what is decoded, so it stays below the cache in the key
    val windowed = ChunkPeerCache.cached(
      spark.read.format("graft-tsdb").load(root)
        .where(col("t") < lit(1700000000000L + 100 * 15000L))
        .where(col("job") === "api"))
    assert(ChunkPeerCache.misses == m0 + 2)
    assert(windowed.count() == 3 * 100)

    // ...and a REPEAT of that window with yet another matcher hits it
    val windowed2 = ChunkPeerCache.cached(
      spark.read.format("graft-tsdb").load(root)
        .where(col("t") < lit(1700000000000L + 100 * 15000L))
        .where(col("instance") === "i-1"))
    assert(ChunkPeerCache.hits == h0 + 3)
    assert(windowed2.count() == 2 * 100)

    ChunkPeerCache.clear()
    assert(ChunkPeerCache.entryCount == 0)
  }

  test("byte budget evicts LRU — groupcache parity: bytes, not entries") {
    ChunkPeerCache.clear()
    // reference: 8 GiB BYTE budget (`groupcache.go:40`, 8<<30); shrink it
    // to 1 byte so any materialized relation overflows immediately
    spark.conf.set("spark.graft.tsdb.peerCacheMaxBytes", "1")
    try {
      val e0 = ChunkPeerCache.evictions
      val a = ChunkPeerCache.cached(sel)
      assert(a.count() == 3 * 200) // materialize A into the BlockManager
      assert(ChunkPeerCache.usedBytes > 0,
        "materialized entry must report its actual storage bytes")
      // routing a second window inserts B; A (LRU, over budget) must go
      val b = ChunkPeerCache.cached(
        spark.read.format("graft-tsdb").load(root)
          .where(col("t") < lit(1700000000000L + 100 * 15000L))
          .where(col("job") === "api"))
      assert(ChunkPeerCache.evictions == e0 + 1,
        "A's materialized bytes exceed the budget → LRU eviction")
      assert(ChunkPeerCache.entryCount == 1)
      assert(b.count() == 3 * 100)
      // the most-recently-used entry survives even when it alone exceeds
      // the budget: evicting it would only force an immediate re-decode
      val b2 = ChunkPeerCache.cached(
        spark.read.format("graft-tsdb").load(root)
          .where(col("t") < lit(1700000000000L + 100 * 15000L))
          .where(col("instance") === "i-1"))
      assert(b2.count() == 2 * 100)
      assert(ChunkPeerCache.entryCount == 1, "hit on B — no new entry")
      assert(ChunkPeerCache.evictions == e0 + 1, "MRU entry is never evicted")
    } finally {
      spark.conf.unset("spark.graft.tsdb.peerCacheMaxBytes")
      ChunkPeerCache.clear()
    }
  }
}
