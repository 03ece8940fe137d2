package graft.tsdb

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class TsdbIndexSpec extends AnyFunSuite {
  private def mkSeries: Seq[TsdbIndex.IndexSeries] = {
    val raw = for {
      job <- Seq("api", "web"); inst <- (0 to 3).map("i-" + _)
    } yield TsdbIndex.IndexSeries(
      Seq(Label("__name__", "up"), Label("job", job), Label("instance", inst)),
      Seq(TsdbIndex.ChunkMeta(1000, 2000, ChunkFile.ref(1, 5)),
        TsdbIndex.ChunkMeta(2001, 3000, ChunkFile.ref(1, 900))))
    raw
  }

  private def canonSorted(ss: Seq[TsdbIndex.IndexSeries]) =
    ss.map(s => s.copy(labels = Labels.canonical(s.labels)))
      .sortBy(_.labels)(Labels.ordering)

  test("index write/read round-trip: symbols, series, postings, label values") {
    val idx = new TsdbIndex.IndexReader(TsdbIndex.write(mkSeries))
    assert(idx.allSeries.map(s => (s.labels, s.chunks)) ==
      canonSorted(mkSeries).map(s => (s.labels, s.chunks)))
    assert(idx.labelValues("job") == Seq("api", "web"))
    assert(idx.labelValues("instance") == Seq("i-0", "i-1", "i-2", "i-3"))
    assert(idx.labelValues("nope") == Seq.empty)
    // postings for a label pair select exactly the matching series
    val apiRefs = idx.postings("job", "api")
    assert(apiRefs.size == 4)
    assert(apiRefs.forall(r => idx.series(r).labels.contains(Label("job", "api"))))
    assert(idx.postings("job", "zzz") == Seq.empty)
    assert(idx.allPostings.size == 8)
  }

  test("duplicate series label sets are rejected") {
    val s = mkSeries
    assertThrows[IllegalArgumentException](TsdbIndex.write(s ++ s.take(1)))
  }

  test("corrupted TOC crc fails") {
    val bytes = TsdbIndex.write(mkSeries)
    bytes(bytes.length - 20) = (bytes(bytes.length - 20) ^ 1).toByte
    assertThrows[IllegalArgumentException](new TsdbIndex.IndexReader(bytes))
  }
}

class TsdbBlockSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def corpus: Seq[(Seq[Label], Seq[Sample])] = {
    val rnd = new scala.util.Random(7)
    for {
      job <- Seq("api", "api-canary", "web"); inst <- (0 to 2).map("i-" + _)
    } yield (
      Seq(Label("__name__", "http_requests_total"), Label("job", job), Label("instance", inst)),
      // 300 samples → 3 chunks per series; strictly increasing t
      (0 until 300).map(i => Sample(1700000000000L + i * 15000L, rnd.nextInt(500).toDouble)))
  }

  test("block write → distributed read round-trip") {
    val dir = Files.createTempDirectory("graft-block")
    val meta = TsdbBlock.write(dir, corpus, TsdbBlock.syntheticUlid(1))
    assert(meta.stats.numSeries == 9 && meta.stats.numChunks == 27)
    assert(meta.stats.numSamples == 9 * 300)
    assert(Files.exists(dir.resolve("index")) && Files.exists(dir.resolve("chunks/000001")))

    val df = TsdbBlock.read(spark, dir.toString)
    assert(df.count() == 9 * 300)
    // one series' samples come back exactly
    val got = df.where(element_at(col("labels"), "job") === "api" &&
      element_at(col("labels"), "instance") === "i-0")
      .orderBy(col("t")).collect().map(r => Sample(r.getLong(1), r.getDouble(2)))
    val want = corpus.find(c => c._1.contains(Label("job", "api")) &&
      c._1.contains(Label("instance", "i-0"))).get._2
    assert(got.toSeq == want)
  }

  test("meta.json round-trip") {
    val dir = Files.createTempDirectory("graft-meta")
    val meta = TsdbBlock.BlockMeta("01TESTULID0000000000000000", 5, 99,
      TsdbBlock.BlockStats(100, 2, 3), 1)
    TsdbBlock.writeMeta(dir, meta)
    assert(TsdbBlock.readMeta(dir) == meta)
  }

  test("ingest is ULID-idempotent and queryable through TsQuerier") {
    val blockDir = Files.createTempDirectory("graft-ingest-block")
    val store = Files.createTempDirectory("graft-ingest-store").resolve("store").toString
    TsdbBlock.write(blockDir, corpus, TsdbBlock.syntheticUlid(2))
    assert(TsdbBlock.ingest(spark, blockDir.toString, store))
    assert(!TsdbBlock.ingest(spark, blockDir.toString, store), "second ingest must skip")

    val q = TsStore.read(spark, store)
    val streams = q.selectStreams(0, Long.MaxValue,
      Seq(LabelMatcher.eq("job", "api"), LabelMatcher.eq("instance", "i-1"))).collect()
    assert(streams.length == 1)
    assert(streams.head.samples.size == 300)
    val want = corpus.find(c => c._1.contains(Label("job", "api")) &&
      c._1.contains(Label("instance", "i-1"))).get._2
    assert(streams.head.samples == want)
  }

  test("overlapping block is rejected at ingest (db.go:206-220 invariant)") {
    val root = Files.createTempDirectory("graft-overlap")
    val store = root.resolve("store").toString
    val b1 = Files.createDirectory(root.resolve("b1"))
    TsdbBlock.write(b1, corpus, TsdbBlock.syntheticUlid(31))
    assert(TsdbBlock.ingest(spark, b1.toString, store))
    // same time range, different ULID → overlap → must be rejected
    val b2 = Files.createDirectory(root.resolve("b2"))
    TsdbBlock.write(b2, corpus, TsdbBlock.syntheticUlid(32))
    assertThrows[IllegalArgumentException](TsdbBlock.ingest(spark, b2.toString, store))
  }

  test("syncDir ingests each ULID block once") {
    val root = Files.createTempDirectory("graft-sync")
    val store = root.resolve("store").toString
    (0 until 3).foreach { i =>
      // blocks must be time-disjoint (db.go:206-220 invariant)
      val shifted = corpus.map { case (ls, ss) =>
        (ls, ss.map(s => Sample(s.t + i * 7200000L * 10, s.v)))
      }
      TsdbBlock.write(Files.createDirectory(root.resolve(TsdbBlock.syntheticUlid(100 + i))),
        shifted, TsdbBlock.syntheticUlid(100 + i))
    }
    val first = TsdbBlock.syncDir(spark, root.toString, store)
    assert(first.size == 3)
    assert(TsdbBlock.syncDir(spark, root.toString, store).isEmpty)
    assert(TsStore.read(spark, store).labelValues("job").count() == 3)
  }
}

class TsdbIndexPropertySpec extends AnyFunSuite {
  test("property: random label sets + chunk lists round-trip through the index format") {
    val rnd = new scala.util.Random(1234)
    (1 to 30).foreach { trial =>
      val nSeries = 1 + rnd.nextInt(40)
      val raw = (0 until nSeries).map { i =>
        val nl = 1 + rnd.nextInt(5)
        val labels = (0 until nl).map(j =>
          Label(s"l${rnd.nextInt(8)}", s"v${rnd.nextInt(20)}")) :+ Label("uniq", s"s$i")
        val nc = 1 + rnd.nextInt(6)
        var t = rnd.nextLong() % (1L << 40)
        val chunks = (0 until nc).map { _ =>
          val mint = t + 1 + rnd.nextInt(100000)
          val maxt = mint + rnd.nextInt(7200000)
          t = maxt
          TsdbIndex.ChunkMeta(mint, maxt, ChunkFile.ref(1 + rnd.nextInt(3), rnd.nextInt(1 << 28)))
        }
        TsdbIndex.IndexSeries(labels, chunks)
      }
      // dedupe canonical label sets (duplicates rejected by design)
      val unique = raw.groupBy(s => Labels.canonical(s.labels)).map(_._2.head).toSeq
      val idx = new TsdbIndex.IndexReader(TsdbIndex.write(unique))
      val got = idx.allSeries.map(s => (s.labels, s.chunks))
      val want = unique.map(s => (Labels.canonical(s.labels), s.chunks))
        .sortBy(_._1)(Labels.ordering)
      assert(got == want, s"trial $trial mismatch")
      // every label pair's postings select exactly the matching series
      val pairs = unique.flatMap(_.labels.map(l => (l.name, l.value))).distinct.take(5)
      pairs.foreach { case (n, v) =>
        val refs = idx.postings(n, v)
        assert(refs.forall(r => idx.series(r).labels.contains(Label(n, v))))
      }
    }
  }
}
