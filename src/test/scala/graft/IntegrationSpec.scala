package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.xerial.snappy.Snappy
import graft.remote.{Proto, RemoteReadServer}
import graft.tsdb._

/** Capstone: the reference's full data path in one flow (SURVEY.md §3) —
  * shipper-written TSDB block → sync/ingest into the lakehouse store →
  * Prometheus remote-read query over HTTP → decoded samples match the
  * original input bit-for-bit. */
class IntegrationSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("block → ingest → remote-read round-trip") {
    // 1. a "Prometheus" writes two time-disjoint blocks
    val root = Files.createTempDirectory("graft-e2e")
    val store = root.resolve("store").toString
    def mkSeries(shift: Long): Seq[(Seq[Label], Seq[Sample])] = for {
      job <- Seq("api", "api-canary", "web"); i <- 0 to 1
    } yield (
      Seq(Label("__name__", "http_requests_total"), Label("job", job), Label("instance", s"i-$i")),
      (0 until 200).map(k => Sample(1700000000000L + shift + k * 15000L, (k % 97).toDouble)))
    (0 until 2).foreach { b =>
      val ulid = TsdbBlock.syntheticUlid(500 + b)
      TsdbBlock.write(Files.createDirectory(root.resolve(ulid)), mkSeries(b * 7200000L), ulid)
    }

    // 2. shipper-equivalent sync (idempotent)
    assert(TsdbBlock.syncDir(spark, root.toString, store).size == 2)
    assert(TsdbBlock.syncDir(spark, root.toString, store).isEmpty)

    // 3. serve remote-read over the ingested store; query over HTTP
    val server = new RemoteReadServer(TsStore.read(spark, store))
    val port = server.start()
    try {
      val req = Proto.encodeReadRequest(Seq(Proto.Query(
        1700000000000L, 1700000000000L + 2 * 7200000L + 3600000L,
        Seq(LabelMatcher.eq("__name__", "http_requests_total"),
          LabelMatcher.re("job", "api"))))) // anchored
      val resp = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port/read"))
          .POST(HttpRequest.BodyPublishers.ofByteArray(Snappy.compress(req))).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(resp.statusCode() == 200)
      val streams = Proto.decodeReadResponse(Snappy.uncompress(resp.body())).head

      // anchored regex excludes api-canary; 2 instances of job=api remain
      assert(streams.size == 2)
      assert(streams.forall(_.labels("job") == "api"))
      // cross-block chaining: 200 + 200 samples per series, time-ordered,
      // values bit-exact through XOR encode → index → ingest → wire
      streams.foreach { ss =>
        assert(ss.samples.size == 400)
        assert(ss.samples.map(_.t) == ss.samples.map(_.t).sorted)
        assert(ss.samples.map(_.v) ==
          ((0 until 200) ++ (0 until 200)).map(k => (k % 97).toDouble))
      }
      // canonical stream order
      val order = streams.map(s => Labels.fromMap(s.labels))
      assert(order == order.sorted(Labels.ordering))
    } finally server.stop()
  }

  test("write → delete → materialize → ship → DSv2 regex → compact lifecycle") {
    val root = Files.createTempDirectory("graft-e2e2")
    val store = root.resolve("store").toString
    val t0 = 1700000000000L - (1700000000000L % TsSchema.BlockMs)

    // 1. remote-write two full 2h windows straight into the store
    val streams = for {
      job <- Seq("api", "api-canary", "web"); i <- 0 to 1
    } yield SampleStream(
      Map("__name__" -> "rps", "job" -> job, "instance" -> s"i-$i"),
      (0 until 240).map(k => Sample(t0 + k * 60000L, k.toDouble)))
    remote.RemoteWrite.appendToStore(spark, store)(streams)
    assert(spark.read.parquet(store).count() == 6L * 240)

    // 2. store-level delete: api-canary's first hour, masked then physical
    TsDeletions.delete(spark, store,
      Seq(LabelMatcher.eq("job", "api-canary")), t0, t0 + 59 * 60000L)
    assert(TsDeletions.readMasked(spark, store).count() == 6L * 240 - 2 * 60)
    TsDeletions.materialize(spark, store)
    assert(spark.read.parquet(store).count() == 6L * 240 - 2 * 60)

    // 3. ship both (closed) windows as native blocks
    val blocks = root.resolve("blocks").toString
    assert(BlockShipper.shipClosed(spark, store, blocks, Long.MaxValue / 2)
      .size == 2)

    // 4. DSv2 regex matcher over the shipped blocks: rewritten to a
    // postings union; anchored pattern excludes api-canary
    val ds = spark.read.format("graft-tsdb").load(blocks)
    val api = ds.where(org.apache.spark.sql.functions.col("job").rlike("^api$"))
    assert(api.count() == 2L * 240)
    assert(ds.count() == 6L * 240 - 2 * 60)

    // 5. compact the two blocks into one level-2 block; data intact
    val out = root.resolve("compacted")
    val meta = TsdbBlock.compact(spark,
      BlockShipper.shipped(blocks).toSeq.sorted.map(b =>
        root.resolve("blocks").resolve(TsdbBlock.syntheticUlid(b)).toString),
      out, TsdbBlock.syntheticUlid(999))
    assert(meta.level == 2)
    assert(meta.stats.numSamples == 6L * 240 - 2 * 60)
    assert(spark.read.format("graft-tsdb").load(out.toString).count() ==
      6L * 240 - 2 * 60)
  }

  test("corpus curation lifecycle: curate → split → partitioned write → reread") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // full curation verdict (dedup election × quality × span ceiling)
    val verdicts = graft.queries.PipelineQueries.defs("pipeline_curate")(spark, dir)
    val kept = d.join(verdicts.where(col("keep")).select("doc_id"), "doc_id")
    val nKept = kept.count()
    assert(nKept > 0 && nKept < d.count()) // non-trivial verdict mix
    // deterministic held-out split, stable under corpus growth
    val withSplit = graft.ops.Sampling.split(kept, col("doc_id"),
      Seq("train" -> 0.9, "val" -> 0.1))
    val out = Files.createTempDirectory("graft-corpus").resolve("curated").toString
    withSplit.write.partitionBy("split", "lang").parquet(out)
    // the dataset a training job reads: layout prunes by split and lang
    val back = spark.read.parquet(out)
    assert(back.count() == nKept)
    assert(back.select("split").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val")))
    val trainOnly = spark.read.parquet(out).where(col("split") === "train")
    assert(trainOnly.queryExecution.executedPlan.toString.contains("split=train")
      || trainOnly.count() < nKept) // partition pruning reaches the scan
    // the whole lifecycle is deterministic: a re-run keeps the same docs
    val verdicts2 = graft.queries.PipelineQueries.defs("pipeline_curate")(spark, dir)
    assert(verdicts2.where(col("keep")).select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(verdicts.where(col("keep")).select("doc_id").collect().map(_.getLong(0)).sorted))
  }
}
