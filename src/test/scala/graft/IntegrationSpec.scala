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
}
