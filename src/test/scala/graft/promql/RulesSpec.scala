package graft.promql

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tsdb.{TsQuerier, TsSchema}

class RulesSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val ruleText =
    """# alerting + recording, one group each
      |groups:
      |  - name: errors
      |    interval: 30s
      |    rules:
      |      - alert: HighErr
      |        expr: errs > 50
      |        for: 2m
      |        labels:
      |          severity: "page"
      |        annotations:
      |          summary: 'errs is high'   # trailing comment
      |      - alert: AnyErr
      |        expr: errs > 50
      |  - name: rollups
      |    rules:
      |      - record: errs:sum
      |        expr: |
      |          sum(errs)
      |        labels:
      |          team: infra
      |""".stripMargin

  test("rule-file parse: groups, kinds, durations, maps, block expr") {
    val gs = Rules.parse(ruleText, "rules.yml")
    assert(gs.map(_.name) == Seq("errors", "rollups"))
    assert(gs(0).intervalMs == 30000L && gs(1).intervalMs == 60000L)
    val Seq(high, any) = gs(0).rules
    assert(high.alert.contains("HighErr") && high.forMs == 120000L)
    assert(high.expr == "errs > 50")
    assert(high.labels == Seq("severity" -> "page"))
    assert(high.annotations == Seq("summary" -> "errs is high"))
    assert(any.alert.contains("AnyErr") && any.forMs == 0L)
    val Seq(rec) = gs(1).rules
    assert(rec.record.contains("errs:sum") && rec.expr == "sum(errs)")
    assert(rec.labels == Seq("team" -> "infra"))
  }

  test("rule-file parse: strict errors") {
    assertThrows[IllegalArgumentException](Rules.parse("groups:\n  - name: g\n    rules:\n      - record: r\n        fro: 5m\n"))
    assertThrows[IllegalArgumentException](Rules.parse("groups:\n  - name: g\n    rules:\n      - record: r\n"))  // no expr
    assertThrows[IllegalArgumentException](Rules.parse("groups:\n  - name: g\n    rules:\n      - record: r\n        expr: x\n        for: 5m\n")) // for on recording
    assertThrows[IllegalArgumentException](Rules.parse("rules:\n")) // no groups
  }

  // metric `errs`, 50 points on a 15s grid per series:
  //   job=a: always 100            -> condition errs>50 held all along
  //   job=b: 10 until the last two -> holds now, not yet for 2m
  //   job=c: always 10             -> never holds
  private val t0 = 1700000000000L
  private val tEnd = t0 + 49 * 15000L
  private def mkQuerier: TsQuerier = {
    import scala.jdk.CollectionConverters._
    val rows = (for (job <- Seq("a", "b", "c"); k <- 0 to 49) yield {
      val v = job match {
        case "a" => 100.0
        case "b" => if (k >= 48) 100.0 else 10.0
        case _ => 10.0
      }
      Row(Map("__name__" -> "errs", "job" -> job), t0 + k * 15000L, v)
    }).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    new TsQuerier(TsSchema.canonicalize(spark.createDataFrame(rows, schema)))
  }

  test("activeAlerts: firing vs pending vs inactive, label merge") {
    val gs = Rules.parse(ruleText)
    val active = Rules.activeAlerts(mkQuerier, gs.take(1), tEnd)
    def byName(n: String) = active.filter(_.rule.name == n)
    val high = byName("HighErr")
    assert(high.map(a => a.labels.toMap.apply("job") -> a.state).toMap ==
      Map("a" -> "firing", "b" -> "pending"), high)
    val firing = high.find(_.state == "firing").get
    assert(firing.labels.toMap.apply("alertname") == "HighErr")
    assert(firing.labels.toMap.apply("severity") == "page")
    assert(!firing.labels.toMap.contains("__name__"))
    assert(firing.v == 100.0)
    assert(firing.activeAt == tEnd - 120000L)
    // for=0 rule: both a and b fire instantly, c never
    assert(byName("AnyErr").map(a => a.labels.toMap.apply("job") -> a.state).toMap ==
      Map("a" -> "firing", "b" -> "firing"))
  }

  test("recordAll: recording rule appends renamed series with rule labels") {
    val dest = java.nio.file.Files.createTempDirectory("graft-rules").toString
    val gs = Rules.parse(ruleText)
    val n = Rules.recordAll(mkQuerier, dest, gs, t0, tEnd)
    // one series, step = the group interval (60s default): the 735s
    // span yields 13 grid points, not the data's 50 x 15s samples
    assert(n == Seq("errs:sum" -> 13L), n)
    val back = graft.tsdb.TsStore.read(spark, dest)
      .selectLong(t0, tEnd, Seq(graft.tsdb.LabelMatcher.eq("__name__", "errs:sum")))
      .collect()
    assert(back.length == 13)
    val labels = back.head.getSeq[Row](back.head.fieldIndex("labels"))
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels == Map("__name__" -> "errs:sum", "team" -> "infra"))
    // sum over a,b,c at the first step: 100+10+10
    assert(back.map(_.getDouble(back.head.fieldIndex("v"))).min == 120.0)
  }

  test("/api/v1/rules and /api/v1/alerts endpoints") {
    val gs = Rules.parse(ruleText)
    val server = new graft.remote.RemoteReadServer(mkQuerier,
      rulesSource = Some(() => gs), rulesFile = "rules.yml")
    val port = server.start()
    try {
      val http = HttpClient.newHttpClient()
      def get(pq: String): HttpResponse[String] = http.send(
        HttpRequest.newBuilder(new URI(s"http://127.0.0.1:$port$pq")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val timeSec = tEnd / 1000
      val alerts = get(s"/api/v1/alerts?time=$timeSec")
      assert(alerts.statusCode() == 200, alerts.body())
      val ab = alerts.body()
      assert(ab.contains(""""alertname":"HighErr""""))
      assert(ab.contains(""""state":"firing"""") && ab.contains(""""state":"pending""""))
      assert(ab.contains(""""severity":"page"""") && ab.contains(""""value":"100""""))
      assert(ab.contains(""""summary":"errs is high""""))

      val rules = get(s"/api/v1/rules?time=$timeSec")
      assert(rules.statusCode() == 200, rules.body())
      val rb = rules.body()
      assert(rb.contains(""""name":"errors"""") && rb.contains(""""name":"rollups""""))
      assert(rb.contains(""""type":"recording"""") && rb.contains(""""type":"alerting""""))
      assert(rb.contains(""""state":"firing"""")) // HighErr has a firing instance
      assert(rb.contains(""""duration":120""") && rb.contains(""""interval":30"""))
      assert(rb.contains(""""query":"errs > 50""""))

      // type filter keeps only recording rules (no alert evaluation)
      val rec = get(s"/api/v1/rules?time=$timeSec&type=record").body()
      assert(rec.contains(""""type":"recording"""") && !rec.contains(""""type":"alerting""""))
      assert(get(s"/api/v1/rules?type=bogus").statusCode() == 400)
    } finally server.stop()
  }

  test("streamAll: rule file evaluated continuously over a streaming store") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("rulefile-stream")
    val in = root.resolve("in").toString
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString
    val t0s = 1700000000000L - (1700000000000L % 60000L)
    def write(fromK: Int, untilK: Int): Unit = {
      val rows = (for {
        job <- Seq("api", "web"); k <- fromK until untilK
      } yield Row(Map("__name__" -> "up", "job" -> job),
        t0s + k * 15000L, k.toDouble)).asJava
      spark.createDataFrame(rows, graft.streaming.StreamIngest.inputSchema)
        .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Append).parquet(in)
    }
    val text =
      """groups:
        |  - name: g1
        |    interval: 1m
        |    rules:
        |      - record: up:sum
        |        expr: sum(up)
        |        labels:
        |          team: infra
        |      - alert: UpHigh
        |        expr: sum(up) > 50
        |        for: 2m
        |        labels:
        |          severity: page
        |""".stripMargin
    def run(): Unit = Rules.streamAll(spark, in, store, ckpt, t0s,
      Rules.parse(text), lagMs = 120000L).foreach(_._2.awaitTermination())

    write(0, 100)
    run()
    def series(name: String) = graft.tsdb.TsStore.read(spark, store)
      .selectLong(0L, Long.MaxValue / 2,
        Seq(graft.tsdb.LabelMatcher.eq("__name__", name)))
    // recording: sum(up) at minute m = 8m, m=0..22 closed under 2m lag;
    // rule labels attached
    val rec = series("up:sum").collect()
    assert(rec.length == 23)
    val labels = rec.head.getSeq[Row](rec.head.fieldIndex("labels"))
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(labels == Map("__name__" -> "up:sum", "team" -> "infra"))
    // alert: 8m > 50 from m=7, for=2m fires from m=9; severity attached
    val al = series("UpHigh").collect()
    assert(al.map(_.getLong(al.head.fieldIndex("t"))).sorted.toSeq ==
      (9 to 22).map(m => t0s + m * 60000L))
    val alLabels = al.head.getSeq[Row](al.head.fieldIndex("labels"))
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(alLabels("severity") == "page")
    // resume: markers keep replays exactly-once
    write(100, 140)
    run()
    assert(series("up:sum").collect().map(
      _.getLong(rec.head.fieldIndex("t"))).sorted.toSeq ==
      (0 to 32).map(m => t0s + m * 60000L))
    // duplicate rule names across groups are rejected up front
    intercept[IllegalArgumentException](Rules.streamAll(spark, in, store,
      ckpt, t0s, Rules.parse(
        "groups:\n  - name: a\n    rules:\n      - record: r\n        expr: x\n" +
        "  - name: b\n    rules:\n      - record: r\n        expr: y\n")))
  }

  test("Notifier: firing alerts POST to Alertmanager v2; loop counts") {
    // capture receiver
    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val am = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    am.createContext("/api/v2/alerts", (ex: com.sun.net.httpserver.HttpExchange) => {
      received.put(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    am.start()
    val url = s"http://127.0.0.1:${am.getAddress.getPort}/api/v2/alerts"
    try {
      val gs = Rules.parse(ruleText).take(1)
      val active = Rules.activeAlerts(mkQuerier, gs, tEnd)
      // body carries ONLY firing instances, in the v2 shape
      val b = Notifier.body(active)
      assert(b.contains(""""alertname":"HighErr"""") && b.contains("startsAt"), b)
      assert(!b.contains(""""state""""))
      // HighErr fires for job=a; AnyErr (for=0) fires for a and b -> 3
      assert(Notifier.push(url, active) == 3)
      val got = received.poll(5, java.util.concurrent.TimeUnit.SECONDS)
      assert(got == b)
      // nothing firing -> no POST at all
      assert(Notifier.push(url, active.filterNot(_.state == "firing")) == 0)
      assert(received.poll(300, java.util.concurrent.TimeUnit.MILLISECONDS) == null)
      // loop form: ticks and sends, unreachable target only counts
      val loop = new Notifier.Loop(mkQuerier, () => gs, url, 3600000L,
        now = () => tEnd)
      try {
        val deadline = System.currentTimeMillis() + 15000
        while (loop.ticks.get() == 0 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(loop.ticks.get() >= 1 && loop.sent.get() >= 3)
      } finally loop.close()
      val dead = new Notifier.Loop(mkQuerier, () => gs,
        "http://127.0.0.1:1/api/v2/alerts", 3600000L, now = () => tEnd)
      try {
        val deadline = System.currentTimeMillis() + 15000
        while (dead.failures.get() == 0 && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        assert(dead.failures.get() >= 1 && dead.sent.get() == 0)
      } finally dead.close()
    } finally am.stop(0)
  }
}
