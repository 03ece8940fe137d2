package graft.tsdb

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** End-to-end select semantics vs a brute-force in-memory oracle, on the
  * FIXTURES.md §1 seeded corpus (8h span → 4+ two-hour blocks, so every
  * query exercises the multi-block merge path J1/J2). */
class TsQuerierSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  // --- seeded corpus (deterministic, mirrors FIXTURES.md profile) ---
  final case class Series(labels: Map[String, String], samples: Seq[Sample])

  private lazy val corpus: Seq[Series] = {
    val rnd = new scala.util.Random(42)
    val t0 = 1700000000000L
    val http = for {
      job <- Seq("api", "api-canary", "web"); inst <- (0 to 4).map("i-" + _)
      code <- Seq("200", "500")
    } yield Series(
      Map("__name__" -> "http_requests_total", "job" -> job, "instance" -> inst, "code" -> code),
      (0 until 8 * 60 / 5).map(i => Sample(t0 + i * 300000L, rnd.nextInt(1000).toDouble)))
    val temp = for {
      site <- Seq("a", "b"); sensor <- (0 to 2).map("s-" + _)
    } yield Series(
      Map("__name__" -> "temperature_celsius", "site" -> site, "sensor" -> sensor),
      (0 until 8 * 60 / 10).map(i => Sample(t0 + i * 600000L, rnd.nextGaussian() * 10)))
    http ++ temp
  }

  private lazy val store = {
    import scala.jdk.CollectionConverters._
    val rows = corpus.flatMap(s => s.samples.map(x => Row(s.labels, x.t, x.v))).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    TsSchema.canonicalize(spark.createDataFrame(rows, schema))
  }
  private lazy val querier = new TsQuerier(store)

  /** Brute-force oracle: filter corpus in memory. */
  private def oracle(mint: Long, maxt: Long, ms: Seq[LabelMatcher]): Seq[Series] =
    corpus.flatMap { s =>
      val ok = ms.forall(m => m.matches(s.labels.getOrElse(m.name, "")))
      val inRange = s.samples.filter(x => x.t >= mint && x.t <= maxt)
      if (ok && inRange.nonEmpty) Some(Series(s.labels, inRange)) else None
    }

  private def runSelect(mint: Long, maxt: Long, ms: Seq[LabelMatcher]): Seq[Series] =
    querier.selectStreams(mint, maxt, ms).collect().toSeq
      .map(ss => Series(ss.labels, ss.samples))

  private def check(mint: Long, maxt: Long, ms: Seq[LabelMatcher]): Unit = {
    val got = runSelect(mint, maxt, ms)
    val want = oracle(mint, maxt, ms)
    assert(got.map(_.labels).toSet == want.map(_.labels).toSet, "series identity sets differ")
    val wantByLabels = want.map(s => s.labels -> s.samples).toMap
    got.foreach { s =>
      assert(s.samples == wantByLabels(s.labels), s"samples differ for ${s.labels}")
      assert(s.samples == s.samples.sortBy(_.t), "samples not time-ordered")
    }
    // canonical label-set order of the result streams (labels.Compare)
    val gotOrder = got.map(s => Labels.fromMap(s.labels))
    assert(gotOrder == gotOrder.sorted(Labels.ordering), "streams not in canonical label order")
  }

  private val t0 = 1700000000000L
  private val tEnd = t0 + 8 * 3600 * 1000L

  test("equality matcher, full range, multi-block merge") {
    check(t0, tEnd, Seq(LabelMatcher.eq("__name__", "http_requests_total"), LabelMatcher.eq("job", "api")))
  }

  test("anchored regex: job=~'api' must not match api-canary") {
    val got = runSelect(t0, tEnd, Seq(LabelMatcher.re("job", "api")))
    assert(got.nonEmpty && got.forall(_.labels("job") == "api"))
    check(t0, tEnd, Seq(LabelMatcher.re("job", "api.*")))
  }

  test("negation and not-regex") {
    check(t0, tEnd, Seq(LabelMatcher.eq("__name__", "http_requests_total"),
      LabelMatcher.neq("job", "web"), LabelMatcher.notRe("instance", "i-[0-2]")))
  }

  test("RE2 dialect: Java-only constructs rejected, RE2 spellings bridged") {
    // constructs RE2 (and therefore Prometheus) errors on must error
    // here too instead of silently matching
    for (bad <- Seq("(a)\\1", "a(?=b)", "a(?!b)", "(?<=a)b", "(?<!a)b",
        "(?>ab)c", "a*+b", "a++", "ab?+", "a{2,3}+", "(?P<g>a)\\k<g>"))
      assertThrows[IllegalArgumentException](LabelMatcher.re("l", bad))
    // the PromQL surface stays accepted
    for (ok <- Seq("api|web", "i-1[0-9]", "job-.*", "(?i)Api", "a+?b*?",
        "[+*?]", "\\\\d+", "(?:grp)+", "(?P<g>api)-canary", "a\\0b"))
      LabelMatcher.re("l", ok)
    // RE2 named-group spelling executes through the Java bridge
    assert(LabelMatcher.re("l", "(?P<env>api)-canary").matches("api-canary"))
    assert(!LabelMatcher.re("l", "(?P<env>api)-canary").matches("web-canary"))
  }

  test("absent-label matchers: mode='' and site!=''") {
    check(t0, tEnd, Seq(LabelMatcher.eq("__name__", "temperature_celsius"),
      LabelMatcher.absent("job")))
    check(t0, tEnd, Seq(LabelMatcher.neq("site", "")))
    // job="" must include ALL temperature series and NO http series
    val got = runSelect(t0, tEnd, Seq(LabelMatcher.absent("job")))
    assert(got.forall(_.labels("__name__") == "temperature_celsius"))
    assert(got.size == 6)
  }

  test("prefix matcher") {
    check(t0, tEnd, Seq(LabelMatcher.prefix("job", "api")))
  }

  test("time clamps: inside one block, straddling blocks, empty range") {
    check(t0 + 600000, t0 + 3600000, Seq(LabelMatcher.eq("job", "api"))) // inside block 0
    check(t0 + 7000000, t0 + 8000000, Seq(LabelMatcher.eq("job", "api"))) // straddles block boundary (7.2e6)
    assert(runSelect(t0 - 5000, t0 - 1, Seq.empty).isEmpty)
    // inclusive bounds on both ends (querier.go:728-793 semantics)
    val one = runSelect(t0, t0, Seq(LabelMatcher.eq("job", "api")))
    assert(one.nonEmpty && one.forall(_.samples.forall(_.t == t0)))
  }

  test("labelValues: sorted distinct merge across blocks") {
    val jobs = querier.labelValues("job").collect().map(_.getString(0)).toSeq
    assert(jobs == Seq("api", "api-canary", "web"))
    val names = querier.labelNames().collect().map(_.getString(0)).toSeq
    assert(names == Seq("__name__", "code", "instance", "job", "sensor", "site"))
  }

  test("empty matcher set selects everything in range") {
    check(t0, tEnd, Seq.empty)
  }

  test("chunked form: identical results to long form for every matcher type") {
    import scala.jdk.CollectionConverters._
    val rows = corpus.flatMap(s => s.samples.map(x => Row(s.labels, x.t, x.v))).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    val chunked = new TsChunkedQuerier(
      TsChunkedStore.fromLongForm(spark.createDataFrame(rows, schema)))
    val cases = Seq(
      (t0, tEnd, Seq(LabelMatcher.eq("job", "api"))),
      (t0 + 3600000, t0 + 7000000, Seq(LabelMatcher.re("job", "api.*"))),
      (t0, tEnd, Seq(LabelMatcher.absent("job"))),
      (t0 + 100, t0 + 100, Seq.empty[LabelMatcher]))
    cases.foreach { case (mint, maxt, ms) =>
      val long = runSelect(mint, maxt, ms).map(s => (s.labels, s.samples)).toSet
      val chk = chunked.selectStreams(mint, maxt, ms).collect()
        .map(ss => (ss.labels, ss.samples)).toSet
      assert(chk == long, s"chunked != long for $ms")
    }
  }

  test("written store: partition pruning + promoted-label pushdown reach the parquet scan") {
    import scala.jdk.CollectionConverters._
    val rows = corpus.flatMap(s => s.samples.map(x => Row(s.labels, x.t, x.v))).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    val dir = java.nio.file.Files.createTempDirectory("graft-pushdown").resolve("store").toString
    TsStore.write(spark.createDataFrame(rows, schema), dir)
    val q = TsStore.read(spark, dir)
    val executed = q.selectLong(t0, t0 + 3600000L,
      Seq(LabelMatcher.eq("__name__", "http_requests_total"), LabelMatcher.eq("job", "api")))
      .queryExecution.executedPlan
    val scan = executed.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    // P10: partition pruning on block_start reaches the partition filters
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "block_start")),
      s"no block_start partition filter: ${scan.partitionFilters}")
    // P1/P6: promoted label matchers become data filters pushed at the scan
    val dataFilterStr = scan.dataFilters.mkString(";")
    assert(dataFilterStr.contains("l___name__") && dataFilterStr.contains("l_job"),
      s"label pushdown missing: $dataFilterStr")
    // correctness on the written store matches the in-memory path
    val got = q.selectStreams(t0, tEnd, Seq(LabelMatcher.eq("job", "api"))).collect()
      .map(s => (s.labels, s.samples)).toSet
    val want = runSelect(t0, tEnd, Seq(LabelMatcher.eq("job", "api")))
      .map(s => (s.labels, s.samples)).toSet
    assert(got == want)
  }

  test("partition layout: store is 2h-block partitioned, pruning keeps plan to matching blocks") {
    val blocks = store.select(col("block_start")).distinct().collect().map(_.getLong(0)).sorted
    assert(blocks.length >= 4) // 8h span → ≥4 two-hour blocks
    assert(blocks.forall(_ % TsSchema.BlockMs == 0))
    // a 1h query must not read all blocks: check filter reaches the plan
    val plan = querier.selectLong(t0, t0 + 3600000L, Seq.empty)
      .queryExecution.executedPlan.toString
    assert(plan.contains("block_start"), "block_start pruning filter missing from plan")
  }
}
