package graft.tsdb

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Exposition-format parse/render semantics on hand lines, the
  * render→parse round-trip over the canonical store form, and the
  * streaming ingest path. */
class ExpositionSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def parse(lines: String*) =
    Exposition.parse(lines.toSeq.toDF("line"), col("line"), lit(999L))
      .collect()
      .map(r => (r.getMap[String, String](0).toMap, r.getLong(1), r.getDouble(2)))

  test("parse: names, labels, escapes, value dialect, optional timestamp") {
    val out = parse(
      "http_requests_total{method=\"post\",code=\"200\"} 1027 1395066363000",
      "metric_no_labels 42.5",
      "esc{v=\"a\\\\b\\\"c\\nd\"} 1 5",
      "trailing_comma{a=\"1\",} 2 7",
      "signs{s=\"x\"} -3.4e-2 -12",
      "weird:name:colons 0.5 8",
      "infs +Inf 1",
      "neginfs -Infinity 2",
      "nans NaN 3")
    assert(out.length == 9)
    assert(out(0)._1 == Map("__name__" -> "http_requests_total",
      "method" -> "post", "code" -> "200") && out(0)._2 == 1395066363000L &&
      out(0)._3 == 1027.0)
    assert(out(1) == (Map("__name__" -> "metric_no_labels"), 999L, 42.5))
    assert(out(2)._1("v") == "a\\b\"c\nd")
    assert(out(3)._1 == Map("__name__" -> "trailing_comma", "a" -> "1"))
    assert(out(4)._2 == -12L && out(4)._3 == -3.4e-2)
    assert(out(5)._1("__name__") == "weird:name:colons")
    assert(out(6)._3.isPosInfinity && out(7)._3.isNegInfinity && out(8)._3.isNaN)
  }

  test("parse: comments, blanks, and malformed lines drop; report counts them") {
    val lines = Seq(
      "# HELP up Whether the target is up.",
      "# TYPE up gauge",
      "",
      "   ",
      "up{job=\"api\"} 1 10",
      "9bad_name 1 2",          // name cannot start with a digit
      "dup{a=\"1\",a=\"2\"} 3", // duplicate label name
      "unclosed{a=\"x 1",       // unterminated quote
      "no_value{a=\"1\"}",      // missing value
      "trailing{a=\"1\"} 2 3 junk",
      "notanumber{a=\"1\"} abc 3")
    val parsed = Exposition.parse(lines.toDF("line"), col("line"), lit(0L)).collect()
    assert(parsed.length == 1)
    val rep = Exposition.parseReport(lines.toDF("line"), col("line")).head()
    assert(rep.getLong(0) == 11 && rep.getLong(1) == 4 &&
      rep.getLong(2) == 1 && rep.getLong(3) == 6,
      s"report ${rep.toSeq}")
  }

  test("OpenMetrics dialect: seconds timestamps, exemplar tails, # EOF") {
    def om(lines: String*) =
      Exposition.parseOpenMetrics(lines.toSeq.toDF("line"), col("line"), lit(999L))
        .collect()
        .map(r => (r.getMap[String, String](0).toMap, r.getLong(1), r.getDouble(2)))
    val out = om(
      "# TYPE acme_http_router_request_seconds summary",
      "acme_http_router_request_seconds_sum{path=\"/api/v1\"} 9036.32 1520879607.789",
      "requests_total 3 1700000000",
      "with_exemplar_total 17 1520879607.789 # {trace_id=\"KOO5S4vxi0o\"} 0.67",
      "exemplar_no_ts_total 8 # {span_id=\"x\"} 1.0 1520879607.789",
      "# EOF")
    assert(out.length == 4)
    assert(out(0)._2 == 1520879607789L && out(0)._3 == 9036.32)
    assert(out(1)._2 == 1700000000000L) // integer seconds scale to ms too
    assert(out(2)._2 == 1520879607789L) // exemplar tail ignored
    assert(out(3)._2 == 999L)           // no ts: scrape default, exemplar ignored
    // the classic dialect must NOT accept the exemplar tail (trailing junk)
    assert(parse(
      "with_exemplar_total 17 1520879607 # {trace_id=\"K\"} 0.67").isEmpty)
    // a NaN seconds timestamp is malformed, not a sample at t=NaN
    assert(om("bad_total 1 NaN").isEmpty)
  }

  test("exemplar parse: labels, value, optional seconds timestamp") {
    def ex(lines: String*) =
      Exposition.parseExemplars(lines.toSeq.toDF("line"), col("line"), lit(999L))
        .collect()
        .map(r => (r.getMap[String, String](0).toMap,
          r.getMap[String, String](1).toMap, r.getDouble(2), r.getLong(3)))
    val out = ex(
      "with_ts_total{job=\"api\"} 17 1520879607.789 # {trace_id=\"KOO5S4vxi0o\"} 0.67 1520879607.5",
      "no_ts_total 8 # {span_id=\"x\"} 1.25",
      "empty_labels_total 3 # {} 2.0 1700000000",
      "plain_total 5 1700000000",   // no exemplar: no row
      "# EOF")
    assert(out.length == 3)
    assert(out(0) == (Map("__name__" -> "with_ts_total", "job" -> "api"),
      Map("trace_id" -> "KOO5S4vxi0o"), 0.67, 1520879607500L))
    assert(out(1) == (Map("__name__" -> "no_ts_total"),
      Map("span_id" -> "x"), 1.25, 999L)) // scrape-time default
    assert(out(2) == (Map("__name__" -> "empty_labels_total"),
      Map.empty[String, String], 2.0, 1700000000000L))
    // malformed exemplars invalidate the line (value required; junk tail)
    assert(ex("bad_total 1 # {a=\"b\"}").isEmpty)
    assert(ex("bad_total 1 # {a=\"b\"} 2.0 1700000000 junk").isEmpty)
    // the sample half still parses through the exemplar-keeping parser:
    // same line count as parseOpenMetrics sees
    val lines = Seq("with_ts_total 1 1700000000", "no_ts 2").toDF("line")
    assert(Exposition.parseOpenMetrics(lines, col("line"), lit(0L)).count() == 2)
  }

  test("metadata parse: HELP/TYPE/UNIT, left-to-right escapes, last-wins") {
    val lines = Seq(
      "# HELP http_requests_total The total\\nnumber of \\\\n requests.",
      "# TYPE http_requests_total counter",
      "# TYPE boiler_pressure_bars gauge",
      "# UNIT boiler_pressure_bars bars",
      "# EOF",                                  // terminator: not metadata
      "# just a comment",                       // plain comment: ignored
      "http_requests_total 5 1700000000000",    // sample: ignored
      "# TYPE http_requests_total gauge")       // duplicate kind: max picks
    val out = Exposition.parseMetadata(lines.toDF("line"), col("line"))
      .orderBy("metric").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(out.length == 2)
    assert(out(0) == ("boiler_pressure_bars", "gauge", "", "bars"))
    // `\\n` is backslash-n (left-to-right), `\n` is a newline
    assert(out(1) == ("http_requests_total", "gauge",
      "The total\nnumber of \\n requests.", ""))
  }

  test("render -> parse round-trips the canonical store form") {
    import org.apache.spark.sql.{Row, SaveMode}
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Row(Map("__name__" -> "up", "job" -> "api", "q" -> "a\"b\\c\nd"),
        1700000000000L, 1.0),
      Row(Map("__name__" -> "lone"), 1700000001000L, Double.PositiveInfinity),
      Row(Map("__name__" -> "tiny", "i" -> "1"), 1700000002000L, 1.25e-9)).asJava
    val long0 = spark.createDataFrame(rows, graft.streaming.StreamIngest.inputSchema)
    val canon = TsSchema.canonicalize(long0)
    val lines = Exposition.render(canon)
    // every rendered line parses back to the exact series + sample
    val back = TsSchema.canonicalize(
      Exposition.parse(lines, col("line"), lit(-1L)))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("fingerprint"), col("t"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(back) == key(canon) && back.count() == 3)
    // timestamps always emitted: the default never kicks in
    assert(back.where(col("t") === -1L).count() == 0)
  }

  test("fuzz: random generated series round-trip; arbitrary junk never throws") {
    val rnd = new scala.util.Random(42)
    def randLabelValue(): String = {
      val chars = "ab \\\"\nüλ}{=,#".toCharArray
      (0 until rnd.nextInt(12)).map(_ => chars(rnd.nextInt(chars.length))).mkString
    }
    // generated canonical series → render → parse → same labels/t/v
    import org.apache.spark.sql.{Row, SaveMode}
    import scala.jdk.CollectionConverters._
    val rows = (1 to 200).map { i =>
      val labels = Map("__name__" -> s"m_$i") ++
        (0 until rnd.nextInt(4)).map(j => s"l$j" -> randLabelValue())
      val v = rnd.nextInt(5) match {
        case 0 => rnd.nextDouble() * 1e12
        case 1 => -rnd.nextDouble() / 1e9
        case 2 => Double.PositiveInfinity
        case 3 => rnd.nextInt(100).toDouble
        case _ => Double.MinPositiveValue
      }
      Row(labels, 1700000000000L + i, v)
    }.asJava
    val canon = TsSchema.canonicalize(
      spark.createDataFrame(rows, graft.streaming.StreamIngest.inputSchema))
    val back = TsSchema.canonicalize(Exposition.parse(
      Exposition.render(canon), col("line"), lit(-1L)))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select(col("fingerprint"), col("t"), col("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(key(back) == key(canon) && back.count() == 200)
    // junk lines: parser returns null (drops), never throws
    val alphabet = "ab{}\"\\=, \t#0.9eE+-\nxyz"
    val junk = (1 to 500).map { _ =>
      (0 until rnd.nextInt(40)).map(_ =>
        alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
    }
    val n = Exposition.parse(junk.toDF("line"), col("line"), lit(0L)).count()
    assert(n >= 0) // the count itself proves no line threw
  }

  test("streaming exposition ingest lands in a queryable store") {
    val root = Files.createTempDirectory("graft-expo")
    val in = root.resolve("in"); Files.createDirectories(in)
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString
    Files.writeString(in.resolve("scrape1.txt"),
      Seq("# TYPE up gauge",
        "up{job=\"api\"} 1 1700000000000",
        "up{job=\"web\"} 0 1700000000000",
        "up{job=\"api\"} 1 1700000015000",
        "garbage &&&",
        "latency_seconds{job=\"api\"} 0.25").mkString("\n"))
    graft.streaming.StreamIngest.expositionIngestStream(
      spark, in.toString, store, ckpt, defaultTsMs = 1700000030000L)
      .awaitTermination()
    val q = TsStore.read(spark, store)
    val s = q.selectStreams(0, Long.MaxValue,
      Seq(LabelMatcher.eq("job", "api"), LabelMatcher.eq(Labels.MetricName, "up")))
      .collect()
    assert(s.length == 1 && s.head.samples.map(_.t).toSeq ==
      Seq(1700000000000L, 1700000015000L))
    // the timestamp-less sample got the default scrape stamp
    val lat = q.selectStreams(0, Long.MaxValue,
      Seq(LabelMatcher.eq(Labels.MetricName, "latency_seconds"))).collect()
    assert(lat.length == 1 && lat.head.samples.head.t == 1700000030000L)
  }
}
