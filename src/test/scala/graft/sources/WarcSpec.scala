package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** WARC ingest: streaming record parse (plain + per-record-gzip
  * multi-member files, the Common Crawl layout), HTTP header lift,
  * payload truncation, and the records → html-documents bridge. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def warcRecord(typ: String, uri: String, body: Array[Byte],
                         ct: String): Array[Byte] = {
    val head = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append(s"WARC-Type: $typ\r\n")
      .append(s"WARC-Record-ID: <urn:uuid:$typ-${body.length}>\r\n")
      .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
    if (uri.nonEmpty) head.append(s"WARC-Target-URI: $uri\r\n")
    head.append(s"Content-Type: $ct\r\n")
      .append(s"Content-Length: ${body.length}\r\n\r\n")
    head.toString.getBytes(ISO_8859_1) ++ body ++
      "\r\n\r\n".getBytes(ISO_8859_1)
  }

  private def httpResponse(html: String,
                           mime: String = "text/html; charset=utf-8"): Array[Byte] = {
    val body = html.getBytes(UTF_8)
    (s"HTTP/1.1 200 OK\r\nContent-Type: $mime\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1) ++ body
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private val htmlA =
    "<html><head><title> Page A </title><script>var x = '<p>no</p>';" +
      "</script></head><body><h1>Alpha &amp; Beta</h1><p>real text</p>" +
      "<a href=\"https://ex.com/a?utm_source=t&b=2&a=1\">link</a></body></html>"
  private val htmlB =
    "<html><title>B</title><body><!-- hidden -->Bravo body</body></html>"

  private def fixture(): Path = {
    val dir = Files.createTempDirectory("graft-warc")
    // plain file: warcinfo + response + request
    val plain =
      warcRecord("warcinfo", "", "software: graft-test\r\n".getBytes(ISO_8859_1),
        "application/warc-fields") ++
      warcRecord("response", "https://ex.com/a", httpResponse(htmlA),
        "application/http; msgtype=response") ++
      warcRecord("request", "https://ex.com/a",
        ("GET /a HTTP/1.1\r\nHost: ex.com\r\n\r\n").getBytes(ISO_8859_1),
        "application/http; msgtype=request")
    Files.write(dir.resolve("a.warc"), plain)
    // gzip file: TWO members, one per record — the Common Crawl layout;
    // GZIPInputStream must cross the member boundary
    val g = gz(warcRecord("response", "https://ex.com/b", httpResponse(htmlB),
      "application/http; msgtype=response")) ++
      gz(warcRecord("response", "https://ex.com/c",
        httpResponse("<html><body>" + ("c" * 500) + "</body></html>"),
        "application/http; msgtype=response"))
    Files.write(dir.resolve("b.warc.gz"), g)
    dir
  }

  test("records: parse plain + multi-member gzip, lift HTTP headers") {
    val dir = fixture()
    val recs = WarcReader.records(spark, dir.toString).collect()
      .map(r => (r.getString(0).split('/').last, r.getString(2),
        r.getString(3), r.getInt(7), r.getString(8),
        new String(r.getAs[Array[Byte]]("payload"), UTF_8),
        r.getBoolean(11)))
    assert(recs.length == 5)
    val byUri = recs.filter(_._2 == "response").map(r => r._3 -> r).toMap
    assert(byUri.keySet == Set("https://ex.com/a", "https://ex.com/b",
      "https://ex.com/c"))
    // HTTP headers lifted, payload is the BODY only
    val a = byUri("https://ex.com/a")
    assert(a._4 == 200 && a._5 == "text/html; charset=utf-8")
    assert(a._6 == htmlA && !a._7)
    // both gzip members surfaced
    assert(byUri("https://ex.com/b")._6 == htmlB)
    assert(byUri("https://ex.com/c")._6.contains("c" * 500))
    // non-HTTP records keep their raw block
    val info = recs.find(_._2 == "warcinfo").get
    assert(info._6.startsWith("software: graft-test") && info._4 == 0)
  }

  test("records: oversized payloads truncate with a flag, stream survives") {
    val dir = fixture()
    val recs = WarcReader.records(spark, dir.toString, maxPayloadBytes = 120)
      .collect().map(r => (r.getString(3),
        r.getAs[Array[Byte]]("payload").length, r.getLong(10), r.getBoolean(11)))
    // the 500-char body exceeds the cap: kept bytes < full length, flagged
    val c = recs.find(_._1 == "https://ex.com/c").get
    assert(c._4 && c._2 < c._3 && c._3 > 500)
    // later records in the same file still parse (skip path consumed the rest)
    assert(recs.count(_._1.nonEmpty) >= 3)
  }

  test("writer round-trip: responses and WET conversions re-read exactly") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val docs = (0 until 200).map(i =>
      (s"https://ex.com/w/$i", s"<html><title>w$i</title><body>page $i body</body></html>"))
      .toDF("url", "payload")
    // response segments: write (4 tasks), read back through the reader
    val respDir = Files.createTempDirectory("graft-warcw-resp").toString
    val nResp = WarcWriter.write(docs.repartition(4), respDir)
    assert(nResp == 4)
    val rt = WarcReader.htmlDocuments(WarcReader.records(spark, respDir))
      .select(col("url"), col("html")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rt.size == 200)
    (0 until 200).foreach { i =>
      assert(rt(s"https://ex.com/w/$i") ==
        s"<html><title>w$i</title><body>page $i body</body></html>")
    }
    // WET conversion segments: extracted text round-trips bare
    val wetDir = Files.createTempDirectory("graft-warcw-wet").toString
    val wet = docs.select(col("url"),
      graft.ops.WebText.htmlToText(col("payload")).as("text"))
    WarcWriter.writeConversions(wet.repartition(2), wetDir)
    val back = WarcReader.textDocuments(WarcReader.records(spark, wetDir))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(back.size == 200)
    assert(back("https://ex.com/w/7") == "w7 page 7 body")
    // uncompressed segments parse identically
    val plainDir = Files.createTempDirectory("graft-warcw-plain").toString
    WarcWriter.write(docs.limit(5).repartition(1), plainDir, gzip = false)
    assert(WarcReader.records(spark, plainDir).count() == 5)
  }

  test("htmlDocuments: responses → (url, text, title) via WebText") {
    val dir = fixture()
    val docs = WarcReader.htmlDocuments(WarcReader.records(spark, dir.toString))
      .collect().map(r => r.getAs[String]("url") ->
        (r.getAs[String]("text"), r.getAs[String]("title"))).toMap
    assert(docs.size == 3)
    // script content dropped, entities decoded, whitespace collapsed
    assert(docs("https://ex.com/a")._1 == "Page A Alpha & Beta real text link")
    assert(docs("https://ex.com/a")._2 == "Page A")
    // comments dropped
    assert(docs("https://ex.com/b")._1 == "B Bravo body")
  }

  test("malformed Content-Length stops the file, never fails the task") {
    val dir = Files.createTempDirectory("graft-warc-cl")
    val good = warcRecord("response", "https://ok.com/1",
      httpResponse("<html>ok</html>"), "application/http; msgtype=response")
    // once framing is garbled the rest of the byte stream is unframeable:
    // the parser must stop the FILE (like trailing garbage), not throw
    val broken = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "Content-Length: 12abc\r\n\r\n").getBytes(ISO_8859_1) ++
      "hello world!".getBytes(UTF_8) ++ "\r\n\r\n".getBytes(ISO_8859_1)
    val after = warcRecord("resource", "https://ok.com/2",
      "tail".getBytes(UTF_8), "text/plain")
    Files.write(dir.resolve("seg.warc"), good ++ broken ++ after)
    // negative and empty values take the same stop-the-file path
    Files.write(dir.resolve("neg.warc"),
      ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: -4\r\n\r\n")
        .getBytes(ISO_8859_1) ++ after)
    val uris = WarcReader.records(spark, dir.toString).collect()
      .map(_.getString(3))
    assert(uris.toSeq == Seq("https://ok.com/1"))
  }

  test("fuzz battery: mutated/truncated/torn segments never throw") {
    val dir = fixture()
    val clean = Files.readAllBytes(dir.resolve("a.warc"))
    val cleanGz = Files.readAllBytes(dir.resolve("b.warc.gz"))
    val rnd = new scala.util.Random(1311)
    val mdir = Files.createTempDirectory("graft-warc-fuzz")
    // random byte flips anywhere: version lines, headers, lengths, payloads
    (0 until 60).foreach { i =>
      val b = clean.clone()
      (0 to rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
      Files.write(mdir.resolve(f"m$i%03d.warc"), b)
    }
    // truncations: mid-version-line, mid-header, mid-payload, mid-separator
    Seq(3, 20, 80, clean.length / 2, clean.length - 2).zipWithIndex.foreach {
      case (n, i) => Files.write(mdir.resolve(s"t$i.warc"), clean.take(n)) }
    // torn header: cut inside the header block, then splice a fresh record
    val cut = clean.toSeq.indexOfSlice(
      "Content-Length".getBytes(ISO_8859_1).toSeq)
    Files.write(mdir.resolve("torn.warc"),
      clean.take(cut + 5) ++ warcRecord("resource", "https://ex.com/spliced",
        "x".getBytes(UTF_8), "text/plain"))
    // gzip corruption mid-member: earlier members still parse, no throw
    (0 until 20).foreach { i =>
      val b = cleanGz.clone()
      b(cleanGz.length / 2 + rnd.nextInt(cleanGz.length / 2 - 1)) =
        rnd.nextInt(256).toByte
      Files.write(mdir.resolve(f"g$i%03d.warc.gz"), b)
    }
    Seq(10, cleanGz.length / 2).zipWithIndex.foreach { case (n, i) =>
      Files.write(mdir.resolve(s"gt$i.warc.gz"), cleanGz.take(n)) }
    val rows = WarcReader.records(spark, mdir.toString,
      maxPayloadBytes = 4096).collect()
    // parse survives the whole directory; kept payloads respect the cap
    assert(rows.forall(_.getAs[Array[Byte]]("payload").length <= 4096))
    // untouched prefixes still yield records (the battery isn't vacuous)
    assert(rows.nonEmpty)
  }
}
