package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.{Files, Path}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** TAR shard ingestion + WebDataset sample regrouping. */
class TarSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def header(name: String, size: Long, typeflag: Char,
                     prefix: String = ""): Array[Byte] = {
    val h = new Array[Byte](512)
    name.getBytes(ISO_8859_1).copyToArray(h, 0)
    "0000644".getBytes(ISO_8859_1).copyToArray(h, 100) // mode
    f"$size%011o".getBytes(ISO_8859_1).copyToArray(h, 124)
    h(135) = ' '
    "00000000000 ".getBytes(ISO_8859_1).copyToArray(h, 136)
    h(156) = typeflag.toByte
    "ustar".getBytes(ISO_8859_1).copyToArray(h, 257)
    "00".getBytes(ISO_8859_1).copyToArray(h, 263)
    if (prefix.nonEmpty) prefix.getBytes(ISO_8859_1).copyToArray(h, 345)
    // checksum: header bytes with the checksum field as spaces
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    val sum = h.map(_ & 0xff).sum
    f"$sum%06o".getBytes(ISO_8859_1).copyToArray(h, 148)
    h(154) = 0; h(155) = ' '
    h
  }

  private def member(name: String, data: Array[Byte],
                     prefix: String = ""): Array[Byte] = {
    val pad = new Array[Byte]((512 - data.length % 512) % 512)
    header(name, data.length.toLong, '0', prefix) ++ data ++ pad
  }

  private def fixture(): Path = {
    val dir = Files.createTempDirectory("graft-tar")
    val s1 = new ByteArrayOutputStream()
    s1.write(member("000000.txt", "caption zero".getBytes(UTF_8)))
    s1.write(member("000000.cls", "7".getBytes(UTF_8)))
    s1.write(member("000001.txt", "caption one".getBytes(UTF_8)))
    s1.write(member("000001.cls", "3".getBytes(UTF_8)))
    s1.write(header("assets/", 0L, '5')) // directory member: skipped
    s1.write(member("000002.txt", "deep caption".getBytes(UTF_8),
      prefix = "deep/path")) // ustar long-path prefix
    s1.write(new Array[Byte](1024)) // end-of-archive
    Files.write(dir.resolve("shard1.tar"), s1.toByteArray)
    val s2 = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(s2)
    gz.write(member("000003.txt", ("x" * 900).getBytes(UTF_8)))
    gz.write(member("000003.cls", "1".getBytes(UTF_8)))
    gz.write(new Array[Byte](1024))
    gz.close()
    Files.write(dir.resolve("shard2.tar.gz"), s2.toByteArray)
    dir
  }

  test("entries: files only, ustar prefixes, gz shards, payload fidelity") {
    val dir = fixture()
    val e = TarReader.entries(spark, dir.toString).collect()
      .map(r => r.getString(1) -> new String(r.getAs[Array[Byte]]("payload"), UTF_8))
      .toMap
    assert(e.size == 7) // all file members; the directory member is gone
    assert(e("000000.txt") == "caption zero" && e("000001.cls") == "3")
    assert(e("deep/path/000002.txt") == "deep caption")
    assert(e("000003.txt") == "x" * 900) // across the 512-block padding, gz
  }

  test("entries: oversized payloads truncate with a flag, stream survives") {
    val dir = fixture()
    val rows = TarReader.entries(spark, dir.toString, maxPayloadBytes = 100)
      .collect().map(r => (r.getString(1), r.getLong(2),
        r.getAs[Array[Byte]]("payload").length, r.getBoolean(4)))
    val big = rows.find(_._1 == "000003.txt").get
    assert(big._4 && big._3 == 100 && big._2 == 900)
    // the truncated member's successor still parses (skip stayed aligned)
    assert(rows.exists(_._1 == "000003.cls"))
  }

  test("TarWriter round-trip: write -> TarReader reads bytes back exactly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tarw").toString
    val rows = Seq(
      ("a.txt", "alpha".getBytes(UTF_8)),
      ("b.bin", Array.tabulate(700)(i => (i * 7).toByte)), // crosses a block
      (("d/" * 60) + "deep.txt", "deep".getBytes(UTF_8))) // ustar prefix split
    val n = TarWriter.write(
      spark.createDataset(rows).toDF("name", "payload").repartition(1),
      dir, gzip = false)
    assert(n == 1)
    val back = TarReader.entries(spark, dir).collect()
      .map(r => r.getString(1) -> r.getAs[Array[Byte]]("payload")).toMap
    assert(back.keySet == rows.map(_._1).toSet)
    rows.foreach { case (k, v) => assert(back(k).sameElements(v), k) }
    // the shard is also readable by the JDK-independent header math:
    // sizes survive and nothing is truncated
    val sizes = TarReader.entries(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    rows.foreach { case (k, v) => assert(sizes(k) == v.length.toLong) }
  }

  test("TarWriter.writeSamples: shard column cuts files, gz, regroup identity") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tarws").toString
    val samples = Seq(
      (0, "s0", Map("txt" -> "t0".getBytes(UTF_8), "cls" -> "9".getBytes(UTF_8))),
      (0, "s1", Map("txt" -> "t1".getBytes(UTF_8))),
      (1, "s2", Map("txt" -> "t2".getBytes(UTF_8), "json" -> "{}".getBytes(UTF_8))))
    val n = TarWriter.writeSamples(
      spark.createDataset(samples).toDF("shard", "key", "parts"),
      dir, gzip = true)
    assert(n == 2) // one shard file per distinct shard value
    val re = TarReader.webdatasetSamples(TarReader.entries(spark, dir))
      .collect().map { r =>
        r.getString(1) -> r.getMap[String, Array[Byte]](2).view
          .mapValues(new String(_, UTF_8)).toMap
      }.toMap
    assert(re == Map(
      "s0" -> Map("txt" -> "t0", "cls" -> "9"),
      "s1" -> Map("txt" -> "t1"),
      "s2" -> Map("txt" -> "t2", "json" -> "{}")))
    // shard integrity: both members of a sample landed in the SAME file
    val byShardFile = TarReader.entries(spark, dir).collect()
      .groupBy(_.getString(0)).values.map(_.map(_.getString(1)).toSet)
    assert(byShardFile.exists(s => s("s0.txt") && s("s0.cls") && s("s1.txt")))
    assert(byShardFile.exists(s => s("s2.txt") && s("s2.json")))
  }

  test("property: mutated shard bytes never throw and never hang") {
    val dir = fixture()
    val shardPath = dir.resolve("shard1.tar")
    val clean = Files.readAllBytes(shardPath)
    val rnd = new scala.util.Random(42)
    val mdir = Files.createTempDirectory("graft-tar-fuzz")
    (0 until 60).foreach { i =>
      val b = clean.clone()
      // flip 1-4 random bytes anywhere (headers, sizes, checksums, data)
      (0 to rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte }
      Files.write(mdir.resolve(f"m$i%03d.tar"), b)
    }
    // truncations at every region boundary flavor
    Seq(100, 511, 512, 600, 1024, clean.length - 1).zipWithIndex.foreach {
      case (n, i) => Files.write(mdir.resolve(s"t$i.tar"), clean.take(n)) }
    // a parse over the whole mutated directory returns SOME rows and
    // throws nothing; payload sizes stay within the cap
    val rows = TarReader.entries(spark, mdir.toString, maxPayloadBytes = 4096)
      .collect()
    assert(rows.forall(_.getAs[Array[Byte]]("payload").length <= 4096))
  }

  test("webdatasetSamples: members regroup into per-key modality maps") {
    val dir = fixture()
    val s = TarReader.webdatasetSamples(TarReader.entries(spark, dir.toString))
      .collect().map { r =>
        val parts = r.getMap[String, Array[Byte]](2)
        r.getString(1) -> ((r.getLong(3),
          parts.keys.toSet, parts.get("txt").map(new String(_, UTF_8))))
      }.toMap
    assert(s("000000") == (2L, Set("txt", "cls"), Some("caption zero")))
    assert(s("000003") == (2L, Set("txt", "cls"), Some("x" * 900)))
    assert(s("deep/path/000002") == (1L, Set("txt"), Some("deep caption")))
  }

  test("webdatasetSamples: duplicate key+ext keeps the LAST member (tar rule)") {
    val dir = Files.createTempDirectory("graft-tardup")
    val s = new ByteArrayOutputStream()
    s.write(member("000000.txt", "first".getBytes(UTF_8)))
    s.write(member("000000.cls", "1".getBytes(UTF_8)))
    s.write(member("000000.txt", "second wins".getBytes(UTF_8)))
    s.write(new Array[Byte](1024))
    Files.write(dir.resolve("dup.tar"), s.toByteArray)
    // legal tar; must regroup last-wins, not trip the EXCEPTION map policy
    val rows = TarReader.webdatasetSamples(
      TarReader.entries(spark, dir.toString)).collect()
    assert(rows.length == 1)
    val r = rows.head
    val parts = r.getMap[String, Array[Byte]](2).view
      .mapValues(new String(_, UTF_8)).toMap
    assert(parts == Map("txt" -> "second wins", "cls" -> "1"))
    assert(r.getLong(3) == 2L) // kept parts, not raw member count
    assert(r.getLong(4) == "second wins".length.toLong + 1L) // kept bytes
  }

  test("sink commit: .inprogress temps are invisible to readers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tarcommit").toString
    val df = Seq(("a.txt", "A".getBytes(UTF_8))).toDF("name", "payload")
    assert(TarWriter.write(df.repartition(1), dir) == 1)
    // a failed attempt's partial file keeps its temp suffix — the
    // extension filter must never match it
    Files.write(java.nio.file.Paths.get(dir, ".junk.tar.7.inprogress"),
      Array[Byte](1, 2, 3))
    val visible = graft.tsdb.BlockIO.listNames(dir).filter(_.endsWith(".tar"))
    assert(visible.size == 1)
    val names = TarReader.entries(spark, dir).collect().map(_.getString(1))
    assert(names.toSeq == Seq("a.txt"))
  }

  test("writeSamples: shard values colliding after sanitization both land") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tarcoll").toString
    // "a/b" and "a:b" sanitize to the same "a_b" — the digest tag must
    // keep their final names distinct (first-commit-wins would
    // otherwise silently drop one whole shard)
    val samples = Seq(
      ("a/b", "s0", Map("txt" -> "left".getBytes(UTF_8))),
      ("a:b", "s1", Map("txt" -> "right".getBytes(UTF_8))))
    val n = TarWriter.writeSamples(
      spark.createDataset(samples).toDF("shard", "key", "parts"), dir)
    assert(n == 2)
    val back = TarReader.entries(spark, dir).collect()
      .map(r => new String(r.getAs[Array[Byte]]("payload"), UTF_8)).toSet
    assert(back == Set("left", "right"))
  }

  test("sink commit: atomic-exclusive publish makes the retry race exactly-once") {
    val dir = Files.createTempDirectory("graft-tarclaim").toString
    val conf = new graft.tsdb.BlockIO.SerConf(
      spark.sparkContext.hadoopConfiguration)
    // first attempt commits; a late retry of the SAME final name must
    // lose even though rename on a local FS would overwrite (the local
    // publish is a hard link, which fails EEXIST atomically)
    assert(SinkCommit.committed(dir, "seg.tar", conf)(_.write(1)))
    assert(!SinkCommit.committed(dir, "seg.tar", conf)(_.write(2)))
    val visible = graft.tsdb.BlockIO.listNames(dir).filter(_.endsWith(".tar"))
    assert(visible == Seq("seg.tar"))
    // the winner's byte survived; the loser's was discarded
    assert(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "seg.tar")).toSeq == Seq(1.toByte))
  }

  test("sink commit: an attempt that dies mid-write never orphans the shard") {
    val dir = Files.createTempDirectory("graft-tarorphan").toString
    val conf = new graft.tsdb.BlockIO.SerConf(
      spark.sparkContext.hadoopConfiguration)
    // simulate an executor death between writing bytes and publishing:
    // the Pending is simply abandoned (no commit, no abort — a crash
    // runs no cleanup). The old marker-file protocol could orphan here;
    // link-as-commit leaves only an invisible .inprogress temp.
    val dead = SinkCommit.start(dir, "seg.tar", conf)
    dead.raw.write(9)
    dead.raw.flush()
    // the retry must still be able to commit
    assert(SinkCommit.committed(dir, "seg.tar", conf)(_.write(1)))
    val visible = graft.tsdb.BlockIO.listNames(dir).filter(_.endsWith(".tar"))
    assert(visible == Seq("seg.tar"))
    assert(Files.readAllBytes(
      java.nio.file.Paths.get(dir, "seg.tar")).toSeq == Seq(1.toByte))
  }

  test("ustar header: 100/155 limits are BYTE limits on the UTF-8 form") {
    // base segment of 60 two-byte codepoints = 120 bytes > 100: reject
    // loudly instead of truncating mid-codepoint
    val bad = "dir/" + ("é" * 60)
    intercept[IllegalArgumentException](TarWriter.header(bad, 1L))
    // a >100-char ASCII name whose split segments fit passes
    val ok = ("p" * 50) + "/" + ("b" * 90)
    assert(TarWriter.header(ok, 1L).length == 512)
  }
}
