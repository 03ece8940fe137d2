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
}
