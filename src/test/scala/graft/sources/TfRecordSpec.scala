package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** TFRecord framing: round-trips, gz shards, CRC gates. */
class TfRecordSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("round-trip: payload fidelity, record order within shard, gz") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tfr").toString
    val payloads = (0 until 3000).map(i =>
      Array.tabulate(i % 200)(j => (i * 31 + j).toByte))
    val df = payloads.map(Tuple1(_)).toDF("payload")
    assert(TfRecordIO.write(df.repartition(3), dir) == 3)
    assert(TfRecordIO.write(df.repartition(2), dir, gzip = true) == 2)
    val back = TfRecordIO.records(spark, dir)
    assert(back.count() == 6000) // both writes read together
    assert(back.where(!col("length_crc_ok") || !col("data_crc_ok")).count() == 0)
    // content identity (each payload appears exactly twice now)
    val masses = back
      .groupBy(md5(col("payload")).as("d")).count()
      .collect().map(_.getLong(1))
    assert(masses.forall(_ % 2 == 0))
    // per-shard record order is the write order (idx strictly grows)
    val bad = back.selectExpr("shard", "idx")
      .groupBy(col("shard"))
      .agg(max(col("idx")).as("mx"), count(lit(1)).as("n"))
      .where(col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
  }

  test("a flipped payload byte is reported; a corrupt length stops the shard") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tfr-bad").toString
    val df = (0 until 50).map(i => Tuple1(s"record body $i".getBytes("UTF-8")))
      .toDF("payload")
    TfRecordIO.write(df.repartition(1), dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val bytes = Files.readAllBytes(file.toPath)
    // flip one byte inside record 0's PAYLOAD (offset 12 = after the
    // 8-byte length + 4-byte length-crc): data crc flags, framing holds
    val flipped = bytes.clone()
    flipped(13) = (flipped(13) ^ 0x01).toByte
    val d2 = Files.createTempDirectory("graft-tfr-bad2").toString
    Files.write(Paths.get(d2, "a.tfrecord"), flipped)
    val r = TfRecordIO.records(spark, d2)
    assert(r.count() == 50) // every record still framed
    val badRows = r.where(!col("data_crc_ok"))
      .select(col("idx")).collect().map(_.getLong(0)).toSeq
    assert(badRows == Seq(0L))
    // corrupt the LENGTH field of record 1: the shard stops after the
    // valid prefix instead of misframing garbage
    val lenOff = 12 + "record body 0".length + 4
    val broken = bytes.clone()
    broken(lenOff) = (broken(lenOff) ^ 0x40).toByte
    val d3 = Files.createTempDirectory("graft-tfr-bad3").toString
    Files.write(Paths.get(d3, "a.tfrecord"), broken)
    assert(TfRecordIO.records(spark, d3).count() == 1)
  }
}
