package graft.tsdb

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Outbound shipper: closed store partitions → native TSDB blocks,
  * idempotent on markers, round-trippable through ingest. */
class BlockShipperSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val t0 = 1700000000000L - (1700000000000L % TsSchema.BlockMs)

  private def mkStore: String = {
    import scala.jdk.CollectionConverters._
    // 3 full 2h windows, 4 series, 1-minute samples
    val rows = (for {
      job <- Seq("api", "web"); inst <- Seq("i-0", "i-1")
      k <- 0 until (3 * 120)
    } yield Row(Map("__name__" -> "up", "job" -> job, "instance" -> inst),
      t0 + k * 60000L, (k % 13).toDouble)).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    val store = Files.createTempDirectory("shipsrc").resolve("s").toString
    TsSchema.canonicalize(spark.createDataFrame(rows, schema))
      .write.partitionBy("block_start").parquet(store)
    store
  }

  test("ship closed windows, skip open ones, idempotent, DSv2-readable") {
    val store = mkStore
    val blocks = Files.createTempDirectory("shipdst").toString
    assert(TsMaintenance.blocks(store).size == 3)

    // watermark inside window 3: only the first two are closed
    val shippedNow = BlockShipper.shipClosed(spark, store, blocks,
      beforeMs = t0 + 2 * TsSchema.BlockMs + 60000L)
    assert(shippedNow == Seq(t0, t0 + TsSchema.BlockMs))
    // idempotent: nothing new
    assert(BlockShipper.shipClosed(spark, store, blocks,
      beforeMs = t0 + 2 * TsSchema.BlockMs + 60000L).isEmpty)

    // blocks are reference-format and DSv2-readable
    val ds = spark.read.format("graft-tsdb").load(blocks)
    assert(ds.count() == 4L * 2 * 120)
    assert(ds.where(col("job") === "api").count() == 2L * 2 * 120)

    // advancing the watermark ships the last window
    val rest = BlockShipper.shipClosed(spark, store, blocks,
      beforeMs = t0 + 10 * TsSchema.BlockMs)
    assert(rest == Seq(t0 + 2 * TsSchema.BlockMs))
    assert(spark.read.format("graft-tsdb").load(blocks).count() == 4L * 3 * 120)
  }

  test("pending deletions never leak into shipped blocks") {
    val store = mkStore
    val blocks = Files.createTempDirectory("shipdel").toString
    // a PENDING (unmaterialized) deletion: job=api over the first hour
    // of window 1 — shipped blocks are immutable + markered, so a leak
    // here would resurrect the deleted samples forever
    TsDeletions.delete(spark, store, Seq(LabelMatcher.eq("job", "api")),
      t0, t0 + 3600000L - 1)
    BlockShipper.shipClosed(spark, store, blocks, beforeMs = Long.MaxValue / 2)
    val ds = spark.read.format("graft-tsdb").load(blocks)
    // 2 api series lose 60 one-minute samples each
    assert(ds.count() == 4L * 3 * 120 - 2 * 60)
    assert(ds.where(col("job") === "api" && col("t") < t0 + 3600000L)
      .count() == 0)
    // the other series and windows are untouched
    assert(ds.where(col("job") === "web").count() == 2L * 3 * 120)
  }

  test("full cycle: store → shipped blocks → ingest into a second store") {
    val store = mkStore
    val blocks = Files.createTempDirectory("shipcycle").toString
    BlockShipper.shipClosed(spark, store, blocks, beforeMs = Long.MaxValue / 2)
    val store2 = Files.createTempDirectory("shipdest").resolve("s").toString
    val ingested = TsdbBlock.syncDir(spark, blocks, store2)
    assert(ingested.size == 3)
    // byte-for-byte same sample multiset through the whole cycle
    val a = spark.read.parquet(store).select("fingerprint", "t", "v")
      .orderBy("fingerprint", "t").collect().toSeq
    val b = spark.read.parquet(store2).select("fingerprint", "t", "v")
      .orderBy("fingerprint", "t").collect().toSeq
    assert(a == b)
  }
}
