package graft.tsdb

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The `shipper` subcommand lifecycle (`main.go:47-77`): initial ship
  * of pre-existing closed windows, ticker-driven ships as the horizon
  * advances, and the graceful-shutdown final ship. */
class ShipperDaemonSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val t0 = 1700000000000L - (1700000000000L % TsSchema.BlockMs)

  private def mkStore: String = {
    import scala.jdk.CollectionConverters._
    val rows = (for {
      inst <- Seq("i-0", "i-1")
      k <- 0 until (3 * 120)
    } yield Row(Map("__name__" -> "up", "instance" -> inst),
      t0 + k * 60000L, (k % 13).toDouble)).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    val store = Files.createTempDirectory("shipd-src").resolve("s").toString
    TsSchema.canonicalize(spark.createDataFrame(rows, schema))
      .write.partitionBy("block_start").parquet(store)
    store
  }

  private def await(deadlineMs: Long = 30000L)(cond: => Boolean): Boolean = {
    val v0 = System.nanoTime()
    while (!cond && (System.nanoTime() - v0) / 1e6 < deadlineMs) Thread.sleep(50)
    cond
  }

  test("initial ship, horizon-advance tick ship, and final ship on close") {
    val store = mkStore
    val blocks = Files.createTempDirectory("shipd-dst").toString
    // injectable clock: starts inside window 2 (only window 1 closed)
    val clock = new AtomicLong(t0 + TsSchema.BlockMs + 60000L)
    val h = ShipperDaemon.start(spark, store, blocks, tickMs = 200L,
      now = () => clock.get())
    try {
      // initial pass ships the pre-existing closed window
      assert(await()(h.shippedBlocks.get() == 1L), "initial ship timed out")
      assert(BlockShipper.shipped(blocks) == Set(t0))
      // advance the horizon past window 2: the next tick ships it
      clock.set(t0 + 2 * TsSchema.BlockMs + 60000L)
      assert(await()(h.shippedBlocks.get() == 2L), "tick ship timed out")
      assert(BlockShipper.shipped(blocks) == Set(t0, t0 + TsSchema.BlockMs))
      // advance past window 3, then close WITHOUT waiting for a tick:
      // the graceful-shutdown final ship must pick it up
      clock.set(t0 + 10 * TsSchema.BlockMs)
    } finally h.close()
    assert(BlockShipper.shipped(blocks).size == 3,
      "close() must run the final ship (closeShipper parity)")
    assert(h.errors.get() == 0L)
    // the shipped corpus round-trips through the DSv2 reader
    assert(spark.read.format("graft-tsdb").load(blocks).count() == 2L * 3 * 120)
  }
}
