package graft.tsdb

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import scala.jdk.CollectionConverters._

class TsMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def mkStore(nAppends: Int): String = {
    val store = Files.createTempDirectory("graft-maint").resolve("store").toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    // nAppends small appends → nAppends files per touched partition
    (0 until nAppends).foreach { a =>
      val rows = (0 until 50).map(k => Row(
        Map("__name__" -> "up", "job" -> s"j$a"),
        1700000000000L + k * 60000L + (k % 3) * TsSchema.BlockMs * 3, // 4 blocks
        k.toDouble)).asJava
      TsSchema.canonicalize(spark.createDataFrame(rows, schema))
        .write.partitionBy("block_start").mode("append").parquet(store)
    }
    store
  }

  test("compact rewrites over-fragmented partitions, preserving data") {
    val store = mkStore(nAppends = 10)
    val before = spark.read.parquet(store)
    val beforeRows = before.orderBy("t", "fingerprint").collect().toSeq
    val fragmented = TsMaintenance.blocks(store).count { b =>
      Files.list(Paths.get(store, s"block_start=$b")).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet")) > 8
    }
    assert(fragmented > 0, "fixture should be fragmented")

    val compacted = TsMaintenance.compact(spark, store, maxFilesPerBlock = 8, targetFiles = 1)
    assert(compacted.nonEmpty)
    compacted.foreach { b =>
      val n = Files.list(Paths.get(store, s"block_start=$b")).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
      assert(n == 1, s"block $b still has $n files")
    }
    val afterRows = spark.read.parquet(store).orderBy("t", "fingerprint").collect().toSeq
    assert(afterRows == beforeRows, "compaction changed data")
    // idempotent: nothing left to compact
    assert(TsMaintenance.compact(spark, store, 8, 1).isEmpty)
  }

  test("retention drops whole old partitions only") {
    val store = mkStore(nAppends = 2)
    val all = TsMaintenance.blocks(store)
    assert(all.size >= 2)
    val cutoff = all(1) + TsSchema.BlockMs // keep from the 2nd block onward
    val dropped = TsMaintenance.applyRetention(spark, store, cutoff)
    assert(dropped == all.filter(_ + TsSchema.BlockMs <= cutoff))
    assert(TsMaintenance.blocks(store) == all.diff(dropped))
    // remaining data still queryable
    val q = TsStore.read(spark, store)
    assert(q.selectLong(0, Long.MaxValue, Seq.empty).count() > 0)
  }
}
