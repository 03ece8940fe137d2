package graft.tsdb

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Store-level deletion workflow: metadata-only delete → masked reads →
  * partition-pruned materialization that clears the log. */
class TsDeletionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def mkStore: String = {
    import scala.jdk.CollectionConverters._
    val t0 = 1700000000000L // 2h-block aligned enough for partitioning
    val rows = (for {
      name <- Seq("click", "error", "purchase"); k <- 0 until 200
    } yield Row(Map("__name__" -> name, "user" -> (k % 7).toString),
      t0 + k * 60000L, k.toDouble)).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    val store = Files.createTempDirectory("delstore").resolve("s").toString
    TsSchema.canonicalize(spark.createDataFrame(rows, schema))
      .write.partitionBy("block_start").parquet(store)
    store
  }

  test("delete → mask → materialize lifecycle") {
    val store = mkStore
    val t0 = 1700000000000L
    val all = spark.read.parquet(store).count()
    assert(all == 600)

    // 1. metadata-only delete: first 50 minutes of 'click'
    TsDeletions.delete(spark, store,
      Seq(LabelMatcher.eq("__name__", "click")), t0, t0 + 49 * 60000L)
    // physical data untouched, masked read hides exactly 50 samples
    assert(spark.read.parquet(store).count() == 600)
    assert(TsDeletions.readMasked(spark, store).count() == 550)

    // 2. second delete with a regex matcher + user constraint
    TsDeletions.delete(spark, store,
      Seq(LabelMatcher.re("__name__", "err.*"), LabelMatcher.eq("user", "0")),
      t0, t0 + 200 * 60000L)
    val masked = TsDeletions.readMasked(spark, store)
    val errUser0 = 200 / 7 + 1 // k % 7 == 0 for k in 0..199
    assert(masked.count() == 550 - errUser0)
    assert(TsDeletions.list(spark, store).map(_.seq) == Seq(0L, 1L))

    // 3. materialize: only overlapping partitions rewritten, log cleared
    val touched = TsDeletions.materialize(spark, store)
    assert(touched.nonEmpty)
    assert(TsDeletions.list(spark, store).isEmpty)
    assert(spark.read.parquet(store).count() == 550 - errUser0)
    // masked read ≡ plain read once materialized
    assert(TsDeletions.readMasked(spark, store).count() == 550 - errUser0)
    // untouched series intact
    assert(spark.read.parquet(store)
      .where(TsSchema.labelValue(col("labels"), "__name__") === "purchase")
      .count() == 200)
  }

  test("empty matcher set is rejected; no-deletion mask is the identity") {
    val store = mkStore
    assertThrows[IllegalArgumentException] {
      TsDeletions.delete(spark, store, Seq.empty, 0L, 1L)
    }
    assert(TsDeletions.readMasked(spark, store).count() == 600)
    assert(TsDeletions.materialize(spark, store).isEmpty)
  }
}
