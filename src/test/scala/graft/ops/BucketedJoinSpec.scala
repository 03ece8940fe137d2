package graft.ops

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Co-located joins via bucketing — the storage-layout half of the
  * 100 TB join strategy (broadcast covers small dims, AQE covers skew;
  * bucketing covers repeated BIG-to-BIG joins on a stable key: both
  * sides pre-hashed into the same bucket count on disk, so the join
  * plans with ZERO shuffle exchanges on either side). */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("bucketed fact-to-fact join plans without a shuffle on either side") {
    import spark.implicits._
    val n = 10000
    val facts = (0 until n).map(i => (i.toLong % 500, i.toLong, (i % 97).toDouble))
      .toDF("k", "id", "v")
    val dims = (0 until 500).map(i => (i.toLong, s"name-$i")).toDF("k", "kname")

    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")
    facts.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_facts")
    dims.write.bucketBy(8, "k").sortBy("k").saveAsTable("b_dims")

    // disable broadcast so the join itself must co-locate; disable AQE so
    // the static plan is inspectable (bucketing needs neither to work)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
        .groupBy("kname").agg(sum("v").as("sv"))
      val plan = joined.queryExecution.executedPlan
      val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.isDefined, s"expected a sort-merge join, got:\n$plan")
      // no exchange anywhere below the join: both sides read pre-bucketed
      val shufflesBelowJoin = smj.get.collect { case e: ShuffleExchangeExec => e }
      assert(shufflesBelowJoin.isEmpty,
        s"bucketed join should not shuffle its inputs:\n${smj.get}")
      // and the result is right
      assert(joined.agg(sum("sv")).head().getDouble(0) ==
        (0 until n).map(i => (i % 97).toDouble).sum)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }
}
