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

  test("series-bucketed ts store: per-series assembly and self-join plan shuffle-free") {
    import graft.tsdb.{TsSchema, TsStore}
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val t0 = 1700000000000L
    val rows = (for {
      inst <- 0 until 40; k <- 0 until 50
    } yield Row(Map("__name__" -> "up", "instance" -> s"i-$inst"),
      t0 + k * 15000L, (k % 13).toDouble)).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    val longForm = spark.createDataFrame(rows, schema)
    spark.sql("DROP TABLE IF EXISTS b_ts")
    TsStore.writeBucketed(longForm, "b_ts", numBuckets = 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = TsStore.readBucketed(spark, "b_ts")
      // J1/J2 series assembly: groupBy(fingerprint, labels) — the
      // bucket layout (HashPartitioning on fingerprint) must satisfy
      // the aggregation's clustering with ZERO exchanges
      val assembled = q.select(t0, t0 + 3600000L, Seq.empty)
      // (the final orderBy is a range exchange — only the AGG must be
      // exchange-free, so count exchanges below the aggregate instead)
      val aggNode = assembled.queryExecution.executedPlan.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => a
      }.get
      assert(aggNode.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed series assembly must not shuffle:\n$aggNode")
      assert(assembled.count() == 40)
      // series-keyed self-join (the federation/replica shape): both
      // sides read the same bucket layout → no exchange on either side
      val a = spark.table("b_ts").groupBy("fingerprint").count()
      val b = spark.table("b_ts").groupBy("fingerprint")
        .agg(sum(col("v")).as("sv"))
      val joined = a.join(b, "fingerprint")
      val smj = joined.queryExecution.executedPlan.collectFirst {
        case j: SortMergeJoinExec => j
      }
      assert(smj.isDefined, s"expected SMJ:\n${joined.queryExecution.executedPlan}")
      assert(smj.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed self-join must not shuffle:\n${smj.get}")
      assert(joined.count() == 40)
      // results agree with the unbucketed path
      val plain = TsSchema.canonicalize(longForm)
      assert(q.selectLong(t0, t0 + 3600000L, Seq.empty).agg(sum("v")).head().getDouble(0) ==
        plain.where(col("t").between(t0, t0 + 3600000L)).agg(sum("v")).head().getDouble(0))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS b_ts")
    }
  }

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
