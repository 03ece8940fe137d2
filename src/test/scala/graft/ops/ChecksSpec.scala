package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Data-validation suite semantics (the q_checks oracle covers bulk
  * parity on lineitem/orders). */
class ChecksSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private lazy val tbl = Seq(
    (1L, Some(10.0), "a"), (2L, Some(200.0), "b"),
    (3L, None, "a"), (3L, Some(30.0), "zz"))
    .toDF("id", "v", "cat")

  test("row checks: completeness / range / set metrics exact; one agg pass") {
    val rep = Checks.run(tbl, rowChecks = Seq(
      Checks.completeness("v"),
      Checks.inRange("v", 0, 100, minFrac = 0.5),
      Checks.inSet("cat", Seq("a", "b"))))
    val rows = rep.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getBoolean(4)))
    assert(rows.toSet == Set(
      ("completeness", "v", 0.75, false),
      ("in_range", "v", 0.5, true), // null v fails between; 10 & 30 in range
      ("in_set", "cat", 0.75, false)))
    // one partial+final aggregation over the table; the only exchanges
    // are the SinglePartition gather and the 9-row report sort — never
    // a key shuffle of table data
    val plan = rep.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head // AQE repeats the pre-run plan below
    assert(!plan.contains("Exchange hashpartitioning"),
      s"row checks must fold into one aggregation, no key shuffle:\n$plan")
    assert("Exchange SinglePartition".r.findAllIn(plan).length == 1, plan)
  }

  test("uniqueness: exact tuple distinct ratio") {
    val rep = Checks.run(tbl, uniques = Seq(
      Checks.UniqueCheck(Seq("id")),
      Checks.UniqueCheck(Seq("id", "cat"), minRatio = 0.9)))
      .orderBy("column").collect()
    assert(rep(0).getString(1) == "id" && rep(0).getDouble(2) == 0.75)
    assert(!rep(0).getBoolean(4))
    assert(rep(1).getDouble(2) == 1.0 && rep(1).getBoolean(4))
  }

  test("referential integrity: orphans and null FKs both count against") {
    val ref = Seq(1L, 2L).toDF("k")
    val withNull = tbl.withColumn("id",
      when(col("cat") === "zz", lit(null)).otherwise(col("id")))
    val rep = Checks.run(withNull,
      refs = Seq(Checks.RefCheck("id", ref, minFrac = 0.6))).head()
    // ids: 1 ok, 2 ok, 3 orphan, null orphan -> 0.5
    assert(rep.getDouble(2) == 0.5 && !rep.getBoolean(4))
  }

  test("empty table yields null metrics and null pass, not a crash") {
    val rep = Checks.run(tbl.where(lit(false)),
      rowChecks = Seq(Checks.completeness("v")),
      uniques = Seq(Checks.UniqueCheck(Seq("id")))).collect()
    assert(rep.length == 2)
    assert(rep.forall(r => r.isNullAt(2) && r.isNullAt(4)))
  }

  test("empty suite is rejected") {
    intercept[IllegalArgumentException](Checks.run(tbl))
  }

  test("verdict uses the UNROUNDED fraction — display rounding cannot admit bad data") {
    // 2/3 rounds to 0.666667 == the threshold, but the true fraction
    // 0.6666… is below it: the gate must fail even though the printed
    // metric equals the printed threshold (the billion-row analogue:
    // one bad row rounds to metric 1.000000)
    val df = Seq(Some(1.0), Some(2.0), None).toDF("v")
    val r = Checks.run(df,
      rowChecks = Seq(Checks.completeness("v", minFrac = 0.666667))).head()
    assert(r.getAs[Double]("metric") == 0.666667)
    assert(!r.getAs[Boolean]("pass"))
  }
}
