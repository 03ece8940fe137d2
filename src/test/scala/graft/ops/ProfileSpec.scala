package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("typed extrema, exact cardinality, deterministic mode") {
    val df = Seq((2, Some("b")), (10, Some("a")), (10, Some("a")),
      (7, Some("b")), (7, None)).toDF("n", "s")
    val rows = Profile.profile(df, Seq("n", "s")).orderBy("column").collect()
    val n = rows(0)
    // numeric min is 2 — a lexicographic profile would claim "10"
    assert(n.getAs[String]("min_v") == "2" && n.getAs[String]("max_v") == "10")
    assert(n.getAs[Long]("n_distinct") == 3)
    // mode tie 10↔7 (2 each): larger STRING wins -> "7"
    assert(n.getAs[String]("top_v") == "7" && n.getAs[Long]("top_n") == 2)
    val s = rows(1)
    assert(s.getAs[Long]("n_null") == 1 && s.getAs[Double]("null_frac") == 0.2)
    assert(s.getAs[String]("top_v") == "b" || s.getAs[Long]("top_n") == 2)
  }

  test("all-null column: distinct 0, null mode, frac 1.0") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("n", "s")
    val s = Profile.profile(df, Seq("s")).head()
    assert(s.getAs[Long]("n_distinct") == 0L)
    assert(s.isNullAt(s.fieldIndex("top_v")))
    assert(s.getAs[Double]("null_frac") == 1.0)
  }

  test("empty table: zero rows, null fractions, no crash") {
    val df = Seq((1, "x")).toDF("n", "s").where(lit(false))
    val rows = Profile.profile(df, Seq("n", "s")).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getAs[Long]("n_rows") == 0L &&
      r.isNullAt(r.fieldIndex("null_frac")) && r.getAs[Long]("n_distinct") == 0L))
  }
}
