package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def cats(xs: String*) = xs.toDF("c")

  test("identical distributions drift to exactly zero") {
    val a = cats("x", "x", "y")
    val s = Drift.categoricalSummary(a, cats("x", "x", "y"), col("c")).head()
    assert(s.getAs[Double]("psi") == 0.0 && s.getAs[Double]("js") == 0.0 &&
      s.getAs[Double]("chi2") == 0.0)
    // same mix at twice the mass: smoothing weighs the snapshots
    // differently, so the metrics are small but not exactly zero
    val t = Drift.categoricalSummary(a,
      cats("x", "x", "y", "x", "x", "y"), col("c")).head()
    assert(t.getAs[Double]("psi") < 0.01 && t.getAs[Double]("js") < 0.01)
  }

  test("hand-computed PSI/JS on a 2-category shift; disjoint support stays finite") {
    val a = cats("x", "x", "x", "y") // p = (3.5/5, 1.5/5) with alpha .5
    val b = cats("x", "y", "y", "y") // q = (1.5/5, 3.5/5)
    val s = Drift.categoricalSummary(a, b, col("c")).head()
    val p = Seq(3.5 / 5, 1.5 / 5); val q = Seq(1.5 / 5, 3.5 / 5)
    val psi = p.zip(q).map { case (pi, qi) => (pi - qi) * math.log(pi / qi) }.sum
    val js = p.zip(q).map { case (pi, qi) =>
      val m = (pi + qi) / 2
      (pi * math.log(pi / m) + qi * math.log(qi / m)) / 2
    }.sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s.getAs[Double]("psi") == r6(psi))
    assert(s.getAs[Double]("js") == r6(js))
    // disjoint supports: smoothing keeps every metric finite
    val d = Drift.categoricalSummary(cats("a", "a"), cats("b"), col("c")).head()
    assert(!d.getAs[Double]("psi").isNaN && !d.getAs[Double]("psi").isInfinite)
    assert(d.getAs[Double]("js") <= math.log(2) + 1e-9, "JS is bounded by ln 2")
  }

  test("terms drill-down sums to the summary") {
    val a = cats("x", "x", "x", "y", "z")
    val b = cats("x", "y", "y", "z", "z", "z")
    val terms = Drift.categoricalTerms(a, b, col("c")).collect()
    val s = Drift.categoricalSummary(a, b, col("c")).head()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(terms.map(_.getAs[Double]("psi_term")).sum -
      s.getAs[Double]("psi")) < 5e-6)
    assert(r6(terms.map(_.getAs[Double]("n_ref").toString.toDouble).sum) ==
      s.getAs[Long]("n_ref").toDouble)
  }

  test("numeric binning clamps outliers into edge bins") {
    val a = Seq(-5.0, 0.0, 10.0, 99.0).toDF("v")
    val b = Seq(1000.0, 50.0).toDF("v")
    val s = Drift.numericDrift(a, b, col("v"), lo = 0, hi = 100, bins = 10).head()
    // -5 clamps to bin 0, 1000 clamps to bin 9 — nothing dropped
    assert(s.getAs[Long]("n_ref") == 4 && s.getAs[Long]("n_cur") == 2)
    assert(!s.getAs[Double]("chi2").isNaN)
  }
}
