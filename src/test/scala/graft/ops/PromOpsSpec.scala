package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Hand-computed fixtures for the PromQL-flavored operators. Counter
  * semantics (resets) follow Prometheus: a decrease is a reset and the
  * post-reset value is the increase. */
class PromOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  /** One series "a", samples at 1s spacing: 0, 5, 2 (reset), 2, 7. */
  private def counterDF = Seq(
    ("a", 1000L, 0.0), ("a", 2000L, 5.0), ("a", 3000L, 2.0),
    ("a", 4000L, 2.0), ("a", 5000L, 7.0)
  ).toDF("fingerprint", "t", "v").withColumn("labels",
    array(struct(lit("__name__").as("name"), lit("c").as("value"))))

  test("counterIncrease treats decreases as resets") {
    val inc = PromOps.counterIncrease(counterDF)
      .orderBy("t").select("increase").as[Double].collect().toSeq
    assert(inc == Seq(5.0, 2.0, 0.0, 5.0)) // 0→5, 5→2 RESET(=2), 2→2, 2→7
  }

  test("increaseOverTime sums in-window increments only") {
    // 2.5s trailing window at t=5000 covers increments at t=3000,4000,5000
    val iot = PromOps.increaseOverTime(counterDF, rangeMs = 2500L)
      .orderBy("t").select("increase_over_time").as[Double].collect().toSeq
    assert(iot == Seq(5.0, 7.0, 7.0, 7.0)) // windows: {5},{5,2},{5,2,0},{2,0,5}
  }

  test("resetsAndChanges counts resets and value changes") {
    val r = PromOps.resetsAndChanges(counterDF).head()
    assert(r.getAs[Long]("resets") == 1L)   // 5→2
    assert(r.getAs[Long]("changes") == 3L)  // 0→5, 5→2, 2→7 (2→2 is no change)
    assert(r.getAs[Long]("n_samples") == 5L)
  }

  test("bottomk mirrors topk with ascending order") {
    val per = Seq(("m", "s1", 10.0), ("m", "s2", 5.0), ("m", "s3", 7.0))
      .toDF("name", "fingerprint", "sum_v")
    val bot = PromOps.bottomk(per, k = 2, groupCols = Seq("name"), orderCol = "sum_v")
      .orderBy("rnk").select("fingerprint").as[String].collect().toSeq
    assert(bot == Seq("s2", "s3"))
    val top = PromOps.topk(per, k = 2, groupCols = Seq("name"), orderCol = "sum_v")
      .orderBy("rnk").select("fingerprint").as[String].collect().toSeq
    assert(top == Seq("s1", "s3"))
  }

  test("group_left keeps the many side's series; group_right mirrors it") {
    // two series per name over one step; on(__name__) aggregate = sum
    def series(name: String, inst: String, v: Double) = (
      s"$name/$inst".hashCode.toLong, 1000L, v,
      Seq(("__name__", name), ("instance", inst)))
    val df = Seq(
      series("m", "a", 1.0), series("m", "b", 3.0),
      series("n", "a", 10.0), series("n", "b", 30.0)
    ).toDF("fingerprint", "t", "v", "pairs")
      .withColumn("labels",
        expr("transform(pairs, p -> struct(p._1 as name, p._2 as value))"))
    def lv(labels: org.apache.spark.sql.Column, n: String) =
      graft.tsdb.TsSchema.labelValue(labels, n)
    val gl = PromOps.binaryOpGroupLeft(df, df, Seq("__name__"), 1000L, lv,
      (l, r) => l / r)
      .select(lv(col("labels"), "instance").as("inst"),
        col("on___name__").as("name"), col("result"))
      .collect().map(r => (r.getString(1), r.getString(0), r.getDouble(2))).toSet
    // each series' share of its name's total
    assert(gl == Set(("m", "a", 0.25), ("m", "b", 0.75),
      ("n", "a", 0.25), ("n", "b", 0.75)))
    // group_right with op = division: one-side-total / many-side value
    val gr = PromOps.binaryOpGroupRight(df, df, Seq("__name__"), 1000L, lv,
      (l, r) => l / r)
      .select(lv(col("labels"), "instance").as("inst"),
        col("on___name__").as("name"), col("result"))
      .collect().map(r => (r.getString(1), r.getString(0), r.getDouble(2))).toSet
    assert(gr == Set(("m", "a", 4.0), ("m", "b", 4.0 / 3),
      ("n", "a", 4.0), ("n", "b", 4.0 / 3)))
  }

  test("histogramQuantile interpolates within the first reaching bucket") {
    // 10 obs: cum = le0.1→2, le0.5→6, le1.0→9, +Inf→10
    val buckets = Seq(
      ("m", 0.1, 2L), ("m", 0.5, 6L), ("m", 1.0, 9L),
      ("m", Double.PositiveInfinity, 10L)
    ).toDF("name", "le", "cum")
    def q(p: Double): Double =
      PromOps.histogramQuantile(buckets, p, Seq("name"))
        .head().getAs[Double]("quantile")
    // rank 5 → bucket (0.1,0.5]: 0.1 + 0.4*(5-2)/(6-2) = 0.4
    assert(math.abs(q(0.5) - 0.4) < 1e-12)
    // rank 2 → first bucket, interpolate from 0: 0.1*(2/2) = 0.1
    assert(math.abs(q(0.2) - 0.1) < 1e-12)
    // rank 9.5 → +Inf bucket → largest finite bound
    assert(q(0.95) == 1.0)
  }

  test("histogramFraction invariants over random bucket frames") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random cumulative frames: 1-5 finite buckets at irrational-ish
    // bounds (no generated probe can land exactly on one), optional
    // +Inf mass
    val frameGen = for {
      n <- Gen.choose(1, 5)
      les <- Gen.listOfN(n, Gen.choose(1, 9999).map(_ * 0.7001))
      incs <- Gen.listOfN(n, Gen.choose(0L, 50L))
      infExtra <- Gen.choose(0L, 10L)
    } yield {
      val sorted = les.distinct.sorted
      val cums = sorted.indices.map(i => incs.take(i + 1).sum + 1)
      sorted.zip(cums) :+ (Double.PositiveInfinity, cums.last + infExtra)
    }
    def frac(rows: Seq[(Double, Long)], lo: Double, hi: Double): Double =
      PromOps.histogramFraction(
        rows.map { case (le, c) => ("m", le, c) }.toDF("name", "le", "cum"),
        lo, hi, Seq("name")).head().getAs[Double]("fraction")
    val params = Gen.Parameters.default
    (1 to 12).foreach { i =>
      val rows = frameGen.apply(params, Seed(i.toLong)).get
      val maxF = rows.map(_._1).filter(_.isFinite).max
      // everything is covered, and [0, maxFinite] covers it too (the
      // +Inf mass is a point at the largest finite bound)
      assert(math.abs(frac(rows, Double.NegativeInfinity,
        Double.PositiveInfinity) - 1.0) < 1e-9)
      assert(math.abs(frac(rows, 0.0, maxF) - 1.0) < 1e-9)
      // monotone in hi, bounded in [0,1]
      val probes = Seq(maxF * 0.25 + 0.003, maxF * 0.5 + 0.003, maxF * 0.9)
      val fs = probes.map(p => frac(rows, 0.0, p))
      assert(fs.zip(fs.tail).forall { case (a, b) => a <= b + 1e-12 })
      assert(fs.forall(f => f >= -1e-12 && f <= 1 + 1e-12))
      // additive split at a non-bound probe point
      val mid = maxF * 0.37 + 0.001
      assert(math.abs(frac(rows, 0.0, mid) + frac(rows, mid, maxF) -
        frac(rows, 0.0, maxF)) < 1e-9)
    }
  }
}
