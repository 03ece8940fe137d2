package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Native-histogram minimal surface: exponential bucket assignment,
  * monoid merge, both conversions, and the quantile route through the
  * one classic histogram_quantile implementation. */
class NativeHistogramSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def bucketsOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Long, Long)]] =
    df.collect().map { r =>
      r.getString(r.fieldIndex("g")) ->
        r.getSeq[Row](r.fieldIndex("buckets")).map(b => (b.getLong(0), b.getLong(1)))
    }.toMap

  test("observe: exponential bucket indices at schema 0 and 2") {
    // schema 0: base 2, bucket i covers (2^(i-1), 2^i]
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 10.0))
      .toDF("g", "v")
    val nh0 = NativeHistogram.observe(df, col("v"), 0, Seq("g"))
    // 1.0 -> idx 0; 2.0 -> 1; 3.0 -> 2; 4.0 -> 2; 10.0 -> 4
    assert(bucketsOf(nh0)("a") == Seq(0L -> 1L, 1L -> 1L, 2L -> 2L, 4L -> 1L))
    val r0 = nh0.head()
    assert(r0.getLong(r0.fieldIndex("count")) == 5L)
    assert(r0.getDouble(r0.fieldIndex("sum")) == 20.0)
    assert(r0.getLong(r0.fieldIndex("zero_count")) == 0L)

    // schema 2: base 2^(1/4); exact powers of two land on idx 4k
    val nh2 = NativeHistogram.observe(df, col("v"), 2, Seq("g"))
    // log2(3)*4 = 6.339 -> 7; log2(10)*4 = 13.287 -> 14
    assert(bucketsOf(nh2)("a") == Seq(0L -> 1L, 4L -> 1L, 7L -> 1L, 8L -> 1L, 14L -> 1L))
  }

  test("zero bucket: non-positive observations, quantile inside it is 0") {
    val df = Seq(("z", 0.0), ("z", -1.5), ("z", 2.0)).toDF("g", "v")
    val nh = NativeHistogram.observe(df, col("v"), 2, Seq("g"))
    val r = nh.head()
    assert(r.getLong(r.fieldIndex("zero_count")) == 2L)
    assert(r.getLong(r.fieldIndex("count")) == 3L)
    // rank 0.5*3 = 1.5 lands in the zero bucket -> 0.0
    val q = NativeHistogram.quantile(nh, 0.5, Seq("g")).head().getDouble(1)
    assert(q == 0.0)
  }

  test("merge: partial histograms sum to the whole-corpus observe") {
    val all = (1 to 400).map(i => ("m", (i % 97 + 1).toDouble))
    val (p1, p2) = all.splitAt(150)
    val merged = NativeHistogram.merge(
      NativeHistogram.observe(p1.toDF("g", "v"), col("v"), 2, Seq("g"))
        .unionByName(
          NativeHistogram.observe(p2.toDF("g", "v"), col("v"), 2, Seq("g"))),
      Seq("g"))
    val whole = NativeHistogram.observe(all.toDF("g", "v"), col("v"), 2, Seq("g"))
    assert(bucketsOf(merged)("m") == bucketsOf(whole)("m"))
    val (rm, rw) = (merged.head(), whole.head())
    assert(rm.getLong(rm.fieldIndex("count")) == rw.getLong(rw.fieldIndex("count")))
    assert(math.abs(rm.getDouble(rm.fieldIndex("sum")) -
      rw.getDouble(rw.fieldIndex("sum"))) < 1e-9)
  }

  test("round trip: fromClassic(toClassic(nh)) preserves buckets/counts") {
    val df = Seq(("a", 0.5), ("a", 1.0), ("a", 7.0), ("a", 7.0), ("a", 300.0),
      ("a", -2.0), ("b", 42.0)).toDF("g", "v")
    val nh = NativeHistogram.observe(df, col("v"), 2, Seq("g"))
    val rt = NativeHistogram.fromClassic(
      NativeHistogram.toClassic(nh, Seq("g")), 2, Seq("g"))
    assert(bucketsOf(rt) == bucketsOf(nh))
    def cz(d: org.apache.spark.sql.DataFrame) = d.collect().map { r =>
      r.getString(r.fieldIndex("g")) ->
        (r.getLong(r.fieldIndex("count")), r.getLong(r.fieldIndex("zero_count")))
    }.toMap
    assert(cz(rt) == cz(nh))
  }

  test("stats: count/sum/avg exact, stddev from the midpoint estimator") {
    val df = Seq(("a", 1.0), ("a", 4.0), ("a", 4.0), ("a", 16.0), ("a", 0.0))
      .toDF("g", "v")
    val st = NativeHistogram.stats(
      NativeHistogram.observe(df, col("v"), 0, Seq("g")), Seq("g")).head()
    assert(st.getLong(st.fieldIndex("count")) == 5L)
    assert(st.getDouble(st.fieldIndex("sum")) == 25.0)
    assert(st.getDouble(st.fieldIndex("avg")) == 5.0)
    // schema 0 buckets: 1.0 -> idx 0 (bounds (0.5,1], mid 0.75);
    // 4.0 x2 -> idx 2 ((2,4], mid 3); 16.0 -> idx 4 ((8,16], mid 12);
    // zero bucket mass at 0. mean_mid = (0.75 + 6 + 12 + 0)/5 = 3.75
    // m2 = 0.5625 + 18 + 144 = 162.5625; var = 32.5125 - 14.0625 = 18.45
    val stdvar = st.getDouble(st.fieldIndex("stdvar"))
    assert(math.abs(stdvar - 18.45) < 1e-9, s"stdvar=$stdvar")
    assert(math.abs(st.getDouble(st.fieldIndex("stddev")) -
      math.sqrt(18.45)) < 1e-9)
  }

  test("fraction: uniform-within-bucket overlap, zero bucket as point mass") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("a", 4.0), ("a", 16.0), ("a", -1.0))
      .toDF("g", "v")
    val nh = NativeHistogram.observe(df, col("v"), 0, Seq("g"))
    def frac(lo: Double, hi: Double): Double =
      NativeHistogram.fraction(nh, lo, hi, Seq("g")).head().getDouble(1)
    // full line covers everything (zero bucket included)
    assert(frac(-10, Double.PositiveInfinity) == 1.0)
    // [0,0] catches exactly the zero-bucket point mass: 1/5
    assert(frac(0.0, 0.0) == 0.2)
    // (2,4] holds 2 of 5 observations; [2,4] overlaps that bucket fully
    // and nothing else that intersects -> 2/5
    assert(frac(2.0, 4.0) == 0.4)
    // half of bucket (2,4] -> uniform assumption gives half its mass
    assert(frac(3.0, 4.0) == 0.2)
  }

  test("quantile equals the classic computation on equivalent buckets") {
    val vals = (1 to 1000).map(i => ("q", (i % 317 + 1).toDouble))
    val nh = NativeHistogram.observe(vals.toDF("g", "v"), col("v"), 3, Seq("g"))
    val viaNative = NativeHistogram.quantile(nh, 0.9, Seq("g")).head().getDouble(1)
    // classic reference: same le set built by hand from the same indices
    val classic = PromOps.histogramQuantile(
      NativeHistogram.toClassic(nh, Seq("g")), 0.9, Seq("g")).head().getDouble(1)
    assert(viaNative == classic)
    // sanity: the 90th percentile of 1..317 uniform-ish sits near 285
    assert(viaNative > 200 && viaNative < 330, s"q90=$viaNative")
  }
}
