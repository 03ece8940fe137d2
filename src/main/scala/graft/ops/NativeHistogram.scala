package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prometheus NATIVE histograms, minimally: sparse exponential buckets
  * behind the existing classic-bucket `histogram_quantile`.
  *
  * Format facts (public Prometheus data model / exposition docs): at
  * resolution `schema` n ∈ [-4, 8], positive bucket i covers
  * `(2^((i-1)·2^-n), 2^(i·2^-n)]` — consecutive bounds differ by the
  * base `2^(2^-n)` — a zero bucket holds observations with
  * `|v| ≤ zeroThreshold`, and total `count` / `sum` ride along. This
  * module models the positive spectrum + zero bucket (the engine's
  * metric corpus is non-negative; a negative spectrum is the same
  * machinery mirrored) and converts BOTH ways to classic cumulative
  * `le` buckets, so [[PromOps.histogramQuantile]] — and through it the
  * PromQL front-end — serves native-schema data unchanged. Quantile
  * semantics are therefore the CLASSIC ones (linear interpolation from
  * the previous *present* bucket's bound): sparse gaps widen the
  * interpolation interval rather than using the bucket's exact
  * exponential lower bound — the documented cost of "minimal
  * conversion, one quantile code path" (README support matrix).
  *
  * Scale shape: one map-side-combined aggregation per (group, bucket
  * idx) — the shuffle carries at most `groups × occupied buckets`
  * count rows, never observations. Occupied buckets are bounded by the
  * value spectrum: at schema 2 a [2^-10, 2^20] spread is ≤ 120
  * buckets. Bucket rows are a sum-monoid ([[merge]]), so partials
  * stream exactly like the count-min/histogram stores in
  * [[graft.streaming.StreamIngest]].
  *
  * Histogram-frame layout (one row per group):
  * `groupCols…, schema:int, count:long, sum:double, zero_count:long,
  * buckets:array<struct<idx:long,cnt:long>>` (sorted by idx). */
object NativeHistogram {

  /** Native bucket index of a positive observation: the smallest i
    * with `v ≤ 2^(i·2^-schema)`, i.e. `ceil(log2(v) · 2^schema)`.
    * log2 is computed as `ln(v)/ln 2` with the correctly-rounded
    * `ln 2` literal so an external engine (the DuckDB oracle) lands on
    * bit-identical indices. */
  def bucketIdx(v: Column, schema: Int): Column =
    ceil(log(v) / lit(math.log(2.0)) * lit(math.pow(2.0, schema))).cast("long")

  /** Upper bound `2^(idx·2^-schema)` of a native bucket (`2^-schema`
    * is IEEE-exact for |schema| ≤ 8, so the exponent product is the
    * same on every engine). */
  def bucketUpper(idx: Column, schema: Column): Column =
    pow(lit(2.0), idx.cast("double") * pow(lit(2.0), -schema.cast("double")))

  /** Aggregate raw observations into one native histogram per group.
    * Observations ≤ 0 land in the zero bucket (`zeroThreshold` = 0 —
    * the corpus convention here); null values must be filtered by the
    * caller (they are observations of nothing, not zeros). */
  def observe(df: DataFrame, valueCol: Column, schema: Int,
              groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val idx = when(valueCol > 0.0, bucketIdx(valueCol, schema))
    df.select(g :+ idx.as("_idx") :+ valueCol.cast("double").as("_v"): _*)
      .groupBy(g :+ col("_idx"): _*)
      .agg(count(lit(1)).as("_cnt"), sum(col("_v")).as("_sv"))
      .groupBy(g: _*)
      .agg(
        sum(col("_cnt")).as("count"),
        sum(col("_sv")).as("sum"),
        sum(when(col("_idx").isNull, col("_cnt")).otherwise(0L)).as("zero_count"),
        // collect_list drops the nulls the zero bucket leaves behind
        sort_array(collect_list(when(col("_idx").isNotNull,
          struct(col("_idx").as("idx"), col("_cnt").as("cnt"))))).as("buckets"))
      .withColumn("schema", lit(schema))
  }

  private val EmptyBuckets =
    array().cast("array<struct<idx:bigint,cnt:bigint>>")

  /** Merge several histogram rows per group into one — the sum-monoid
    * that makes native histograms shippable as partials (per-executor,
    * per-micro-batch, per-block). Rows merge within their `schema`;
    * mixed resolutions stay separate rows (Prometheus would downscale
    * first — out of minimal scope, and silently merging them would be
    * wrong). */
  def merge(nh: DataFrame, groupCols: Seq[String]): DataFrame = {
    val keys = groupCols :+ "schema"
    val g = keys.map(col)
    val basic = nh.groupBy(g: _*).agg(
      sum(col("count")).as("count"), sum(col("sum")).as("sum"),
      sum(col("zero_count")).as("zero_count"))
    val buckets = nh.select(g :+ explode(col("buckets")).as("b"): _*)
      .groupBy(g :+ col("b.idx").as("idx"): _*)
      .agg(sum(col("b.cnt")).as("cnt"))
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("idx"), col("cnt")))).as("buckets"))
    basic.join(buckets, keys, "left") // explode dropped all-zero-bucket rows
      .withColumn("buckets", coalesce(col("buckets"), EmptyBuckets))
  }

  /** Native → classic: one cumulative `le` row per occupied bucket
    * (upper bound as `le`, zero-bucket mass below the first), an
    * explicit `le = 0` row when the zero bucket is occupied, and the
    * `+Inf` row carrying the total. Input: ONE histogram row per group
    * ([[merge]] first if partials). The output frame is exactly what
    * [[PromOps.histogramQuantile]] consumes. */
  def toClassic(nh: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("b.idx"))
    val pos = nh.select(g :+ col("zero_count") :+ col("schema") :+
        explode(col("buckets")).as("b"): _*)
      .select(g :+ bucketUpper(col("b.idx"), col("schema")).as("le") :+
        (col("zero_count") + sum(col("b.cnt")).over(w)).as("cum"): _*)
    val zero = nh.where(col("zero_count") > 0)
      .select(g :+ lit(0.0).as("le") :+ col("zero_count").as("cum"): _*)
    val inf = nh.select(g :+ lit(Double.PositiveInfinity).as("le") :+
      col("count").as("cum"): _*)
    pos.unionByName(zero).unionByName(inf)
  }

  /** Classic → native: de-cumulate `(le, cum)` buckets, map each finite
    * positive bound onto its native index (an exact power
    * `le = 2^(i·2^-schema)` lands on i; anything else on the covering
    * bucket), fold `le ≤ 0` mass into the zero bucket. The `+Inf`
    * bucket's mass exists only in `count` (no finite bucket can carry
    * it); classic buckets carry no `sum`, so it is null. */
  def fromClassic(buckets: DataFrame, schema: Int,
                  groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("le"))
    val d = buckets
      .withColumn("cnt",
        col("cum") - coalesce(lag(col("cum"), 1).over(w), lit(0L)))
      .withColumn("_idx", when(col("le") > 0.0 &&
        col("le") =!= Double.PositiveInfinity, bucketIdx(col("le"), schema)))
    // totals + zero mass in one pass; +Inf mass reaches `count` only
    val totals = d.groupBy(g: _*).agg(
      max(col("cum")).as("count"),
      sum(when(col("le") <= 0.0, col("cnt")).otherwise(0L)).as("zero_count"))
    // distinct classic bounds may share one covering native bucket
    val bk = d.where(col("_idx").isNotNull)
      .groupBy(g :+ col("_idx").as("idx"): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .groupBy(g: _*)
      .agg(sort_array(collect_list(struct(col("idx"), col("cnt")))).as("buckets"))
    totals.join(bk, groupCols, "left")
      .withColumn("buckets", coalesce(col("buckets"), EmptyBuckets))
      .withColumn("sum", lit(null).cast("double")) // classic carries no sum
      .withColumn("schema", lit(schema))
      .select(g :+ col("schema") :+ col("count") :+ col("sum") :+
        col("zero_count") :+ col("buckets"): _*)
  }

  /** `histogram_quantile(q, native)` — the conversion route: classic
    * cumulative buckets from [[toClassic]], then the one existing
    * quantile implementation. */
  def quantile(nh: DataFrame, q: Double, groupCols: Seq[String]): DataFrame =
    PromOps.histogramQuantile(toClassic(nh, groupCols), q, groupCols)

  /** Native-histogram SERIES for the PromQL engine — Prometheus's
    * "classic view" of native histograms: each (group labels, t)
    * histogram row becomes cumulative `<metric>` bucket samples labeled
    * with `le` at the NATIVE exponential bounds (no precision loss —
    * the bounds are the native ones, not a fixed classic grid). The
    * output is long-form `(labels map, t, v)`, i.e. exactly what
    * [[graft.tsdb.TsSchema.canonicalize]] + [[graft.tsdb.TsQuerier]]
    * serve, so `histogram_quantile(φ, <metric>)` — and any other PromQL
    * over the bucket series — evaluates through the ordinary
    * [[graft.promql.Evaluator]] path with no histogram-specific code in
    * the engine. `le` round-trips double → string → double exactly
    * (Java toString), so the quantile math is bit-identical to
    * [[quantile]]. */
  def toClassicSeries(nh: DataFrame, metric: String, groupLabels: Seq[String],
                      tCol: String, countSumSeries: Boolean = false): DataFrame = {
    val classic = toClassic(nh, groupLabels :+ tCol)
    val leStr = when(col("le") === Double.PositiveInfinity, lit("+Inf"))
      .otherwise(col("le").cast("string"))
    val entries =
      Seq(lit(graft.tsdb.Labels.MetricName), lit(metric)) ++
        groupLabels.flatMap(g => Seq(lit(g), col(g).cast("string"))) ++
        Seq(lit("le"), leStr)
    val buckets = classic.select(map(entries: _*).as("labels"),
      col(tCol).cast("long").as("t"), col("cum").cast("double").as("v"))
    if (!countSumSeries) buckets
    else {
      // the classic-convention companions: `<metric>_count` /
      // `<metric>_sum` series (no `le` label), exact reads of the
      // native row — so `m_sum / m_count` (PromQL average) and every
      // other classic-histogram workflow runs with no engine support
      def flat(name: String, v: Column): DataFrame = {
        val e = Seq(lit(graft.tsdb.Labels.MetricName), lit(name)) ++
          groupLabels.flatMap(g => Seq(lit(g), col(g).cast("string")))
        nh.select(map(e: _*).as("labels"),
          col(tCol).cast("long").as("t"), v.cast("double").as("v"))
      }
      buckets
        .unionByName(flat(metric + "_count", col("count")))
        .unionByName(flat(metric + "_sum", col("sum")))
    }
  }

  private def bucketLower(idx: Column, schema: Column): Column =
    bucketUpper(idx - 1, schema)

  /** The PromQL native-histogram stats family at the operator layer:
    * `histogram_count/sum/avg` are exact reads of the histogram row;
    * `histogram_stddev/stdvar` use the BUCKET-MIDPOINT estimator — each
    * bucket's mass placed at the arithmetic midpoint of its bounds, the
    * zero bucket at 0, moments about the midpoint mean (a documented,
    * self-consistent estimator choice; any bucket-mass estimator is an
    * approximation by construction). One pass over the tiny exploded
    * bucket frame per group. */
  def stats(nh: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val ex = nh.select(g ++ Seq(col("count"), col("sum"), col("zero_count"),
      col("schema"), explode_outer(col("buckets")).as("b")): _*)
    val mid = (bucketLower(col("b.idx"), col("schema")) +
      bucketUpper(col("b.idx"), col("schema"))) / 2
    val mids = ex.select(g ++ Seq(col("count"), col("sum"),
      col("zero_count"), col("b"), mid.as("_mid")): _*)
    // DEVIATION form: Σ cnt·(mid − mean)² (+ the zero bucket's point
    // mass at 0: zero_count·mean²), never E[x²]−E[x]² — the latter's
    // cancellation surfaces a spurious ~1e-6 stddev when all mass sits
    // in one bucket, and the two engines cancel DIFFERENTLY
    val mean = mids.groupBy(g: _*).agg(
        first(col("count")).as("count"), first(col("sum")).as("sum"),
        first(col("zero_count")).as("_z"),
        sum(when(col("b").isNotNull, col("b.cnt") * col("_mid"))
          .otherwise(0.0)).as("_m1"))
      .withColumn("_mean_mid", col("_m1") / col("count"))
    val dev = mids.select(g ++ Seq(col("b"), col("_mid")): _*)
      .join(mean.select(g ++ Seq(col("_mean_mid").as("_mm")): _*), groupCols)
      .groupBy(g: _*).agg(
        sum(when(col("b").isNotNull,
          col("b.cnt") * (col("_mid") - col("_mm")) *
            (col("_mid") - col("_mm"))).otherwise(0.0)).as("_dev2"))
    mean.join(dev, groupCols)
      .withColumn("avg", col("sum") / col("count"))
      .withColumn("stdvar",
        (col("_dev2") + col("_z") * col("_mean_mid") * col("_mean_mid")) /
          col("count"))
      .withColumn("stddev", sqrt(col("stdvar")))
      .select(g ++ Seq(col("count"), col("sum"), col("avg"),
        col("stdvar"), col("stddev")): _*)
  }

  /** `histogram_fraction(lo, hi, native)`: fraction of observations in
    * `[lo, hi]`, assuming (as upstream does) a uniform distribution
    * WITHIN each bucket — a bucket contributes its mass times the
    * overlapped share of its width; the zero bucket is a point mass at
    * 0, counted iff `lo ≤ 0 ≤ hi`. `hi = ∞` covers every finite
    * bucket. */
  def fraction(nh: DataFrame, lo: Double, hi: Double,
               groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    // degenerate bounds degrade as upstream does (promql/quantile.go):
    // NaN bounds → NaN, inverted → 0, empty histogram → NaN — no throw
    if (lo.isNaN || hi.isNaN || lo > hi) {
      val v = if (lo.isNaN || hi.isNaN) Double.NaN else 0.0
      return nh.select(g :+ when(col("count") > 0, lit(v))
        .otherwise(lit(Double.NaN)).as("fraction"): _*)
    }
    val ex = nh.select(g ++ Seq(col("count"), col("zero_count"),
      col("schema"), explode_outer(col("buckets")).as("b")): _*)
    val lower = bucketLower(col("b.idx"), col("schema"))
    val upper = bucketUpper(col("b.idx"), col("schema"))
    val overlap =
      greatest(lit(0.0), least(lit(hi), upper) - greatest(lit(lo), lower)) /
        (upper - lower)
    ex.groupBy(g: _*).agg(
        first(col("count")).as("count"),
        first(col("zero_count")).as("zero_count"),
        sum(when(col("b").isNotNull, col("b.cnt") * overlap)
          .otherwise(0.0)).as("_mass"))
      .select(g :+ ((col("_mass") +
        (if (lo <= 0.0 && hi >= 0.0) col("zero_count") else lit(0L))) /
        col("count")).as("fraction"): _*)
  }
}
