package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** PromQL-flavored operators over the long-form series frame
  * (`labels ARRAY<STRUCT<name,value>>`-canonical or any frame carrying
  * `fingerprint`, `t` (ms), `v`).
  *
  * The reference serves raw samples only — PromQL evaluation happens in
  * the upstream Prometheus server (SURVEY.md §2.4). These operators bring
  * that evaluation INTO the engine, expressed as window functions and
  * grouped aggregations so Catalyst plans them like any other query:
  * per-series windows shuffle once on `fingerprint`; `by`-aggregations
  * shuffle on the grouping labels.
  *
  * Counter semantics follow Prometheus: a decrease in a counter is a
  * reset; `rate`/`increase` add the pre-reset value back before dividing.
  */
object PromOps {
  private def seriesWindow = Window.partitionBy(col("fingerprint")).orderBy(col("t"))

  /** Per-sample instantaneous delta vs previous sample (gauge `delta`). */
  def delta(longForm: DataFrame): DataFrame =
    longForm
      .withColumn("prev_v", lag(col("v"), 1).over(seriesWindow))
      .where(col("prev_v").isNotNull)
      .withColumn("delta", col("v") - col("prev_v"))
      .drop("prev_v")

  /** Counter increase per sample step: negative jumps are resets — the
    * post-reset value IS the increase (Prometheus counter semantics). */
  def counterIncrease(longForm: DataFrame): DataFrame =
    longForm
      .withColumn("prev_v", lag(col("v"), 1).over(seriesWindow))
      .where(col("prev_v").isNotNull)
      .withColumn("increase",
        when(col("v") >= col("prev_v"), col("v") - col("prev_v")).otherwise(col("v")))
      .drop("prev_v")

  /** Per-sample rate: increase / seconds since previous sample. */
  def rate(longForm: DataFrame): DataFrame =
    counterIncrease(
      longForm.withColumn("prev_t", lag(col("t"), 1).over(seriesWindow)))
      .withColumn("rate", col("increase") / ((col("t") - col("prev_t")) / 1000.0d))
      .drop("prev_t")

  /** PromQL `irate()` / `idelta()`: the instantaneous rate/delta taken
    * from the LAST TWO samples of each series in the selected range
    * (Prometheus functions.go `instantValue`). Counter reset between the
    * two samples → the last value alone is the increase; `idelta` keeps
    * the raw (possibly negative) difference. One shuffle on the series
    * fingerprint; emits one row per series with >= 2 samples. Samples
    * sharing a timestamp are ordered by value so both engines agree. */
  def instantRate(longForm: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fingerprint")).orderBy(col("t"), col("v"))
    val wDesc = Window.partitionBy(col("fingerprint"))
      .orderBy(col("t").desc, col("v").desc)
    longForm
      .withColumn("pt", lag(col("t"), 1).over(w))
      .withColumn("pv", lag(col("v"), 1).over(w))
      .withColumn("rn", row_number().over(wDesc))
      .where(col("rn") === 1 && col("pt").isNotNull)
      .withColumn("irate",
        when(col("v") >= col("pv"), col("v") - col("pv")).otherwise(col("v"))
          * 1000.0d / (col("t") - col("pt")))
      .withColumn("idelta", col("v") - col("pv"))
      .drop("pt", "pv", "rn")
  }

  /** `<agg>_over_time(range)` family: per-series sliding range window of
    * `rangeMs` milliseconds ending at each sample. */
  def overTime(longForm: DataFrame, rangeMs: Long): DataFrame = {
    val w = Window.partitionBy(col("fingerprint")).orderBy(col("t"))
      .rangeBetween(-rangeMs, 0)
    longForm
      .withColumn("sum_over_time", sum(col("v")).over(w))
      .withColumn("avg_over_time", avg(col("v")).over(w))
      .withColumn("min_over_time", min(col("v")).over(w))
      .withColumn("max_over_time", max(col("v")).over(w))
      .withColumn("count_over_time", count(col("v")).over(w))
  }

  /** PromQL `sum/avg/min/max/count by (labels...)` at aligned time steps:
    * buckets samples to `stepMs` and aggregates across series per group.
    * (`last` within bucket per series first, then aggregate across
    * series — PromQL's instant-vector semantics at evaluation steps.) */
  def aggregateBy(longForm: DataFrame, byLabels: Seq[String], stepMs: Long,
                  labelValue: (Column, String) => Column): DataFrame = {
    val stepped = longForm
      .withColumn("step_t", col("t") - pmod(col("t"), lit(stepMs)))
    val perSeries = stepped
      .groupBy(col("fingerprint") +: col("step_t") +: byLabels.map(n =>
        labelValue(col("labels"), n).as("by_" + n)): _*)
      .agg(max(struct(col("t"), col("v"))).getField("v").as("v")) // last sample in the step (tie-safe: (t,v) max)
    perSeries
      .groupBy(col("step_t") +: byLabels.map(n => col("by_" + n)): _*)
      .agg(sum(col("v")).as("sum_v"), avg(col("v")).as("avg_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        count(lit(1)).as("n_series"))
  }

  /** topk(k) per group: highest-valued series per (step, group). Ties
    * break on `tieCols` (default: the series fingerprint). */
  def topk(aggregatedPerSeries: DataFrame, k: Int, groupCols: Seq[String],
           orderCol: String, tieCols: Seq[String] = Seq("fingerprint")): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).desc +: tieCols.map(col): _*)
    aggregatedPerSeries.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
  }

  /** bottomk(k): lowest-valued series per group — topk's mirror. */
  def bottomk(aggregatedPerSeries: DataFrame, k: Int, groupCols: Seq[String],
              orderCol: String, tieCols: Seq[String] = Seq("fingerprint")): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol).asc +: tieCols.map(col): _*)
    aggregatedPerSeries.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
  }

  /** PromQL `increase(range)` per sample position: the sum of
    * reset-adjusted per-step increments inside the trailing `rangeMs`
    * window. (PromQL proper extrapolates to the window edges; we define
    * the un-extrapolated sum — the same quantity Prometheus uses before
    * extrapolation — so the result is exactly reproducible.) One shuffle
    * on fingerprint; both window passes share the sort. */
  def increaseOverTime(longForm: DataFrame, rangeMs: Long): DataFrame = {
    val inc = counterIncrease(longForm) // adds `increase` per step, drops first sample
    val w = Window.partitionBy(col("fingerprint")).orderBy(col("t"))
      .rangeBetween(-rangeMs, 0)
    inc.withColumn("increase_over_time", sum(col("increase")).over(w))
  }

  /** PromQL `resets()` and `changes()` over the whole selected range,
    * per series: counts of counter resets (v < prev_v) and of value
    * changes (v <> prev_v). Window pass + one aggregation. */
  def resetsAndChanges(longForm: DataFrame): DataFrame = {
    val stepped = longForm
      .withColumn("prev_v", lag(col("v"), 1).over(seriesWindow))
    stepped.groupBy(col("fingerprint"), col("labels"))
      .agg(
        sum(when(col("prev_v").isNotNull && col("v") < col("prev_v"), 1L)
          .otherwise(0L)).as("resets"),
        sum(when(col("prev_v").isNotNull && col("v") =!= col("prev_v"), 1L)
          .otherwise(0L)).as("changes"),
        count(lit(1)).as("n_samples"))
  }

  /** PromQL binary operation between two instant vectors with
    * `on(labels…)` matching: both sides are bucketed to `stepMs` and
    * reduced to one value per (step, match-labels) — `last` sample per
    * series then `sum` across series, the shape `sum by (l) (m)` produces
    * — then joined one-to-one on (step, match-labels) and combined with
    * `op`. Inner join ≡ PromQL semantics: entries without a match drop
    * out. One shuffle per side on the match key. */
  def binaryOp(left: DataFrame, right: DataFrame, onLabels: Seq[String],
               stepMs: Long, labelValue: (Column, String) => Column,
               op: (Column, Column) => Column): DataFrame = {
    def side(df: DataFrame, out: String): DataFrame = {
      val stepped = df.withColumn("step_t", col("t") - pmod(col("t"), lit(stepMs)))
      stepped
        .groupBy(col("fingerprint") +: col("step_t") +: onLabels.map(n =>
          labelValue(col("labels"), n).as("on_" + n)): _*)
        .agg(max(struct(col("t"), col("v"))).getField("v").as("v"))
        .groupBy(col("step_t") +: onLabels.map(n => col("on_" + n)): _*)
        .agg(sum(col("v")).as(out))
    }
    side(left, "lv").join(side(right, "rv"),
        Seq("step_t") ++ onLabels.map("on_" + _))
      .withColumn("result", op(col("lv"), col("rv")))
  }

  /** PromQL many-to-one binary operation with `group_left` — the
    * `metric / on(l…) group_left sum by (l…)(metric)` shape. The "many"
    * (left) side keeps its FULL per-series identity (fingerprint +
    * labels survive to the output); the "one" (right) side reduces to a
    * single value per (step, on-labels) and is BROADCAST onto every
    * matching left row. Scale shape: the one side is an aggregate over
    * few groups (tiny), so the many side pays only its own per-series
    * step reduction — no shuffle on the match key at all. */
  def binaryOpGroupLeft(left: DataFrame, right: DataFrame, onLabels: Seq[String],
                        stepMs: Long, labelValue: (Column, String) => Column,
                        op: (Column, Column) => Column): DataFrame = {
    def stepped(df: DataFrame) =
      df.withColumn("step_t", col("t") - pmod(col("t"), lit(stepMs)))
    val many = stepped(left)
      .groupBy(col("fingerprint") +: col("labels") +: col("step_t") +:
        onLabels.map(n => labelValue(col("labels"), n).as("on_" + n)): _*)
      .agg(max(struct(col("t"), col("v"))).getField("v").as("lv"))
    val one = stepped(right)
      .groupBy(col("fingerprint") +: col("step_t") +: onLabels.map(n =>
        labelValue(col("labels"), n).as("on_" + n)): _*)
      .agg(max(struct(col("t"), col("v"))).getField("v").as("v"))
      .groupBy(col("step_t") +: onLabels.map(n => col("on_" + n)): _*)
      .agg(sum(col("v")).as("rv"))
    many.join(broadcast(one), Seq("step_t") ++ onLabels.map("on_" + _))
      .withColumn("result", op(col("lv"), col("rv")))
  }

  /** PromQL one-to-many `group_right`: mirror of [[binaryOpGroupLeft]]
    * with the roles swapped — the "many" side is the RIGHT operand (its
    * series identity survives in `labels`/`lv`); `rv` carries the left
    * operand's per-(step, on-labels) aggregate. `op` still receives
    * (left-value, right-value) in operator order. */
  def binaryOpGroupRight(left: DataFrame, right: DataFrame, onLabels: Seq[String],
                         stepMs: Long, labelValue: (Column, String) => Column,
                         op: (Column, Column) => Column): DataFrame =
    binaryOpGroupLeft(right, left, onLabels, stepMs, labelValue,
      (manyV, oneV) => op(oneV, manyV))

  /** PromQL `holt_winters(v[range], sf, tf)` (double exponential
    * smoothing; Prometheus functions.go `funcHoltWinters`): per-series
    * fold in time order with level `s` and trend `b`:
    * seed s=x0, b=x1-x0, then for each subsequent sample
    * s' = sf*x + (1-sf)*(s+b); b' = tf*(s'-s) + (1-tf)*b; emit the final
    * level. Series with < 2 samples emit nothing.
    *
    * Shape: one shuffle on the series key, then a sorted collect + one
    * linear fold per series (the recurrence is inherently sequential —
    * the lambda-HOF fold stays on the executor that owns the series, no
    * further exchange). Samples sharing a timestamp order by value so
    * re-runs and the oracle agree. Prefer exactly-representable sf/tf
    * (0.25, 0.5, ...) when an external engine must reproduce the fold
    * bit-for-bit. */
  def holtWinters(longForm: DataFrame, sf: Double, tf: Double): DataFrame =
    longForm.groupBy(col("fingerprint"), col("labels"))
      .agg(array_sort(collect_list(struct(col("t"), col("v")))).as("xs"))
      .where(size(col("xs")) >= 2)
      .withColumn("smoothed", desSmooth(col("xs"), sf, tf))
      .withColumn("n_samples", size(col("xs")).cast("long"))
      .drop("xs")

  /** The double-exponential-smoothing fold over a SORTED `(t, v)` struct
    * array — shared by [[holtWinters]] and the PromQL evaluator's
    * `double_exponential_smoothing` range function (upstream renamed
    * `holt_winters` in 3.x; both names parse). */
  def desSmooth(xs: Column, sf: Double, tf: Double): Column = {
    val oneMinusSf = 1 - sf
    val oneMinusTf = 1 - tf
    val vs = transform(xs, x => x.getField("v"))
    def sNext(acc: Column, v: Column): Column =
      lit(sf) * v + lit(oneMinusSf) * (acc.getField("s") + acc.getField("b"))
    aggregate(
      slice(vs, lit(2), size(vs) - 1),
      struct(element_at(vs, 1).as("s"),
        (element_at(vs, 2) - element_at(vs, 1)).as("b")),
      (acc, v) => struct(
        sNext(acc, v).as("s"),
        (lit(tf) * (sNext(acc, v) - acc.getField("s"))
          + lit(oneMinusTf) * acc.getField("b")).as("b")),
      acc => acc.getField("s"))
  }

  /** PromQL time functions over an epoch-ms timestamp column (UTC
    * session): minute, hour, day_of_week (0 = Sunday, Prometheus
    * convention), day_of_month, month, year. */
  def timeFunctions(tMs: Column): Column = {
    val ts = timestamp_millis(tMs)
    struct(
      minute(ts).cast("long").as("minute"),
      hour(ts).cast("long").as("hour"),
      (dayofweek(ts) - 1).cast("long").as("day_of_week"),
      dayofmonth(ts).cast("long").as("day_of_month"),
      month(ts).cast("long").as("month"),
      year(ts).cast("long").as("year"))
  }

  /** PromQL `clamp(v, lo, hi)` / `clamp_min` / `clamp_max`. */
  def clamp(v: Column, lo: Double, hi: Double): Column =
    least(greatest(v, lit(lo)), lit(hi))
  def clampMin(v: Column, lo: Double): Column = greatest(v, lit(lo))
  def clampMax(v: Column, hi: Double): Column = least(v, lit(hi))

  /** PromQL `histogram_quantile(q, …)` over cumulative `le` buckets.
    *
    * Input: one row per (groupCols…, le, cum) where `le` is the bucket
    * upper bound (Double.PositiveInfinity for +Inf) and `cum` the
    * cumulative count. Semantics follow Prometheus
    * (`promql/quantile.go` upstream, public): rank = q × total; take the
    * first bucket whose cumulative count reaches rank and interpolate
    * linearly between its bounds; the lowest bucket interpolates from 0;
    * a rank landing in the +Inf bucket returns the largest finite bound.
    *
    * Pure window functions over the tiny bucket frame — the heavy work
    * (building the cumulative counts) is a plain groupBy upstream. */
  def histogramQuantile(buckets: DataFrame, q: Double,
                        groupCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("le"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val ranked = buckets
      .withColumn("prev_le", lag(col("le"), 1).over(w))
      .withColumn("prev_cum", lag(col("cum"), 1).over(w))
      .withColumn("total", max(col("cum")).over(wAll))
      .withColumn("max_finite_le",
        max(when(col("le") =!= Double.PositiveInfinity, col("le"))).over(wAll))
      .withColumn("rank", lit(q) * col("total"))
    // first bucket reaching the rank (ties: lowest le wins via min over the filtered set)
    val hit = ranked.where(col("cum") >= col("rank"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(col("le"))))
      .where(col("rn") === 1)
    hit.select(groupCols.map(col) :+
      when(col("le") === Double.PositiveInfinity, col("max_finite_le"))
        .otherwise(
          coalesce(col("prev_le"), lit(0.0d)) +
            (col("le") - coalesce(col("prev_le"), lit(0.0d))) *
              ((col("rank") - coalesce(col("prev_cum"), lit(0.0d))) /
                (col("cum") - coalesce(col("prev_cum"), lit(0.0d)))))
        .as("quantile"): _*)
  }

  /** PromQL `histogram_fraction(lo, hi, …)` over cumulative `le`
    * buckets: estimated fraction of observations in `[lo, hi]`.
    *
    * Same input shape and interpolation family as [[histogramQuantile]]
    * (this is its inverse): mass is uniform within each bucket, the
    * lowest bucket's lower bound is 0 (unless its upper bound is ≤ 0, in
    * which case the bucket is a point mass at its bound), and — exactly
    * dual to the quantile's "+Inf rank returns the largest finite
    * bound" — the +Inf bucket's mass sits as a point at the largest
    * finite bound. So `fraction(0, quantile(φ)) ≈ φ` and
    * `fraction(-Inf, +Inf) = 1` by construction. Groups with zero
    * observations are dropped (a 0/0 fraction, upstream's NaN).
    *
    * One pass: per-bucket overlap share, one groupBy — no windows beyond
    * the lag/total frame shared with the quantile. */
  def histogramFraction(buckets: DataFrame, lo: Double, hi: Double,
                        groupCols: Seq[String]): DataFrame = {
    // degenerate bounds degrade the way upstream's histogramFraction
    // does (promql/quantile.go): NaN bounds → NaN, inverted bounds → 0
    // — never an eval-time throw (a dashboard typo must not kill the
    // query); zero-observation groups stay NaN (0/0) on both paths
    if (lo.isNaN || hi.isNaN || lo > hi) {
      val v = if (lo.isNaN || hi.isNaN) Double.NaN else 0.0
      return buckets.groupBy(groupCols.map(col): _*)
        .agg(when(max(col("cum")) > 0, lit(v))
          .otherwise(lit(Double.NaN)).as("fraction"))
    }
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("le"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val d = buckets
      .withColumn("prev_cum", coalesce(lag(col("cum"), 1).over(w), lit(0.0d)))
      .withColumn("lower",
        coalesce(lag(col("le"), 1).over(w), least(col("le"), lit(0.0d))))
      .withColumn("total", max(col("cum")).over(wAll))
      .withColumn("max_finite_le",
        max(when(col("le") =!= Double.PositiveInfinity, col("le"))).over(wAll))
      .withColumn("cnt", col("cum") - col("prev_cum"))
    val pointAt = when(col("le") === Double.PositiveInfinity,
        coalesce(col("max_finite_le"), lit(0.0d)))   // +Inf mass: dual of quantile
      .otherwise(col("le"))                           // zero-width bucket
    val overlap = least(lit(hi), col("le")) - greatest(lit(lo), col("lower"))
    val contrib = when(
        col("le") === Double.PositiveInfinity || col("le") === col("lower"),
        when(pointAt.between(lo, hi), col("cnt")).otherwise(lit(0.0d)))
      .otherwise(col("cnt") *
        greatest(overlap, lit(0.0d)) / (col("le") - col("lower")))
    d.where(col("total") > 0)
      .groupBy(groupCols.map(col): _*)
      .agg((sum(contrib) / first(col("total"))).as("fraction"))
  }
}
