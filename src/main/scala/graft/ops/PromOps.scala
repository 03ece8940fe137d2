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
}
