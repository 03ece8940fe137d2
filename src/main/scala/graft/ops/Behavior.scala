package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics — ordered-funnel matching and cohort
  * retention, the two queries every event warehouse serves daily.
  *
  * 100 TB shapes: [[funnelStepTimes]] is ONE shuffle on the user key —
  * every chained step is a `min(when(...))` window over the same
  * user partition, so Catalyst stacks consecutive Window operators on
  * a single exchange; the summary collapses to a steps-sized row set.
  * [[retention]] shuffles on user (cohort fit + per-period activity
  * distinct) and then on the period key — all aggregation-key-bounded,
  * nothing quadratic, no self-join over raw events.
  */
object Behavior {

  /** Greedy-earliest funnel chain per user: `s1 = min t` of step-1
    * events; `s_{i+1} = min t` of step-(i+1) events STRICTLY after
    * `s_i` and within `windowMs` of `s1`. Greedy is optimal here —
    * with the window anchored at `s1`, taking the earliest completion
    * of step i only relaxes the constraint on step i+1 — so the depth
    * reached is THE deepest achievable chain, not a heuristic. Returns
    * one row per user: `(user, s1 … sk)` epoch-millis, null where the
    * chain stopped (nulls are suffix-closed by construction). */
  def funnelStepTimes(events: DataFrame, userCol: Column, typeCol: Column,
                      tsCol: Column, steps: Seq[String],
                      windowMs: Long): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(windowMs > 0, "windowMs must be positive")
    val base = events.select(userCol.as("u"), typeCol.as("et"), tsCol.as("t"))
    val chained = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col("et") === step
        else col("et") === step && col("t") > col(s"s$i") &&
          col("t") <= col("s1") + windowMs
      df.withColumn(s"s${i + 1}",
        min(when(cond, col("t"))).over(Window.partitionBy(col("u"))))
    }
    // every row of a user carries identical s_i; max() collapses to one
    val aggs = steps.indices.map(i => max(col(s"s${i + 1}")).as(s"s${i + 1}"))
    chained.groupBy(col("u")).agg(aggs.head, aggs.tail: _*)
  }

  /** Funnel summary: per step `(step, step_name, n_users,
    * conv_from_prev, conv_from_entry)` — users reaching the step, the
    * step-over-step conversion (step 1 converts from the full user
    * base), and conversion from the user base. Rates round to 6. */
  def funnel(events: DataFrame, userCol: Column, typeCol: Column,
             tsCol: Column, steps: Seq[String], windowMs: Long): DataFrame = {
    val times = funnelStepTimes(events, userCol, typeCol, tsCol, steps, windowMs)
    val counts = times.agg(
      count(lit(1)).as("n0"),
      steps.indices.map(i => count(col(s"s${i + 1}")).as(s"n${i + 1}")): _*)
    def rate(num: Column, den: Column) =
      round(when(den === 0, lit(null)).otherwise(num.cast("double") / den), 6)
    counts.select(explode(array(steps.zipWithIndex.map { case (step, i) =>
        struct(lit(i + 1).as("step"), lit(step).as("step_name"),
          col(s"n${i + 1}").as("n_users"),
          rate(col(s"n${i + 1}"), col(s"n$i")).as("conv_from_prev"),
          rate(col(s"n${i + 1}"), col("n0")).as("conv_from_entry"))
      }: _*)).as("r"))
      .select(col("r.step"), col("r.step_name"), col("r.n_users"),
        col("r.conv_from_prev"), col("r.conv_from_entry"))
  }

  /** Cohort retention triangle: users cohort on the period of their
    * FIRST `cohortType` event (period = `floor((t − epochMs) /
    * periodMs)`), and count back as active in offset `0..maxOffset`
    * periods when they have an `activityType` event there. Returns
    * `(cohort_period, offset, n_cohort, n_active, retention)` with the
    * rate rounded to 6. */
  def retention(events: DataFrame, userCol: Column, typeCol: Column,
                tsCol: Column, cohortType: String, activityType: String,
                periodMs: Long, epochMs: Long, maxOffset: Int): DataFrame = {
    require(periodMs > 0 && maxOffset >= 0, "need periodMs > 0, maxOffset >= 0")
    def period(t: Column) = floor((t - epochMs) / periodMs).cast("long")
    val cohort = events.where(typeCol === cohortType)
      .groupBy(userCol.as("u")).agg(min(period(tsCol)).as("cp"))
    val activity = events.where(typeCol === activityType)
      .select(userCol.as("u"), period(tsCol).as("ap")).distinct()
    val sizes = cohort.groupBy(col("cp")).agg(count(lit(1)).as("n_cohort"))
    activity.join(cohort, Seq("u"))
      .where(col("ap") >= col("cp") && col("ap") - col("cp") <= maxOffset)
      .groupBy(col("cp"), (col("ap") - col("cp")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cp"))
      .select(col("cp").as("cohort_period"), col("offset"),
        col("n_cohort"), col("n_active"),
        round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
  }

  /** Gap-based sessionization: per user, events sorted by time belong
    * to the same session while the gap to the previous event is
    * ≤ `gapMs`; a strictly larger gap (or no previous event) starts a
    * new one. Appends `session_idx` — the 1-based ordinal of the
    * session in the user's history — keeping every input column.
    *
    * Deterministic under timestamp ties BY CONSTRUCTION, not by
    * tiebreak: the boundary flag is summed with the default RANGE
    * frame, so all peer rows (equal `tsCol`) read the same cumulative
    * value, and a peer group contributes exactly one boundary flag
    * total regardless of which physical row `lag` anchors outside the
    * group — any SQL engine reproduces the assignment exactly.
    *
    * 100 TB shape: the lag and the running sum share ONE partitioning
    * on the user key, so Catalyst plans a single exchange and computes
    * both in the same sorted pass. */
  def sessionize(events: DataFrame, userCol: Column, tsCol: Column,
                 gapMs: Long): DataFrame = {
    require(gapMs > 0, "gapMs must be positive")
    val byUser = Window.partitionBy(userCol).orderBy(tsCol)
    val prev = lag(tsCol, 1).over(byUser)
    events
      .withColumn("session_new",
        when(prev.isNull || tsCol - prev > gapMs, 1L).otherwise(0L))
      // default frame with ORDER BY = RANGE unbounded..current: ties peer
      .withColumn("session_idx", sum(col("session_new")).over(byUser))
      .drop("session_new")
  }

  /** Per-session summary over [[sessionize]]: `(user, session_idx,
    * start_t, end_t, n_events, n_types, duration_ms)`. The group-by
    * on (user, session) is key-bounded — one exchange past the
    * session-assignment pass, carrying one row per session. */
  def sessionStats(events: DataFrame, userCol: Column, typeCol: Column,
                   tsCol: Column, gapMs: Long): DataFrame =
    sessionize(events, userCol, tsCol, gapMs)
      .groupBy(userCol.as("user"), col("session_idx"))
      .agg(min(tsCol).as("start_t"), max(tsCol).as("end_t"),
        count(lit(1)).as("n_events"),
        countDistinct(typeCol).as("n_types"),
        (max(tsCol) - min(tsCol)).as("duration_ms"))
}
