package graft.promql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tsdb.TsQuerier

/** Prometheus alert rules, batch-evaluated: `alert: ... expr: <expr>
  * for: <d>` fires once the condition has held CONTINUOUSLY for `d`.
  *
  * A comparison expression without `bool` is a filter, so "the
  * condition holds at step t" ≡ "the expression produced a sample at
  * t". Firing therefore reduces to a trailing count over the step
  * grid: a series fires at `t` iff a conditional sample exists at
  * every step in `[t - for, t]`. That count uses the evaluator's own
  * bounded-explode shape — each conditional step serves the `for/step
  * + 1` later steps it can help fire, then one groupBy on (series,
  * step) — rather than a sort-based window: a global alert (empty
  * label set after `sum(...)`) would constant-fold the window's
  * partition spec away and funnel everything through one partition.
  *
  * The upstream server keeps pending/firing state in memory between
  * evaluations; the batch grid IS that state, so backfilled history
  * and steady-state evaluation agree by construction.
  */
object AlertRules {

  /** Steps where `expr` (a PromQL comparison/filter) has held for
    * `forMs` per series. `forMs` must be a multiple of `stepMs` so
    * the trailing window aligns with the grid. Returns `(labels, t,
    * v)` with `v` = the condition's value at the firing step (what an
    * ALERTS consumer joins back for annotations). */
  def firing(querier: TsQuerier, expr: String, mint: Long, maxt: Long,
             stepMs: Long, forMs: Long,
             lookbackMs: Long = 5 * 60 * 1000L): DataFrame = {
    require(forMs >= 0 && forMs % stepMs == 0,
      "for-duration must be a non-negative multiple of the step")
    // evaluate the condition from forMs BEFORE the window so the first
    // requested step can already be past its pending phase
    val cond = PromQL.rangeQuery(querier, expr, mint - forMs, maxt,
      stepMs, lookbackMs)
    val need = forMs / stepMs + 1
    // a holding step at t supports firing at t .. t+for (bounded
    // explode, ≤ need ordinals); a step fires iff all `need` of its
    // trailing steps contributed. max(struct) recovers the firing
    // step's own value (its t is the window max).
    cond
      .withColumn("ft",
        explode(sequence(col("t"), col("t") + forMs, lit(stepMs))))
      .groupBy(col("labels"), col("ft"))
      .agg(count(lit(1)).as("held"),
        max(struct(col("t"), col("v"))).getField("v").as("v"))
      .where(col("held") === need && col("ft").between(mint, maxt))
      .select(col("labels"), col("ft").as("t"), col("v"))
  }
}
