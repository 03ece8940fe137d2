package graft.promql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tsdb.TsQuerier

/** Prometheus alert rules, batch-evaluated: `alert: ... expr: <expr>
  * for: <d>` fires once the condition has held CONTINUOUSLY for `d`.
  *
  * A comparison expression without `bool` is a filter, so "the
  * condition holds at step t" ≡ "the expression produced a sample at
  * t". Firing therefore reduces to a per-series trailing count over
  * the step grid: a series fires at `t` iff a conditional sample
  * exists at every step in `[t - for, t]` — one window over the same
  * (series, step) key the evaluator already shuffles on, no joins.
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
    val w = Window.partitionBy(col("labels")).orderBy(col("t"))
      .rangeBetween(-forMs, 0)
    cond.withColumn("held", count(lit(1)).over(w))
      .where(col("held") === need && col("t") >= mint)
      .select(col("labels"), col("t"), col("v"))
  }
}
