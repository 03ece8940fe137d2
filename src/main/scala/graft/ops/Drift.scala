package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between a REFERENCE snapshot and a
  * CURRENT one — the monitor a training pipeline runs on every new
  * crawl/load before mixing it in: has the source mix shifted, did a
  * feature's distribution move, is this month's data the same
  * population as last month's?
  *
  * Metrics (all closed-form over per-category counts, smoothed with
  * add-`alpha` over the UNION of categories so empty cells stay
  * finite and both engines agree exactly):
  *  - PSI (population stability index): Σ (p−q)·ln(p/q). The industry
  *    rule of thumb reads <0.1 as stable, 0.1–0.25 as drifting, >0.25
  *    as shifted.
  *  - Jensen-Shannon divergence: ½KL(p‖m) + ½KL(q‖m), m = ½(p+q) —
  *    bounded in [0, ln 2], symmetric, defined even for disjoint
  *    supports.
  *  - Two-sample chi-square homogeneity statistic: with pooled share
  *    s_i = (ref_i + cur_i)/(N_ref + N_cur), Σ_i (ref_i − N_ref·s_i)²/
  *    (N_ref·s_i) + (cur_i − N_cur·s_i)²/(N_cur·s_i) — no smoothing
  *    needed (pooled counts are positive on the union support), and
  *    identical mixes score exactly 0. df = k − 1.
  *
  * 100 TB shape: each snapshot collapses to one map-side-combined
  * per-category count (≤ |categories| rows); everything after the two
  * aggs — the full-outer join, the term algebra, the summary sum —
  * runs on that bounded frame. Numeric columns drift via fixed-width
  * binning ([[numericDrift]]), so the category count is a parameter,
  * never data-sized. */
object Drift {

  /** Per-category drift terms: `(category, n_ref, n_cur, p_ref, p_cur,
    * psi_term, js_term)` rounded to 6, ordered by category. The
    * summary metrics are the SUMS of these columns — the terms table
    * is the drill-down view of the same computation. */
  def categoricalTerms(ref: DataFrame, cur: DataFrame, catCol: Column,
                       alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha must be positive (keeps empty cells finite)")
    def counts(df: DataFrame, name: String) =
      df.where(catCol.isNotNull)
        .groupBy(catCol.cast("string").as("category"))
        .agg(count(lit(1)).as(name))
    val joined = counts(ref, "n_ref")
      .join(counts(cur, "n_cur"), Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // two scalars + the category count to the driver
    val tot = joined.agg(sum("n_ref"), sum("n_cur"), count(lit(1))).head()
    val (nr, nc, k) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble,
      tot.getLong(2).toDouble)
    val p = (col("n_ref") + alpha) / (nr + alpha * k)
    val q = (col("n_cur") + alpha) / (nc + alpha * k)
    val m = (p + q) / 2
    joined.select(col("category"), col("n_ref"), col("n_cur"),
        round(p, 6).as("p_ref"), round(q, 6).as("p_cur"),
        round((p - q) * (log(p) - log(q)), 6).as("psi_term"),
        round((p * (log(p) - log(m)) + q * (log(q) - log(m))) / 2, 6).as("js_term"))
      .orderBy(col("category"))
  }

  /** Per-category counts of a snapshot — the reference side of the
    * monitor is FIT ONCE from the blessed corpus and persisted as a
    * table; every later comparison (batch or per-micro-batch) joins
    * against it instead of re-counting the reference. */
  def categoryCounts(df: DataFrame, catCol: Column): DataFrame =
    df.where(catCol.isNotNull)
      .groupBy(catCol.cast("string").as("category"))
      .agg(count(lit(1)).as("n"))

  /** One-row drift summary: `(n_categories, n_ref, n_cur, psi, js, chi2)`.
    * Computed from the UNROUNDED term algebra (the terms table rounds
    * for display); the statistics themselves round to 6. */
  def categoricalSummary(ref: DataFrame, cur: DataFrame, catCol: Column,
                         alpha: Double = 0.5): DataFrame =
    summaryFromCounts(categoryCounts(ref, catCol),
      categoryCounts(cur, catCol), alpha)

  /** [[categoricalSummary]] over PRE-FIT `(category, n)` count tables —
    * the amortized/streaming form. */
  def summaryFromCounts(refCounts: DataFrame, curCounts: DataFrame,
                        alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val joined = refCounts.toDF("category", "n_ref")
      .join(curCounts.toDF("category", "n_cur"), Seq("category"), "full_outer")
      .select(coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = joined.agg(sum("n_ref"), sum("n_cur"), count(lit(1))).head()
    val (nr, nc, k) = (tot.getLong(0).toDouble, tot.getLong(1).toDouble,
      tot.getLong(2).toDouble)
    val p = (col("n_ref") + alpha) / (nr + alpha * k)
    val q = (col("n_cur") + alpha) / (nc + alpha * k)
    val m = (p + q) / 2
    // pooled expected counts — positive on the union support by
    // construction, so the chi-square terms need no smoothing
    val s = (col("n_ref") + col("n_cur")) / (nr + nc)
    val eR = lit(nr) * s
    val eC = lit(nc) * s
    joined.agg(
      count(lit(1)).as("n_categories"),
      sum("n_ref").as("n_ref"), sum("n_cur").as("n_cur"),
      round(sum((p - q) * (log(p) - log(q))), 6).as("psi"),
      round(sum(p * (log(p) - log(m)) + q * (log(q) - log(m))) / 2, 6).as("js"),
      round(sum(pow(col("n_ref") - eR, 2) / eR +
        pow(col("n_cur") - eC, 2) / eC), 6).as("chi2"))
  }

  /** Fixed-width binning of a numeric column into `[lo, hi)` with
    * `bins` cells (outliers clamp into the edge bins) — feed the
    * result to the categorical machinery for numeric drift. */
  def bin(c: Column, lo: Double, hi: Double, bins: Int): Column = {
    require(bins >= 2 && hi > lo, "need bins >= 2, hi > lo")
    least(greatest(floor((c - lo) / ((hi - lo) / bins)), lit(0.0)),
      lit(bins - 1.0)).cast("long")
  }

  /** Numeric drift: bin both snapshots and summarize. */
  def numericDrift(ref: DataFrame, cur: DataFrame, valueCol: Column,
                   lo: Double, hi: Double, bins: Int,
                   alpha: Double = 0.5): DataFrame =
    categoricalSummary(
      ref.where(valueCol.isNotNull).select(bin(valueCol, lo, hi, bins).as("b")),
      cur.where(valueCol.isNotNull).select(bin(valueCol, lo, hi, bins).as("b")),
      col("b"), alpha)
}
