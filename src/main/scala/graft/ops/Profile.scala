package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the survey a pipeline runs BEFORE writing
  * [[Checks]] constraints: per column, row/null counts, exact distinct
  * cardinality, typed min/max, and the modal value. One report row per
  * column; the report is data (land it, diff it between loads, alert
  * on drift).
  *
  * 100 TB shape: typed min/max and null counts for ALL columns fold
  * into ONE map-side-combined aggregation (a single pass, one scalar
  * row). Cardinality and the mode need per-(column, value) counts: the
  * table melts to `(column, value)` pairs — |columns| rows per input
  * row, all map-side — and aggregates by (column, value), bounded by
  * the summed column cardinalities after the map-side combine. The
  * final per-column rollup and the mode window run over that bounded
  * aggregate, never the raw table. For columns known to be
  * quasi-unique (ids), profile them via [[Checks.UniqueCheck]] instead
  * — a mode over a unique column is meaningless and its candidate set
  * is table-sized. */
object Profile {

  /** Profile `columns` of `df`. Report row: `(column, n_rows, n_null,
    * null_frac, n_distinct, min_v, max_v, top_v, top_n)` — min/max are
    * computed on the NATIVE type (numeric order for numbers) and cast
    * to string for the uniform report schema; `top_v` is the modal
    * value with ties broken toward the larger string (deterministic in
    * any engine); all-null columns profile to distinct 0 and null
    * mode. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "no columns to profile")
    // pass 1: one aggregation — counts + typed extrema per column
    val aggs = count(lit(1)).as("n_rows") +: columns.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val base = one.select(explode(array(columns.map { c =>
        struct(lit(c).as("column"), col("n_rows"),
          col(s"__null_$c").as("n_null"),
          round(when(col("n_rows") === 0, lit(null))
            .otherwise(col(s"__null_$c").cast("double") / col("n_rows")), 6)
            .as("null_frac"),
          col(s"__min_$c").as("min_v"), col(s"__max_$c").as("max_v"))
      }: _*)).as("r")).select(col("r.*"))

    // pass 2: melt → (column, value) counts → cardinality + mode
    val melted = df.select(explode(array(columns.map { c =>
        struct(lit(c).as("column"), col(c).cast("string").as("v"))
      }: _*)).as("r"))
      .select(col("r.*")).where(col("v").isNotNull)
    val vc = melted.groupBy(col("column"), col("v"))
      .agg(count(lit(1)).as("cnt"))
    val perCol = vc.groupBy(col("column"))
      .agg(count(lit(1)).as("n_distinct"),
        max(struct(col("cnt"), col("v"))).as("top"))
      .select(col("column"), col("n_distinct"),
        col("top.v").as("top_v"), col("top.cnt").as("top_n"))

    base.join(perCol, Seq("column"), "left")
      .select(col("column"), col("n_rows"), col("n_null"), col("null_frac"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_v"), col("max_v"), col("top_v"), col("top_n"))
      .orderBy(col("column"))
  }
}
