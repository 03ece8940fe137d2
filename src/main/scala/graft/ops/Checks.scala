package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation suite (the Deequ / great-expectations
  * pattern): constraints a pipeline asserts over a table before
  * trusting it downstream — completeness, uniqueness, value ranges,
  * categorical membership, regex shape, referential integrity. Each
  * check yields a measured metric and a pass verdict against its
  * threshold, as ROWS (a validation report is data too: it lands in a
  * table, gets diffed between runs, drives alerts).
  *
  * 100 TB shapes: all row-local checks (completeness / range / set /
  * regex) fold into ONE map-side-combined aggregation over the table —
  * adding a check adds a column, not a pass. Uniqueness is an exact
  * key-tuple distinct (one shuffle, key-bounded output). Referential
  * integrity is a LeftAnti join against the (dimension-sized,
  * broadcast-able) reference keys, counted map-side. Nothing is
  * row-materialized into the report.
  */
object Checks {

  /** A row-local constraint: `frac` = fraction of rows satisfying the
    * predicate among non-null inputs of `col` (completeness uses the
    * predicate `isNotNull` over ALL rows). Passes when
    * `frac >= minFrac`. */
  final case class RowCheck(name: String, column: String, pred: Column,
                            minFrac: Double)

  def completeness(column: String, minFrac: Double = 1.0): RowCheck =
    RowCheck("completeness", column, col(column).isNotNull, minFrac)

  def inRange(column: String, lo: Double, hi: Double,
              minFrac: Double = 1.0): RowCheck =
    RowCheck("in_range", column, col(column).between(lo, hi), minFrac)

  def inSet(column: String, values: Seq[String],
            minFrac: Double = 1.0): RowCheck =
    RowCheck("in_set", column, col(column).isin(values: _*), minFrac)

  def matchesRegex(column: String, re: String,
                   minFrac: Double = 1.0): RowCheck =
    RowCheck("matches_regex", column, col(column).rlike(re), minFrac)

  def nonNegative(column: String, minFrac: Double = 1.0): RowCheck =
    RowCheck("non_negative", column, col(column) >= 0, minFrac)

  /** Uniqueness of a key tuple: metric = distinct keys / rows; passes
    * at `minRatio` (1.0 = a primary key). */
  final case class UniqueCheck(columns: Seq[String], minRatio: Double = 1.0)

  /** Referential integrity: metric = fraction of rows whose `column`
    * exists in `refKeys` (a one-column frame of valid keys); null FKs
    * count as orphans unless the column also has a completeness
    * check relaxing them. `broadcastKeys` is an explicit opt-in for
    * genuinely dimension-sized key sets — by default Catalyst/AQE
    * picks the anti-join strategy from its own size estimates (a
    * fact-sized reference side must shuffle, not build a driver
    * hash relation). */
  final case class RefCheck(column: String, refKeys: DataFrame,
                            minFrac: Double = 1.0,
                            broadcastKeys: Boolean = false)

  /** Evaluate a suite. Report schema:
    * `(check, column, metric, threshold, pass)` — metric rounded to 6,
    * one row per constraint, ordered by (check, column). */
  def run(df: DataFrame, rowChecks: Seq[RowCheck] = Nil,
          uniques: Seq[UniqueCheck] = Nil,
          refs: Seq[RefCheck] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniques.nonEmpty || refs.nonEmpty,
      "empty check suite")
    val spark = df.sparkSession
    val frames = Seq.newBuilder[DataFrame]

    if (rowChecks.nonEmpty) {
      // one aggregation for every row-local check. The VERDICT compares
      // the UNROUNDED fraction — at a billion rows one bad row rounds
      // to metric 1.000000, and a gate that passes on the rounded value
      // would admit it; the reported metric alone is display-rounded
      val aggs = count(lit(1)).as("n_rows") +:
        rowChecks.zipWithIndex.map { case (c, i) =>
          sum(when(c.pred, 1L).otherwise(0L)).as(s"c$i")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      frames += one.select(explode(array(rowChecks.zipWithIndex.map {
          case (c, i) =>
            val frac = when(col("n_rows") === 0, lit(null))
              .otherwise(col(s"c$i").cast("double") / col("n_rows"))
            struct(lit(c.name).as("check"), lit(c.column).as("column"),
              round(frac, 6).as("metric"), lit(c.minFrac).as("threshold"),
              (frac >= c.minFrac).as("pass"))
        }: _*)).as("r")).select(col("r.*"))
    }

    uniques.foreach { u =>
      val m = df.agg(count(lit(1)).as("n"),
          count_distinct(struct(u.columns.map(col): _*)).as("d"))
        .select(when(col("n") === 0, lit(null))
          .otherwise(col("d").cast("double") / col("n")).as("frac"))
      frames += m.select(lit("unique").as("check"),
        lit(u.columns.mkString(",")).as("column"),
        round(col("frac"), 6).as("metric"),
        lit(u.minRatio).as("threshold"), (col("frac") >= u.minRatio).as("pass"))
    }

    if (refs.nonEmpty) {
      // ONE shared row count for every ref denominator, not a scan per check
      val total = df.agg(count(lit(1)).as("n"))
      refs.foreach { r =>
        val keys0 = r.refKeys.toDF("__ref_key").distinct()
        val keys = if (r.broadcastKeys) broadcast(keys0) else keys0
        val orphans = df.select(col(r.column).as("__ref_key"))
          .join(keys, Seq("__ref_key"), "left_anti")
          .agg(count(lit(1)).as("orphans"))
        frames += orphans.crossJoin(total)
          .select(when(col("n") === 0, lit(null))
            .otherwise(lit(1d) - col("orphans").cast("double") / col("n")).as("frac"))
          .select(lit("ref_integrity").as("check"), lit(r.column).as("column"),
            round(col("frac"), 6).as("metric"), lit(r.minFrac).as("threshold"),
            (col("frac") >= r.minFrac).as("pass"))
      }
    }

    frames.result().reduce(_ unionByName _)
      .orderBy(col("check"), col("column"))
  }
}
