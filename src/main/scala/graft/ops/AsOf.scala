package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (temporal) join: for each left row, the latest right row with the
  * same key and `rightTime <= leftTime`.
  *
  * Implemented with the union-and-carry-forward formulation: tag both
  * inputs, union, and take `last(payload, ignoreNulls)` over a window
  * partitioned by key and ordered by (time, tag) — right rows at equal
  * time sort before left rows, matching the inclusive `<=` bound.
  *
  * Scale: exactly ONE shuffle on the join key (the window), regardless of
  * how many right rows precede each left row — no range-join explosion,
  * no per-row subquery. This is the composition path (a) of the custom-
  * operator ladder: existing ops express the semantics, so no custom
  * SparkPlan is needed.
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftKey: Column, rightKey: Column,
           leftTime: Column, rightTime: Column,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      leftKey.as("_k") +: leftTime.as("_t") +: lit(1).as("_isLeft") +:
        (leftCols.map(col) ++ payload.map(p => lit(null).cast(right.schema(p).dataType).as(p))): _*)
    val r = right.select(
      rightKey.as("_k") +: rightTime.as("_t") +: lit(0).as("_isLeft") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ payload.map(col)): _*)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_isLeft")) // right (0) before left (1) at equal t → inclusive <=
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(l.unionByName(r)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.where(col("_isLeft") === 1).drop("_k", "_t", "_isLeft")
  }
}
