package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for heavy-key workloads.
  *
  * AQE's skew-join splitting handles JOIN skew at runtime; a skewed
  * GROUP BY key still funnels every row of the hot key through one
  * reducer for non-algebraic aggregates. [[saltedAgg]] is the classic
  * two-stage fix: spread each key over `salts` sub-keys, partially
  * aggregate, then combine — the hot key's work lands on `salts`
  * reducers instead of one. For ALGEBRAIC aggregates (sum/count/min/
  * max) Spark's map-side partial aggregation already bounds reducer
  * load; salting matters for the rest (exact distinct sets, collect_*,
  * exact percentiles) and for extreme cardinality skew.
  */
object Skew {

  /** A measure for [[saltedAgg]]: output name, the stage-1 aggregate
    * over input rows, and the stage-2 combiner over stage-1 partials. */
  final case class Measure(name: String, stage1: Column, stage2: Column => Column)

  /** A deterministic salt column in [0, salts): hash of a spreading
    * column (e.g. a unique id) — same input always lands on the same
    * sub-key, keeping the operator reproducible. */
  def saltCol(spread: Column, salts: Int): Column =
    pmod(xxhash64(spread), lit(salts.toLong))

  /** Two-stage salted aggregation: stage 1 groups on (key, salt) —
    * partials are small and spread over `salts` reducers per key —
    * stage 2 combines partials per key. Result is identical to the
    * direct `groupBy(key).agg(...)` whenever each measure's
    * (stage1, stage2) pair is a valid decomposition. */
  def saltedAgg(df: DataFrame, keyCols: Seq[Column], spread: Column, salts: Int,
                measures: Seq[Measure]): DataFrame = {
    val stage1 = df
      .withColumn("__salt", saltCol(spread, salts))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(measures.head.stage1.as(measures.head.name),
        measures.tail.map(m => m.stage1.as(m.name)): _*)
    stage1
      .groupBy(keyCols: _*)
      .agg(measures.head.stage2(col(measures.head.name)).as(measures.head.name),
        measures.tail.map(m => m.stage2(col(m.name)).as(m.name)): _*)
  }
}
