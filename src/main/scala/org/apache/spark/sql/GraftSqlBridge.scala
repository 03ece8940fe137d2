package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` conversion helpers — the standard pattern
  * for third-party Catalyst extensions that need to wrap a custom
  * `Expression` as a user-facing `Column` (Spark 4 moved `Column` to a
  * ColumnNode facade; `classic.ExpressionUtils` does the conversion). */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Fully convert a Column (including casts, UDF application, lambdas)
    * into a concrete Catalyst expression tree — what a
    * SparkSessionExtensions `injectFunction` builder must return
    * (`ExpressionUtils.expression` leaves a lazy ColumnNode facade that
    * the analyzer never visits in that context). */
  def toCatalyst(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap an analyzed `LogicalPlan` back into a `DataFrame` — what a
    * plan-level cache needs to rebuild the sub-plan it keys on
    * (`Dataset.ofRows` is `private[sql]`). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Never-reused session identity (`sessionUUID` is `private[sql]`) —
    * the right key for per-session caches, where an identity hash can
    * collide after GC. */
  def sessionUUID(s: SparkSession): String =
    s.asInstanceOf[classic.SparkSession].sessionUUID

  /** ACTUAL accumulated bytes of a persisted DataFrame's materialized
    * in-memory relation — the `CachedRDDBuilder.sizeInBytesStats`
    * accumulator the executors fill as cached batches are built. 0 while
    * the cache entry exists but no partition has materialized yet, and 0
    * for a frame that is not cached at all. This is storage truth (what
    * the BlockManagers actually hold), not a plan-stats estimate — the
    * right currency for a byte-budgeted cache tier. */
  def persistedBytes(df: DataFrame): Long =
    df.asInstanceOf[classic.Dataset[_]].sparkSession.sharedState.cacheManager
      .lookupCachedData(df.asInstanceOf[classic.Dataset[_]]) match {
      case scala.Some(cd) =>
        val b = cd.cachedRepresentation.cacheBuilder
        if (b.isCachedColumnBuffersLoaded) b.sizeInBytesStats.value else 0L
      case _ => 0L
    }
}
