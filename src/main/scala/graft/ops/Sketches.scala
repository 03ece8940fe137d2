package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic cardinality sketching.
  *
  * Spark's built-in `approx_count_distinct` (HLL++) is
  * implementation-specific — its estimates can't be cross-checked by
  * another engine. The KMV (k-minimum-values / bottom-k) sketch over the
  * md5 hash space IS cross-checkable: the k smallest hashes of a set are
  * a pure function of the data, so the estimate
  * `(k-1) / F(h_k)` (with `F` the k-th smallest hash scaled to [0,1))
  * is bit-reproducible by DuckDB — an approximate operator with an
  * EXACT oracle, like the SQ/PQ/kmeans paths.
  *
  * Scale shape: one shuffle keyed on the group. The `row_number <= k`
  * window compiles to WindowGroupLimit with a PARTIAL pass — each map
  * task forwards at most k rows per group to the exchange, so the
  * shuffle carries O(groups × k × partitions) rows, never the full
  * distinct stream. KMV sketches are also mergeable (union = k smallest
  * of the concatenation), which is exactly what the partial limit
  * exploits.
  */
object Sketches {

  /** Per-group KMV distinct-count estimate of `keyCol`, k minimum
    * 60-bit md5 values. Exact (returns the true count) when a group has
    * fewer than k distinct keys. Output: (grp, est). */
  def kmvDistinct(df: DataFrame, groupCol: Column, keyCol: Column,
                  k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val h = Dedup.hash60(concat_ws("", lit(salt), keyCol))
    val w = Window.partitionBy(col("grp")).orderBy(col("h"))
    df.select(groupCol.as("grp"), h.as("h")).distinct()
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("hk"))
      .select(col("grp"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(
            lit((k - 1).toDouble) * lit(1152921504606846976.0d) / col("hk"),
            2)).as("est"))
  }
}
