package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Federated querier — the Thanos-Querier fan-in over multiple stores
  * (the reference's server reads ONE bucket; a fleet of them plus a
  * local store is the deployment the domain implies). Each member
  * executes its own partition-pruned, matcher-pushed select; the union
  * is a metadata-only plan combinator (Spark unions don't move data),
  * and the J1/J2 series merge across stores falls out of the same
  * (fingerprint, labels) aggregation the single-store path uses.
  *
  * Overlap handling: stores fed by overlapping shippers can both hold a
  * sample at the same (series, t). With `dedupOverlap` the union
  * collapses exact duplicates by (fingerprint, labels, t) keeping the
  * max value — deterministic, engine-recomputable (Prometheus keeps an
  * arbitrary one; max is the auditable choice). Costs one shuffle; skip
  * it for stores known time-disjoint (the common retention layout).
  *
  * Scale: fan-in of N stores is N independent scans, each pruned by its
  * own partitions and pushed predicates — no cross-store coordination
  * until the final per-series merge the query needed anyway. */
final class TsFederatedQuerier(members: Seq[TsQuerier],
                               dedupOverlap: Boolean = false) {
  require(members.nonEmpty, "federation needs at least one member")

  def selectLong(mint: Long, maxt: Long, matchers: Seq[LabelMatcher]): DataFrame = {
    val u = members.map(_.selectLong(mint, maxt, matchers))
      .reduce(_ unionByName _)
    if (!dedupOverlap) u
    else {
      // extra columns (block_start, promoted labels) are functions of
      // (labels, t) — max() keeps them deterministically
      val extraCols = u.columns.filterNot(Set("fingerprint", "labels", "t", "v"))
      u.groupBy(col("fingerprint"), col("labels"), col("t"))
        .agg(max(col("v")).as("v"), extraCols.map(c => max(col(c)).as(c)): _*)
    }
  }

  /** Cross-store merged series streams, canonical label order. */
  def select(mint: Long, maxt: Long, matchers: Seq[LabelMatcher]): DataFrame =
    selectLong(mint, maxt, matchers)
      .groupBy(col("fingerprint"), col("labels"))
      .agg(sort_array(collect_list(struct(col("t"), col("v")))).as("samples"))
      .orderBy(col("labels"))
      .select(col("labels"), col("samples"))

  def labelValues(name: String): DataFrame =
    members.map(_.labelValues(name)).reduce(_ unionByName _)
      .distinct().orderBy(col("value"))

  def labelNames(): DataFrame =
    members.map(_.labelNames()).reduce(_ unionByName _)
      .distinct().orderBy(col("name"))
}
