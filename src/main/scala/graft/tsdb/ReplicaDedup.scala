package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HA replica deduplication — the other long-term-store query feature
  * the reference's domain implies: Prometheus is deployed in HA pairs,
  * so a store fed by a shipper (`shipper.go`) holds every series twice,
  * distinguished only by a replica label, and queries must collapse the
  * pair into one logical series.
  *
  * This implements the published Cortex/Mimir HA-tracker model (elect
  * one replica per cluster per time window; drop the rest) rather than
  * Thanos's sequential per-sample penalty walk — election is a pure
  * aggregation, so it stays two shuffles at any scale, while the penalty
  * walk needs the full merged sample stream per series in order.
  *
  * Election rule (deterministic): per (series-without-replica, aligned
  * window), the replica with the MOST samples wins; ties break to the
  * lexicographically smallest replica value. Samples of losing replicas
  * in that window are dropped — the HA semantic: you trust one source
  * per window, gaps and all.
  *
  * Scale (100 TB): two shuffles keyed on (series fingerprint, window) —
  * the count aggregation and the semi-join back — with only
  * (fingerprint, window, replica, count) rows moving in between; sample
  * payloads move once. The full label array rides the keys alongside the
  * 64-bit fingerprint so hash collisions cannot merge distinct series. */
object ReplicaDedup {

  /** Canonical long form (labels include `replicaLabel`) → canonical
    * long form with one elected replica per (series, window) and the
    * replica label removed from `labels`/`fingerprint`. */
  def dedup(data: DataFrame, replicaLabel: String = "replica",
            windowMs: Long = 60 * 60 * 1000L): DataFrame = {
    val stripped = filter(col("labels"), e => e.getField("name") =!= replicaLabel)
    val base = data
      .withColumn("_sr", stripped)
      .withColumn("_fpsr", TsSchema.fingerprintCol(stripped))
      .withColumn("_rep", TsSchema.labelValue(col("labels"), replicaLabel))
      .withColumn("_w", col("t") - pmod(col("t"), lit(windowMs)))
    val counts = base
      .groupBy(col("_fpsr"), col("_sr"), col("_w"), col("_rep"))
      .agg(count(lit(1)).as("_n"))
    // most samples wins; tie → smallest replica value. min(struct) gives
    // lexicographic (−n, replica) order = (n desc, replica asc).
    val elected = counts
      .groupBy(col("_fpsr"), col("_sr"), col("_w"))
      .agg(min(struct((-col("_n")).as("nn"), col("_rep").as("r"))).as("_best"))
      .select(col("_fpsr"), col("_sr"), col("_w"), col("_best.r").as("_rep"))
    base
      .join(elected, Seq("_fpsr", "_sr", "_w", "_rep"), "left_semi")
      .withColumn("labels", col("_sr"))
      .withColumn("fingerprint", col("_fpsr"))
      .drop("_sr", "_fpsr", "_rep", "_w")
  }
}
