package graft.promql

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.tsdb.{Labels, TsQuerier, TsSchema, TsStore}

/** Prometheus recording rules, materialized batch-style: evaluate a
  * PromQL expression on a step grid and append the result to a store
  * as a new metric (`record: <name>  expr: <expr>` in upstream rule
  * files).
  *
  * The upstream server re-evaluates rules every interval at a sliding
  * instant; here one BATCH materializes a whole `[mint, maxt]` grid —
  * the lakehouse shape of the same idea (backfill and steady state are
  * one code path, like `promtool tsdb create-blocks-from rules`). For
  * continuous operation, call [[record]] from the same `foreachBatch`
  * that drives [[graft.tsdb.BlockShipper.shipClosed]], with the batch
  * watermark as `maxt`.
  *
  * Scale: evaluation inherits the front-end's bounded-explode plan;
  * the append is one canonicalize + partitioned write whose volume is
  * the RULE OUTPUT (series × steps), typically orders of magnitude
  * smaller than the input samples. Rule outputs are ordinary series —
  * selectable, shippable to native blocks, deletable — because they
  * ARE store rows, with the rule name as `__name__`.
  */
object RecordingRules {

  /** Evaluate `expr` against `querier` over the grid and append the
    * result to `destPath` as metric `ruleName`. The result keeps the
    * expression's label set with `__name__` replaced by the rule name
    * (Prometheus recording-rule semantics). Returns rows written. */
  def record(querier: TsQuerier, destPath: String, ruleName: String,
             expr: String, mint: Long, maxt: Long, stepMs: Long,
             promoted: Seq[String] = TsSchema.DefaultPromoted,
             lookbackMs: Long = 5 * 60 * 1000L,
             extraLabels: Seq[(String, String)] = Nil): Long = {
    require(ruleName.nonEmpty && ruleName.forall(c =>
      c.isLetterOrDigit || c == '_' || c == ':'),
      s"bad rule metric name '$ruleName'")
    val out = PromQL.rangeQuery(querier, expr, mint, maxt, stepMs, lookbackMs)
    val renamed = attachName(out, ruleName, extraLabels)
    val canonical = TsSchema.canonicalize(renamed, promoted)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = canonical.count() // one evaluation feeds both count and write
    canonical.write.partitionBy("block_start")
      .mode(SaveMode.Append).parquet(destPath)
    canonical.unpersist(blocking = false)
    n
  }

  /** Store-to-store convenience: evaluate against `storePath` and
    * append back into the SAME store — the steady-state deployment
    * (rule series live beside their inputs). */
  def record(spark: SparkSession, storePath: String, ruleName: String,
             expr: String, mint: Long, maxt: Long, stepMs: Long): Long =
    record(TsStore.read(spark, storePath), storePath, ruleName, expr,
      mint, maxt, stepMs)

  /** `(labels, t, v)` frame with `__name__` replaced by `ruleName` and
    * rule labels attached (overriding result labels of the same name —
    * upstream recording-rule semantics). Output labels are a MAP
    * column ready for [[TsSchema.canonicalize]]. */
  def attachName(out: org.apache.spark.sql.DataFrame, ruleName: String,
                 extraLabels: Seq[(String, String)] = Nil): org.apache.spark.sql.DataFrame = {
    val dropped = extraLabels.map(_._1).toSet + Labels.MetricName
    val attached = array((
      (Labels.MetricName -> ruleName) +: extraLabels).map { case (k, v) =>
        struct(lit(k).as("name"), lit(v).as("value")) }: _*)
    out.select(
      map_from_entries(concat(
        filter(col("labels"), e => !e.getField("name").isin(dropped.toSeq: _*)),
        attached)).as("labels"),
      col("t"), col("v"))
  }
}
