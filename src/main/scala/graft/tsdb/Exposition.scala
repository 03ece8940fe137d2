package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prometheus text exposition format (0.0.4) — the `/metrics` scrape
  * and `/federate` wire format the reference's upstream feeds on
  * (public spec: Prometheus "Exposition formats" docs). [[parse]]
  * turns a line stream into the long form every ingest path here
  * consumes; [[render]] is its inverse over the canonical store form,
  * so a downstream Prometheus can federate FROM this engine. Both are
  * doc-local (codegen'd parse expression / codegen'd string ops) —
  * they run map-side at scan speed over a 100 TB scrape archive.
  */
object Exposition {

  /** Exposition lines → long form `(labels map incl __name__, t, v)`.
    * Comment (`# HELP`/`# TYPE`/any `#`), blank, and malformed lines
    * are DROPPED (a scraper skips bad lines, it does not fail the
    * scrape); [[parseReport]] counts them. Lines without the optional
    * timestamp take `defaultTsMs` — the scrape-time stamping upstream
    * Prometheus applies. */
  def parse(lines: DataFrame, lineCol: Column, defaultTsMs: Column): DataFrame =
    lines
      .select(graft.functions.ExpositionExpressions.exposition_parse(lineCol).as("p"))
      .where(col("p").isNotNull)
      .select(col("p.labels").as("labels"),
        coalesce(col("p.t"), defaultTsMs).as("t"),
        col("p.v").as("v"))

  /** OpenMetrics 1.0 dialect of [[parse]]: timestamps arrive in
    * decimal SECONDS (converted to ms), exemplar tails are accepted
    * and ignored (this engine stores samples, not exemplars), and the
    * `# EOF` terminator drops out as any other comment. */
  def parseOpenMetrics(lines: DataFrame, lineCol: Column,
                       defaultTsMs: Column): DataFrame =
    lines
      .select(graft.functions.ExpositionExpressions.openmetrics_parse(lineCol).as("p"))
      .where(col("p").isNotNull)
      .select(col("p.labels").as("labels"),
        coalesce(col("p.t"), defaultTsMs).as("t"),
        col("p.v").as("v"))

  /** OpenMetrics EXEMPLARS (` # {trace_id="..."} value [ts]` tails —
    * the trace-correlation references behind `/api/v1/query_exemplars`):
    * one row per exemplar-carrying line, `(labels, ex_labels, v, t)`
    * where `labels` is the owning series (incl `__name__`), `v`/`t` the
    * exemplar's own value and ms timestamp (timestamp-less exemplars
    * take `defaultTsMs` — scrape time, upstream's rule). Map-side only;
    * non-exemplar lines drop at the scan. */
  def parseExemplars(lines: DataFrame, lineCol: Column,
                     defaultTsMs: Column): DataFrame =
    lines
      .select(graft.functions.ExpositionExpressions.openmetrics_parse_ex(lineCol).as("p"))
      .where(col("p").isNotNull && col("p.ex_v").isNotNull)
      .select(col("p.labels").as("labels"),
        col("p.ex_labels").as("ex_labels"),
        col("p.ex_v").as("v"),
        coalesce(col("p.ex_t"), defaultTsMs).as("t"))

  /** Metric metadata from `# HELP`/`# TYPE`/`# UNIT` comment lines —
    * the half of a scrape body [[parse]] deliberately drops, and what
    * `/api/v1/metadata` serves upstream. One row per metric:
    * `(metric, mtype, help, unit)`, absent kinds empty. Within one
    * body a metric carries each kind at most once (the format's rule);
    * on violation `max` picks deterministically. Map-side-combined —
    * the shuffle carries one slim row per metric, never sample
    * lines. */
  def parseMetadata(lines: DataFrame, lineCol: Column): DataFrame =
    lines
      .select(graft.functions.ExpositionExpressions.exposition_meta_parse(lineCol).as("m"))
      .where(col("m").isNotNull)
      .groupBy(col("m.metric").as("metric"))
      .agg(
        coalesce(max(when(col("m.kind") === "TYPE", col("m.text"))), lit(""))
          .as("mtype"),
        coalesce(max(when(col("m.kind") === "HELP", col("m.text"))), lit(""))
          .as("help"),
        coalesce(max(when(col("m.kind") === "UNIT", col("m.text"))), lit(""))
          .as("unit"))

  /** One-row parse audit: total lines, comment/blank lines, parsed
    * samples, and dropped (malformed) lines — map-side-combined, so
    * the report costs one scan whatever the archive size. */
  def parseReport(lines: DataFrame, lineCol: Column): DataFrame = {
    val trimmed = ltrim(lineCol, " \t")
    // project the parse ONCE per line; the agg references the column
    // (a second inline use would re-run the expression per condition)
    lines
      .select(
        (trimmed === "" || substring(trimmed, 1, 1) === "#").as("is_comment"),
        graft.functions.ExpositionExpressions.exposition_parse(lineCol).as("p"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_comment"), 1L).otherwise(0L)).as("n_comment"),
        sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("n_samples"),
        sum(when(!col("is_comment") && col("p").isNull, 1L).otherwise(0L))
          .as("n_malformed"))
  }

  /** Canonical store form → exposition lines. Labels are already
    * sorted in the canonical array (the reference's `Labels` total
    * order), values get the `\\`, `\"`, `\n` escapes, doubles render
    * via the JVM round-trip form (`Infinity`/`NaN` parse back), and
    * the timestamp is always emitted — the `/federate` convention. */
  def render(canonical: DataFrame): DataFrame = {
    def esc(c: Column): Column =
      regexp_replace(regexp_replace(regexp_replace(c,
        "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n")
    val others = filter(col("labels"),
      e => e.getField("name") =!= Labels.MetricName)
    val pairs = transform(others, e =>
      concat(e.getField("name"), lit("=\""), esc(e.getField("value")), lit("\"")))
    canonical.select(concat(
      TsSchema.labelValue(col("labels"), Labels.MetricName),
      when(size(pairs) > 0,
        concat(lit("{"), array_join(pairs, ","), lit("}"))).otherwise(lit("")),
      lit(" "), col("v").cast("string"),
      lit(" "), col("t").cast("string")).as("line"))
  }
}
