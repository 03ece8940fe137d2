package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{PipelineQueries, RelationalQueries, TsQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups:
  *  - [[graft.queries.TsQueries]]   — the reference's surface (label
  *    matchers, time pruning, series merge; SURVEY.md §2.2-§2.3) over the
  *    `events` table via [[graft.tsdb.TsQuerier]];
  *  - [[graft.queries.RelationalQueries]] — beyond-reference relational
  *    operators (aggregation, joins, windows, set ops, scalar/JSON);
  *  - [[graft.queries.PipelineQueries]]   — training-data pipeline ops
  *    (dedup, similarity search, text analysis, multimodal plumbing).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core operation: label-matcher + time-range select
    * with cross-block series merge (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    TsQueries.defs("ts_series_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TsQueries.defs ++ RelationalQueries.defs ++ PipelineQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TsQueries.oracles ++ RelationalQueries.oracles ++ PipelineQueries.oracles
}
