package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunked storage form: one row per (series, block) carrying the sorted
  * sample array — the reference's physical layout (samples of one series
  * stored contiguously, SURVEY.md §1.2) expressed as parquet nested data,
  * vs. the long form's row-per-sample.
  *
  * Why it matters at 100 TB: selection predicates evaluate on CHUNK rows
  * (~125× fewer rows than samples), so label matching + chunk time
  * pruning (`min_t`/`max_t`, the reference's P11 `querier.go:510-531`)
  * discard whole series before any sample is materialized; only matching
  * chunks explode. Row-group stats on `min_t`/`max_t`/promoted labels
  * skip IO the same way the reference's index avoids reading non-matching
  * series. The tradeoff: per-sample predicates (P12) run after the
  * explode, and updates rewrite whole chunks — the same tradeoffs the
  * reference makes.
  */
object TsChunkedStore {
  import TsSchema.{BlockMs, DefaultPromoted, promotedColName, labelValue}

  /** Long-form (labels map, t, v) → chunked rows, partitioned by block. */
  def fromLongForm(df: DataFrame, promoted: Seq[String] = DefaultPromoted): DataFrame =
    fromCanonical(TsSchema.canonicalize(df, promoted), promoted)

  /** Already-canonical long form (labels array, fingerprint, block_start,
    * promoted cols) → chunked rows — ONE shuffle on the series key, no
    * re-canonicalization. Use when the long-form store already exists
    * (the two forms share the canonicalization pass). */
  def fromCanonical(canonical: DataFrame, promoted: Seq[String] = DefaultPromoted): DataFrame =
    canonical
      .groupBy(col("fingerprint") +: col("labels") +: col("block_start") +:
        promoted.map(p => col(promotedColName(p))): _*)
      .agg(
        sort_array(collect_list(struct(col("t"), col("v")))).as("samples"),
        min(col("t")).as("min_t"), max(col("t")).as("max_t"),
        count(lit(1)).as("n_samples"))

  def write(df: DataFrame, path: String, promoted: Seq[String] = DefaultPromoted): Unit =
    fromLongForm(df, promoted)
      .write.partitionBy("block_start").mode("overwrite").parquet(path)

  def read(spark: SparkSession, path: String,
           promoted: Seq[String] = DefaultPromoted): TsChunkedQuerier =
    new TsChunkedQuerier(spark.read.parquet(path), promoted)
}

/** Querier over the chunked form — same API/semantics as [[TsQuerier]],
  * different physical pipeline: prune chunks (P10/P11 + matchers), THEN
  * explode, THEN clamp samples (P12). */
final class TsChunkedQuerier(data: DataFrame,
                             promoted: Seq[String] = TsSchema.DefaultPromoted) {
  import TsSchema._

  private def valueCol(name: String): Column =
    if (promoted.contains(name)) col(promotedColName(name))
    else labelValue(col("labels"), name)

  def selectLong(mint: Long, maxt: Long, matchers: Seq[LabelMatcher]): DataFrame = {
    val chunks = data
      .where(col("block_start") >= lit(mint - BlockMs + 1) && col("block_start") <= lit(maxt)) // P10
      .where(col("max_t") >= mint && col("min_t") <= maxt) // P11: chunk-level time pruning
    val matched = matchers.foldLeft(chunks)((d, m) => d.where(m.predicate(valueCol(m.name)))) // P1-P9 on chunk rows
    matched
      .select(col("labels"), col("fingerprint"), explode(col("samples")).as("s"))
      .select(col("labels"), col("fingerprint"), col("s.t").as("t"), col("s.v").as("v"))
      .where(col("t").between(mint, maxt)) // P12
  }

  def select(mint: Long, maxt: Long, matchers: Seq[LabelMatcher]): DataFrame =
    selectLong(mint, maxt, matchers)
      .groupBy(col("fingerprint"), col("labels"))
      .agg(sort_array(collect_list(struct(col("t"), col("v")))).as("samples"))
      .orderBy(col("labels"))
      .select(col("labels"), col("samples"))

  def selectStreams(mint: Long, maxt: Long, matchers: Seq[LabelMatcher]) = {
    val spark = data.sparkSession
    import spark.implicits._
    select(mint, maxt, matchers)
      .select(map_from_entries(col("labels")).as("labels"), col("samples"))
      .as[SampleStream]
  }

  def labelValues(name: String): DataFrame =
    data.select(valueCol(name).as("value"))
      .where(col("value") =!= "").distinct().orderBy(col("value"))
}
