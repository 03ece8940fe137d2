package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tsdb._

/** The reference's query surface (time-range + label-matcher selection,
  * SURVEY.md §2-§3) exercised over the driver's `events` table, mapped to
  * the labeled-series model:
  *   labels = { __name__: event_type, user: user_id,
  *              big: "1" iff value >= 100 (absent otherwise) }
  *   t = epoch millis of ts, v = value.
  * Every query returns flat, deterministic columns (strings / longs /
  * rounded doubles) ordered by the full row so the DuckDB oracle can
  * hash-compare.
  */
object TsQueries {
  // 2024-01-10T00:00:00Z .. 2024-01-20T00:00:00Z, inside the events span
  val Mint = 1704844800000L
  val Maxt = 1705708800000L

  /** Per-(session, dir) cache of the canonicalized store: one pass over
    * events builds the long form, every matcher query then scans the
    * cached columnar form — the same shape a real deployment gets from
    * reading the written store (TsStore.read) instead of re-deriving it. */
  private val storeCache =
    SessionFixtures.register(scala.collection.concurrent.TrieMap[(String, String), DataFrame]())

  def store(s: SparkSession, dir: String): DataFrame =
    storeCache.getOrElseUpdate((SessionFixtures.key(s), dir), buildStore(s, dir).cache())

  /** events → canonical long-form series store (SURVEY.md §1.3), via the
    * codegen'd static-label fast path. */
  private def buildStore(s: SparkSession, dir: String): DataFrame = {
    // fanOut BEFORE canonicalize: events ships as one single-row-group
    // file, so without it the canonicalization runs as one task AND —
    // worse — the .cache() above freezes the store at ONE partition,
    // serializing the scan of every ts_* query for the whole session
    val ev = Tables.fanOut(Tables.load(s, dir, "events"))
      .select(col("event_type"), col("user_id"), col("value"),
        Tables.tsMillis(col("ts")).as("t"), col("value").as("v"))
    TsSchema.canonicalizeStatic(ev, Seq(
      Labels.MetricName -> col("event_type"),
      "user" -> col("user_id").cast("string"),
      "big" -> when(col("value") >= 100, lit("1")).otherwise(lit(""))),
      promoted = Seq(Labels.MetricName))
      .select(col("labels"), col("fingerprint"), col("t"), col("v"),
        col("block_start"), col(TsSchema.promotedColName(Labels.MetricName)))
  }

  private def querier(s: SparkSession, dir: String): TsQuerier =
    new TsQuerier(store(s, dir), promoted = Seq(Labels.MetricName))

  /** Chunked-form variant of the same store (SURVEY.md §7.4): chunk rows
    * are pruned by label + min_t/max_t BEFORE exploding samples. */
  private val chunkedCache =
    SessionFixtures.register(scala.collection.concurrent.TrieMap[(String, String), DataFrame]())

  private def chunkedStore(s: SparkSession, dir: String): DataFrame =
    chunkedCache.getOrElseUpdate((SessionFixtures.key(s), dir),
      // derive from the CACHED canonical long form — the two storage
      // forms share one canonicalization pass; building the chunked rows
      // is then a single shuffle on the series key
      TsChunkedStore.fromCanonical(store(s, dir), promoted = Seq(Labels.MetricName)).cache())

  private def chunkedQuerier(s: SparkSession, dir: String): TsChunkedQuerier =
    new TsChunkedQuerier(chunkedStore(s, dir), promoted = Seq(Labels.MetricName))

  /** Per-(session, dir) one-time write of the events store as a native
    * TSDB block (ULID dir with index + XOR chunk segments), for the DSv2
    * read-back query. Driver-side assembly is the test-scale shape of the
    * shipper path; production ingest is the distributed TsdbBlock.ingest. */
  private val blockDirCache =
    SessionFixtures.register(scala.collection.concurrent.TrieMap[(String, String), String]())

  private def dsv2BlockDir(s: SparkSession, dir: String): String =
    blockDirCache.getOrElseUpdate((SessionFixtures.key(s), dir), {
      val root = java.nio.file.Files.createTempDirectory("graft_dsv2_block")
      // XOR encoding runs on executors; the driver only assembles the
      // segment + index layout (TsdbBlock.writeDistributed)
      TsdbBlock.writeDistributed(store(s, dir), root.resolve("b1"),
        TsdbBlock.syntheticUlid(1L))
      root.toString
    })

  /** Per-(session, dir) parquet store with two pending deletion records,
    * for the Delta-style delete workflow query (TsDeletions). */
  private val deleteStoreCache =
    SessionFixtures.register(scala.collection.concurrent.TrieMap[(String, String), String]())

  private def deleteStore(s: SparkSession, dir: String): String =
    deleteStoreCache.getOrElseUpdate((SessionFixtures.key(s), dir), {
      // deletes are metadata-only: the log lives under <store>/_deletions
      // and never needs the data files present, so the fixture appends
      // the two records to an empty dir and the query masks the cached
      // canonical frame — same read path as a real store
      // (TsDeletions.masked), without re-writing the store as parquet.
      // The on-disk roundtrip + materialize are covered by
      // TsDeletionsSpec / TsMaintenanceSpec.
      val p = java.nio.file.Files.createTempDirectory("graft_delstore")
        .resolve("store").toString
      TsDeletions.delete(s, p, Seq(LabelMatcher.eq(Labels.MetricName, "click")),
        1704844800000L, 1705276800000L)
      TsDeletions.delete(s, p, Seq(LabelMatcher.eq(Labels.MetricName, "error")),
        1705276800000L, 1705708800000L)
      p
    })

  /** Per-(session, dir) store holding one materialized recording rule
    * (the e2e expression recorded as a new metric). */
  private val ruleStoreCache =
    SessionFixtures.register(scala.collection.concurrent.TrieMap[(String, String), String]())

  private def ruleStore(s: SparkSession, dir: String): String =
    ruleStoreCache.getOrElseUpdate((SessionFixtures.key(s), dir), {
      val p = java.nio.file.Files.createTempDirectory("graft_rules")
        .resolve("store").toString
      graft.promql.RecordingRules.record(querier(s, dir), p,
        "user:click:increase1d", "sum by (user) (increase(click[1d]))",
        Mint, Maxt, 86400000L)
      p
    })

  /** Per-(session, dir) classic view of the per-(event_type, day)
    * native-histogram store — shared by every ts_promql_native_hist*
    * query (each previously rebuilt observe + toClassicSeries + one
    * canonicalization pass per query per rep). Built with the
    * `_count`/`_sum` companion series: the extra series carry their own
    * `__name__` values, so bucket-only queries are unaffected. */
  private val nativeHistCache =
    SessionFixtures.register(scala.collection.concurrent.TrieMap[(String, String), DataFrame]())

  private def nativeHistView(s: SparkSession, dir: String): DataFrame =
    nativeHistCache.getOrElseUpdate(
      (SessionFixtures.key(s), dir), {
        val ev = Tables.load(s, dir, "events")
          .select(col("event_type"), col("value"),
            (Tables.tsMillis(col("ts")) -
              pmod(Tables.tsMillis(col("ts")), lit(86400000L))).as("day_t"))
          .where(col("day_t").between(Mint, Maxt))
        val nh = graft.ops.NativeHistogram.observe(ev, col("value"),
          schema = 2, Seq("event_type", "day_t"))
        TsSchema.canonicalize(
          graft.ops.NativeHistogram.toClassicSeries(nh, "latency",
            Seq("event_type"), "day_t", countSumSeries = true)).cache()
      })

  private def nativeHistQuerier(s: SparkSession, dir: String): TsQuerier =
    new TsQuerier(nativeHistView(s, dir))

  /** Shared-fixture builders, in dependency order. Bench runs these in an
    * explicit warm-up pass and reports each build as its own labeled line,
    * so the one-time store/block/rule-store costs are no longer charged to
    * whichever query happens to touch them first (that attribution made
    * round-over-round per-query comparisons unreadable). Each thunk fully
    * materializes its fixture (count() forces the lazy .cache()). */
  def fixtures: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "fx_ts_store" -> ((s, dir) => { store(s, dir).count(); () }),
    "fx_ts_chunked" -> ((s, dir) => { chunkedStore(s, dir).count(); () }),
    "fx_ts_dsv2_block" -> ((s, dir) => { dsv2BlockDir(s, dir); () }),
    "fx_ts_delete_store" -> ((s, dir) => { deleteStore(s, dir); () }),
    "fx_ts_rule_store" -> ((s, dir) => { ruleStore(s, dir); () }),
    "fx_ts_native_hist" -> ((s, dir) => { nativeHistView(s, dir).count(); () }))

  /** Long-form select → flat projection in deterministic order. */
  private def flat(q: DataFrame): DataFrame =
    q.select(
      TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
      TsSchema.labelValue(col("labels"), "user").as("user"),
      col("t"), col("v"))
      .orderBy(col("name"), col("user"), col("t"), col("v"))

  /** Oracle-side long-form projection of the same store. */
  private val oracleBase =
    """SELECT event_type AS name, CAST(user_id AS VARCHAR) AS "user",
      |       epoch_ms(ts) AS t, "value" AS v,
      |       CASE WHEN "value" >= 100 THEN '1' ELSE '' END AS big
      |  FROM events""".stripMargin.replace("\n", " ")

  /** Shared by ts_promql_e2e and ts_rule_record: the step-window
    * replication of `sum by (user) (increase(click[1d]))`. */
  private lazy val promqlE2eSql =
    s"""WITH steps AS (SELECT unnest(range($Mint, $Maxt + 1, 86400000)) AS step_t),
       | raw AS (SELECT name, "user", big, t, v FROM ($oracleBase)
       |         WHERE name = 'click' AND t > $Mint - 86400000 AND t <= $Maxt),
       | win AS (SELECT r.name, r."user", r.big, r.t, r.v, s.step_t
       |         FROM raw r JOIN steps s
       |           ON r.t > s.step_t - 86400000 AND r.t <= s.step_t),
       | lagd AS (SELECT *, lag(v) OVER (
       |            PARTITION BY name, "user", big, step_t ORDER BY t, v) AS pv
       |          FROM win),
       | inc AS (SELECT name, "user", big, step_t,
       |           sum(CASE WHEN pv IS NULL THEN 0
       |                    WHEN v >= pv THEN v - pv ELSE v END) AS increase
       |         FROM lagd GROUP BY name, "user", big, step_t
       |         HAVING count(*) >= 2)
       | SELECT "user", step_t AS t, round(sum(increase), 4) AS v
       | FROM inc GROUP BY "user", step_t ORDER BY "user", t""".stripMargin.replace("\n", " ")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1 equality matcher + P10-P12 time clamps
    "ts_select_eq" -> ((s, dir) => flat(
      querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "click"))))),

    // P2 regex matcher, Prometheus-anchored: "click|sign.*" must not match "signups2"
    "ts_select_regex" -> ((s, dir) => flat(
      querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.re(Labels.MetricName, "cl.*|sign.*"),
        LabelMatcher.re("user", "[0-4][0-9]"))))),

    // P3 negation matchers
    "ts_select_neg" -> ((s, dir) => flat(
      querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.neq(Labels.MetricName, "click"),
        LabelMatcher.notRe("user", "1.*"))))),

    // P4 prefix matcher
    "ts_select_prefix" -> ((s, dir) => flat(
      querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.prefix(Labels.MetricName, "s"),
        LabelMatcher.prefix("user", "2"))))),

    // P5 absent-label semantics: big="" (absent ≡ value<100), job="" (never present)
    "ts_select_absent" -> ((s, dir) => flat(
      querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.absent("big"),
        LabelMatcher.absent("job"),
        LabelMatcher.eq(Labels.MetricName, "error"))))),

    // P5 inverse: big!="" (label present)
    "ts_select_present" -> ((s, dir) => flat(
      querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.neq("big", ""),
        LabelMatcher.eq(Labels.MetricName, "purchase"))))),

    // J1/J2 cross-block merge: per-series sample assembly as flat aggregates
    "ts_series_agg" -> ((s, dir) =>
      querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.re(Labels.MetricName, ".*")))
        .groupBy(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"))
        .agg(count(lit(1)).as("n_samples"),
          min(col("t")).as("min_t"), max(col("t")).as("max_t"),
          round(sum(col("v")), 2).as("sum_v"))
        .orderBy(col("name"), col("user"))),

    // J3 label-values cross-block distinct merge
    "ts_label_values" -> ((s, dir) => querier(s, dir).labelValues("user")),

    // label names enumeration
    "ts_label_names" -> ((s, dir) => querier(s, dir).labelNames()),

    // cardinality statistics (the /api/v1/status/tsdb analog): distinct
    // values + series count per label name, over unique series only
    "ts_cardinality" -> ((s, dir) => querier(s, dir).labelStats()),

    // /api/v1/status/tsdb top-k list: series count per label PAIR
    // (value desc, name asc — deterministic through the limit boundary)
    "ts_tsdb_pairs" -> ((s, dir) =>
      // the one list this query reads, computed engine-side: the full
      // tsdbStats() bundle ran ~8 driver actions (persists, five scalar
      // heads, four TakeOrdered collects) to fill fields this query
      // discarded, then round-tripped the rows through the driver
      querier(s, dir).seriesCountByLabelValuePairDf(10)),

    // P13 tombstone interval mask: deletions applied as a broadcast
    // anti-join (the reference's deletedIterator, querier.go:845-883 —
    // always-empty there, block.go:73-75; modeled as a real table here)
    "ts_tombstone" -> ((s, dir) => {
      import s.implicits._
      val deletions = Seq( // (name, mint, maxt) deletion intervals
        ("click", 1704844800000L, 1705276800000L),
        ("error", 1705276800000L, 1705708800000L)
      ).toDF("del_name", "del_mint", "del_maxt")
      val sel = querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.re(Labels.MetricName, "click|error")))
        .withColumn("name", TsSchema.labelValue(col("labels"), Labels.MetricName))
      sel.join(broadcast(deletions),
        col("name") === col("del_name") &&
          col("t").between(col("del_mint"), col("del_maxt")), "left_anti")
        .select(col("name"), TsSchema.labelValue(col("labels"), "user").as("user"),
          col("t"), col("v"))
        .orderBy(col("name"), col("user"), col("t"), col("v"))
    }),

    // Delta-style deletion workflow: delete(matchers, mint, maxt) appends
    // to the store's _deletions log; the querier masks pending deletions
    // with a compiled predicate (no rewrite until materialize runs).
    // Same intervals as ts_tombstone → same oracle shape.
    "ts_delete_select" -> ((s, dir) => {
      val p = deleteStore(s, dir)
      val q = new TsQuerier(TsDeletions.masked(s, p, store(s, dir)),
        promoted = Seq(Labels.MetricName))
      flat(q.selectLong(Mint, Maxt, Seq(
        LabelMatcher.re(Labels.MetricName, "click|error"))))
    }),

    // beyond-reference: PromQL-style per-series rate over sample deltas
    "ts_rate" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fingerprint")).orderBy(col("t"))
      querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "purchase")))
        .withColumn("prev_t", lag(col("t"), 1).over(w))
        .withColumn("prev_v", lag(col("v"), 1).over(w))
        .where(col("prev_t").isNotNull)
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          col("t"),
          round((col("v") - col("prev_v")) / ((col("t") - col("prev_t")) / 1000.0d), 6).as("rate"))
        .orderBy(col("name"), col("user"), col("t"))
    }),

    // chunked storage form (SURVEY.md §7.4): same semantics, chunk-level
    // pruning before explode — shares its oracle with the long-form query
    "ts_chunked_eq" -> ((s, dir) => flat(
      chunkedQuerier(s, dir).selectLong(Mint, Maxt,
        Seq(LabelMatcher.eq(Labels.MetricName, "click"))))),

    "ts_chunked_series_agg" -> ((s, dir) =>
      chunkedQuerier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.neq("user", "")))
        .groupBy(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"))
        .agg(count(lit(1)).as("n_samples"),
          min(col("t")).as("min_t"), max(col("t")).as("max_t"),
          round(sum(col("v")), 2).as("sum_v"))
        .orderBy(col("name"), col("user"))),

    // PromQL-flavored: counter increase + rate with reset semantics
    "ts_prom_rate" -> ((s, dir) =>
      graft.ops.PromOps.rate(
        querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "error"))))
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          col("t"), round(col("increase"), 6).as("increase"), round(col("rate"), 6).as("rate"))
        .orderBy(col("name"), col("user"), col("t"))),

    // PromQL-flavored: sliding <agg>_over_time(1h) range windows
    "ts_prom_over_time" -> ((s, dir) =>
      graft.ops.PromOps.overTime(
        querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "view"))),
        rangeMs = 3600000L)
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          col("t"), round(col("sum_over_time"), 4).as("sot"),
          round(col("avg_over_time"), 6).as("aot"),
          col("count_over_time").as("cot"))
        .orderBy(col("name"), col("user"), col("t"))),

    // PromQL-flavored: sum/avg by (__name__) at 1h steps
    "ts_prom_agg_by" -> ((s, dir) =>
      graft.ops.PromOps.aggregateBy(
        querier(s, dir).selectLong(Mint, Maxt, Seq.empty),
        byLabels = Seq(Labels.MetricName), stepMs = 3600000L,
        labelValue = TsSchema.labelValue)
        .select(col("step_t"), col("by___name__").as("name"),
          round(col("sum_v"), 4).as("sum_v"),
          // avg from the ROUNDED sum: raw-avg rounding can land exactly on
          // a 6-dp half (e.g. 1114.23/32) where engine summation order
          // flips the digit; dividing identical rounded sums cannot
          round(round(col("sum_v"), 4) / col("n_series"), 6).as("avg_v"),
          col("n_series"))
        .orderBy(col("step_t"), col("name"))),

    // PromQL-flavored: topk(3) series by per-step sum within each metric
    "ts_prom_topk" -> ((s, dir) => {
      val perSeries = querier(s, dir).selectLong(Mint, Maxt, Seq.empty)
        .groupBy(col("fingerprint"),
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"))
        .agg(round(sum(col("v")), 4).as("series_sum"))
      graft.ops.PromOps.topk(perSeries, k = 3, groupCols = Seq("name"), orderCol = "series_sum", tieCols = Seq("user", "big"))
        .select(col("name"), col("rnk").cast("long").as("rnk"),
          col("user"), col("big"), col("series_sum"))
        .orderBy(col("name"), col("rnk"))
    }),

    // PromQL increase(2h): reset-adjusted increments summed over a
    // trailing range window (un-extrapolated — see PromOps.increaseOverTime)
    "ts_prom_increase" -> ((s, dir) =>
      graft.ops.PromOps.increaseOverTime(
        querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "error"))),
        rangeMs = 7200000L)
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          col("t"), round(col("increase_over_time"), 4).as("iot"))
        .orderBy(col("name"), col("user"), col("t"))),

    // PromQL resets() + changes() over the selected range, per series
    "ts_prom_resets" -> ((s, dir) =>
      graft.ops.PromOps.resetsAndChanges(
        querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "click"))))
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("resets"), col("changes"), col("n_samples"))
        .orderBy(col("name"), col("user"), col("big"))),

    // PromQL quantile_over_time + stddev/stdvar_over_time per series
    "ts_prom_quantile" -> ((s, dir) =>
      querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "view")))
        .groupBy(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"))
        .agg(
          round(expr("percentile(v, 0.5)"), 4).as("q50"),
          round(expr("percentile(v, 0.9)"), 4).as("q90"),
          round(stddev_pop(col("v")), 4).as("sd"),
          // variance from the ROUNDED stddev: raw var_pop differs in the
          // last digit across engines (summation order); squaring the
          // agreed-on sd is engine-independent
          round(pow(round(stddev_pop(col("v")), 4), 2.0), 4).as("sv"),
          count(lit(1)).as("n_samples"))
        .orderBy(col("name"), col("user"), col("big"))),

    // PromQL histogram_quantile(0.9): cumulative le-bucket counts per
    // metric (one pass, k conditional sums — no explode fan-out), then
    // the Prometheus interpolation formula over the tiny bucket frame
    "ts_prom_hist_quantile" -> ((s, dir) => {
      val les = Seq(25.0, 50.0, 100.0, 250.0)
      val sel = querier(s, dir).selectLong(Mint, Maxt, Seq.empty)
        .select(TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"), col("v"))
      val bucketAggs = les.zipWithIndex.map { case (le, i) =>
        sum(when(col("v") <= le, 1L).otherwise(0L)).as(s"c_$i")
      } :+ count(lit(1)).as("c_inf")
      val grouped = sel.groupBy(col("name")).agg(bucketAggs.head, bucketAggs.tail: _*)
      val buckets = grouped.select(col("name"), explode(array(
        les.zipWithIndex.map { case (le, i) =>
          struct(lit(le).as("le"), col(s"c_$i").as("cum"))
        } :+ struct(lit(Double.PositiveInfinity).as("le"), col("c_inf").as("cum")): _*)).as("b"))
        .select(col("name"), col("b.le").as("le"), col("b.cum").as("cum"))
      graft.ops.PromOps.histogramQuantile(buckets, 0.9, Seq("name"))
        .select(col("name"), round(col("quantile"), 6).as("q90"))
        .orderBy(col("name"))
    }),

    // PromQL binary op with on(user) vector matching at 1d steps:
    // error_sum / view_sum per user (entries without a match drop out)
    "ts_prom_binary_op" -> ((s, dir) => {
      val q = querier(s, dir)
      graft.ops.PromOps.binaryOp(
        q.selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "error"))),
        q.selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "view"))),
        onLabels = Seq("user"), stepMs = 86400000L,
        labelValue = TsSchema.labelValue,
        op = (l, r) => round(l / r, 6))
        .select(col("step_t"), col("on_user").as("user"),
          round(col("lv"), 4).as("err_sum"), round(col("rv"), 4).as("view_sum"),
          // ratio recomputed from the ROUNDED sums so both engines
          // divide identical inputs
          round(round(col("lv"), 4) / round(col("rv"), 4), 6).as("ratio"))
        .orderBy(col("step_t"), col("user"))
    }),

    // PromQL group_left many-to-one vector match: each (name,user,big)
    // series' daily value against the name's daily total (broadcast one
    // side) — v / on(__name__) group_left sum by (__name__)(v)
    "ts_prom_group_left" -> ((s, dir) => {
      val q = querier(s, dir)
      val sel = q.selectLong(Mint, Maxt, Seq(
        LabelMatcher.re(Labels.MetricName, "click|purchase")))
      graft.ops.PromOps.binaryOpGroupLeft(
        sel, sel, onLabels = Seq(Labels.MetricName), stepMs = 86400000L,
        labelValue = TsSchema.labelValue,
        op = (l, r) => round(l / r, 6))
        .select(col("step_t"), col("on___name__").as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          round(col("lv"), 4).as("user_v"), round(col("rv"), 4).as("total_sum"),
          // share recomputed from the ROUNDED inputs so both engines
          // divide identical values
          round(round(col("lv"), 4) / round(col("rv"), 4), 6).as("share"))
        .orderBy(col("name"), col("user"), col("step_t"), col("user_v"))
    }),

    // PromQL one-to-many group_right: mirror of ts_prom_group_left with
    // the MANY side as the RIGHT operand — series identity survives from
    // the right, the left operand reduces to the per-(step, name)
    // aggregate; inv_share = total ÷ user-series value
    "ts_prom_group_right" -> ((s, dir) => {
      val q = querier(s, dir)
      val sel = q.selectLong(Mint, Maxt, Seq(
        LabelMatcher.re(Labels.MetricName, "click|purchase")))
      graft.ops.PromOps.binaryOpGroupRight(
        sel, sel, onLabels = Seq(Labels.MetricName), stepMs = 86400000L,
        labelValue = TsSchema.labelValue,
        op = (l, r) => round(l / r, 6))
        .select(col("step_t"), col("on___name__").as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          round(col("lv"), 4).as("user_v"), round(col("rv"), 4).as("total_sum"),
          round(round(col("rv"), 4) / round(col("lv"), 4), 6).as("inv_share"))
        .orderBy(col("name"), col("user"), col("step_t"), col("user_v"))
    }),

    // PromQL clamp family (scalar functions over an instant vector)
    "ts_prom_clamp" -> ((s, dir) => {
      val sel = querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.eq(Labels.MetricName, "purchase")))
      sel.select(
        TsSchema.labelValue(col("labels"), "user").as("user"), col("t"),
        round(graft.ops.PromOps.clamp(col("v"), 20.0, 120.0), 4).as("clamped"),
        round(graft.ops.PromOps.clampMin(col("v"), 50.0), 4).as("clamped_min"),
        round(graft.ops.PromOps.clampMax(col("v"), 80.0), 4).as("clamped_max"))
        .orderBy(col("user"), col("t"), col("clamped"))
    }),

    // PromQL subquery composition: max/sum_over_time(increase(m)[3d:]) —
    // an inner function evaluated per sample, re-windowed by an outer
    // range function (two chained per-series window passes, no shuffle
    // between them: both partition on fingerprint)
    "ts_prom_subquery" -> ((s, dir) => {
      val base = querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.eq(Labels.MetricName, "purchase")))
      val inc = graft.ops.PromOps.counterIncrease(base)
        .select(col("fingerprint"), col("labels"), col("t"),
          round(col("increase"), 4).as("v"))
      graft.ops.PromOps.overTime(inc, 3L * 86400000L)
        .select(TsSchema.labelValue(col("labels"), "user").as("user"), col("t"),
          col("v").as("increase"),
          round(col("max_over_time"), 4).as("max_increase_3d"),
          round(col("sum_over_time"), 4).as("sum_increase_3d"))
        .orderBy(col("user"), col("t"), col("increase"))
    }),

    // PromQL time functions (minute/hour/day_of_week/…, UTC; Prometheus
    // 0=Sunday convention)
    "ts_prom_time_fns" -> ((s, dir) => {
      val sel = querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.eq(Labels.MetricName, "signup")))
      sel.select(TsSchema.labelValue(col("labels"), "user").as("user"), col("t"),
          graft.ops.PromOps.timeFunctions(col("t")).as("f"))
        .select(col("user"), col("t"), col("f.minute").as("minute"),
          col("f.hour").as("hour"), col("f.day_of_week").as("day_of_week"),
          col("f.day_of_month").as("day_of_month"), col("f.month").as("month"),
          col("f.year").as("year"))
        .orderBy(col("user"), col("t"))
    }),

    // PromQL offset modifier: day-over-day comparison — current daily
    // sums joined against the same series OFFSET 1d (implemented by
    // time-shifting the right side before the vector match)
    "ts_prom_offset" -> ((s, dir) => {
      val q = querier(s, dir)
      val cur = q.selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "click")))
      graft.ops.PromOps.binaryOp(
        cur, cur.withColumn("t", col("t") + 86400000L),
        onLabels = Seq("user"), stepMs = 86400000L,
        labelValue = TsSchema.labelValue,
        op = (l, r) => l - r)
        .select(col("step_t"), col("on_user").as("user"),
          round(col("lv"), 4).as("today"), round(col("rv"), 4).as("yesterday"),
          round(round(col("lv"), 4) - round(col("rv"), 4), 4).as("dod_delta"))
        .orderBy(col("step_t"), col("user"))
    }),

    // PromQL deriv(): per-series least-squares slope of v over time
    // (seconds), plus predict_linear(1h) from the same regression
    "ts_prom_deriv" -> ((s, dir) =>
      querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "view")))
        .groupBy(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"))
        .agg(
          round(regr_slope(col("v"), col("t") / 1000.0d), 6).as("deriv"),
          round(regr_intercept(col("v"), col("t") / 1000.0d) +
            regr_slope(col("v"), col("t") / 1000.0d) * (lit(Maxt) / 1000.0d + 3600.0d), 2)
            .as("predict_1h"),
          count(lit(1)).as("n_samples"))
        .where(col("n_samples") >= 2)
        .orderBy(col("name"), col("user"), col("big"))),

    // The PromQL FRONT-END end-to-end: the query string a Prometheus
    // user would type, parsed and compiled onto the engine's operators
    // (graft.promql), step-evaluated over the store — gated by a DuckDB
    // oracle that replicates the step/window semantics exactly
    "ts_promql_e2e" -> ((s, dir) =>
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        "sum by (user) (increase(click[1d]))", Mint, Maxt, 86400000L)
        .select(TsSchema.labelValue(col("labels"), "user").as("user"),
          col("t"), round(col("v"), 4).as("v"))
        .orderBy(col("user"), col("t"))),

    // A second parser-driven pipeline: topk over a by-aggregation over
    // a range function, all composed from the PromQL string
    "ts_promql_topk" -> ((s, dir) =>
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        "topk(3, sum by (user) (sum_over_time(purchase[2d])))",
        Mint, Maxt, 172800000L)
        .select(TsSchema.labelValue(col("labels"), "user").as("user"),
          col("t"), round(col("v"), 4).as("v"))
        .orderBy(col("user"), col("t"))),

    // Parser-driven sort_desc (presentation ordering of the instant
    // vector): values/labels pass through, and the defining sort key
    // (per step, value desc then label) is surfaced as `pos` so the
    // oracle gates the full order, not just the row set
    "ts_promql_sort" -> ((s, dir) =>
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        "sort_desc(sum by (user) (sum_over_time(purchase[2d])))",
        Mint, Maxt, 172800000L)
        .select(TsSchema.labelValue(col("labels"), "user").as("user"),
          col("t"), round(col("v"), 4).as("v"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("t"))
            .orderBy(col("v").desc, col("user"))).cast("long"))
        .orderBy(col("t"), col("pos"))),

    // Parser-driven SUBQUERY: the inner instant selector re-evaluated
    // at 1d resolution (5m lookback per inner instant), then averaged
    // over the outer 2d window — the oracle rebuilds both step grids
    "ts_promql_subquery" -> ((s, dir) =>
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        "avg_over_time(purchase[2d:1d])", Mint, Maxt, 86400000L)
        .select(TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), round(col("v"), 4).as("v"))
        .orderBy(col("user"), col("big"), col("t"))),

    // Parser-driven regression functions: predict_linear's horizon rides
    // in the fn name; deriv shares the regression — both join on the
    // per-step window's (series, step) key, gated by DuckDB's regr_*
    "ts_promql_predict" -> ((s, dir) => {
      val q = querier(s, dir)
      val pl = graft.promql.PromQL.rangeQuery(q,
        "predict_linear(view[2d], 3600)", Mint, Maxt, 86400000L)
        .select(TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), round(col("v"), 2).as("predict_1h"))
      val dv = graft.promql.PromQL.rangeQuery(q,
        "deriv(view[2d])", Mint, Maxt, 86400000L)
        .select(TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), round(col("v"), 6).as("deriv"))
      pl.join(dv, Seq("user", "big", "t"))
        .orderBy(col("user"), col("big"), col("t"))
    }),

    // PromQL over NATIVE histograms, via the classic view: per
    // (event_type, day) native histograms (sparse exponential buckets,
    // schema 2) exposed as cumulative le-bucket SERIES at the native
    // bounds (NativeHistogram.toClassicSeries), served by an ordinary
    // TsQuerier, and histogram_quantile evaluated by the PromQL
    // front-end — no histogram-specific code in the evaluator
    "ts_promql_native_hist" -> ((s, dir) => {
      graft.promql.PromQL.rangeQuery(nativeHistQuerier(s, dir),
        "histogram_quantile(0.9, latency)", Mint, Maxt, 86400000L)
        .select(TsSchema.labelValue(col("labels"), "event_type").as("event_type"),
          col("t"), round(col("v"), 6).as("q90"))
        .orderBy(col("event_type"), col("t"))
    }),

    // histogram_fraction through the same classic-view route: fraction
    // of observations in [1.5, 75] per (event_type, day), bounds chosen
    // to land strictly inside buckets so both partial-overlap ends of
    // the uniform-within-bucket estimator are exercised
    "ts_promql_hist_fraction" -> ((s, dir) => {
      graft.promql.PromQL.rangeQuery(nativeHistQuerier(s, dir),
        "histogram_fraction(1.5, 75, latency)", Mint, Maxt, 86400000L)
        .select(TsSchema.labelValue(col("labels"), "event_type").as("event_type"),
          col("t"), round(col("v"), 6).as("frac"))
        .orderBy(col("event_type"), col("t"))
    }),

    // the classic-convention companion series (`latency_count` /
    // `latency_sum`, exact reads of the native row) driven through a
    // plain PromQL binary op — the histogram average with no
    // histogram-specific evaluator code at all
    "ts_promql_native_hist_avg" -> ((s, dir) => {
      graft.promql.PromQL.rangeQuery(nativeHistQuerier(s, dir),
        "latency_sum / latency_count", Mint, Maxt, 86400000L)
        .select(TsSchema.labelValue(col("labels"), "event_type").as("event_type"),
          col("t"), round(col("v"), 6).as("avg_v"))
        .orderBy(col("event_type"), col("t"))
    }),

    // the full Prometheus stats family as evaluator-level FUNCTIONS
    // (`histogram_count/sum/avg/stddev/stdvar`), all five parser routes
    // over one classic-view store: count reads the +Inf bucket, sum the
    // `_sum` companion, avg their ratio (all exact); stddev/stdvar use
    // the classic-interpolation bucket-midpoint estimator (midpoint of
    // (previous present le | 0, le]) — the same family as
    // histogram_quantile over the classic view
    "ts_promql_native_hist_stats" -> ((s, dir) => {
      val q = nativeHistQuerier(s, dir)
      def run(expr: String, alias: String, scale: Int) =
        graft.promql.PromQL.rangeQuery(q, expr, Mint, Maxt, 86400000L)
          .select(TsSchema.labelValue(col("labels"), "event_type").as("event_type"),
            col("t"), round(col("v"), scale).as(alias))
      run("histogram_count(latency)", "cnt", 6)
        .join(run("histogram_sum(latency)", "sum_v", 4), Seq("event_type", "t"))
        .join(run("histogram_avg(latency)", "avg_v", 6), Seq("event_type", "t"))
        .join(run("histogram_stddev(latency)", "stddev_v", 6), Seq("event_type", "t"))
        .join(run("histogram_stdvar(latency)", "stdvar_v", 4), Seq("event_type", "t"))
        .orderBy(col("event_type"), col("t"))
    }),

    // recording rule: the e2e expression materialized into a store as a
    // new metric, then selected back through the ordinary querier — the
    // oracle is the SAME SQL as ts_promql_e2e because the rule series
    // IS that expression's result
    "ts_rule_record" -> ((s, dir) =>
      TsStore.read(s, ruleStore(s, dir)).selectLong(Mint, Maxt, Seq(
        LabelMatcher.eq(Labels.MetricName, "user:click:increase1d")))
        .select(TsSchema.labelValue(col("labels"), "user").as("user"),
          col("t"), round(col("v"), 4).as("v"))
        .orderBy(col("user"), col("t"))),

    // alert rule with a for-duration: fire once the condition has held
    // for 2 consecutive days — a trailing count window over the
    // condition grid, no state machine
    "ts_alert_firing" -> ((s, dir) =>
      graft.promql.AlertRules.firing(querier(s, dir),
        "sum(increase(click[1d])) > 100",
        Mint, Maxt, 86400000L, forMs = 172800000L)
        .select(col("t"), round(col("v"), 4).as("v"))
        .orderBy(col("t"))),

    // count_values through the parser: the instant-vector value
    // distribution per step (1h lookback for density); the value label
    // round-trips back to a double so the oracle compares numerically
    "ts_promql_count_values" -> ((s, dir) =>
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        """count_values("val", purchase)""", Mint, Maxt, 86400000L,
        lookbackMs = 3600000L)
        .select(TsSchema.labelValue(col("labels"), "val").cast("double").as("val"),
          col("t"), col("v").as("n"))
        .orderBy(col("val"), col("t"))),

    // scalar() in arithmetic: each series' share of the per-step total —
    // the scalar side is grid-sized and broadcasts, no extra shuffle
    "ts_promql_scalar" -> ((s, dir) =>
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        "purchase / scalar(sum(purchase))", Mint, Maxt, 86400000L,
        lookbackMs = 3600000L)
        .select(TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), round(col("v"), 6).as("share"))
        .orderBy(col("user"), col("big"), col("t"))),

    // time() arithmetic against a range function: seconds since each
    // series' 2d max was set... the step time enters as a per-step
    // scalar, exercising the scalar-vector broadcast path
    "ts_promql_time_arith" -> ((s, dir) =>
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        "time() - max_over_time(purchase[2d])", Mint, Maxt, 86400000L)
        .select(TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), round(col("v"), 4).as("v"))
        .orderBy(col("user"), col("big"), col("t"))),

    // PromQL irate()/idelta(): instantaneous rate/delta from the last
    // two samples of each series in the range (counter reset → the last
    // value alone is the increase; idelta keeps the raw difference)
    "ts_prom_irate" -> ((s, dir) =>
      graft.ops.PromOps.instantRate(
        querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "click"))))
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          round(col("irate"), 6).as("irate"),
          round(col("idelta"), 4).as("idelta"))
        .orderBy(col("name"), col("user"), col("big"))),

    // PromQL holt_winters (double exponential smoothing) with exactly-
    // representable sf=0.25, tf=0.5 — the sequential per-series fold is
    // reproduced by the oracle as a recursive CTE, so the hash compare
    // covers every intermediate (s, b) step bit-for-bit
    "ts_prom_holt_winters" -> ((s, dir) =>
      graft.ops.PromOps.holtWinters(
        querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "purchase"))),
        sf = 0.25, tf = 0.5)
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          round(col("smoothed"), 4).as("smoothed"), col("n_samples"))
        .orderBy(col("name"), col("user"), col("big"))),

    // PARSED PromQL served from the downsample ladder: the evaluator
    // routes this aligned sum_over_time through the 6h materialized
    // form (TsDownsample.pick) instead of raw samples — the month-scale
    // query path. Window-aligned semantics [t_k - range, t_k), which the
    // oracle replicates directly over raw samples.
    "ts_promql_downsampled" -> ((s, dir) => {
      val down = TsDownsample.downsample(
        querier(s, dir).selectLong(Mint, Maxt, Seq.empty), 21600000L)
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        "sum_over_time(click[2d])", Mint + 172800000L, Maxt, 86400000L,
        downsamples = Seq((21600000L, down)))
        .select(
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), round(col("v"), 4).as("v"))
        .orderBy(col("user"), col("big"), col("t"))
    }),

    // robust dispersion through the PARSED path: median absolute
    // deviation per step window (the experimental upstream
    // mad_over_time) — oracle recomputes both medians with DuckDB's
    // interpolated median(), the same quantile_cont(0.5) rule the
    // evaluator's sorted-array midpoint implements
    "ts_promql_mad" -> ((s, dir) =>
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        "mad_over_time(purchase[2d])", Mint + 172800000L, Maxt, 86400000L)
        .select(
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), round(col("v"), 4).as("v"))
        .orderBy(col("user"), col("big"), col("t"))),

    // the same smoothing through the PARSED PromQL path: per-step
    // [5d] windows, 2 steps — oracle unrolls the fold per (series, step)
    // as a recursive CTE (window semantics left-open, like the evaluator)
    "ts_promql_smooth" -> ((s, dir) =>
      graft.promql.PromQL.rangeQuery(querier(s, dir),
        "double_exponential_smoothing(purchase[5d], 0.25, 0.5)",
        Mint + 432000000L, Maxt, 432000000L)
        .select(
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), round(col("v"), 4).as("v"))
        .orderBy(col("user"), col("big"), col("t"))),

    // PromQL bottomk(3): lowest-sum series per metric (topk's mirror)
    "ts_prom_bottomk" -> ((s, dir) => {
      val perSeries = querier(s, dir).selectLong(Mint, Maxt, Seq.empty)
        .groupBy(col("fingerprint"),
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"))
        .agg(round(sum(col("v")), 4).as("series_sum"))
      graft.ops.PromOps.bottomk(perSeries, k = 3, groupCols = Seq("name"),
        orderCol = "series_sum", tieCols = Seq("user", "big"))
        .select(col("name"), col("rnk").cast("long").as("rnk"),
          col("user"), col("big"), col("series_sum"))
        .orderBy(col("name"), col("rnk"))
    }),

    // PromQL count_values at 1d steps: how many series report each
    // distinct value (instant-vector = last sample per series per step)
    "ts_prom_count_values" -> ((s, dir) => {
      val stepped = querier(s, dir).selectLong(Mint, Maxt, Seq.empty)
        .withColumn("step_t", col("t") - pmod(col("t"), lit(86400000L)))
      val perSeries = stepped
        .groupBy(col("fingerprint"),
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          col("step_t"))
        .agg(max(struct(col("t"), col("v"))).getField("v").as("v"))
      perSeries.groupBy(col("step_t"), col("name"), col("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("step_t"), col("name"), col("v"))
    }),

    // PromQL label_replace + label_join over the series set
    "ts_prom_label_ops" -> ((s, dir) =>
      querier(s, dir).selectLong(Mint, Maxt, Seq.empty)
        .groupBy(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"))
        .agg(count(lit(1)).as("n_samples"))
        .withColumn("region", regexp_replace(col("user"), "^([0-9])[0-9]*$", "g$1"))
        .withColumn("joined", concat_ws("-", col("name"), col("user"), col("big")))
        .orderBy(col("name"), col("user"), col("big"))),

    // PromQL absent_over_time at 1d steps: steps in range with no sample
    // for the matcher (sparse series signup/user=11 — 5 of 10 days)
    "ts_prom_absent" -> ((s, dir) => {
      val steps = s.range(1).select(explode(
        sequence(lit(Mint), lit(Maxt - 1), lit(86400000L))).as("step_t"))
      val present = querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.eq(Labels.MetricName, "signup"), LabelMatcher.eq("user", "11")))
        .select((col("t") - pmod(col("t"), lit(86400000L))).as("step_t")).distinct()
      steps.join(present, Seq("step_t"), "left_anti")
        .select(col("step_t"), lit(1L).as("absent"))
        .orderBy(col("step_t"))
    }),

    // S4/S5 + P6/P10-P12 via the DSv2 block source: write the store out as
    // a native TSDB block (index + XOR chunks), read it back through
    // spark.read.format("graft-tsdb") with label + time pushdown — the
    // oracle is the plain un-encoded select, proving the whole
    // write→index→postings→decode→clamp path end-to-end
    "ts_dsv2_select" -> ((s, dir) => {
      val root = dsv2BlockDir(s, dir)
      s.read.format("graft-tsdb").load(root)
        .where(col(Labels.MetricName) === "click" && col("t").between(Mint, Maxt))
        .select(col(Labels.MetricName).as("name"), col("user"), col("t"), col("v"))
        .orderBy(col("name"), col("user"), col("t"), col("v"))
    }),

    // P7 regex → postings through DSv2: TsdbRegexRewrite (GraftExtensions)
    // rewrites the rlikes into label-value In-lists, which push as
    // postings unions — no series outside the match set is decoded
    "ts_dsv2_regex" -> ((s, dir) => {
      val root = dsv2BlockDir(s, dir)
      s.read.format("graft-tsdb").load(root)
        .where(col(Labels.MetricName).rlike("^(?:cl.*|sign.*)$") &&
          col("user").rlike("^(?:[0-4][0-9])$") && col("t").between(Mint, Maxt))
        .select(col(Labels.MetricName).as("name"), col("user"), col("t"), col("v"))
        .orderBy(col("name"), col("user"), col("t"), col("v"))
    }),

    // P3/P7 `!=` → complement-of-values postings through DSv2
    "ts_dsv2_neq" -> ((s, dir) => {
      val root = dsv2BlockDir(s, dir)
      s.read.format("graft-tsdb").load(root)
        .where(col(Labels.MetricName) =!= "click" &&
          col("user").isin("10", "11", "12") && col("t").between(Mint, Maxt))
        .select(col(Labels.MetricName).as("name"), col("user"), col("t"), col("v"))
        .orderBy(col("name"), col("user"), col("t"), col("v"))
    }),

    // S5/S9 in-engine round-trip: assemble per-series chunks, XOR-encode,
    // decode back, re-explode — output must equal the plain select (the
    // oracle is the UNENCODED query, proving codec fidelity end-to-end)
    "ts_chunk_roundtrip" -> ((s, dir) => {
      import graft.functions.{tsdb_decode_chunk, tsdb_encode_chunk}
      val chunks = querier(s, dir)
        .selectLong(Mint, Maxt, Seq(LabelMatcher.eq(Labels.MetricName, "signup")))
        .groupBy(col("fingerprint"), col("labels"))
        .agg(sort_array(collect_list(struct(col("t"), col("v")))).as("samples"))
        .select(col("labels"), tsdb_encode_chunk(col("samples")).as("chunk"))
      chunks
        .select(col("labels"), explode(tsdb_decode_chunk(col("chunk"))).as("s"))
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          col("s.t").as("t"), col("s.v").as("v"))
        .orderBy(col("name"), col("user"), col("t"), col("v"))
    }),

    // Thanos-style downsampling (TsDownsample): per-series 1d aggregate
    // windows — the long-range-query lever for a long-term store; the
    // aggregate set (n/sum/min/max/first/last/inc) is closed under
    // query-time re-aggregation
    "ts_downsample" -> ((s, dir) =>
      TsDownsample.downsample(
        querier(s, dir).selectLong(Mint, Maxt, Seq(LabelMatcher.neq("user", ""))),
        86400000L)
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("w_t"), col("n"), round(col("sum_v"), 2).as("sum_v"),
          col("min_v"), col("max_v"), col("first_v"), col("last_v"),
          round(col("inc_v"), 2).as("inc_v"))
        .orderBy(col("name"), col("user"), col("big"), col("w_t"))),

    // counter increase computed FROM the downsampled form — exactly equal
    // to the raw reset-corrected increase (every raw sample pair is either
    // intra-window inc_v or a boundary delta between consecutive rows)
    "ts_downsample_rate" -> ((s, dir) => {
      val down = TsDownsample.downsample(
        querier(s, dir).selectLong(Mint, Maxt, Seq(
          LabelMatcher.eq(Labels.MetricName, "click"))), 86400000L)
      TsDownsample.increaseOver(down, 86400000L, Mint, Maxt)
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          round(col("increase"), 2).as("increase"), col("n_samples"))
        .orderBy(col("name"), col("user"), col("big"))
    }),

    // the query-path payoff of downsampling: step-gridded
    // sum/min/max/count/avg_over_time served from 6h windows — exact for
    // window-aligned queries, reading resolution²-fewer rows than raw
    "ts_prom_downsampled" -> ((s, dir) => {
      val down = TsDownsample.downsample(
        querier(s, dir).selectLong(Mint, Maxt, Seq(
          LabelMatcher.eq(Labels.MetricName, "view"))), 21600000L)
      TsDownsample.overTime(down, 21600000L, Mint, Maxt, 86400000L, 86400000L)
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), col("n"), round(col("sum_v"), 2).as("sum_v"),
          col("min_v"), col("max_v"),
          round(col("sum_v") / col("n"), 6).as("avg_v"))
        .orderBy(col("name"), col("user"), col("big"), col("t"))
    }),

    // step-gridded counter increase from the 6h downsampled form (2d
    // windows at 1d steps) — exact: in-range window increases plus
    // reset-corrected boundary deltas between consecutive rows
    "ts_downsample_rate_steps" -> ((s, dir) => {
      val down = TsDownsample.downsample(
        querier(s, dir).selectLong(Mint, Maxt, Seq(
          LabelMatcher.eq(Labels.MetricName, "error"))), 21600000L)
      TsDownsample.increaseAtSteps(down, 21600000L, Mint, Maxt,
        86400000L, 2 * 86400000L)
        .select(
          TsSchema.labelValue(col("labels"), Labels.MetricName).as("name"),
          TsSchema.labelValue(col("labels"), "user").as("user"),
          TsSchema.labelValue(col("labels"), "big").as("big"),
          col("t"), round(col("increase"), 2).as("increase"), col("n_samples"))
        .orderBy(col("name"), col("user"), col("big"), col("t"))
    }),

    // Thanos-Querier-style federation (TsFederatedQuerier): two
    // OVERLAPPING store shards (split at mid-range with a 2-day overlap)
    // fan in; exact duplicate samples collapse by (series, t) — the
    // result must equal a single-store select, which is the oracle
    "ts_federated_select" -> ((s, dir) => {
      val mid = (Mint + Maxt) / 2
      val full = store(s, dir)
      val shard1 = new TsQuerier(full.where(col("t") <= mid + 86400000L),
        promoted = Seq(Labels.MetricName))
      val shard2 = new TsQuerier(full.where(col("t") >= mid - 86400000L),
        promoted = Seq(Labels.MetricName))
      val fed = new TsFederatedQuerier(Seq(shard1, shard2), dedupOverlap = true)
      flat(fed.selectLong(Mint, Maxt, Seq(
        LabelMatcher.re(Labels.MetricName, "click|error"))))
    }),

    // HA replica dedup (ReplicaDedup): two synthetic replicas with
    // deterministic sample gaps; per (series, 1d window) the replica with
    // the most samples is elected (tie → smallest name) and only its
    // samples survive — the Cortex/Mimir HA-tracker model
    "ts_replica_dedup" -> ((s, dir) => {
      val base = querier(s, dir).selectLong(Mint, Maxt, Seq(
        LabelMatcher.re(Labels.MetricName, "click|error")))
      def rep(n: String, pred: org.apache.spark.sql.Column) = base.where(pred)
        .withColumn("labels", array_sort(concat(col("labels"),
          array(struct(lit("replica").as("name"), lit(n).as("value"))))))
      val r0 = rep("r0", expr("(t div 3600000) % 5 != 0"))
      val r1 = rep("r1", expr("(t div 3600000) % 4 != 0"))
      flat(ReplicaDedup.dedup(r0.unionByName(r1), "replica", 86400000L))
    })
  )

  private def flatOracle(pred: String): String =
    s"""SELECT name, "user", t, v FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND ($pred) ORDER BY name, "user", t, v"""

  val oracles: Map[String, String] = Map(
    // native-histogram quantile through the PromQL front-end: same
    // bucket math as q_native_hist_quantile (correctly-rounded ln(2)
    // literal, bit-identical bucket indices) with the day dimension of
    // the step grid added; each day-start histogram serves exactly its
    // own step, so the oracle needs no lookback modeling
    "ts_promql_native_hist" ->
      s"""WITH ev AS (SELECT event_type, "value" AS value,
         |   epoch_ms(ts) - epoch_ms(ts) % 86400000 AS t FROM events),
         | evw AS (SELECT * FROM ev WHERE t BETWEEN $Mint AND $Maxt),
         | obs AS (SELECT event_type, t,
         |   ceil(ln(value) / 0.6931471805599453 * 4)::BIGINT AS idx
         |  FROM evw WHERE value > 0),
         | b AS (SELECT event_type, t, idx, count(*) AS cnt FROM obs GROUP BY 1, 2, 3),
         | tot AS (SELECT event_type, t, count(*) AS n FROM evw GROUP BY 1, 2),
         | cm AS (SELECT event_type, t, idx, power(2.0, idx / 4.0) AS le,
         |   sum(cnt) OVER (PARTITION BY event_type, t ORDER BY idx) AS cum FROM b),
         | buckets AS (SELECT event_type, t, le, cum FROM cm
         |  UNION ALL SELECT event_type, t, 'Infinity'::DOUBLE, n FROM tot),
         | ranked AS (SELECT event_type, t, le, cum,
         |   lag(le) OVER w AS prev_le, lag(cum) OVER w AS prev_cum,
         |   max(cum) OVER (PARTITION BY event_type, t) AS total,
         |   max(CASE WHEN le <> 'Infinity'::DOUBLE THEN le END)
         |     OVER (PARTITION BY event_type, t) AS max_finite_le
         |  FROM buckets WINDOW w AS (PARTITION BY event_type, t ORDER BY le)),
         | hit AS (SELECT *, row_number() OVER (PARTITION BY event_type, t ORDER BY le) AS rn
         |  FROM (SELECT *, 0.9 * total AS rank FROM ranked) WHERE cum >= rank)
         | SELECT event_type, t, round(CASE WHEN le = 'Infinity'::DOUBLE THEN max_finite_le
         |  ELSE coalesce(prev_le, 0.0) + (le - coalesce(prev_le, 0.0)) *
         |   ((rank - coalesce(prev_cum, 0.0)) / (cum - coalesce(prev_cum, 0.0))) END, 6) AS q90
         | FROM hit WHERE rn = 1 ORDER BY event_type, t""".stripMargin.replace("\n", " "),
    // same bucket frame as ts_promql_native_hist, then the
    // uniform-within-bucket overlap estimator: each bucket ((prev
    // present le | 0), le] contributes its count times the overlapped
    // share of its width; the +Inf bucket is a point mass at the
    // largest finite bound (dual of the quantile's +Inf rule — empty
    // here since every value lands in a finite bucket)
    "ts_promql_hist_fraction" ->
      s"""WITH ev AS (SELECT event_type, "value" AS value,
         |   epoch_ms(ts) - epoch_ms(ts) % 86400000 AS t FROM events),
         | evw AS (SELECT * FROM ev WHERE t BETWEEN $Mint AND $Maxt),
         | obs AS (SELECT event_type, t,
         |   ceil(ln(value) / 0.6931471805599453 * 4)::BIGINT AS idx
         |  FROM evw WHERE value > 0),
         | b AS (SELECT event_type, t, idx, count(*) AS cnt FROM obs GROUP BY 1, 2, 3),
         | tot AS (SELECT event_type, t, count(*) AS n FROM evw GROUP BY 1, 2),
         | cm AS (SELECT event_type, t, idx, power(2.0, idx / 4.0) AS le,
         |   sum(cnt) OVER (PARTITION BY event_type, t ORDER BY idx) AS cum FROM b),
         | buckets AS (SELECT event_type, t, le, cum FROM cm
         |  UNION ALL SELECT event_type, t, 'Infinity'::DOUBLE, n FROM tot),
         | ranked AS (SELECT event_type, t, le, cum,
         |   coalesce(lag(le) OVER w, least(le, 0.0)) AS lower,
         |   cum - coalesce(lag(cum) OVER w, 0) AS cnt,
         |   max(cum) OVER (PARTITION BY event_type, t) AS total,
         |   max(CASE WHEN le <> 'Infinity'::DOUBLE THEN le END)
         |     OVER (PARTITION BY event_type, t) AS max_finite_le
         |  FROM buckets WINDOW w AS (PARTITION BY event_type, t ORDER BY le)),
         | c AS (SELECT event_type, t, total,
         |   CASE WHEN le = 'Infinity'::DOUBLE THEN
         |     CASE WHEN coalesce(max_finite_le, 0.0) BETWEEN 1.5 AND 75.0
         |       THEN cnt ELSE 0 END
         |   ELSE cnt * greatest(least(75.0, le) - greatest(1.5, lower), 0.0)
         |     / (le - lower) END AS contrib FROM ranked)
         | SELECT event_type, t, round(sum(contrib) / max(total), 6) AS frac
         | FROM c GROUP BY event_type, t ORDER BY event_type, t""".stripMargin.replace("\n", " "),
    // the stats family: count/sum/avg are exact reads of the corpus;
    // stddev/stdvar replicate the classic-interpolation bucket-midpoint
    // estimator over the same bucket frame as ts_promql_native_hist —
    // de-cumulate consecutive present les, mass at (prev_le + le)/2,
    // +Inf mass excluded from the moments
    "ts_promql_native_hist_stats" ->
      s"""WITH ev AS (SELECT event_type, "value" AS value,
         |   epoch_ms(ts) - epoch_ms(ts) % 86400000 AS t FROM events),
         | evw AS (SELECT * FROM ev WHERE t BETWEEN $Mint AND $Maxt),
         | obs AS (SELECT event_type, t,
         |   ceil(ln(value) / 0.6931471805599453 * 4)::BIGINT AS idx
         |  FROM evw WHERE value > 0),
         | b AS (SELECT event_type, t, idx, count(*) AS cnt FROM obs GROUP BY 1, 2, 3),
         | tot AS (SELECT event_type, t, count(*) AS n, sum(value) AS sv
         |  FROM evw GROUP BY 1, 2),
         | cm AS (SELECT event_type, t, idx, power(2.0, idx / 4.0) AS le,
         |   sum(cnt) OVER (PARTITION BY event_type, t ORDER BY idx) AS cum FROM b),
         | buckets AS (SELECT event_type, t, le, cum FROM cm
         |  UNION ALL SELECT event_type, t, 'Infinity'::DOUBLE, n FROM tot),
         | dd AS MATERIALIZED (SELECT event_type, t, le,
         |   (cum - coalesce(lag(cum) OVER w, 0))::DOUBLE AS cnt,
         |   (coalesce(lag(le) OVER w, 0.0) + le) / 2 AS mid
         |  FROM buckets WINDOW w AS (PARTITION BY event_type, t ORDER BY le)),
         | mn AS MATERIALIZED (SELECT dd.event_type, dd.t,
         |   sum(CASE WHEN le <> 'Infinity'::DOUBLE THEN cnt * mid ELSE 0 END)
         |     / max(tot.n) AS mean
         |  FROM dd JOIN tot ON dd.event_type = tot.event_type AND dd.t = tot.t
         |  GROUP BY 1, 2),
         | mo AS (SELECT dd.event_type, dd.t,
         |   sum(CASE WHEN le <> 'Infinity'::DOUBLE
         |    THEN cnt * (mid - mean) * (mid - mean)
         |    ELSE 0 END) AS dev2
         |  FROM dd JOIN mn ON dd.event_type = mn.event_type AND dd.t = mn.t
         |  GROUP BY 1, 2)
         | SELECT tot.event_type, tot.t, round(tot.n::DOUBLE, 6) AS cnt,
         |  round(tot.sv, 4) AS sum_v, round(tot.sv / tot.n, 6) AS avg_v,
         |  round(sqrt(mo.dev2 / tot.n), 6) AS stddev_v,
         |  round(mo.dev2 / tot.n, 4) AS stdvar_v
         | FROM tot JOIN mo ON tot.event_type = mo.event_type AND tot.t = mo.t
         | ORDER BY tot.event_type, tot.t""".stripMargin.replace("\n", " "),
    // exact: observe() counts every row and sums every value, so the
    // PromQL `latency_sum / latency_count` is plain per-group average
    "ts_promql_native_hist_avg" ->
      s"""SELECT event_type, epoch_ms(ts) - epoch_ms(ts) % 86400000 AS t,
         | round(sum("value") / count(*), 6) AS avg_v FROM events
         | WHERE epoch_ms(ts) - epoch_ms(ts) % 86400000 BETWEEN $Mint AND $Maxt
         | GROUP BY 1, 2 ORDER BY event_type, t""".stripMargin.replace("\n", " "),
    "ts_select_eq" -> flatOracle("name = 'click'"),
    "ts_select_regex" -> flatOracle(
      "regexp_matches(name, '^(?:cl.*|sign.*)$') AND regexp_matches(\"user\", '^(?:[0-4][0-9])$')"),
    "ts_select_neg" -> flatOracle(
      "name <> 'click' AND NOT regexp_matches(\"user\", '^(?:1.*)$')"),
    "ts_select_prefix" -> flatOracle(
      "starts_with(name, 's') AND starts_with(\"user\", '2')"),
    "ts_select_absent" -> flatOracle("big = '' AND name = 'error'"),
    "ts_select_present" -> flatOracle("big <> '' AND name = 'purchase'"),
    "ts_series_agg" ->
      s"""SELECT name, "user", count(*) AS n_samples, min(t) AS min_t, max(t) AS max_t,
         | round(sum(v), 2) AS sum_v FROM ($oracleBase)
         | WHERE t BETWEEN $Mint AND $Maxt GROUP BY name, "user" ORDER BY name, "user"""".stripMargin.replace("\n", " "),
    "ts_label_values" ->
      "SELECT DISTINCT CAST(user_id AS VARCHAR) AS value FROM events ORDER BY value",
    "ts_label_names" ->
      """SELECT name FROM (SELECT '__name__' AS name UNION SELECT 'user'
        | UNION SELECT DISTINCT 'big' FROM events WHERE "value" >= 100) ORDER BY name""".stripMargin.replace("\n", " "),
    "ts_cardinality" ->
      s"""WITH series AS (SELECT DISTINCT name, "user", big FROM ($oracleBase)),
         | lab AS (SELECT '__name__' AS label, name AS value FROM series
         |   UNION ALL SELECT 'user', "user" FROM series
         |   UNION ALL SELECT 'big', big FROM series WHERE big <> '')
         |SELECT label, count(DISTINCT value) AS n_values, count(*) AS n_series
         |  FROM lab GROUP BY label ORDER BY label""".stripMargin.replace("\n", " "),
    "ts_tsdb_pairs" ->
      s"""WITH series AS (SELECT DISTINCT name, "user", big FROM ($oracleBase)),
         | lab AS (SELECT '__name__' AS lname, name AS value FROM series
         |   UNION ALL SELECT 'user', "user" FROM series
         |   UNION ALL SELECT 'big', big FROM series WHERE big <> '')
         |SELECT lname || '=' || value AS name, CAST(count(*) AS BIGINT) AS value
         |  FROM lab GROUP BY 1 ORDER BY value DESC, name LIMIT 10""".stripMargin.replace("\n", " "),
    "ts_tombstone" ->
      s"""SELECT name, "user", t, v FROM ($oracleBase)
         | WHERE t BETWEEN $Mint AND $Maxt
         |  AND regexp_matches(name, '^(?:click|error)$$')
         |  AND NOT (name = 'click' AND t BETWEEN 1704844800000 AND 1705276800000)
         |  AND NOT (name = 'error' AND t BETWEEN 1705276800000 AND 1705708800000)
         | ORDER BY name, "user", t, v""".stripMargin.replace("\n", " "),
    "ts_delete_select" ->
      s"""SELECT name, "user", t, v FROM ($oracleBase)
         | WHERE t BETWEEN $Mint AND $Maxt
         |  AND regexp_matches(name, '^(?:click|error)$$')
         |  AND NOT (name = 'click' AND t BETWEEN 1704844800000 AND 1705276800000)
         |  AND NOT (name = 'error' AND t BETWEEN 1705276800000 AND 1705708800000)
         | ORDER BY name, "user", t, v""".stripMargin.replace("\n", " "),
    "ts_downsample" ->
      s"""WITH raw AS (SELECT name, "user", big, t, v FROM ($oracleBase)
         |             WHERE t BETWEEN $Mint AND $Maxt AND "user" <> ''),
         | lagd AS (SELECT *, lag(v) OVER w AS pv, lag(t) OVER w AS pt FROM raw
         |          WINDOW w AS (PARTITION BY name, "user", big ORDER BY t))
         |SELECT name, "user", big, t - t % 86400000 AS w_t, count(*) AS n,
         |       round(sum(v), 2) AS sum_v, min(v) AS min_v, max(v) AS max_v,
         |       min_by(v, t) AS first_v, max_by(v, t) AS last_v,
         |       round(sum(CASE WHEN pv IS NULL OR pt - pt % 86400000 <> t - t % 86400000 THEN 0
         |                      WHEN v >= pv THEN v - pv ELSE v END), 2) AS inc_v
         |  FROM lagd GROUP BY name, "user", big, w_t
         | ORDER BY name, "user", big, w_t""".stripMargin.replace("\n", " "),
    "ts_downsample_rate" ->
      s"""WITH raw AS (SELECT name, "user", big, t, v FROM ($oracleBase)
         |             WHERE t BETWEEN $Mint AND $Maxt AND name = 'click'),
         | lagd AS (SELECT *, lag(v) OVER w AS pv FROM raw
         |          WINDOW w AS (PARTITION BY name, "user", big ORDER BY t))
         |SELECT name, "user", big,
         |       round(sum(CASE WHEN pv IS NULL THEN 0
         |                      WHEN v >= pv THEN v - pv ELSE v END), 2) AS increase,
         |       count(*) AS n_samples
         |  FROM lagd GROUP BY name, "user", big
         | ORDER BY name, "user", big""".stripMargin.replace("\n", " "),
    "ts_prom_downsampled" ->
      s"""WITH steps AS (SELECT unnest(range(${Mint + 86400000L}, ${Maxt + 1}, 86400000)) AS step_t),
         | raw AS (SELECT name, "user", big, t, v FROM ($oracleBase)
         |         WHERE t BETWEEN $Mint AND $Maxt AND name = 'view')
         |SELECT r.name, r."user", r.big, s.step_t AS t, count(*) AS n,
         |       round(sum(v), 2) AS sum_v, min(v) AS min_v, max(v) AS max_v,
         |       round(sum(v) / count(*), 6) AS avg_v
         |  FROM raw r JOIN steps s
         |    ON r.t >= s.step_t - 86400000 AND r.t < s.step_t
         | GROUP BY r.name, r."user", r.big, s.step_t
         | ORDER BY r.name, r."user", r.big, s.step_t""".stripMargin.replace("\n", " "),
    "ts_federated_select" -> flatOracle("regexp_matches(name, '^(?:click|error)$')"),
    "ts_downsample_rate_steps" ->
      s"""WITH steps AS (SELECT unnest(range($Mint, ${Maxt + 1}, 86400000)) AS step_t),
         | raw AS (SELECT name, "user", big, t, v FROM ($oracleBase)
         |         WHERE t BETWEEN $Mint AND $Maxt AND name = 'error'),
         | stepped AS (SELECT r.*, s.step_t FROM raw r JOIN steps s
         |   ON r.t >= s.step_t - ${2 * 86400000L} AND r.t < s.step_t),
         | lagd AS (SELECT *, lag(v) OVER w AS pv FROM stepped
         |   WINDOW w AS (PARTITION BY name, "user", big, step_t ORDER BY t))
         |SELECT name, "user", big, step_t AS t,
         |       round(sum(CASE WHEN pv IS NULL THEN 0
         |                      WHEN v >= pv THEN v - pv ELSE v END), 2) AS increase,
         |       count(*) AS n_samples
         |  FROM lagd GROUP BY name, "user", big, step_t
         | ORDER BY name, "user", big, step_t""".stripMargin.replace("\n", " "),
    "ts_replica_dedup" ->
      s"""WITH raw AS (SELECT name, "user", big, t, v FROM ($oracleBase)
         |             WHERE t BETWEEN $Mint AND $Maxt
         |               AND regexp_matches(name, '^(?:click|error)$$')),
         | reps AS (SELECT 'r0' AS rep, * FROM raw WHERE (t // 3600000) % 5 <> 0
         |          UNION ALL
         |          SELECT 'r1' AS rep, * FROM raw WHERE (t // 3600000) % 4 <> 0),
         | wr AS (SELECT *, t - t % 86400000 AS w FROM reps),
         | cnt AS (SELECT name, "user", big, w, rep, count(*) AS n FROM wr
         |         GROUP BY name, "user", big, w, rep),
         | el AS (SELECT name, "user", big, w, rep FROM
         |          (SELECT *, row_number() OVER (PARTITION BY name, "user", big, w
         |                                        ORDER BY n DESC, rep) AS rn FROM cnt)
         |        WHERE rn = 1)
         |SELECT w.name, w."user", w.t, w.v FROM wr w JOIN el e
         |    ON w.name = e.name AND w."user" = e."user" AND w.big = e.big
         |   AND w.w = e.w AND w.rep = e.rep
         | ORDER BY w.name, w."user", w.t, w.v""".stripMargin.replace("\n", " "),
    "ts_rate" ->
      s"""SELECT name, "user", t, round((v - prev_v) / ((t - prev_t) / 1000.0), 6) AS rate
         | FROM (
         |  SELECT name, "user", t, v,
         |   lag(t) OVER w AS prev_t, lag(v) OVER w AS prev_v
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'purchase'
         |  WINDOW w AS (PARTITION BY name, "user", big ORDER BY t)
         | ) WHERE prev_t IS NOT NULL ORDER BY name, "user", t""".stripMargin.replace("\n", " "),
    "ts_chunk_roundtrip" ->
      flatOracle("name = 'signup'"),
    "ts_dsv2_select" -> flatOracle("name = 'click'"),
    "ts_dsv2_regex" -> flatOracle(
      "regexp_matches(name, '^(?:cl.*|sign.*)$') AND regexp_matches(\"user\", '^(?:[0-4][0-9])$')"),
    "ts_dsv2_neq" -> flatOracle(
      "name <> 'click' AND \"user\" IN ('10','11','12')"),
    "ts_prom_rate" ->
      s"""SELECT name, "user", t,
         | round(CASE WHEN v >= prev_v THEN v - prev_v ELSE v END, 6) AS increase,
         | round((CASE WHEN v >= prev_v THEN v - prev_v ELSE v END) / ((t - prev_t) / 1000.0), 6) AS rate
         | FROM (
         |  SELECT name, "user", t, v, lag(v) OVER w AS prev_v, lag(t) OVER w AS prev_t
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'error'
         |  WINDOW w AS (PARTITION BY name, "user", big ORDER BY t)
         | ) WHERE prev_v IS NOT NULL ORDER BY name, "user", t""".stripMargin.replace("\n", " "),
    "ts_prom_over_time" ->
      s"""SELECT name, "user", t,
         | round(sum(v) OVER w, 4) AS sot,
         | round(avg(v) OVER w, 6) AS aot,
         | count(v) OVER w AS cot
         | FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'view'
         | WINDOW w AS (PARTITION BY name, "user", big ORDER BY t
         |   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)
         | ORDER BY name, "user", t""".stripMargin.replace("\n", " "),
    "ts_prom_agg_by" ->
      s"""WITH stepped AS (
         |  SELECT name, "user", big, t - (t % 3600000) AS step_t, t, v
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt),
         | per_series AS (
         |  SELECT name, "user", big, step_t, (max({'t': t, 'v': v})).v AS v
         |  FROM stepped GROUP BY name, "user", big, step_t)
         | SELECT step_t, name, round(sum(v), 4) AS sum_v, round(round(sum(v), 4) / count(*), 6) AS avg_v,
         |  count(*) AS n_series
         | FROM per_series GROUP BY step_t, name ORDER BY step_t, name""".stripMargin.replace("\n", " "),
    "ts_prom_topk" ->
      s"""WITH per_series AS (
         |  SELECT name, "user", big, round(sum(v), 4) AS series_sum
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt
         |  GROUP BY name, "user", big),
         | ranked AS (SELECT name, "user", big, series_sum,
         |  row_number() OVER (PARTITION BY name ORDER BY series_sum DESC, "user", big) AS rnk
         |  FROM per_series)
         | SELECT name, rnk, "user", big, series_sum FROM ranked
         | WHERE rnk <= 3 ORDER BY name, rnk""".stripMargin.replace("\n", " "),
    "ts_prom_increase" ->
      s"""WITH lagged AS (
         |  SELECT name, "user", big, t, v, lag(v) OVER w AS prev_v
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'error'
         |  WINDOW w AS (PARTITION BY name, "user", big ORDER BY t)),
         | inc AS (
         |  SELECT name, "user", big, t,
         |   CASE WHEN v >= prev_v THEN v - prev_v ELSE v END AS increase
         |  FROM lagged WHERE prev_v IS NOT NULL)
         | SELECT name, "user", t, round(sum(increase) OVER (
         |   PARTITION BY name, "user", big ORDER BY t
         |   RANGE BETWEEN 7200000 PRECEDING AND CURRENT ROW), 4) AS iot
         | FROM inc ORDER BY name, "user", t""".stripMargin.replace("\n", " "),
    "ts_prom_resets" ->
      s"""SELECT name, "user", big,
         | CAST(sum(CASE WHEN prev_v IS NOT NULL AND v < prev_v THEN 1 ELSE 0 END) AS BIGINT) AS resets,
         | CAST(sum(CASE WHEN prev_v IS NOT NULL AND v <> prev_v THEN 1 ELSE 0 END) AS BIGINT) AS changes,
         | count(*) AS n_samples
         | FROM (
         |  SELECT name, "user", big, v, lag(v) OVER w AS prev_v
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'click'
         |  WINDOW w AS (PARTITION BY name, "user", big ORDER BY t))
         | GROUP BY name, "user", big ORDER BY name, "user", big""".stripMargin.replace("\n", " "),
    "ts_prom_quantile" ->
      s"""SELECT name, "user", big,
         | round(quantile_cont(v, 0.5), 4) AS q50,
         | round(quantile_cont(v, 0.9), 4) AS q90,
         | round(stddev_pop(v), 4) AS sd,
         | round(pow(round(stddev_pop(v), 4), 2), 4) AS sv,
         | count(*) AS n_samples
         | FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'view'
         | GROUP BY name, "user", big ORDER BY name, "user", big""".stripMargin.replace("\n", " "),
    "ts_prom_hist_quantile" ->
      s"""WITH grouped AS (
         |  SELECT name,
         |   sum(CASE WHEN v <= 25.0 THEN 1 ELSE 0 END) AS c0,
         |   sum(CASE WHEN v <= 50.0 THEN 1 ELSE 0 END) AS c1,
         |   sum(CASE WHEN v <= 100.0 THEN 1 ELSE 0 END) AS c2,
         |   sum(CASE WHEN v <= 250.0 THEN 1 ELSE 0 END) AS c3,
         |   count(*) AS c4
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt GROUP BY name),
         | buckets AS (
         |  SELECT name, 25.0 AS le, c0 AS cum FROM grouped
         |  UNION ALL SELECT name, 50.0, c1 FROM grouped
         |  UNION ALL SELECT name, 100.0, c2 FROM grouped
         |  UNION ALL SELECT name, 250.0, c3 FROM grouped
         |  UNION ALL SELECT name, 'Infinity'::DOUBLE, c4 FROM grouped),
         | ranked AS (
         |  SELECT name, le, cum,
         |   lag(le) OVER w AS prev_le, lag(cum) OVER w AS prev_cum,
         |   max(cum) OVER (PARTITION BY name) AS total,
         |   max(CASE WHEN le <> 'Infinity'::DOUBLE THEN le END)
         |     OVER (PARTITION BY name) AS max_finite_le
         |  FROM buckets WINDOW w AS (PARTITION BY name ORDER BY le)),
         | hit AS (
         |  SELECT *, row_number() OVER (PARTITION BY name ORDER BY le) AS rn
         |  FROM (SELECT *, 0.9 * total AS rank FROM ranked) WHERE cum >= rank)
         | SELECT name, round(CASE WHEN le = 'Infinity'::DOUBLE THEN max_finite_le
         |  ELSE coalesce(prev_le, 0.0) + (le - coalesce(prev_le, 0.0)) *
         |   ((rank - coalesce(prev_cum, 0.0)) / (cum - coalesce(prev_cum, 0.0))) END, 6) AS q90
         | FROM hit WHERE rn = 1 ORDER BY name""".stripMargin.replace("\n", " "),
    "ts_prom_binary_op" ->
      s"""WITH stepped AS (
         |  SELECT name, "user", big, t - (t % 86400000) AS step_t, t, v
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name IN ('error', 'view')),
         | per_series AS (
         |  SELECT name, "user", big, step_t, (max({'t': t, 'v': v})).v AS v
         |  FROM stepped GROUP BY name, "user", big, step_t),
         | sums AS (
         |  SELECT name, "user", step_t, sum(v) AS sv
         |  FROM per_series GROUP BY name, "user", step_t)
         | SELECT e.step_t, e."user" AS "user",
         |  round(e.sv, 4) AS err_sum, round(v.sv, 4) AS view_sum,
         |  round(round(e.sv, 4) / round(v.sv, 4), 6) AS ratio
         | FROM (SELECT * FROM sums WHERE name = 'error') e
         | JOIN (SELECT * FROM sums WHERE name = 'view') v
         |  ON e.step_t = v.step_t AND e."user" = v."user"
         | ORDER BY e.step_t, e."user"""".stripMargin.replace("\n", " "),
    "ts_prom_group_left" ->
      s"""WITH stepped AS (
         |  SELECT name, "user", big, t - (t % 86400000) AS step_t, t, v
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt
         |   AND regexp_matches(name, '^(?:click|purchase)$$')),
         | per_series AS (
         |  SELECT name, "user", big, step_t, (max({'t': t, 'v': v})).v AS v
         |  FROM stepped GROUP BY name, "user", big, step_t),
         | totals AS (
         |  SELECT name, step_t, sum(v) AS rv FROM per_series GROUP BY name, step_t)
         | SELECT p.step_t, p.name AS name, p."user" AS "user",
         |  round(p.v, 4) AS user_v, round(t.rv, 4) AS total_sum,
         |  round(round(p.v, 4) / round(t.rv, 4), 6) AS share
         | FROM per_series p JOIN totals t ON p.name = t.name AND p.step_t = t.step_t
         | ORDER BY name, "user", p.step_t, user_v""".stripMargin.replace("\n", " "),
    "ts_promql_e2e" -> promqlE2eSql,
    // the recording rule materializes exactly the e2e expression, so
    // the same oracle verifies the record → store → select round-trip
    "ts_rule_record" -> promqlE2eSql,
    "ts_promql_topk" ->
      s"""WITH steps AS (SELECT unnest(range($Mint, $Maxt + 1, 172800000)) AS step_t),
         | raw AS (SELECT name, "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'purchase' AND t > $Mint - 172800000 AND t <= $Maxt),
         | win AS (SELECT r."user", r.big, r.t, r.v, s.step_t
         |         FROM raw r JOIN steps s
         |           ON r.t > s.step_t - 172800000 AND r.t <= s.step_t),
         | ser AS (SELECT "user", big, step_t, sum(v) AS sv FROM win GROUP BY 1, 2, 3),
         | byu AS (SELECT "user", step_t, sum(sv) AS v FROM ser GROUP BY 1, 2),
         | ranked AS (SELECT *, row_number() OVER (
         |             PARTITION BY step_t ORDER BY v DESC, "user") AS rnk FROM byu)
         | SELECT "user", step_t AS t, round(v, 4) AS v
         | FROM ranked WHERE rnk <= 3 ORDER BY "user", t""".stripMargin.replace("\n", " "),
    "ts_promql_sort" ->
      s"""WITH steps AS (SELECT unnest(range($Mint, $Maxt + 1, 172800000)) AS step_t),
         | raw AS (SELECT name, "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'purchase' AND t > $Mint - 172800000 AND t <= $Maxt),
         | win AS (SELECT r."user", r.big, r.t, r.v, s.step_t
         |         FROM raw r JOIN steps s
         |           ON r.t > s.step_t - 172800000 AND r.t <= s.step_t),
         | ser AS (SELECT "user", big, step_t, sum(v) AS sv FROM win GROUP BY 1, 2, 3),
         | byu AS (SELECT "user", step_t, round(sum(sv), 4) AS v FROM ser GROUP BY 1, 2)
         | SELECT "user", step_t AS t, v, row_number() OVER (
         |   PARTITION BY step_t ORDER BY v DESC, "user") AS pos
         | FROM byu ORDER BY t, pos""".stripMargin.replace("\n", " "),
    "ts_promql_subquery" ->
      s"""WITH isteps AS (
         |   SELECT unnest(range($Mint - 172800000, $Maxt + 1, 86400000)) AS is_t),
         | osteps AS (SELECT unnest(range($Mint, $Maxt + 1, 86400000)) AS step_t),
         | raw AS (SELECT "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'purchase'),
         | inner_v AS (
         |   SELECT r."user", r.big, s.is_t, (max({'t': r.t, 'v': r.v})).v AS iv
         |   FROM raw r JOIN isteps s
         |     ON r.t > s.is_t - 300000 AND r.t <= s.is_t
         |   GROUP BY r."user", r.big, s.is_t),
         | outer_v AS (
         |   SELECT i."user", i.big, o.step_t, avg(i.iv) AS v
         |   FROM inner_v i JOIN osteps o
         |     ON i.is_t > o.step_t - 172800000 AND i.is_t <= o.step_t
         |   GROUP BY i."user", i.big, o.step_t)
         | SELECT "user", big, step_t AS t, round(v, 4) AS v
         | FROM outer_v ORDER BY "user", big, t""".stripMargin.replace("\n", " "),
    "ts_promql_predict" ->
      s"""WITH steps AS (SELECT unnest(range($Mint, $Maxt + 1, 86400000)) AS step_t),
         | raw AS (SELECT "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'view' AND t > $Mint - 172800000 AND t <= $Maxt),
         | win AS (SELECT r."user", r.big, r.t, r.v, s.step_t
         |         FROM raw r JOIN steps s
         |           ON r.t > s.step_t - 172800000 AND r.t <= s.step_t),
         | reg AS (SELECT "user", big, step_t,
         |           regr_slope(v, t / 1000.0) AS slope,
         |           regr_intercept(v, t / 1000.0) AS icept
         |         FROM win GROUP BY 1, 2, 3 HAVING count(*) >= 2)
         | SELECT "user", big, step_t AS t,
         |  round(icept + slope * (step_t / 1000.0 + 3600.0), 2) AS predict_1h,
         |  round(slope, 6) AS deriv
         | FROM reg ORDER BY "user", big, t""".stripMargin.replace("\n", " "),
    "ts_alert_firing" ->
      s"""WITH steps AS (
         |   SELECT unnest(range($Mint - 172800000, $Maxt + 1, 86400000)) AS step_t),
         | raw AS (SELECT name, "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'click'
         |           AND t > $Mint - 172800000 - 86400000 AND t <= $Maxt),
         | win AS (SELECT r.name, r."user", r.big, r.t, r.v, s.step_t
         |         FROM raw r JOIN steps s
         |           ON r.t > s.step_t - 86400000 AND r.t <= s.step_t),
         | lagd AS (SELECT *, lag(v) OVER (
         |            PARTITION BY name, "user", big, step_t ORDER BY t, v) AS pv
         |          FROM win),
         | inc AS (SELECT name, "user", big, step_t,
         |           sum(CASE WHEN pv IS NULL THEN 0
         |                    WHEN v >= pv THEN v - pv ELSE v END) AS increase
         |         FROM lagd GROUP BY name, "user", big, step_t
         |         HAVING count(*) >= 2),
         | su AS (SELECT step_t, sum(increase) AS v
         |        FROM inc GROUP BY 1),
         | cond AS (SELECT * FROM su WHERE v > 100),
         | held AS (SELECT step_t, v, count(*) OVER (
         |            ORDER BY step_t
         |            RANGE BETWEEN 172800000 PRECEDING AND CURRENT ROW) AS n
         |          FROM cond)
         | SELECT step_t AS t, round(v, 4) AS v
         | FROM held WHERE n = 3 AND step_t >= $Mint
         | ORDER BY t""".stripMargin.replace("\n", " "),
    "ts_promql_count_values" ->
      s"""WITH steps AS (SELECT unnest(range($Mint, $Maxt + 1, 86400000)) AS step_t),
         | raw AS (SELECT "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'purchase' AND t > $Mint - 3600000 AND t <= $Maxt),
         | iv AS (SELECT r."user", r.big, s.step_t, (max({'t': r.t, 'v': r.v})).v AS v
         |        FROM raw r JOIN steps s
         |          ON r.t > s.step_t - 3600000 AND r.t <= s.step_t
         |        GROUP BY 1, 2, 3)
         | SELECT v AS val, step_t AS t, CAST(count(*) AS DOUBLE) AS n
         | FROM iv GROUP BY 1, 2 ORDER BY val, t""".stripMargin.replace("\n", " "),
    "ts_promql_scalar" ->
      s"""WITH steps AS (SELECT unnest(range($Mint, $Maxt + 1, 86400000)) AS step_t),
         | raw AS (SELECT "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'purchase' AND t > $Mint - 3600000 AND t <= $Maxt),
         | iv AS (SELECT r."user", r.big, s.step_t, (max({'t': r.t, 'v': r.v})).v AS v
         |        FROM raw r JOIN steps s
         |          ON r.t > s.step_t - 3600000 AND r.t <= s.step_t
         |        GROUP BY 1, 2, 3),
         | tot AS (SELECT step_t, sum(v) AS sv FROM iv GROUP BY 1)
         | SELECT i."user", i.big, i.step_t AS t, round(i.v / t.sv, 6) AS share
         | FROM iv i JOIN tot t ON i.step_t = t.step_t
         | ORDER BY "user", big, t""".stripMargin.replace("\n", " "),
    "ts_promql_time_arith" ->
      s"""WITH steps AS (SELECT unnest(range($Mint, $Maxt + 1, 86400000)) AS step_t),
         | raw AS (SELECT "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'purchase' AND t > $Mint - 172800000 AND t <= $Maxt),
         | win AS (SELECT r."user", r.big, r.v, s.step_t
         |         FROM raw r JOIN steps s
         |           ON r.t > s.step_t - 172800000 AND r.t <= s.step_t),
         | mx AS (SELECT "user", big, step_t, max(v) AS mv
         |        FROM win GROUP BY 1, 2, 3)
         | SELECT "user", big, step_t AS t,
         |  round(step_t / 1000.0 - mv, 4) AS v
         | FROM mx ORDER BY "user", big, t""".stripMargin.replace("\n", " "),
    "ts_prom_irate" ->
      s"""WITH s AS (
         |  SELECT name, "user", big, t, v, lag(t) OVER w AS pt, lag(v) OVER w AS pv,
         |    row_number() OVER (PARTITION BY name, "user", big ORDER BY t DESC, v DESC) AS rn
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'click'
         |  WINDOW w AS (PARTITION BY name, "user", big ORDER BY t, v))
         | SELECT name, "user", big,
         |  round((CASE WHEN v >= pv THEN v - pv ELSE v END) * 1000.0 / (t - pt), 6) AS irate,
         |  round(v - pv, 4) AS idelta
         | FROM s WHERE rn = 1 AND pt IS NOT NULL
         | ORDER BY name, "user", big""".stripMargin.replace("\n", " "),
    "ts_promql_downsampled" ->
      s"""WITH steps AS (
         |  SELECT unnest(range(${Mint + 172800000L}, $Maxt + 1, 86400000)) AS step_t),
         | raw AS (SELECT "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'click' AND t >= $Mint AND t <= $Maxt),
         | win AS (SELECT r."user", r.big, r.v, s.step_t
         |         FROM raw r JOIN steps s
         |           ON r.t >= s.step_t - 172800000 AND r.t < s.step_t)
         | SELECT "user", big, step_t AS t, round(sum(v), 4) AS v
         | FROM win GROUP BY 1, 2, 3
         | ORDER BY "user", big, t""".stripMargin.replace("\n", " "),
    "ts_promql_mad" ->
      s"""WITH steps AS (
         |  SELECT unnest(range(${Mint + 172800000L}, $Maxt + 1, 86400000)) AS step_t),
         | raw AS (SELECT "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'purchase' AND t >= $Mint AND t <= $Maxt),
         | win AS (SELECT r."user", r.big, r.v, s.step_t
         |         FROM raw r JOIN steps s
         |           ON r.t > s.step_t - 172800000 AND r.t <= s.step_t),
         | med AS (SELECT "user", big, step_t, median(v) AS m
         |         FROM win GROUP BY 1, 2, 3)
         | SELECT w."user", w.big, w.step_t AS t,
         |   round(median(abs(w.v - med.m)), 4) AS v
         | FROM win w JOIN med ON w."user" = med."user" AND w.big = med.big
         |   AND w.step_t = med.step_t
         | GROUP BY 1, 2, 3 ORDER BY w."user", w.big, t""".stripMargin.replace("\n", " "),
    "ts_promql_smooth" ->
      s"""WITH RECURSIVE steps AS (
         |  SELECT unnest([${Mint + 432000000L}, $Maxt]) AS step_t),
         | raw AS (SELECT "user", big, t, v FROM ($oracleBase)
         |         WHERE name = 'purchase' AND t > $Mint AND t <= $Maxt),
         | base AS (
         |  SELECT r."user", r.big, s.step_t, r.v,
         |    row_number() OVER (PARTITION BY r."user", r.big, s.step_t
         |      ORDER BY r.t, r.v) AS rn,
         |    count(*) OVER (PARTITION BY r."user", r.big, s.step_t) AS n
         |  FROM raw r JOIN steps s
         |    ON r.t > s.step_t - 432000000 AND r.t <= s.step_t),
         | hw AS (
         |  SELECT b2."user", b2.big, b2.step_t, 2 AS rn, b2.n,
         |    0.25::DOUBLE * b2.v + 0.75::DOUBLE * (b1.v + (b2.v - b1.v)) AS s,
         |    0.5::DOUBLE * ((0.25::DOUBLE * b2.v + 0.75::DOUBLE * (b1.v + (b2.v - b1.v))) - b1.v)
         |      + 0.5::DOUBLE * (b2.v - b1.v) AS b
         |  FROM base b1 JOIN base b2 ON b1."user" = b2."user" AND b1.big = b2.big
         |    AND b1.step_t = b2.step_t AND b1.rn = 1 AND b2.rn = 2
         |  UNION ALL
         |  SELECT x."user", x.big, x.step_t, x.rn, x.n,
         |    0.25::DOUBLE * x.v + 0.75::DOUBLE * (hw.s + hw.b),
         |    0.5::DOUBLE * ((0.25::DOUBLE * x.v + 0.75::DOUBLE * (hw.s + hw.b)) - hw.s)
         |      + 0.5::DOUBLE * hw.b
         |  FROM hw JOIN base x ON x."user" = hw."user" AND x.big = hw.big
         |    AND x.step_t = hw.step_t AND x.rn = hw.rn + 1)
         | SELECT "user", big, step_t AS t, round(s, 4) AS v
         | FROM hw WHERE rn = n AND n >= 2
         | ORDER BY "user", big, t""".stripMargin.replace("\n", " "),
    "ts_prom_holt_winters" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT name, "user", big, v,
         |    row_number() OVER (PARTITION BY name, "user", big ORDER BY t, v) AS rn,
         |    count(*) OVER (PARTITION BY name, "user", big) AS n
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'purchase'),
         | hw AS (
         |  SELECT b2.name, b2."user", b2.big, 2 AS rn, b2.n,
         |    0.25::DOUBLE * b2.v + 0.75::DOUBLE * (b1.v + (b2.v - b1.v)) AS s,
         |    0.5::DOUBLE * ((0.25::DOUBLE * b2.v + 0.75::DOUBLE * (b1.v + (b2.v - b1.v))) - b1.v)
         |      + 0.5::DOUBLE * (b2.v - b1.v) AS b
         |  FROM base b1 JOIN base b2 ON b1.name = b2.name AND b1."user" = b2."user"
         |    AND b1.big = b2.big AND b1.rn = 1 AND b2.rn = 2
         |  UNION ALL
         |  SELECT x.name, x."user", x.big, x.rn, x.n,
         |    0.25::DOUBLE * x.v + 0.75::DOUBLE * (hw.s + hw.b),
         |    0.5::DOUBLE * ((0.25::DOUBLE * x.v + 0.75::DOUBLE * (hw.s + hw.b)) - hw.s)
         |      + 0.5::DOUBLE * hw.b
         |  FROM hw JOIN base x ON x.name = hw.name AND x."user" = hw."user"
         |    AND x.big = hw.big AND x.rn = hw.rn + 1)
         | SELECT name, "user", big, round(s, 4) AS smoothed, n::BIGINT AS n_samples
         | FROM hw WHERE rn = n ORDER BY name, "user", big""".stripMargin.replace("\n", " "),
    "ts_prom_group_right" ->
      s"""WITH stepped AS (
         |  SELECT name, "user", big, t - (t % 86400000) AS step_t, t, v
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt
         |   AND regexp_matches(name, '^(?:click|purchase)$$')),
         | per_series AS (
         |  SELECT name, "user", big, step_t, (max({'t': t, 'v': v})).v AS v
         |  FROM stepped GROUP BY name, "user", big, step_t),
         | totals AS (
         |  SELECT name, step_t, sum(v) AS rv FROM per_series GROUP BY name, step_t)
         | SELECT p.step_t, p.name AS name, p."user" AS "user",
         |  round(p.v, 4) AS user_v, round(t.rv, 4) AS total_sum,
         |  round(round(t.rv, 4) / round(p.v, 4), 6) AS inv_share
         | FROM per_series p JOIN totals t ON p.name = t.name AND p.step_t = t.step_t
         | ORDER BY name, "user", p.step_t, user_v""".stripMargin.replace("\n", " "),
    "ts_prom_clamp" ->
      s"""SELECT "user", t,
         | round(least(greatest(v, 20.0), 120.0), 4) AS clamped,
         | round(greatest(v, 50.0), 4) AS clamped_min,
         | round(least(v, 80.0), 4) AS clamped_max
         | FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'purchase'
         | ORDER BY "user", t, clamped""".stripMargin.replace("\n", " "),
    "ts_prom_subquery" ->
      s"""WITH base AS (
         |  SELECT name, "user", big, t, v FROM ($oracleBase)
         |  WHERE t BETWEEN $Mint AND $Maxt AND name = 'purchase'),
         | inc AS (
         |  SELECT "user", big, t, round(CASE WHEN v >= prev_v THEN v - prev_v ELSE v END, 4) AS iv
         |  FROM (SELECT *, lag(v) OVER w AS prev_v FROM base
         |        WINDOW w AS (PARTITION BY name, "user", big ORDER BY t))
         |  WHERE prev_v IS NOT NULL)
         | SELECT "user", t, iv AS increase,
         |  round(max(iv) OVER wr, 4) AS max_increase_3d,
         |  round(sum(iv) OVER wr, 4) AS sum_increase_3d
         | FROM inc
         | WINDOW wr AS (PARTITION BY "user", big ORDER BY t
         |   RANGE BETWEEN 259200000 PRECEDING AND CURRENT ROW)
         | ORDER BY "user", t, increase""".stripMargin.replace("\n", " "),
    "ts_prom_time_fns" ->
      s"""SELECT "user", t,
         | minute(epoch_ms(t))::BIGINT AS minute, hour(epoch_ms(t))::BIGINT AS hour,
         | dayofweek(epoch_ms(t))::BIGINT AS day_of_week,
         | dayofmonth(epoch_ms(t))::BIGINT AS day_of_month,
         | month(epoch_ms(t))::BIGINT AS month, year(epoch_ms(t))::BIGINT AS year
         | FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'signup'
         | ORDER BY "user", t""".stripMargin.replace("\n", " "),
    "ts_prom_offset" ->
      s"""WITH stepped AS (
         |  SELECT "user", big, t - (t % 86400000) AS step_t, t, v
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'click'),
         | per_series AS (
         |  SELECT "user", big, step_t, (max({'t': t, 'v': v})).v AS v
         |  FROM stepped GROUP BY "user", big, step_t),
         | sums AS (
         |  SELECT "user", step_t, sum(v) AS sv
         |  FROM per_series GROUP BY "user", step_t)
         | SELECT c.step_t, c."user" AS "user",
         |  round(c.sv, 4) AS today, round(p.sv, 4) AS yesterday,
         |  round(round(c.sv, 4) - round(p.sv, 4), 4) AS dod_delta
         | FROM sums c JOIN sums p
         |  ON p.step_t = c.step_t - 86400000 AND p."user" = c."user"
         | ORDER BY c.step_t, c."user"""".stripMargin.replace("\n", " "),
    "ts_prom_deriv" ->
      s"""SELECT name, "user", big,
         | round(regr_slope(v, t / 1000.0), 6) AS deriv,
         | round(regr_intercept(v, t / 1000.0) +
         |   regr_slope(v, t / 1000.0) * ($Maxt / 1000.0 + 3600.0), 2) AS predict_1h,
         | count(*) AS n_samples
         | FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt AND name = 'view'
         | GROUP BY name, "user", big HAVING count(*) >= 2
         | ORDER BY name, "user", big""".stripMargin.replace("\n", " "),
    "ts_prom_bottomk" ->
      s"""WITH per_series AS (
         |  SELECT name, "user", big, round(sum(v), 4) AS series_sum
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt
         |  GROUP BY name, "user", big),
         | ranked AS (SELECT name, "user", big, series_sum,
         |  row_number() OVER (PARTITION BY name ORDER BY series_sum ASC, "user", big) AS rnk
         |  FROM per_series)
         | SELECT name, rnk, "user", big, series_sum FROM ranked
         | WHERE rnk <= 3 ORDER BY name, rnk""".stripMargin.replace("\n", " "),
    "ts_prom_count_values" ->
      s"""WITH stepped AS (
         |  SELECT name, "user", big, t - (t % 86400000) AS step_t, t, v
         |  FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt),
         | per_series AS (
         |  SELECT name, "user", big, step_t, (max({'t': t, 'v': v})).v AS v
         |  FROM stepped GROUP BY name, "user", big, step_t)
         | SELECT step_t, name, v, count(*) AS n
         | FROM per_series GROUP BY step_t, name, v
         | ORDER BY step_t, name, v""".stripMargin.replace("\n", " "),
    "ts_prom_label_ops" ->
      s"""SELECT name, "user", big, count(*) AS n_samples,
         | regexp_replace("user", '^([0-9])[0-9]*$$', 'g\\1') AS region,
         | concat_ws('-', name, "user", big) AS joined
         | FROM ($oracleBase) WHERE t BETWEEN $Mint AND $Maxt
         | GROUP BY name, "user", big ORDER BY name, "user", big""".stripMargin.replace("\n", " "),
    "ts_prom_absent" ->
      s"""SELECT step_t, CAST(1 AS BIGINT) AS absent FROM (
         |  SELECT generate_series AS step_t
         |  FROM generate_series($Mint, ${Maxt - 1}, 86400000))
         | WHERE step_t NOT IN (
         |  SELECT DISTINCT t - (t % 86400000) FROM ($oracleBase)
         |  WHERE t BETWEEN $Mint AND $Maxt AND name = 'signup' AND "user" = '11')
         | ORDER BY step_t""".stripMargin.replace("\n", " "),
    "ts_chunked_eq" -> flatOracle("name = 'click'"),
    "ts_chunked_series_agg" ->
      s"""SELECT name, "user", count(*) AS n_samples, min(t) AS min_t, max(t) AS max_t,
         | round(sum(v), 2) AS sum_v FROM ($oracleBase)
         | WHERE t BETWEEN $Mint AND $Maxt GROUP BY name, "user" ORDER BY name, "user"""".stripMargin.replace("\n", " ")
  )
}
