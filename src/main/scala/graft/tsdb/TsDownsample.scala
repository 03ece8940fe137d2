package graft.tsdb

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Downsampling for long-range queries — the long-term-store feature the
  * reference's domain (immutable 2h blocks shipped to object storage,
  * `shipper.go`, `Readme.md`) points straight at but never implements:
  * querying months of raw samples means decoding every chunk in range.
  * The published design this re-expresses Spark-first is Thanos
  * compact/downsample (5m/1h aggregate series), independently
  * implemented here over the canonical long form.
  *
  * Each (series, aligned window) produces ONE row carrying the five
  * aggregates (`n`, `sum_v`, `min_v`, `max_v`) plus the window's edge
  * samples (`first_t/first_v`, `last_t/last_v`) and the
  * counter-reset-corrected within-window increase (`inc_v`). That set is
  * closed under query-time re-aggregation:
  *   avg = sum(sum_v)/sum(n), min = min(min_v), max = max(max_v),
  *   count = sum(n), and exact counter increase over any window span =
  *   Σ inc_v + Σ boundary deltas (see [[increaseOver]]) — every raw
  *   sample pair is either inside one window (counted by `inc_v`) or
  *   crosses consecutive downsampled rows (counted by the boundary
  *   term), so the downsampled increase equals the raw one exactly.
  *
  * Scale (100 TB): downsampling is one window pass + one aggregation,
  * both keyed on the series fingerprint — a scan-shaped offline job
  * whose output is resolution² smaller; a 30-day query at 1h resolution
  * reads ~1/3600 of the raw bytes. [[pick]] implements the query-time
  * resolution choice (largest resolution that still gives ≥2 points per
  * step), the Thanos `maxSourceResolution` rule. */
object TsDownsample {

  /** Standard resolution ladder: 5m, 1h (raw = 0). */
  val Ladder: Seq[Long] = Seq(5 * 60 * 1000L, 60 * 60 * 1000L)

  /** Query-time resolution choice: the largest ladder entry with at
    * least `minPoints` windows per step; 0 means read raw samples. */
  def pick(stepMs: Long, ladder: Seq[Long] = Ladder, minPoints: Int = 2): Long =
    ladder.filter(r => r * minPoints <= stepMs).sorted.lastOption.getOrElse(0L)

  /** Promoted label columns present on `canonical` (carried through as
    * group keys — they are functions of `labels`). */
  private def promotedCols(canonical: DataFrame): Seq[Column] =
    canonical.columns.filter(_.startsWith("l_")).map(col).toSeq

  /** Canonical long form → downsampled aggregate form at `resMs`.
    * One window pass (per-series sample order, for `inc_v`) + one
    * aggregation, both shuffled on the series fingerprint. */
  def downsample(canonical: DataFrame, resMs: Long): DataFrame = {
    val w = Window.partitionBy(col("fingerprint"), col("labels")).orderBy(col("t"))
    val windowed = canonical
      .withColumn("w_t", col("t") - pmod(col("t"), lit(resMs)))
      .withColumn("prev_v", lag(col("v"), 1).over(w))
      .withColumn("prev_w", lag(col("w_t"), 1).over(w))
      // within-window reset-corrected delta: first sample of a window
      // contributes 0 here (its predecessor pair is the boundary term)
      .withColumn("inc", when(col("prev_v").isNull || col("prev_w") =!= col("w_t"), lit(0.0))
        .otherwise(when(col("v") >= col("prev_v"), col("v") - col("prev_v"))
          .otherwise(col("v"))))
    val keys = Seq(col("fingerprint"), col("labels"), col("w_t")) ++ promotedCols(canonical)
    windowed
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        min(col("t")).as("first_t"),
        min_by(col("v"), col("t")).as("first_v"),
        max(col("t")).as("last_t"),
        max_by(col("v"), col("t")).as("last_v"),
        sum(col("inc")).as("inc_v"))
      // storage partition key, same 2h alignment as the raw store (w_t of
      // a coarser resolution is always BlockMs-aligned for the ladder)
      .withColumn("block_start", col("w_t") - pmod(col("w_t"), lit(TsSchema.BlockMs)))
  }

  /** Step-gridded `<agg>_over_time` served FROM the downsampled form —
    * the query-path payoff: a range function over months reads
    * resolution²-fewer rows than raw samples. Windows are combined
    * whole, so the semantics are window-aligned: step instants
    * `t_k = mint + k·step` see the samples in `[t_k - range, t_k)`
    * (`step`, `range` and `t_k` all multiples of `resMs`) — for which
    * the per-window aggregate set recombines EXACTLY (sum of sums,
    * min of mins, …), no approximation at the edges.
    *
    * Same bounded-explode shape as the raw-path evaluator: a window at
    * `w_t` serves steps `t_k ∈ [w_t + res, w_t + range]` — at most
    * `range/step` ordinals per downsampled row — then one shuffle on
    * (series, step). */
  /** Bounded step-ordinal explode shared by the downsampled serving
    * paths: a window at `w_t` serves steps `t_k ∈ [w_t+res, w_t+range]`
    * (the windows fully inside `[t_k - range, t_k)`), ≤ range/step
    * ordinals per row. */
  private def atSteps(down: DataFrame, resMs: Long, mint: Long, maxt: Long,
                      stepMs: Long, rangeMs: Long): DataFrame = {
    require(stepMs % resMs == 0 && rangeMs % resMs == 0 &&
      mint % resMs == 0, "step/range/mint must be multiples of the resolution")
    val nSteps = (maxt - mint) / stepMs
    // exact integral floor division: make the numerator divisible first,
    // so the double divide is exact (Column./ is double division)
    def floorDiv(a: Column, b: Long): Column =
      ((a - pmod(a, lit(b))) / b).cast("long")
    val kLo = greatest(floorDiv(col("w_t") + (resMs - mint + stepMs - 1), stepMs), lit(0L))
    val kHi = least(floorDiv(col("w_t") + (rangeMs - mint), stepMs), lit(nSteps))
    down.withColumn("k", explode(when(kLo <= kHi, sequence(kLo, kHi))
      .otherwise(array().cast("array<long>"))))
  }

  def overTime(down: DataFrame, resMs: Long, mint: Long, maxt: Long,
               stepMs: Long, rangeMs: Long): DataFrame = {
    atSteps(down, resMs, mint, maxt, stepMs, rangeMs)
      .groupBy(col("fingerprint"), col("labels"), col("k"))
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
      .withColumn("t", lit(mint) + col("k") * stepMs)
      .withColumn("avg_v", col("sum_v") / col("n"))
      .drop("k")
  }

  /** Step-gridded counter increase from downsampled windows — the
    * `increase(metric[range])` shape at a step grid, window-aligned like
    * [[overTime]] and EXACT like [[increaseOver]]: per step, the sum of
    * the in-range windows' `inc_v` plus the reset-corrected delta across
    * each consecutive pair of rows in the range. One step-explode, one
    * window sort, one aggregation — all keyed on (series, step). */
  def increaseAtSteps(down: DataFrame, resMs: Long, mint: Long, maxt: Long,
                      stepMs: Long, rangeMs: Long): DataFrame = {
    val w = Window.partitionBy(col("fingerprint"), col("labels"), col("k"))
      .orderBy(col("w_t"))
    atSteps(down, resMs, mint, maxt, stepMs, rangeMs)
      .withColumn("prev_last", lag(col("last_v"), 1).over(w))
      .withColumn("bnd", when(col("prev_last").isNull, lit(0.0))
        .otherwise(when(col("first_v") >= col("prev_last"), col("first_v") - col("prev_last"))
          .otherwise(col("first_v"))))
      .groupBy(col("fingerprint"), col("labels"), col("k"))
      .agg(sum(col("inc_v") + col("bnd")).as("increase"),
        sum(col("n")).as("n_samples"))
      .withColumn("t", lit(mint) + col("k") * stepMs)
      .drop("k")
  }

  // ---- store-level materialization -----------------------------------
  // <store>/_downsample/res=<resMs>/ holds the downsampled form as an
  // ordinary block_start-partitioned parquet table (underscore dir —
  // invisible to the raw store's partition discovery, same trick as
  // _deletions). A marker file records the newest fully-materialized
  // window start, making re-runs incremental. Crash safety: each run
  // recomputes WHOLE block_start partitions (from the partition floor of
  // its first new window) and publishes them with dynamic partition
  // OVERWRITE, so a crash between the data write and the marker write
  // replays idempotently — the re-run overwrites the same partitions
  // with identical rows instead of appending duplicates. The raw blocks
  // are immutable, so recomputing a partition's older windows is
  // deterministic.

  private def resDir(store: String, resMs: Long) =
    Paths.get(store, "_downsample", s"res=$resMs")

  private def markerOf(store: String, resMs: Long): Option[Long] = {
    val p = resDir(store, resMs).resolve("_marker")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Materialize every fully-closed window newer than the marker:
    * a window `[w, w+res)` is closed once the store's newest sample is
    * at least `lagMs` past its end. Reads ONLY the partitions covering
    * the touched windows (partition-pruned on `block_start`). Returns
    * the materialized window range, or None if nothing closed.
    *
    * Idempotent resume: the recompute range starts at the BLOCK floor of
    * the first new window, so every touched block_start partition is
    * rebuilt in full and written with dynamic partition overwrite — a
    * crash before the marker update replays to the same bytes. */
  def materialize(spark: SparkSession, store: String, resMs: Long,
                  lagMs: Long = 0L): Option[(Long, Long)] = {
    val allBlocks = TsMaintenance.blocks(store)
    if (allBlocks.isEmpty) return None
    // newest sample: scan only the newest partition
    val raw = spark.read.parquet(store)
    val maxT = raw.where(col("block_start") === allBlocks.max)
      .agg(max(col("t"))).head().getLong(0)
    // newest window start whose window has fully closed
    val wMax = Math.floorDiv(maxT - lagMs - resMs + 1, resMs) * resMs
    val from = markerOf(store, resMs).map(_ + resMs)
      .getOrElse(Math.floorDiv(allBlocks.min, resMs) * resMs)
    if (wMax < from) return None
    // recompute from the partition floor: windows in [fromPart, from)
    // were already materialized, but they share partitions with the new
    // ones — rebuilding them (same immutable inputs → same rows) lets
    // the write be a whole-partition overwrite instead of an append
    val fromPart = from - Math.floorMod(from, TsSchema.BlockMs)
    val slice = raw.where(
      col("block_start") >= fromPart &&
        col("t") >= fromPart && col("t") <= wMax + resMs - 1)
    val out = downsample(slice, resMs).where(col("w_t").between(fromPart, wMax))
    val dir = resDir(store, resMs)
    Files.createDirectories(dir)
    out.write.partitionBy("block_start")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite).parquet(dir.toString)
    Files.writeString(dir.resolve("_marker"), wMax.toString)
    Some((from, wMax))
  }

  /** Open a materialized resolution of a store. */
  def readMaterialized(spark: SparkSession, store: String, resMs: Long): DataFrame =
    spark.read.parquet(resDir(store, resMs).toString)

  /** Materialized resolutions available for a store (ascending). */
  def resolutions(store: String): Seq[Long] = {
    val d = Paths.get(store, "_downsample")
    if (!Files.isDirectory(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("res="))
        .map(_.stripPrefix("res=").toLong).toSeq.sorted
    }
  }

  /** Query-time auto-resolution: serve a step-gridded over_time from the
    * COARSEST materialized resolution the step supports ([[pick]] over
    * what [[materialize]] has produced, further restricted to exact
    * alignment), falling back to raw samples when none fits. This is the
    * single call a dashboard backend makes: zoomed-out panels hit the 1h
    * form, zoomed-in panels hit raw, same answer shape either way. */
  def autoOverTime(spark: SparkSession, store: String, canonicalRaw: DataFrame,
                   mint: Long, maxt: Long, stepMs: Long, rangeMs: Long): DataFrame = {
    val usable = resolutions(store).filter(r =>
      stepMs % r == 0 && rangeMs % r == 0 && mint % r == 0)
    pick(stepMs, usable) match {
      case 0L =>
        // raw fallback: same window-aligned [t_k - range, t_k) semantics.
        // A sample at t serves steps t_k ∈ (t, t + range]; exact integral
        // floor division via the pmod trick (Column./ is double division)
        val nSteps = (maxt - mint) / stepMs
        def floorDiv(a: Column, b: Long): Column =
          ((a - pmod(a, lit(b))) / b).cast("long")
        val kLo = greatest(floorDiv(col("t") - mint, stepMs) + 1, lit(0L))
        val kHi = least(floorDiv(col("t") - mint + rangeMs, stepMs), lit(nSteps))
        canonicalRaw
          .where(col("t") >= mint - rangeMs && col("t") <= maxt)
          .withColumn("k", explode(when(kLo <= kHi, sequence(kLo, kHi))
            .otherwise(array().cast("array<long>"))))
          .groupBy(col("fingerprint"), col("labels"), col("k"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"),
            min(col("v")).as("min_v"), max(col("v")).as("max_v"))
          .withColumn("t", lit(mint) + col("k") * stepMs)
          .withColumn("avg_v", col("sum_v") / col("n"))
          .drop("k")
      case res =>
        overTime(readMaterialized(spark, store, res), res, mint, maxt, stepMs, rangeMs)
    }
  }

  /** Exact counter increase per series over the downsampled rows in
    * `[mint, maxt]` (window-aligned bounds): Σ within-window `inc_v`
    * plus the reset-corrected delta across each consecutive pair of
    * downsampled rows. Equals the raw-sample increase exactly — every
    * raw sample pair is either intra-window or spans exactly one row
    * boundary (empty windows in between don't break this: the next row's
    * `first_v` still pairs with the previous row's `last_v`). */
  def increaseOver(down: DataFrame, resMs: Long, mint: Long, maxt: Long): DataFrame = {
    val w = Window.partitionBy(col("fingerprint"), col("labels")).orderBy(col("w_t"))
    down
      .where(col("w_t").between(mint - (mint % resMs), maxt))
      .withColumn("prev_last", lag(col("last_v"), 1).over(w))
      .withColumn("bnd", when(col("prev_last").isNull, lit(0.0))
        .otherwise(when(col("first_v") >= col("prev_last"), col("first_v") - col("prev_last"))
          .otherwise(col("first_v"))))
      .groupBy(col("fingerprint"), col("labels"))
      .agg(sum(col("inc_v") + col("bnd")).as("increase"),
        sum(col("n")).as("n_samples"))
  }
}
