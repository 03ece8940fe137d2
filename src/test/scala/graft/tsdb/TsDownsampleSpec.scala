package graft.tsdb

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Downsampling: aggregate closure + exact counter-increase recovery;
  * replica dedup: election + tie-break semantics. */
class TsDownsampleSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val T0 = 1700000000000L - (1700000000000L % (60 * 60 * 1000L)) // 1h-aligned

  /** Two series: a counter with a reset, and a gauge; 90 samples @ 1m. */
  private def canonical() = {
    import scala.jdk.CollectionConverters._
    val counter = (0 until 90).map { k =>
      // resets to 3 at k=40 (value would have been 40)
      val v = if (k < 40) k.toDouble else (k - 40 + 3).toDouble
      Row(Map("__name__" -> "reqs", "job" -> "a"), T0 + k * 60000L, v)
    }
    val gauge = (0 until 90).map { k =>
      Row(Map("__name__" -> "temp", "job" -> "b"), T0 + k * 60000L, math.sin(k).abs * 10)
    }
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    TsSchema.canonicalize(spark.createDataFrame((counter ++ gauge).asJava, schema))
  }

  test("window aggregates match direct computation") {
    val res = 15 * 60000L // 15m windows
    val down = TsDownsample.downsample(canonical(), res)
    // 90 minutes @1m over 2 series → 6 windows each
    assert(down.count() == 12)
    val direct = canonical()
      .withColumn("w_t", col("t") - pmod(col("t"), lit(res)))
      .groupBy(col("labels"), col("w_t"))
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))
    val joined = down.alias("d").join(direct.alias("r"), Seq("labels", "w_t"))
      .where(col("d.n") =!= col("r.n") || abs(col("d.sum_v") - col("r.sum_v")) > 1e-9 ||
        col("d.min_v") =!= col("r.min_v") || col("d.max_v") =!= col("r.max_v"))
    assert(joined.count() == 0)
    // first/last are the window-edge samples
    val w0 = down.where(TsSchema.labelValue(col("labels"), "__name__") === "reqs" &&
      col("w_t") === T0).select("first_v", "last_v", "inc_v").head()
    assert(w0.getDouble(0) == 0.0 && w0.getDouble(1) == 14.0 && w0.getDouble(2) == 14.0)
  }

  test("increase from downsampled equals raw reset-corrected increase") {
    val res = 15 * 60000L
    val down = TsDownsample.downsample(canonical(), res)
    val inc = TsDownsample.increaseOver(down, res, T0, T0 + 90 * 60000L)
      .where(TsSchema.labelValue(col("labels"), "__name__") === "reqs")
      .select("increase").head().getDouble(0)
    // raw: 0→39 (inc 39), reset to 3 (inc +3), 3→52 (inc 49) = 39+3+49 = 91
    assert(math.abs(inc - 91.0) < 1e-9)
  }

  test("overTime from downsampled equals raw window-aligned aggregation") {
    val res = 15 * 60000L
    val step = 30 * 60000L
    val down = TsDownsample.downsample(canonical(), res)
    val got = TsDownsample.overTime(down, res, T0, T0 + 90 * 60000L, step, step)
      .select(col("labels"), col("t"), col("n"), col("sum_v"), col("min_v"), col("max_v"))
    // raw, window-aligned [t_k - range, t_k)
    val steps = spark.range(1, 4).select((lit(T0) + col("id") * step).as("st"))
    val raw = canonical().join(steps,
      col("t") >= col("st") - step && col("t") < col("st"))
      .groupBy(col("labels"), col("st"))
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"),
        min("v").as("min_v"), max("v").as("max_v"))
    val mismatch = got.alias("g").join(raw.alias("r"),
      col("g.labels") === col("r.labels") && col("g.t") === col("r.st"), "full")
      .where(col("g.n").isNull || col("r.n").isNull || col("g.n") =!= col("r.n") ||
        abs(col("g.sum_v") - col("r.sum_v")) > 1e-9 ||
        col("g.min_v") =!= col("r.min_v") || col("g.max_v") =!= col("r.max_v"))
    assert(mismatch.count() == 0)
  }

  test("increaseAtSteps equals raw per-step reset-corrected increase") {
    val res = 15 * 60000L
    val step = 30 * 60000L
    val range = 60 * 60000L // 1h windows at 30m steps
    val down = TsDownsample.downsample(canonical(), res)
    val got = TsDownsample.increaseAtSteps(down, res, T0, T0 + 90 * 60000L, step, range)
      .where(TsSchema.labelValue(col("labels"), "__name__") === "reqs")
      .select(col("t"), col("increase")).orderBy("t").collect()
      .map(r => (r.getLong(0) - T0) / 60000L -> r.getDouble(1)).toMap
    // raw: counter 0..39 then resets to 3 and counts up; per [t_k-60m, t_k)
    // window the increase is (#pairs) except the reset window
    // k=30m: samples 0..29 → inc 29; k=60m: samples 0..59 crossing the
    // reset at 40 (39→3: +3) → 39 + 3 + 19 - ... compute: pairs 0..59:
    // deltas +1 ×38 pre-reset (0..39 = 39 pairs... keep to spot values
    assert(got((30 * 60000L) / 60000L * 0 + 30) == 29.0) // [0,30m): 0..29 → +29
    // [30m,90m) at k=90m: samples 30..89: 30→39 (+9), reset +3, 3→52 (+49) = 61
    assert(got(90) == 61.0)
  }

  test("resolution pick follows the min-points rule") {
    assert(TsDownsample.pick(60 * 60000L) == 5 * 60000L) // 1h step → 5m (12 pts)
    assert(TsDownsample.pick(3 * 60 * 60000L) == 60 * 60000L) // 3h step → 1h
    assert(TsDownsample.pick(5 * 60000L) == 0L) // 5m step → raw
    assert(TsDownsample.pick(10 * 60000L) == 5 * 60000L) // 10m step → 5m (2 pts)
  }

  test("autoOverTime routes to downsampled and matches the raw fallback") {
    val store = java.nio.file.Files.createTempDirectory("auto").resolve("s").toString
    canonical().write.partitionBy("block_start").parquet(store)
    val res = 15 * 60000L
    TsDownsample.materialize(spark, store, res, lagMs = 0L)
    val step = 30 * 60000L
    val raw = spark.read.parquet(store)
    val cols = Seq("labels", "t", "n", "round(sum_v, 9) AS sum_v", "min_v", "max_v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.selectExpr(cols: _*).collect().map(_.toString).sorted.toSeq
    // query only CLOSED windows (the 90-minute corpus has an incomplete
    // last 15m window that materialize correctly excludes); step
    // supports the 15m rung (2 points per step) → routed downsampled
    val a = rows(TsDownsample.autoOverTime(spark, store, raw,
      T0, T0 + 60 * 60000L, step, step))
    // destroy the materialized form → raw fallback, same answer
    val d = java.nio.file.Paths.get(store, "_downsample")
    java.nio.file.Files.walk(d)
      .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => java.nio.file.Files.delete(p))
    val b = rows(TsDownsample.autoOverTime(spark, store, raw,
      T0, T0 + 60 * 60000L, step, step))
    assert(a.nonEmpty && a == b)
  }

  test("materialize crash-replay is idempotent (overwrite, not append)") {
    val store = java.nio.file.Files.createTempDirectory("idem").resolve("s").toString
    canonical().write.partitionBy("block_start").parquet(store)
    val res = 15 * 60000L
    assert(TsDownsample.materialize(spark, store, res, lagMs = 0L).nonEmpty)
    val first = TsDownsample.readMaterialized(spark, store, res)
      .selectExpr("labels", "w_t", "n", "round(sum_v, 9)", "first_t", "last_t")
      .collect().map(_.toString).sorted.toSeq
    // simulate a crash AFTER the data write but BEFORE the marker write:
    // the next run must replay the same windows without duplicating them
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(store, "_downsample", s"res=$res", "_marker"))
    assert(TsDownsample.materialize(spark, store, res, lagMs = 0L).nonEmpty)
    val second = TsDownsample.readMaterialized(spark, store, res)
      .selectExpr("labels", "w_t", "n", "round(sum_v, 9)", "first_t", "last_t")
      .collect().map(_.toString).sorted.toSeq
    assert(second == first) // same rows, no duplicates
    // and a no-op resume (marker intact, no new data) stays a no-op
    assert(TsDownsample.materialize(spark, store, res, lagMs = 0L).isEmpty)
    assert(TsDownsample.readMaterialized(spark, store, res).count() == first.size)
  }

  test("retention ladder: raw ages out first, downsampled survives") {
    val store = java.nio.file.Files.createTempDirectory("ladder").resolve("s").toString
    canonical().write.partitionBy("block_start").parquet(store)
    val res = 15 * 60000L
    assert(TsDownsample.materialize(spark, store, res, lagMs = 0L).nonEmpty)
    val rawBlocksBefore = TsMaintenance.blocks(store).size
    val downBefore = TsDownsample.readMaterialized(spark, store, res).count()
    // cut raw at T0+1h (drops the first 2h-aligned? blocks strictly older),
    // keep every downsampled window
    val dropped = TsMaintenance.applyRetentionLadder(spark, store,
      rawRetainAfterMs = Long.MaxValue / 2, ladder = Map(res -> 0L))
    assert(dropped(0L).size == rawBlocksBefore) // all raw gone
    assert(dropped(res).isEmpty)
    assert(TsMaintenance.blocks(store).isEmpty)
    assert(TsDownsample.readMaterialized(spark, store, res).count() == downBefore)
  }

  test("replica dedup elects most samples, tie-breaks to smallest name") {
    import scala.jdk.CollectionConverters._
    val wMs = 60 * 60000L
    // window 0: r1 has 3 samples, r0 has 2 → r1 wins
    // window 1: both have 2 → tie → r0 wins
    def s(rep: String, k: Int, v: Double) =
      Row(Map("__name__" -> "m", "replica" -> rep), T0 + k * 60000L, v)
    val rows = Seq(
      s("r0", 0, 1), s("r0", 1, 2),
      s("r1", 0, 10), s("r1", 1, 20), s("r1", 2, 30),
      s("r0", 60, 4), s("r0", 61, 5),
      s("r1", 60, 40), s("r1", 62, 60)).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    val out = ReplicaDedup.dedup(
      TsSchema.canonicalize(spark.createDataFrame(rows, schema)), "replica", wMs)
    val got = out.select(col("t"), col("v")).orderBy("t").collect()
      .map(r => (r.getLong(0) - T0) / 60000L -> r.getDouble(1)).toSeq
    assert(got == Seq(0L -> 10.0, 1L -> 20.0, 2L -> 30.0, 60L -> 4.0, 61L -> 5.0))
    // replica label removed from surviving series
    val labels = out.select(TsSchema.labelValue(col("labels"), "replica")).distinct().collect()
    assert(labels.map(_.getString(0)).toSeq == Seq(""))
  }
}
