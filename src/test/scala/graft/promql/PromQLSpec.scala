package graft.promql

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.tsdb.{LabelMatcher, Labels, MatchType, TsQuerier, TsSchema, TsStore}

/** PromQL front-end: parser AST shapes and step-evaluation semantics
  * against a tiny hand-checkable store. */
class PromQLSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import PromExpr._

  // ---- parser ----

  test("parser: selector with matchers, range and offset") {
    val e = PromQL.parse("""http_req{job="api", inst=~"i-[0-9]+", env!="dev"}[5m] offset 1h""")
    val s = e.asInstanceOf[Selector]
    assert(s.rangeMs.contains(300000L))
    assert(s.offsetMs == 3600000L)
    assert(s.matchers.map(m => (m.tpe, m.name, m.value)) == Seq(
      (MatchType.Eq, "__name__", "http_req"),
      (MatchType.Eq, "job", "api"),
      (MatchType.Re, "inst", "i-[0-9]+"),
      (MatchType.Neq, "env", "dev")))
  }

  test("parser: precedence, by-clauses, parameterized aggregations") {
    assert(PromQL.parse("a + b * c") ==
      Bin("+", Selector(Seq(LabelMatcher.eq("__name__", "a")), None, 0),
        Bin("*", Selector(Seq(LabelMatcher.eq("__name__", "b")), None, 0),
          Selector(Seq(LabelMatcher.eq("__name__", "c")), None, 0), None), None))
    val pre = PromQL.parse("sum by (job) (rate(m[1m30s]))").asInstanceOf[Agg]
    val post = PromQL.parse("sum(rate(m[90s])) by (job)").asInstanceOf[Agg]
    assert(pre == post && pre.by == Seq("job"))
    assert(pre.arg.asInstanceOf[RangeFn].arg
      .asInstanceOf[Selector].rangeMs.contains(90000L))
    val tk = PromQL.parse("topk(3, m)").asInstanceOf[Agg]
    assert(tk.op == "topk" && tk.param.contains(3.0))
  }

  test("parser: rejects malformed input") {
    assert(intercept[IllegalArgumentException](PromQL.parse("rate(m)"))
      .getMessage.contains("[range]"))
    intercept[IllegalArgumentException](PromQL.parse("m{job=}"))
    intercept[IllegalArgumentException](PromQL.parse("m[5m] extra"))
    intercept[IllegalArgumentException](PromQL.parse("nosuchfn(m, 1)"))
  }

  // ---- evaluator ----

  private val T0 = 1700000000000L // step grid origin for the fixture

  /** req (counter, with one reset on i-1) and mem (gauge), two
    * instances, samples every 30s for 10 minutes. */
  private lazy val querier: TsQuerier = {
    val rows = for {
      inst <- Seq("i-0", "i-1"); k <- 0 until 21
    } yield {
      val t = T0 + k * 30000L
      val req = // i-1 resets at k=10 (counter drops to 0)
        if (inst == "i-1" && k >= 10) (k - 10) * 2.0 else k * (if (inst == "i-0") 10.0 else 2.0)
      (inst, t, req)
    }
    val df = spark.createDataFrame(rows).toDF("inst", "t", "req")
    val longForm = df.select(
      map(lit("__name__"), lit("req"), lit("inst"), col("inst")).as("labels"),
      col("t"), col("req").as("v"))
      .unionByName(df.select(
        map(lit("__name__"), lit("mem"), lit("inst"), col("inst")).as("labels"),
        col("t"), (col("t") % 7 + 1).cast("double").as("v")))
    new TsQuerier(TsSchema.canonicalize(longForm, promoted = Seq()), promoted = Seq())
  }

  private def rows(q: String, mint: Long, maxt: Long, step: Long,
                   downsamples: Seq[(Long, org.apache.spark.sql.DataFrame)] = Seq.empty):
      Seq[(String, Long, Double)] =
    PromQL.rangeQuery(querier, q, mint, maxt, step, downsamples = downsamples)
      .select(to_json(col("labels")).as("l"), col("t"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq

  test("instant selector honors the lookback window") {
    // samples end at T0+10m; with the left-open 5m lookback, steps at
    // T0+10m..T0+14m (m=0..4) still see the last sample, the step at
    // T0+15m has window (T0+10m, T0+15m] and drops the series
    val out = rows("""req{inst="i-0"}""", T0 + 600000L, T0 + 1200000L, 60000L)
    assert(out.map(_._2).toSet ==
      (0 to 4).map(m => T0 + 600000L + m * 60000L).toSet)
    assert(out.forall(_._3 == 200.0)) // i-0's last counter value
  }

  test("rate and increase handle counter resets over the step window") {
    // window (T0, T0+10m] holds samples k=1..20 (k=0 sits on the open
    // left edge). i-0: 19 deltas of +10 ⇒ 190. i-1: k=1..9 deltas +2
    // (16), reset at k=10 contributes its post-reset value 0, then ten
    // +2 deltas ⇒ 36.
    val out = rows("increase(req[10m])", T0 + 600000L, T0 + 600000L, 60000L)
    assert(out.size == 2)
    val byInst = out.map(r => (r._1.contains("i-0"), r._3)).toMap
    assert(byInst(true) == 190.0)
    assert(byInst(false) == 36.0)
    // rate = increase / observed span (k=1..k=20 ⇒ 570 s, no
    // extrapolation — documented deviation)
    val rate = rows("rate(req[10m])", T0 + 600000L, T0 + 600000L, 60000L)
    val rateByInst = rate.map(r => (r._1.contains("i-0"), r._3)).toMap
    assert(math.abs(rateByInst(true) - 190.0 / 570) < 1e-12)
    assert(math.abs(rateByInst(false) - 36.0 / 570) < 1e-12)
  }

  test("extrapolated rate/increase match Prometheus's estimator") {
    // i-0 over (T0, T0+10m]: samples k=1..20, inc=190, span 570s,
    // avg interval 30s. Edges: start gap 30s (≤ 1.1·avg AND exactly the
    // counter's time-to-zero) → extend 30s; end gap 0 → extend 0.
    // increase = 190 · 600/570 = 200; rate = 200/600s = 1/3.
    val out = PromQL.rangeQuery(querier, "increase(req[10m])",
      T0 + 600000L, T0 + 600000L, 60000L, extrapolate = true)
      .select(to_json(col("labels")).as("l"), col("v"))
      .collect().map(r => (r.getString(0).contains("i-0"), r.getDouble(1))).toMap
    assert(math.abs(out(true) - 200.0) < 1e-9)
    // i-1: inc=36, time-to-zero 570·(2/36)=31.67s > start gap 30s →
    // extend by the 30s gap: 36 · 600/570
    assert(math.abs(out(false) - 36.0 * 600 / 570) < 1e-9)
    val rate = PromQL.rangeQuery(querier, "rate(req[10m])",
      T0 + 600000L, T0 + 600000L, 60000L, extrapolate = true)
      .select(to_json(col("labels")).as("l"), col("v"))
      .collect().map(r => (r.getString(0).contains("i-0"), r.getDouble(1))).toMap
    assert(math.abs(rate(true) - 1.0 / 3) < 1e-9)
  }

  test("aggregation by label and binary division compose") {
    val out = rows("""sum by (inst) (increase(req[10m]))""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(out.size == 2)
    // share of total via one-to-one division on inst
    val share = rows(
      """increase(req[10m]) / on(inst) sum by (inst) (increase(req[10m]))""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(share.size == 2 && share.forall(r => math.abs(r._3 - 1.0) < 1e-12))
  }

  test("without() groups on the label complement") {
    // without (inst) strips the only non-name label ⇒ one global group,
    // identical to sum without any by-clause
    val w = rows("sum without (inst) (increase(req[10m]))",
      T0 + 600000L, T0 + 600000L, 60000L)
    val g = rows("sum(increase(req[10m]))", T0 + 600000L, T0 + 600000L, 60000L)
    assert(w == g && w.size == 1 && w.head._3 == 190.0 + 36.0)
    // parser accepts the clause after the parens too
    assert(PromQL.parse("sum without (inst) (m)") ==
      PromQL.parse("sum(m) without (inst)"))
  }

  test("group_left keeps the many side's full labels") {
    // share of each series against the per-__name__... here: per-inst
    // req divided by the global sum — many (per-inst) on the left
    val out = rows(
      "increase(req[10m]) / on() group_left sum(increase(req[10m]))",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(out.size == 2)
    val byInst = out.map(r => (r._1.contains("i-0"), r._3)).toMap
    assert(math.abs(byInst(true) - 190.0 / 226.0) < 1e-12)
    assert(math.abs(byInst(false) - 36.0 / 226.0) < 1e-12)
    assert(out.forall(_._1.contains("inst"))) // per-series identity kept
  }

  test("topk keeps the winning series' labels") {
    val out = rows("topk(1, increase(req[10m]))",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(out.size == 1 && out.head._1.contains("i-0") && out.head._3 == 190.0)
  }

  test("@ modifier pins the evaluation time across all steps") {
    // pinned at T0+5m (counter=100), evaluated over an 11-step grid:
    // every step carries the pinned value — including steps where the
    // unpinned series would have aged out of the lookback
    val atSec = (T0 + 300000L) / 1000
    val out = rows(s"""req{inst="i-0"} @ $atSec""",
      T0 + 600000L, T0 + 1200000L, 60000L)
    assert(out.size == 11 && out.forall(_._3 == 100.0))
    assert(out.map(_._2).toSet ==
      (0 to 10).map(m => T0 + 600000L + m * 60000L).toSet)
    // range fn pinned: increase over (T0, T0+5m] = deltas k=1..10
    val inc = rows(s"""increase(req{inst="i-0"}[5m] @ $atSec)""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(inc.size == 1 && inc.head._3 == 90.0)
  }

  test("offset shifts the evaluation window") {
    // at T0+10m with offset 5m ⇒ sees the counter at T0+5m: i-0 = 100
    val out = rows("""req{inst="i-0"} offset 5m""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(out.size == 1 && out.head._3 == 100.0)
  }

  test("subqueries re-evaluate the inner expression at their own step") {
    // selector subquery: m[10m:1m] over i-0 — inner instants sit on
    // ABSOLUTE minute multiples (Prometheus alignment). T0 is 20s past
    // a minute, so the window start T0 rounds up to T0+40s: instants
    // T0+40s+j·60s (j=0..9) see the counter at k=1+2j ⇒ v=10,30,..,190
    // ⇒ avg 100
    val sq = PromQL.parse("""avg_over_time(req{inst="i-0"}[10m:1m])""")
      .asInstanceOf[RangeFn].arg.asInstanceOf[Subquery]
    assert(sq.rangeMs == 600000L && sq.stepMs == 60000L)
    val out = rows("""avg_over_time(req{inst="i-0"}[10m:1m])""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(out.size == 1 && out.head._3 == 100.0)
    // composite subquery: the postfix form over a function result —
    // max_over_time of the 2m increase on the same aligned grid: from
    // the second instant on, each left-open 2m window holds 4 samples
    // (3 deltas of +10) ⇒ max 30
    val mx = rows("""max_over_time(increase(req{inst="i-0"}[2m])[10m:1m])""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(mx.size == 1 && mx.head._3 == 30.0)
    // [range:] with empty step inherits the outer step
    assert(PromQL.parse("avg_over_time(m[10m:])")
      .asInstanceOf[RangeFn].arg.asInstanceOf[Subquery].stepMs == 0L)
  }

  test("histogram_quantile interpolates cumulative le buckets") {
    // one histogram, two instances: i-0 has cum counts (10, 20, 40) at
    // le (0.1, 1, +Inf); i-1 (5, 30, 30). φ=0.5 rank: i-0 → 20 of 40 at
    // le=1 exactly: prev cum 10, rank 20 ⇒ 0.1 + 0.9·(10/10) = 1.0;
    // i-1 → rank 15 in (5..30] ⇒ 0.1 + 0.9·(10/25) = 0.46
    val rows = for {
      (inst, counts) <- Seq("i-0" -> Seq(10.0, 20.0, 40.0),
                            "i-1" -> Seq(5.0, 30.0, 30.0))
      (le, c) <- Seq("0.1", "1", "+Inf").zip(counts)
    } yield (inst, le, c)
    val df = spark.createDataFrame(rows).toDF("inst", "le", "c")
    val longForm = df.select(
      map(lit("__name__"), lit("lat_bucket"), lit("inst"), col("inst"),
        lit("le"), col("le")).as("labels"),
      lit(T0).as("t"), col("c").as("v"))
    val q = new TsQuerier(TsSchema.canonicalize(longForm, promoted = Seq()),
      promoted = Seq())
    val out = PromQL.rangeQuery(q, "histogram_quantile(0.5, lat_bucket)",
      T0, T0, 60000L)
      .select(TsSchema.labelValue(col("labels"), "inst").as("i"), col("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq("i-0", "i-1"))
    assert(math.abs(out(0)._2 - 1.0) < 1e-12)
    assert(math.abs(out(1)._2 - 0.46) < 1e-12)
  }

  test("histogram_quantile composes over increase of bucket counters") {
    // THE production dashboard query: quantile over the rate/increase of
    // cumulative le-bucket counters. Three counters sampled at T0,
    // T0+1m, T0+2m; increase over the left-open 2m window at T0+2m is
    // the last-minus-first of the two in-window samples:
    //   le=0.1: 2→4  ⇒ 2;  le=1: 5→10 ⇒ 5;  +Inf: 6→12 ⇒ 6
    // median rank 3 lands in (0.1, 1]: 0.1 + 0.9·(3−2)/(5−2) = 0.4
    val rows = for {
      (le, vs) <- Seq("0.1" -> Seq(0.0, 2.0, 4.0), "1" -> Seq(0.0, 5.0, 10.0),
                      "+Inf" -> Seq(0.0, 6.0, 12.0))
      (v, k) <- vs.zipWithIndex
    } yield (le, T0 + k * 60000L, v)
    val df = spark.createDataFrame(rows).toDF("le", "t", "v")
    val longForm = df.select(
      map(lit("__name__"), lit("lat_bucket"), lit("le"), col("le")).as("labels"),
      col("t"), col("v"))
    val q = new TsQuerier(TsSchema.canonicalize(longForm, promoted = Seq()),
      promoted = Seq())
    val out = PromQL.rangeQuery(q,
      "histogram_quantile(0.5, increase(lat_bucket[2m]))",
      T0 + 120000L, T0 + 120000L, 60000L)
      .select(col("v")).collect().map(_.getDouble(0)).toSeq
    assert(out.size == 1 && math.abs(out.head - 0.4) < 1e-12)
  }

  test("histogram_fraction is the quantile's uniform-within-bucket dual") {
    // same two histograms as the quantile test. [0.1, 0.55]: the first
    // bucket (0, 0.1] overlaps only at the point 0.1 (measure zero);
    // the second (0.1, 1] contributes 0.45/0.9 of its mass; the +Inf
    // mass is a point at the largest finite bound 1.0, outside.
    // i-0: 10·0.5/40 = 0.125; i-1: 25·0.5/30 = 0.41666…
    val rows = for {
      (inst, counts) <- Seq("i-0" -> Seq(10.0, 20.0, 40.0),
                            "i-1" -> Seq(5.0, 30.0, 30.0))
      (le, c) <- Seq("0.1", "1", "+Inf").zip(counts)
    } yield (inst, le, c)
    val df = spark.createDataFrame(rows).toDF("inst", "le", "c")
    val longForm = df.select(
      map(lit("__name__"), lit("lat_bucket"), lit("inst"), col("inst"),
        lit("le"), col("le")).as("labels"),
      lit(T0).as("t"), col("c").as("v"))
    val q = new TsQuerier(TsSchema.canonicalize(longForm, promoted = Seq()),
      promoted = Seq())
    def frac(expr: String): Seq[(String, Double)] =
      PromQL.rangeQuery(q, expr, T0, T0, 60000L)
        .select(TsSchema.labelValue(col("labels"), "inst").as("i"), col("v"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    val out = frac("histogram_fraction(0.1, 0.55, lat_bucket)")
    assert(out.map(_._1) == Seq("i-0", "i-1"))
    assert(math.abs(out(0)._2 - 0.125) < 1e-12)
    assert(math.abs(out(1)._2 - 12.5 / 30.0) < 1e-12)
    // (-Inf, +Inf) covers everything — including the +Inf point mass —
    // and exercises the Inf number literals in the parser
    val all = frac("histogram_fraction(-Inf, +Inf, lat_bucket)")
    assert(all.map(_._2) == Seq(1.0, 1.0))
    // fraction(0, quantile(φ)) recovers φ when the quantile lands
    // strictly inside a bucket: i-1's median is 0.46
    val half = frac("histogram_fraction(0, 0.46, lat_bucket)")
    assert(math.abs(half(1)._2 - 0.5) < 1e-12)
    // degenerate bounds degrade the way upstream does (no eval-time
    // throw): NaN bounds → NaN, inverted bounds → 0
    val nan = frac("histogram_fraction(NaN, NaN, lat_bucket)")
    assert(nan.size == 2 && nan.forall(_._2.isNaN))
    val inv = frac("histogram_fraction(2, 1, lat_bucket)")
    assert(inv.map(_._2) == Seq(0.0, 0.0))
  }

  test("histogram_count/sum/avg/stddev/stdvar evaluator functions") {
    // one histogram: le (0.1, 1, +Inf) cum (10, 30, 30) → masses 10 at
    // mid 0.05 and 20 at mid 0.55 (classic-interpolation midpoints), no
    // +Inf mass. n = 30; m1 = 11.5; m2 = 6.075 →
    // stdvar = 6.075/30 − (11.5/30)² = 1/18 exactly.
    // The `_sum` companion carries 12.3 → avg = 12.3/30 = 0.41.
    val bdf = spark.createDataFrame(
      Seq(("0.1", 10.0), ("1", 30.0), ("+Inf", 30.0))).toDF("le", "c")
    val buckets = bdf.select(
      map(lit("__name__"), lit("lat_bucket"), lit("le"), col("le")).as("labels"),
      lit(T0).as("t"), col("c").as("v"))
    val sums = spark.createDataFrame(Seq(Tuple1(12.3))).toDF("s").select(
      map(lit("__name__"), lit("lat_bucket_sum")).as("labels"),
      lit(T0).as("t"), col("s").as("v"))
    val q = new TsQuerier(
      TsSchema.canonicalize(buckets.unionByName(sums), promoted = Seq()),
      promoted = Seq())
    def one(expr: String): Double = {
      val vs = PromQL.rangeQuery(q, expr, T0, T0, 60000L)
        .select(col("v")).collect().map(_.getDouble(0)).toSeq
      assert(vs.size == 1, s"$expr returned ${vs.size} series")
      vs.head
    }
    assert(one("histogram_count(lat_bucket)") == 30.0)
    assert(one("histogram_sum(lat_bucket)") == 12.3)
    assert(math.abs(one("histogram_avg(lat_bucket)") - 0.41) < 1e-12)
    assert(math.abs(one("histogram_stdvar(lat_bucket)") - 1.0 / 18) < 1e-12)
    assert(math.abs(one("histogram_stddev(lat_bucket)") - math.sqrt(1.0 / 18)) < 1e-12)
  }

  test("stddev/stdvar/quantile over time") {
    // i-0 window (T0, T0+10m]: v = 10,20,..,200 — median = 105,
    // var_pop = (4·10²·(20²-1))/12·... use the closed forms:
    // mean 105, var = Σ(v-105)²/20 = 3325, sd = √3325
    val out = rows(
      """quantile_over_time(0.5, req{inst="i-0"}[10m])""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(out.size == 1 && out.head._3 == 105.0)
    val sv = rows("""stdvar_over_time(req{inst="i-0"}[10m])""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(math.abs(sv.head._3 - 3325.0) < 1e-9)
    val sd = rows("""stddev_over_time(req{inst="i-0"}[10m])""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(math.abs(sd.head._3 - math.sqrt(3325.0)) < 1e-9)
  }

  test("set operators and/unless/or join on the series identity") {
    val at = (T0 + 600000L, T0 + 600000L, 60000L)
    // both metrics share {inst=...} after the name drops ⇒ `and` keeps
    // every req series that has a matching mem series
    val both = rows("req and mem", at._1, at._2, at._3)
    assert(both.size == 2 &&
      both.map(_._3).toSet == Set(200.0, 20.0)) // req's own values
    val minus = rows("""req unless mem{inst="i-0"}""", at._1, at._2, at._3)
    assert(minus.size == 1 && minus.head._3 == 20.0) // only i-1 survives
    // or: left wins on conflict, right fills the gaps
    val either = rows("(req > 100) or mem", at._1, at._2, at._3)
    assert(either.size == 2)
    assert(either.exists(r => r._1.contains("i-0") && r._3 == 200.0))
    assert(either.exists(r => r._1.contains("i-1") && r._3 != 20.0)) // mem's value
  }

  test("bool comparisons emit 0/1 instead of filtering") {
    val out = rows("increase(req[10m]) > bool 100",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(out.size == 2)
    assert(out.map(r => (r._1.contains("i-0"), r._3)).toMap ==
      Map(true -> 1.0, false -> 0.0))
  }

  test("sort family orders the instant vector presentationally") {
    // collect WITHOUT re-sorting: the assertion is the row order itself
    def ordered(q: String): Seq[(String, Double)] =
      PromQL.rangeQuery(querier, q, T0 + 600000L, T0 + 600000L, 60000L)
        .select(to_json(col("labels")).as("l"), col("v"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // one step, two req series: i-0 = 200, i-1 = 20
    assert(ordered("sort(req)").map(_._2) == Seq(20.0, 200.0))
    assert(ordered("sort_desc(req)").map(_._2) == Seq(200.0, 20.0))
    assert(ordered("""sort_by_label(req, "inst")""")
      .map(_._1.contains("i-0")) == Seq(true, false))
    assert(ordered("""sort_by_label_desc(req, "inst")""")
      .map(_._1.contains("i-0")) == Seq(false, true))
    // values and labels pass through untouched, so a sort composes
    // inside any vector expression
    assert(ordered("sum(sort_desc(req))").map(_._2) == Seq(220.0))
    // at least one label argument is required
    intercept[IllegalArgumentException](PromQL.parse("sort_by_label(req)"))
  }

  test("property: the EVALUATOR completes or raises the documented error on grammar-generated queries") {
    // well-formed-by-construction expressions over the fixture store
    // (plus an absent metric): every one must either evaluate to rows
    // (possibly zero) or raise IllegalArgumentException — no MatchError,
    // ClassCastException, NPE, or analysis error escapes the API
    val rnd = new scala.util.Random(11)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val ranges = Seq("2m", "5m", "90s")
    def sel(): String = {
      val m = pick(Seq("req", "mem", "absent_metric"))
      val matcher = pick(Seq("", """{inst="i-0"}""", """{inst=~"i-.*"}""",
        """{inst!="i-9"}"""))
      val off = pick(Seq("", "", " offset 2m"))
      s"$m$matcher$off"
    }
    def gen(depth: Int): String =
      if (depth <= 0) sel()
      else pick[() => String](Seq(
        () => sel(),
        () => s"${pick(Seq("rate", "increase", "delta", "avg_over_time",
          "max_over_time", "count_over_time", "last_over_time"))}(${sel()}[${pick(ranges)}])",
        () => s"${pick(Seq("sum", "min", "max", "avg", "count"))} by (inst) (${gen(depth - 1)})",
        () => s"${pick(Seq("sum", "avg"))}(${gen(depth - 1)})",
        () => s"topk(2, ${gen(depth - 1)})",
        () => s"quantile(0.9, ${gen(depth - 1)})",
        () => s"(${gen(depth - 1)}) ${pick(Seq("+", "-", "*", "/", ">", "<="))} (${gen(depth - 1)})",
        () => s"(${gen(depth - 1)}) ${pick(Seq("+", "*"))} ${rnd.nextInt(10)}",
        () => s"${pick(Seq("abs", "ceil", "floor", "exp", "ln", "sqrt", "sgn"))}(${gen(depth - 1)})",
        () => s"clamp(${gen(depth - 1)}, 0, 100)",
        () => s"histogram_quantile(0.9, ${gen(depth - 1)})",
        () => s"scalar(${gen(depth - 1)}) * vector(1)",
        () => s"avg_over_time((${gen(depth - 1)})[4m:1m])",
        () => s"label_replace(${gen(depth - 1)}, \"dst\", \"$$1\", \"inst\", \"(.*)\")"
      ))()
    (0 until 36).foreach { i =>
      val q = gen(2)
      try { rows(q, T0, T0 + 600000L, 120000L); () }
      catch {
        case _: IllegalArgumentException => () // the documented error contract
        case e: Throwable =>
          fail(s"query $i leaked ${e.getClass.getName} on: $q\n${e.getMessage}")
      }
    }
  }

  test("property: the parser never throws anything but a parse error") {
    // mutated real queries and raw garbage: every input either parses
    // or raises IllegalArgumentException — no stack overflow, NPE, or
    // index error escapes, whatever bytes arrive on the API
    val seeds = Seq(
      "sum by (job) (rate(http_req{env=\"prod\"}[5m]))",
      "histogram_quantile(0.9, sum by (le) (rate(lat_bucket[5m])))",
      "topk(3, avg_over_time(mem[1h:5m] offset 1d))",
      "label_replace(up, \"dst\", \"$1\", \"src\", \"(.*)\")",
      "sort_by_label(req, \"inst\") / on(inst) group_left sum(req)",
      "clamp(predict_linear(disk[4h], 3600), 0, 1e9)")
    val rnd = new scala.util.Random(7)
    val chars = "(){}[]\",=~!<>+-*/%.:@0123456789abcdefghij_ "
    (0 until 500).foreach { i =>
      val q = rnd.nextInt(3) match {
        case 0 => // mutate a seed: splice random chars in
          val s = seeds(rnd.nextInt(seeds.length)).toCharArray
          (0 until 1 + rnd.nextInt(4)).foreach { _ =>
            s(rnd.nextInt(s.length)) = chars.charAt(rnd.nextInt(chars.length))
          }
          new String(s)
        case 1 =>
          val sd = seeds(rnd.nextInt(seeds.length))
          sd.take(rnd.nextInt(sd.length))
        case 2 => (0 until rnd.nextInt(40))
          .map(_ => chars.charAt(rnd.nextInt(chars.length))).mkString
      }
      try { PromQL.parse(q); () }
      catch {
        case _: IllegalArgumentException => () // the parse-error contract
        case e: Throwable =>
          fail(s"input $i ${e.getClass.getSimpleName} on: $q")
      }
    }
  }

  test("label_replace and label_join rewrite the label set") {
    val rep = rows(
      """label_replace(req{inst="i-0"}, "shard", "$1", "inst", "i-(.*)")""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(rep.size == 1 &&
      rep.head._1.contains("""{"name":"shard","value":"0"}""") &&
      rep.head._1.contains("""{"name":"inst","value":"i-0"}"""))
    // non-matching regex leaves the series untouched
    val miss = rows(
      """label_replace(req{inst="i-0"}, "shard", "$1", "inst", "x-(.*)")""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(miss.size == 1 && !miss.head._1.contains("shard"))
    val join = rows(
      """label_join(req{inst="i-0"}, "id", "-", "__name__", "inst")""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(join.size == 1 &&
      join.head._1.contains("""{"name":"id","value":"req-i-0"}"""))
  }

  test("absent() emits 1 at steps with no matching series") {
    // samples end at T0+10m; with the 5m lookback the series disappears
    // from steps T0+15m on — absent() fires exactly there
    val out = rows("""absent(req{inst="i-0"})""",
      T0 + 600000L, T0 + 1200000L, 60000L)
    assert(out.map(_._2).toSet ==
      (5 to 10).map(m => T0 + 600000L + m * 60000L).toSet)
    assert(out.forall(r => r._3 == 1.0 && r._1.contains("i-0")))
    // a selector that never matches fires at every step
    val never = rows("""absent(req{env="prod"})""",
      T0 + 600000L, T0 + 1200000L, 60000L)
    assert(never.size == 11 && never.forall(_._1.contains("prod")))
  }

  test("scalar functions and comparison filters") {
    val clamped = rows("""clamp(req{inst="i-0"}, 25, 125)""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(clamped.head._3 == 125.0)
    // value-transforming functions drop the metric name...
    assert(!clamped.head._1.contains("__name__"))
    // ...while comparison-as-filter keeps the series identity intact
    val filtered = rows("increase(req[10m]) > 100",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(filtered.size == 1 && filtered.head._1.contains("i-0"))
  }

  test("trigonometric family, pi() and atan2") {
    val at = (T0 + 600000L, T0 + 600000L, 60000L)
    // sin²+cos² = 1 over a real series value
    val s2 = rows("""sin(req{inst="i-0"})^2 + cos(req{inst="i-0"})^2""",
      at._1, at._2, at._3)
    assert(math.abs(s2.head._3 - 1.0) < 1e-12)
    // deg(rad(x)) = x; rad(180·v/v)… simpler: deg over the value
    val d = rows("""deg(rad(req{inst="i-0"}))""", at._1, at._2, at._3)
    assert(math.abs(d.head._3 - 200.0) < 1e-9)
    assert(!d.head._1.contains("__name__")) // value-transforming drops name
    // pi() is a scalar; atan2 is a keyword binary op at * precedence:
    // atan2(v, v) = pi/4 for positive v
    val a = rows("""req{inst="i-0"} atan2 req{inst="i-0"}""", at._1, at._2, at._3)
    assert(math.abs(a.head._3 - math.Pi / 4) < 1e-12)
    val p = rows("""vector(pi())""", at._1, at._2, at._3)
    assert(math.abs(p.head._3 - math.Pi) < 1e-15)
  }

  test("arithmetic drops the metric name; round/sgn transform values") {
    val at = (T0 + 600000L, T0 + 600000L, 60000L)
    val dbl = rows("""req{inst="i-0"} * 2""", at._1, at._2, at._3)
    assert(dbl.size == 1 && dbl.head._3 == 400.0)
    assert(!dbl.head._1.contains("__name__") && dbl.head._1.contains("i-0"))
    // unary minus parses as 0 - e and behaves like any arithmetic
    val neg = rows("""-req{inst="i-0"}""", at._1, at._2, at._3)
    assert(neg.head._3 == -200.0 && !neg.head._1.contains("__name__"))
    // round(v, to_nearest): 200/3 = 66.67 → nearest 10 ⇒ 70
    val r = rows("""round(req{inst="i-0"} / 3, 10)""", at._1, at._2, at._3)
    assert(r.head._3 == 70.0)
    val sg = rows("""sgn(-req{inst="i-0"})""", at._1, at._2, at._3)
    assert(sg.head._3 == -1.0)
  }

  test("deriv, predict_linear and present_over_time") {
    val at = (T0 + 600000L, T0 + 600000L, 60000L)
    // i-0 climbs +10 every 30s ⇒ slope exactly 1/3 per second
    val d = rows("""deriv(req{inst="i-0"}[10m])""", at._1, at._2, at._3)
    assert(d.size == 1 && math.abs(d.head._3 - 1.0 / 3.0) < 1e-9)
    assert(!d.head._1.contains("__name__"))
    // a perfectly linear counter: the regression line hits the exact
    // future value — at T0+10m the counter is 200, 60s later 220
    val p = rows("""predict_linear(req{inst="i-0"}[10m], 60)""",
      at._1, at._2, at._3)
    assert(p.size == 1 && math.abs(p.head._3 - 220.0) < 1e-6)
    val pr = rows("present_over_time(req[10m])", at._1, at._2, at._3)
    assert(pr.size == 2 && pr.forall(_._3 == 1.0))
  }

  test("stddev/stdvar/group/count_values aggregations") {
    val at = (T0 + 600000L, T0 + 600000L, 60000L)
    // instant values at T0+10m: i-0=200, i-1=20 ⇒ mean 110, var_pop 8100
    val sv = rows("stdvar(req)", at._1, at._2, at._3)
    assert(sv.size == 1 && sv.head._3 == 8100.0)
    val sd = rows("stddev(req)", at._1, at._2, at._3)
    assert(sd.head._3 == 90.0)
    val g = rows("group by (inst) (req)", at._1, at._2, at._3)
    assert(g.size == 2 && g.forall(_._3 == 1.0))
    // count_values: distinct instant values become a label
    val cv = rows("""count_values("val", req)""", at._1, at._2, at._3)
    assert(cv.size == 2)
    assert(cv.exists(r => r._1.contains("\"value\":\"200\"}") && r._3 == 1.0))
    assert(cv.exists(r => r._1.contains("\"value\":\"20\"}") && r._3 == 1.0))
  }

  test("time/timestamp/scalar/vector scalar machinery") {
    val at = (T0 + 600000L, T0 + 600000L, 60000L)
    // timestamp(selector) reports the winning SAMPLE's time in seconds
    val ts = rows("""timestamp(req{inst="i-0"})""", at._1, at._2, at._3)
    assert(ts.size == 1 && ts.head._3 == (T0 + 600000L) / 1000.0)
    assert(!ts.head._1.contains("__name__"))
    // time() - timestamp(v): the sample's age in seconds (0 here)
    val age = rows("""time() - timestamp(req{inst="i-0"})""",
      at._1, at._2, at._3)
    assert(age.size == 1 && age.head._3 == 0.0)
    // scalar(): single-series vector value usable in arithmetic
    val sc = rows("""req / scalar(sum(req))""", at._1, at._2, at._3)
    assert(sc.size == 2 &&
      math.abs(sc.map(_._3).sum - 1.0) < 1e-12)
    // vector(time() - 100) lifts a composite scalar to an instant vector
    val vt = rows("vector(time() - 100)", at._1, at._2, at._3)
    assert(vt.size == 1 && vt.head._3 == (T0 + 600000L) / 1000.0 - 100
      && vt.head._1 == "[]")
    // scalar of a non-singleton vector is NaN
    val nan = rows("""vector(scalar(req))""", at._1, at._2, at._3)
    assert(nan.size == 1 && nan.head._3.isNaN)
  }

  test("absent_over_time fires on empty range windows") {
    // samples end at T0+10m; a 2m range window empties from T0+12m on
    val out = rows("""absent_over_time(req{inst="i-0"}[2m])""",
      T0 + 600000L, T0 + 1200000L, 60000L)
    assert(out.map(_._2).toSet ==
      (2 to 10).map(m => T0 + 600000L + m * 60000L).toSet)
    assert(out.forall(r => r._3 == 1.0 && r._1.contains("i-0")))
  }

  test("calendar functions over vector(time())") {
    val at = (T0 + 600000L, T0 + 600000L, 60000L)
    def one(q: String): Double = rows(q, at._1, at._2, at._3).head._3
    // T0+10m = 2023-11-14T22:23:20Z, a Tuesday
    assert(one("minute()") == 23.0 && one("hour()") == 22.0)
    assert(one("day_of_week()") == 2.0) // Prometheus: 0 = Sunday
    assert(one("day_of_month()") == 14.0 && one("day_of_year()") == 318.0)
    assert(one("days_in_month()") == 30.0)
    assert(one("month()") == 11.0 && one("year()") == 2023.0)
    // explicit vector argument
    assert(one("month(vector(1700000600))") == 11.0)
  }

  test("@ start()/end() pin to the window edges; sort keeps the row set") {
    // grid T0+10m..T0+20m: @ start() pins every step to T0+10m (200)
    val st = rows("""req{inst="i-0"} @ start()""",
      T0 + 600000L, T0 + 1200000L, 60000L)
    assert(st.size == 11 && st.forall(_._3 == 200.0))
    // @ end() pins to T0+20m — past the last sample + lookback ⇒ empty
    val en = rows("""req{inst="i-0"} @ end()""",
      T0 + 600000L, T0 + 1200000L, 60000L)
    assert(en.isEmpty)
    // sort only affects presentation order — the row set is unchanged
    val s = rows("sort_desc(req)", T0 + 600000L, T0 + 600000L, 60000L)
    assert(s.map(_._3).toSet == Set(200.0, 20.0))
  }

  test("double_exponential_smoothing matches a reference fold; holt_winters aliases") {
    val at = T0 + 600000L
    // window (at-2m, at]: mem samples k=17..20 (30s cadence)
    val out = rows("""double_exponential_smoothing(mem{inst="i-0"}[2m], 0.4, 0.3)""",
      at, at, 60000L)
    val xs = (17 to 20).map(k => ((T0 + k * 30000L) % 7 + 1).toDouble)
    var s = xs(0); var b = xs(1) - xs(0)
    xs.drop(1).foreach { x =>
      val s2 = 0.4 * x + 0.6 * (s + b)
      b = 0.3 * (s2 - s) + 0.7 * b
      s = s2
    }
    assert(out.size == 1 && math.abs(out.head._3 - s) < 1e-9)
    // pre-3.x upstream name, same function
    assert(rows("""holt_winters(mem{inst="i-0"}[2m], 0.4, 0.3)""",
      at, at, 60000L) == out)
    // sf/tf outside (0,1) are rejected at evaluation
    intercept[IllegalArgumentException] {
      rows("""double_exponential_smoothing(mem[2m], 1.5, 0.3)""", at, at, 60000L)
    }
  }

  test("sort_by_label/_desc keep the row set; limitk/limit_ratio sample series") {
    val at = T0 + 300000L
    val all = rows("req", at, at, 60000L)
    assert(all.size == 2)
    assert(rows("""sort_by_label(req, "inst")""", at, at, 60000L) == all)
    assert(rows("""sort_by_label_desc(req, "inst")""", at, at, 60000L) == all)
    // limitk: deterministic k-first-in-label-order subset, own labels kept
    val lk = rows("limitk(1, req)", at, at, 60000L)
    assert(lk.size == 1 && lk.head._1.contains("i-0"))
    assert(rows("limitk(5, req)", at, at, 60000L) == all)
    // limit_ratio: md5-hash sampling; r and r-1 are exact complements
    assert(rows("limit_ratio(1, req)", at, at, 60000L) == all)
    val pos = rows("limit_ratio(0.5, req)", at, at, 60000L)
    val neg = rows("limit_ratio(-0.5, req)", at, at, 60000L)
    assert((pos ++ neg).sortBy(x => (x._1, x._2)) == all)
  }

  test("info() enriches series with target_info data labels") {
    import org.apache.spark.sql.Row
    import scala.jdk.CollectionConverters._
    val t = T0 + 60000L
    def series(lbls: Map[String, String], v: Double) = Row(lbls, t, v)
    val rws = Seq(
      series(Map("__name__" -> "up", "job" -> "a", "instance" -> "i0"), 1.0),
      series(Map("__name__" -> "up", "job" -> "b", "instance" -> "i9"), 2.0), // no info
      series(Map("__name__" -> "target_info", "job" -> "a", "instance" -> "i0",
        "cluster" -> "us-east", "env" -> "prod"), 1.0)).asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    val q = new TsQuerier(TsSchema.canonicalize(
      spark.createDataFrame(rws, schema), promoted = Seq()), promoted = Seq())
    def run(expr: String): Seq[(String, Double)] =
      PromQL.rangeQuery(q, expr, t, t, 60000L)
        .select(to_json(col("labels")).as("l"), col("v"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
    // all data labels of the matching info series are copied; the
    // series with no matching target_info passes through unchanged
    val enriched = run("info(up)")
    assert(enriched.size == 2)
    val (ja, jb) = (enriched.find(_._2 == 1.0).get._1, enriched.find(_._2 == 2.0).get._1)
    assert(ja.contains("cluster") && ja.contains("us-east") && ja.contains("env"))
    assert(!jb.contains("cluster") && !jb.contains("env"))
    // the selector restricts the copied labels to the names it mentions
    val only = run("""info(up, {cluster="us-east"})""")
    val jc = only.find(_._2 == 1.0).get._1
    assert(jc.contains("cluster") && !jc.contains("env"))
    // a selector the info series does not match ⇒ nothing is copied
    val none = run("""info(up, {cluster="eu-west"})""")
    assert(none.forall(x => !x._1.contains("cluster")))
  }

  test("mad_over_time and the ts_of_* family") {
    val at = T0 + 600000L
    // i-0 window (at-2m, at]: v = 170, 180, 190, 200
    // median = 185; |v-185| = 15, 5, 5, 15 → mad = 10
    val mad = rows("""mad_over_time(req{inst="i-0"}[2m])""", at, at, 60000L)
    assert(mad.map(_._3) == Seq(10.0))
    // odd count: [90s] window (at-90s, at] → v = 180, 190, 200, median 190
    // |v-190| = 10, 0, 10 → mad = 10; also checks the odd-n median path
    val mad3 = rows("""mad_over_time(req{inst="i-0"}[1m30s])""", at, at, 60000L)
    assert(mad3.map(_._3) == Seq(10.0))
    // counters rise, so ts-of-max = last sample, ts-of-min = first
    val tmax = rows("""ts_of_max_over_time(req{inst="i-0"}[2m])""", at, at, 60000L)
    assert(tmax.map(_._3) == Seq(at / 1000.0))
    val tmin = rows("""ts_of_min_over_time(req{inst="i-0"}[2m])""", at, at, 60000L)
    assert(tmin.map(_._3) == Seq((at - 90000L) / 1000.0))
    val tlast = rows("""ts_of_last_over_time(req{inst="i-0"}[2m])""", at, at, 60000L)
    assert(tlast.map(_._3) == Seq(at / 1000.0))
    // ts_of_max tie-break: mem gauge repeats values (t % 7 + 1); the
    // EARLIEST sample attaining the window max must win
    val memXs = (17 to 20).map(k => (T0 + k * 30000L, ((T0 + k * 30000L) % 7 + 1).toDouble))
    val expect = memXs.filter(_._2 == memXs.map(_._2).max).map(_._1).min / 1000.0
    val tmem = rows("""ts_of_max_over_time(mem{inst="i-0"}[2m])""", at, at, 60000L)
    assert(tmem.map(_._3) == Seq(expect))
  }

  test("aligned over_time/increase route through the downsample ladder") {
    import graft.tsdb.TsDownsample
    // 10s windows (T0 is 10s-aligned; every 30s sample gets its own
    // window) materialized straight from the store's canonical form
    val canon = querier.selectLong(T0 - 86400000L, T0 + 86400000L, Seq.empty)
    val down = Seq((10000L, TsDownsample.downsample(canon, 10000L)))
    val at = T0 + 600000L
    // routed semantics are window-aligned [t_k - range, t_k): the 2m
    // window at k=20 sees samples k=16..19 → 160+170+180+190 = 700
    // (the raw path's (t_k - range, t_k] would see k=17..20 = 740, so
    // 700 PROVES the downsampled form was read)
    val sum = rows("""sum_over_time(req{inst="i-0"}[2m])""", at, at, 60000L,
      downsamples = down)
    assert(sum == Seq((sum.head._1, at, 700.0)))
    val cnt = rows("""count_over_time(req{inst="i-0"}[2m])""", at, at, 60000L,
      downsamples = down)
    assert(cnt.map(_._3) == Seq(4.0))
    // exact reset-corrected increase from inc_v + boundary deltas:
    // i-1 samples k=16..19 → 12,14,16,18 → increase 6
    val inc = rows("""increase(req{inst="i-1"}[2m])""", at, at, 60000L,
      downsamples = down)
    assert(inc.map(_._3) == Seq(6.0))
    // a resolution that doesn't divide the step is refused → raw path,
    // identical to evaluating with no ladder at all
    val misaligned = Seq((25000L, TsDownsample.downsample(canon, 25000L)))
    assert(rows("""sum_over_time(req{inst="i-0"}[2m])""", at, at, 60000L,
      downsamples = misaligned) ==
      rows("""sum_over_time(req{inst="i-0"}[2m])""", at, at, 60000L))
  }

  test("ignoring() matches on the label complement; negative offsets") {
    // ignoring(inst) strips the only distinguishing label, so each
    // series matches the global sum — per-series share of total
    val share = rows(
      "increase(req[10m]) / ignoring(inst) group_left sum(increase(req[10m]))",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(share.size == 2)
    val byInst = share.map(r => (r._1.contains("i-0"), r._3)).toMap
    assert(math.abs(byInst(true) - 190.0 / 226.0) < 1e-12)
    assert(math.abs(byInst(false) - 36.0 / 226.0) < 1e-12)
    // offset -5m at T0+5m reads the FUTURE sample at T0+10m
    val neg = rows("""req{inst="i-0"} offset -5m""",
      T0 + 300000L, T0 + 300000L, 60000L)
    assert(neg.size == 1 && neg.head._3 == 200.0)
  }

  test("group_left(lbl) copies labels from the one side") {
    // the static-label idiom: label_replace(v, "tier", "gold", "", "")
    // sets tier=gold on the one side; group_left(tier) copies it onto
    // every many-side series
    val out = rows(
      """req / on(inst) group_left(tier) label_replace(mem, "tier", "gold", "", "")""",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(out.size == 2)
    assert(out.forall(_._1.contains(""""name":"tier","value":"gold"""")))
    assert(out.forall(_._1.contains("inst")))
  }

  test("alert rules fire after the for-duration holds") {
    // req > 100 on i-0 first holds at T0+6m (v=120) on the 1m grid;
    // with for=2m the alert needs 3 consecutive holding steps, so it
    // fires from T0+8m on. i-1 (max 20) never fires.
    val out = AlertRules.firing(querier, "req > 100",
      T0 + 360000L, T0 + 600000L, 60000L, forMs = 120000L)
      .select(to_json(col("labels")).as("l"), col("t"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(out.size == 3 && out.forall(_._1.contains("i-0")))
    assert(out.map(_._2) == (8 to 10).map(m => T0 + m * 60000L))
    assert(out.map(_._3) == Seq(160.0, 180.0, 200.0))
    // a for-duration off the grid is rejected
    intercept[IllegalArgumentException](AlertRules.firing(
      querier, "req > 100", T0, T0, 60000L, forMs = 90000L))
  }

  test("recording rules materialize an expression as a new metric") {
    val dest = java.nio.file.Files.createTempDirectory("rules")
      .resolve("s").toString
    val n = RecordingRules.record(querier, dest, "inst:req:increase10m",
      "sum by (inst) (increase(req[10m]))",
      T0 + 600000L, T0 + 600000L, 60000L)
    assert(n == 2)
    // rule series read back through the ordinary querier, renamed
    val got = TsStore.read(spark, dest)
      .selectLong(0L, Long.MaxValue / 2, Seq(
        LabelMatcher.eq(Labels.MetricName, "inst:req:increase10m")))
      .select(TsSchema.labelValue(col("labels"), "inst").as("inst"), col("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == Map("i-0" -> 190.0, "i-1" -> 36.0))
    // malformed rule names are rejected before any evaluation
    intercept[IllegalArgumentException](
      RecordingRules.record(querier, dest, "bad name", "req", 0L, 0L, 1L))
  }

  test("one-to-one matching rejects duplicate series per match group") {
    // on() collapses every series into ONE match group: both req series
    // collide on the left (and both mem on the right) — Prometheus
    // raises instead of emitting a cross product
    val ex = intercept[Exception](
      rows("req + on() mem", T0 + 600000L, T0 + 600000L, 60000L))
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("; ")
    assert(chain.contains("duplicate series"))
    // the `one` side of group_left must be unique too
    val ex2 = intercept[Exception](
      rows("req / on() group_left mem", T0 + 600000L, T0 + 600000L, 60000L))
    val chain2 = Iterator.iterate(ex2: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("; ")
    assert(chain2.contains("duplicate series"))
  }
}
