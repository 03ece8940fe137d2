package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Funnel + retention semantics on hand fixtures (the DuckDB oracle
  * covers bulk parity on the events table). */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("u", "et", "t")

  test("funnel: greedy-earliest chain, window anchored at step 1") {
    val df = ev(
      // u1 completes: a@10 -> b@20 -> c@30
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      // u2: b precedes its a — b does not count; chain stops at a
      (2L, "b", 5L), (2L, "a", 10L), (2L, "c", 40L),
      // u3: c lands outside the window anchored at a@0 (0+50 < 60)
      (3L, "a", 0L), (3L, "b", 10L), (3L, "c", 61L),
      // u4: never enters
      (4L, "b", 10L), (4L, "c", 20L))
    val times = Behavior.funnelStepTimes(df, col("u"), col("et"), col("t"),
      Seq("a", "b", "c"), windowMs = 50L).orderBy("u").collect()
    assert(times.map(r => (r.getLong(0),
      Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(10L), None, None), // u2's c@40 can't count: no b reached
      (3L, Some(0L), Some(10L), None),
      (4L, None, None, None)))
    val summary = Behavior.funnel(df, col("u"), col("et"), col("t"),
      Seq("a", "b", "c"), windowMs = 50L).orderBy("step").collect()
    assert(summary.map(r => (r.getInt(0), r.getLong(2))).toSeq ==
      Seq((1, 3L), (2, 2L), (3, 1L)))
    assert(summary(1).getAs[Double]("conv_from_prev") ==
      BigDecimal(2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(summary(2).getAs[Double]("conv_from_entry") == 0.25)
  }

  test("funnel: equal timestamps do not chain (strictly-after rule)") {
    val df = ev((1L, "a", 10L), (1L, "b", 10L), (1L, "b", 11L))
    val r = Behavior.funnelStepTimes(df, col("u"), col("et"), col("t"),
      Seq("a", "b"), windowMs = 50L).head()
    assert(r.getLong(1) == 10L && r.getLong(2) == 11L)
  }

  test("funnel plan: chained step windows + summary ride ONE user exchange") {
    val df = ev((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 5L))
    val plan = Behavior.funnelStepTimes(df, col("u"), col("et"), col("t"),
      Seq("a", "b", "c"), windowMs = 50L)
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected a single user-key exchange, got $exchanges:\n$plan")
  }

  test("retention: cohort on first signup period, offsets clamp, rates exact") {
    val day = 10L
    val df = ev(
      // u1 cohorts at period 0 (first signup wins), active at 0 and 2
      (1L, "signup", 0L), (1L, "signup", 25L), (1L, "buy", 5L), (1L, "buy", 21L),
      // u2 cohorts at period 1; activity BEFORE the cohort is excluded
      (2L, "buy", 3L), (2L, "signup", 12L), (2L, "buy", 19L),
      // u3 cohorts at period 0, active only past maxOffset
      (3L, "signup", 1L), (3L, "buy", 35L),
      // u4 never signs up — no cohort row despite activity
      (4L, "buy", 7L))
    val out = Behavior.retention(df, col("u"), col("et"), col("t"),
      cohortType = "signup", activityType = "buy",
      periodMs = day, epochMs = 0L, maxOffset = 2)
      .orderBy("cohort_period", "offset").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 2L, 1L), (0L, 2L, 2L, 1L), (1L, 0L, 1L, 1L)))
    assert(out(0).getAs[Double]("retention") == 0.5)
  }

  test("sessionize: gap boundary is strict, sessions ordinal per user") {
    val df = ev(
      // u1: 0,10 | 25 (gap 15 > 10) | 30,40 (gap exactly 10 stays)
      (1L, "x", 0L), (1L, "x", 10L), (1L, "x", 25L), (1L, "x", 30L),
      (1L, "y", 40L),
      // u2: single event → session 1
      (2L, "x", 100L))
    val out = Behavior.sessionize(df, col("u"), col("t"), gapMs = 10L)
      .orderBy("u", "t").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 1L), (1L, 10L, 1L), (1L, 25L, 2L), (1L, 30L, 2L),
      (1L, 40L, 2L), (2L, 100L, 1L)))
  }

  test("sessionize: timestamp ties land in one session (range-frame peers)") {
    // the tie group at t=50 follows a session-breaking gap; whichever
    // physical row lag anchors outside the group, ALL peers must share
    // the new session's index
    val df = ev((1L, "a", 0L), (1L, "b", 50L), (1L, "c", 50L), (1L, "d", 50L))
    val out = Behavior.sessionize(df, col("u"), col("t"), gapMs = 10L)
      .where(col("t") === 50L).select(col("session_idx"))
      .distinct().collect()
    assert(out.length == 1 && out(0).getLong(0) == 2L)
  }

  test("property: session count and sizes match an independent fold oracle") {
    val rnd = new scala.util.Random(23)
    (1 to 8).foreach { _ =>
      val gap = 5L + rnd.nextInt(20)
      val rows = (0 until 30 + rnd.nextInt(50)).map { _ =>
        (1L + rnd.nextInt(4), "e", rnd.nextInt(300).toLong)
      }.distinct // unique (u, t): ties are covered by the dedicated test
      // oracle: plain Scala fold over the sorted per-user timeline
      val expect = rows.groupBy(_._1).view.mapValues { es =>
        val ts = es.map(_._3).sorted
        ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
          if (t - acc.head.head > gap) List(t) :: acc
          else (t :: acc.head) :: acc.tail
        }.map(_.size).reverse
      }.toMap
      val got = Behavior.sessionStats(ev(rows: _*), col("u"), col("et"), col("t"), gap)
        .orderBy("user", "session_idx").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(4)).toList).toMap
      assert(got == expect, s"gap=$gap rows=$rows")
    }
  }

  test("sessionStats: per-session aggregates; one user exchange for assignment") {
    val df = ev(
      (1L, "view", 0L), (1L, "click", 5L), (1L, "view", 100L),
      (2L, "view", 7L))
    val out = Behavior.sessionStats(df, col("u"), col("et"), col("t"), gapMs = 10L)
      .orderBy("user", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, 5L, 2L, 2L, 5L),
      (1L, 2L, 100L, 100L, 1L, 1L, 0L),
      (2L, 1L, 7L, 7L, 1L, 1L, 0L)))
    // the lag and running-sum windows must share one exchange on u
    val plan = Behavior.sessionize(df, col("u"), col("t"), gapMs = 10L)
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected a single user-key exchange, got $exchanges:\n$plan")
  }
}
