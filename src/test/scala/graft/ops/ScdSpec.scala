package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** SCD2 semantics on hand fixtures + the incremental ≡ one-shot merge
  * law (the DuckDB oracle covers bulk parity on the events table). */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val End = 4102444800000L // 2100-01-01, repo "unbounded" epoch

  private def upd(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("k", "state", "t")

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k", "valid_from", "state").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq

  test("scd2: change detection, interval chaining, open tail") {
    val h = Scd.scd2(upd(
      (1L, "a", 10L), (1L, "a", 20L), // no-op repeat collapses
      (1L, "b", 30L), (1L, "a", 40L), // back-and-forth = two more versions
      (2L, "x", 5L)),
      Seq("k"), Seq("state"), "t", End)
    assert(rowsOf(h) == Seq(
      (1L, "a", 10L, 30L), (1L, "b", 30L, 40L), (1L, "a", 40L, End),
      (2L, "x", 5L, End)))
  }

  test("scd2: NULL attribute values are real states (null-safe change detect)") {
    val df = Seq((1L, Some("a"), 10L), (1L, None, 20L), (1L, None, 25L),
      (1L, Some("a"), 30L)).toDF("k", "state", "t")
    val h = Scd.scd2(df, Seq("k"), Seq("state"), "t", End)
      .orderBy("valid_from").collect()
      .map(r => (Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    // a -> NULL is a change; NULL -> NULL collapses; NULL -> a reopens
    assert(h.toSeq == Seq(
      (Some("a"), 10L, 20L), (None, 20L, 30L), (Some("a"), 30L, End)))
  }

  test("scd2: (ts, attrs) tie-break makes same-ms conflicts deterministic") {
    val h = Scd.scd2(upd((1L, "b", 10L), (1L, "a", 10L)),
      Seq("k"), Seq("state"), "t", End)
    // attrs order: 'a' sorts first -> 'a' [10,10) is a zero-width
    // version, 'b' stays open; any engine replays exactly this
    assert(rowsOf(h) == Seq((1L, "a", 10L, 10L), (1L, "b", 10L, End)))
  }

  test("scd2Merge: closes, inserts, no-ops, stale drops; ≡ one-shot") {
    val first = upd((1L, "a", 10L), (1L, "b", 30L), (2L, "x", 5L))
    val second = upd(
      (1L, "b", 50L),  // no-op: value unchanged
      (1L, "c", 60L),  // real change: closes b@30
      (2L, "x", 3L),   // stale: at/before open valid_from -> dropped
      (3L, "n", 70L))  // new key
    val hist1 = Scd.scd2(first, Seq("k"), Seq("state"), "t", End)
    val merged = Scd.scd2Merge(hist1, second, Seq("k"), Seq("state"), "t", End)
    assert(rowsOf(merged) == Seq(
      (1L, "a", 10L, 30L), (1L, "b", 30L, 60L), (1L, "c", 60L, End),
      (2L, "x", 5L, End), (3L, "n", 70L, End)))
    // the merge law: incremental equals the one-shot rebuild over the
    // union of non-stale updates
    val oneShot = Scd.scd2(
      first.unionByName(second.where(!(col("k") === 2L && col("t") === 3L))),
      Seq("k"), Seq("state"), "t", End)
    assert(rowsOf(merged) == rowsOf(oneShot))
  }

  test("scd2Stream: per-batch merge snapshots; view ≡ one-shot; vacuum prunes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft-scd2")
    val dim = root.resolve("dim").toString
    val ckpt = root.resolve("ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.StreamIngest.scd2Stream(
      mem.toDF().toDF("k", "state", "t"),
      Seq("k"), Seq("state"), "t", dim, ckpt, End, daemon = true)
    try {
      mem.addData((1L, "a", 10L), (2L, "x", 5L))
      q.processAllAvailable()
      mem.addData((1L, "b", 30L), (3L, "n", 40L))
      q.processAllAvailable()
    } finally q.stop()
    val view = graft.streaming.StreamIngest.scd2View(spark, dim)
    val oneShot = Scd.scd2(
      upd((1L, "a", 10L), (2L, "x", 5L), (1L, "b", 30L), (3L, "n", 40L)),
      Seq("k"), Seq("state"), "t", End)
    assert(rowsOf(view) == rowsOf(oneShot))
    // both epochs exist until vacuum keeps only the newest
    assert(graft.streaming.StreamIngest.scd2Vacuum(spark, dim) == 1)
    assert(rowsOf(graft.streaming.StreamIngest.scd2View(spark, dim)) ==
      rowsOf(oneShot))
  }

  test("asOf: facts pick the version valid at t; boundary goes to the new version") {
    val hist = Scd.scd2(upd(
      (1L, "a", 10L), (1L, "b", 30L), (2L, "x", 5L)),
      Seq("k"), Seq("state"), "t", End)
    val facts = Seq((1L, 10L, "f1"), (1L, 29L, "f2"), (1L, 30L, "f3"),
      (2L, 100L, "f4"), (1L, 9L, "f5"), (3L, 50L, "f6"))
      .toDF("k", "t", "tag")
    val out = Scd.asOf(facts, hist, Seq("k"), "t",
      horizonMs = 1000L, bucketWidth = 16L)
      .select(col("tag"), col("state")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // f5 precedes all history and f6's key has none: both drop
    assert(out == Map("f1" -> "a", "f2" -> "a", "f3" -> "b", "f4" -> "x"))
  }

  test("property: merge(scd2(before cut), after) ≡ scd2(all) for any time cut") {
    // a time-cut partition never produces stale updates (every
    // second-half ts ≥ cut > every first-half valid_from), so the merge
    // law must hold EXACTLY for random streams and random cuts
    val rnd = new scala.util.Random(11)
    (1 to 8).foreach { _ =>
      val n = 20 + rnd.nextInt(40)
      val rows = (0 until n).map { i =>
        (1L + rnd.nextInt(4), rnd.nextInt(3).toString, rnd.nextInt(100).toLong)
      }
      val cut = 1L + rnd.nextInt(99)
      val df = upd(rows: _*)
      val merged = Scd.scd2Merge(
        Scd.scd2(df.where(col("t") < cut), Seq("k"), Seq("state"), "t", End),
        df.where(col("t") >= cut), Seq("k"), Seq("state"), "t", End)
      val oneShot = Scd.scd2(df, Seq("k"), Seq("state"), "t", End)
      assert(rowsOf(merged) == rowsOf(oneShot),
        s"law broke at cut=$cut over $rows")
    }
  }

  test("scd2 plan: change detection and interval windows share one key exchange") {
    val plan = Scd.scd2(upd((1L, "a", 10L)), Seq("k"), Seq("state"), "t", End)
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected a single key exchange, got $exchanges:\n$plan")
  }
}
