package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** robots.txt parse + gate semantics (the RFC 9309 prefix subset). */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val body =
    """# policy header comment
      |Disallow: /ignored-no-group
      |
      |User-agent: otherbot
      |User-agent: graftbot
      |Disallow: /en
      |Allow: /en/ok
      |Disallow:
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin

  private def gate(agent: String, paths: Seq[String]): Map[String, Boolean] = {
    val robots = Seq(("h1", body)).toDF("host", "body")
    val urls = paths.map(p => ("h1", p)).toDF("host", "path")
    Robots.allowed(urls, Robots.rules(robots, agent))
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
  }

  test("group runs, exact-agent selection, longest match, tie rules") {
    val g = gate("GraftBot", Seq("/en/zz", "/en/ok/page", "/fr/aa", "/", "/en"))
    // the exact-agent group applies; the * group's Disallow: / does NOT
    assert(g("/fr/aa") && g("/"))
    // Disallow /en is the longest match for /en/zz and /en itself
    assert(!g("/en/zz") && !g("/en"))
    // Allow /en/ok (len 6) beats Disallow /en (len 3)
    assert(g("/en/ok/page"))
    // the empty Disallow and the pre-group directive were ignored
    // (otherwise /fr/aa or / would flip)
  }

  test("agents without an exact group fall back to *") {
    val g = gate("strangerbot", Seq("/anything", "/"))
    assert(!g("/anything") && !g("/")) // * group: Disallow /
  }

  test("tie between Allow and Disallow of equal length: Allow wins") {
    val robots = Seq(("h2",
      "User-agent: *\nDisallow: /dir\nAllow: /dir\n")).toDF("host", "body")
    val urls = Seq(("h2", "/dir/x")).toDF("host", "path")
    val out = Robots.allowed(urls, Robots.rules(robots, "anybot")).head()
    assert(out.getBoolean(2))
  }

  test("hosts with no robots rules allow everything") {
    val robots = Seq(("h3", "User-agent: *\nDisallow: /x\n")).toDF("host", "body")
    val urls = Seq(("h3", "/x/1"), ("h4", "/x/1")).toDF("host", "path")
    val out = Robots.allowed(urls, Robots.rules(robots, "anybot"))
      .collect().map(r => (r.getString(0), r.getBoolean(2))).toMap
    assert(!out("h3") && out("h4"))
  }

  test("crawlSchedule: per-host FIFO spacing, declared vs default delay") {
    import org.apache.spark.sql.functions.col
    val frontier = Seq(("slow.com", "/a"), ("slow.com", "/b"), ("slow.com", "/c"),
      ("fast.com", "/a"), ("fast.com", "/b")).toDF("host", "path")
    val delays = Seq(("slow.com", 5000L)).toDF("host", "delay_ms")
    val out = Robots.crawlSchedule(frontier, delays, defaultDelayMs = 1000L,
        startMs = 100L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // declared delay paces slow.com at 5 s; fast.com falls back to 1 s
    assert(out(("slow.com", "/a")) == (0L, 100L))
    assert(out(("slow.com", "/b")) == (1L, 5100L))
    assert(out(("slow.com", "/c")) == (2L, 10100L))
    assert(out(("fast.com", "/b")) == (1L, 1100L))
    // two hosts' schedules are independent: same slot, different times
    assert(out(("fast.com", "/a"))._1 == out(("slow.com", "/a"))._1)
    // consecutive same-host fetches are never closer than the delay
    val byHost = out.toSeq.groupBy(_._1._1)
    byHost.foreach { case (h, rows) =>
      val times = rows.map(_._2._2).sorted
      val gap = if (h == "slow.com") 5000L else 1000L
      times.sliding(2).foreach {
        case Seq(a, b) => assert(b - a >= gap); case _ => () }
    }
  }
}
