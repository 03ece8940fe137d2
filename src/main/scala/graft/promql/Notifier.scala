package graft.promql

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.tsdb.TsQuerier

/** Alertmanager notification push — the rule manager's outbound half
  * (upstream sends firing alerts to every configured Alertmanager).
  * Formats [[Rules.ActiveAlert]]s as the Alertmanager v2 `POST
  * /api/v2/alerts` body and ships them; [[Loop]] is the daemon form
  * (evaluate the rule groups against the CURRENT store view each
  * interval, post what fires — the batch engine's rule-manager tick).
  *
  * Only FIRING instances are posted (upstream notifies on firing;
  * pending is internal state). `startsAt` carries the instance's
  * `activeAt`; `endsAt` is omitted — Alertmanager then applies its own
  * resolve timeout, the correct default for a sender that evaluates
  * state from storage rather than holding it in memory. */
object Notifier {

  private val http = HttpClient.newHttpClient()

  private def pairsJson(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) =>
      graft.remote.QueryApi.jsonStr(k) + ":" + graft.remote.QueryApi.jsonStr(v)
    }.mkString("{", ",", "}")

  /** Alertmanager v2 `POST /api/v2/alerts` body for the firing subset. */
  def body(alerts: Seq[Rules.ActiveAlert]): String =
    alerts.filter(_.state == "firing").map { a =>
      s"""{"labels":${pairsJson(a.labels)}""" +
        s""","annotations":${pairsJson(a.rule.annotations.sortBy(_._1))}""" +
        s""","startsAt":${graft.remote.QueryApi.jsonStr(
          java.time.Instant.ofEpochMilli(a.activeAt).toString)}""" +
        s""","generatorURL":""}"""
    }.mkString("[", ",", "]")

  /** One push. Returns the number of firing alerts sent (0 = no POST
    * at all — an empty body is not a notification). Non-2xx throws. */
  def push(url: String, alerts: Seq[Rules.ActiveAlert]): Int = {
    val firing = alerts.count(_.state == "firing")
    if (firing == 0) return 0
    val resp = http.send(
      HttpRequest.newBuilder(new URI(url))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body(alerts))).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"alertmanager $url: HTTP ${resp.statusCode()}")
    firing
  }

  /** Rule-manager tick loop: every `intervalMs`, evaluate `groups`
    * (re-resolved, so a live-reloaded rule file applies) against the
    * by-name querier's CURRENT view and push what fires. Failures
    * count and the loop keeps running (an unreachable Alertmanager
    * must not kill rule evaluation — upstream's stance). */
  final class Loop(querier: => TsQuerier, groups: () => Seq[RuleGroup],
                   url: String, intervalMs: Long,
                   now: () => Long = () => System.currentTimeMillis())
      extends AutoCloseable {
    require(intervalMs > 0, "intervalMs must be positive")
    @volatile private var running = true
    val ticks = new java.util.concurrent.atomic.AtomicLong(0)
    val sent = new java.util.concurrent.atomic.AtomicLong(0)
    val failures = new java.util.concurrent.atomic.AtomicLong(0)
    private val thread = new Thread(() => {
      while (running) {
        try {
          sent.addAndGet(push(url,
            Rules.activeAlerts(querier, groups(), now())))
          ticks.incrementAndGet()
        } catch {
          case _: InterruptedException => // closing
          case scala.util.control.NonFatal(_) => failures.incrementAndGet()
        }
        try { if (running) Thread.sleep(intervalMs) }
        catch { case _: InterruptedException => () }
      }
    }, s"graft-notifier-$url")
    thread.setDaemon(true)
    thread.start()

    override def close(): Unit = {
      running = false
      thread.interrupt()
      thread.join(30000)
    }
  }
}
