package graft.remote

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.tsdb.{Exposition, TsSchema}

/** Exposition-format scrape client — the pull half of the federation
  * loop ([[RemoteReadServer]]'s `/federate` and `/metrics` are the
  * push half): GET an exposition endpoint, parse the lines with the
  * engine's own codegen'd parser, stamp timestamp-less samples with
  * scrape time (upstream Prometheus's convention), canonicalize,
  * append to a store.
  *
  * Shape: the HTTP fetch and line split are driver-side (one scrape
  * body is endpoint-sized, never corpus-sized); parse + canonicalize
  * + partitioned append are ordinary distributed jobs, so a large
  * federation pull still lands in parallel. [[Loop]] is the
  * ShipperDaemon-style driver singleton: ticker thread, failure
  * counters, close() drains the in-flight scrape. */
object Scraper {

  private val http = HttpClient.newHttpClient()

  /** Content negotiation, upstream Prometheus's convention: offer
    * OpenMetrics 1.0 and classic text, let the target's Content-Type
    * pick the parse dialect (exposition_format.md — the scraper must
    * not assume; a target may only speak one). */
  private val AcceptHeader =
    "application/openmetrics-text;version=1.0.0;q=0.8,text/plain;version=0.0.4;q=0.5"

  /** One scrape: returns the number of samples ingested. Non-200
    * responses throw (the loop counts them; a one-shot caller sees the
    * error). The parse dialect follows the response Content-Type:
    * `application/openmetrics-text` → OpenMetrics (seconds timestamps,
    * exemplar tails), anything else → classic text exposition.
    * With `metadataPath` set, `# HELP`/`# TYPE`/`# UNIT` lines are
    * ALSO harvested ([[graft.tsdb.Exposition.parseMetadata]]) and
    * appended there, stamped with scrape time — the feed behind
    * `/api/v1/metadata` ([[metadataView]] reads it back latest-wins).
    * With `exemplarPath` set and an OpenMetrics target, exemplar tails
    * are harvested too ([[graft.tsdb.Exposition.parseExemplars]]) —
    * the feed behind `/api/v1/query_exemplars`; classic targets carry
    * none, so nothing is written there. */
  def scrapeOnce(spark: SparkSession, url: String, storePath: String,
                 scrapeTsMs: Long, metadataPath: Option[String] = None,
                 exemplarPath: Option[String] = None): Long = {
    val resp = http.send(
      HttpRequest.newBuilder(new URI(url)).GET()
        .header("Accept", AcceptHeader).build(),
      HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200,
      s"scrape $url: HTTP ${resp.statusCode()}")
    val openMetrics = resp.headers().firstValue("Content-Type")
      .map[Boolean](_.toLowerCase.contains("application/openmetrics-text"))
      .orElse(false)
    import spark.implicits._
    val lines = resp.body().split("\n").toSeq.toDF("line")
    val parsed =
      if (openMetrics) Exposition.parseOpenMetrics(lines, col("line"), lit(scrapeTsMs))
      else Exposition.parse(lines, col("line"), lit(scrapeTsMs))
    val canonical = TsSchema.canonicalize(parsed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = canonical.count()
      if (n > 0)
        canonical.write.partitionBy("block_start")
          .mode(SaveMode.Append).parquet(storePath)
      metadataPath.foreach { mp =>
        Exposition.parseMetadata(lines, col("line"))
          .withColumn("scraped_at", lit(scrapeTsMs))
          .write.mode(SaveMode.Append).parquet(mp)
      }
      if (openMetrics) exemplarPath.foreach { ep =>
        val ex = Exposition.parseExemplars(lines, col("line"), lit(scrapeTsMs))
        if (!ex.isEmpty)
          ex.write.mode(SaveMode.Append).parquet(ep)
      }
      n
    } finally { canonical.unpersist(false); () }
  }

  /** Latest-wins metadata view over a [[scrapeOnce]] metadata dir: one
    * row per metric, the most recent scrape's (mtype, help, unit) —
    * max-struct per metric, map-side-combined (re-scrapes append; this
    * collapses them at read, the same keep-latest shape as replica
    * dedup). */
  def metadataView(spark: SparkSession, metadataPath: String) = {
    import org.apache.spark.sql.functions.{max, struct}
    spark.read.parquet(metadataPath)
      .groupBy(col("metric"))
      .agg(max(struct(col("scraped_at"), col("mtype"), col("help"), col("unit"))).as("m"))
      .select(col("metric"), col("m.mtype").as("mtype"),
        col("m.help").as("help"), col("m.unit").as("unit"))
  }

  /** Per-target scrape state as `/api/v1/targets` reports it
    * (upstream's activeTargets entry): health is "up" after a
    * successful last scrape, "down" after a failed one, "unknown"
    * before the first attempt. */
  final case class TargetStatus(url: String, health: String,
                                lastScrapeMs: Long, lastDurationSec: Double,
                                lastError: String, scrapes: Long,
                                failures: Long, samples: Long)

  /** Interval scrape loop. `close()` stops the ticker and waits for an
    * in-flight scrape to finish; failures increment a counter and the
    * loop keeps running (a scrape target being down must not kill the
    * collector). */
  final class Loop(spark: SparkSession, url: String, storePath: String,
                   intervalMs: Long) extends AutoCloseable {
    require(intervalMs > 0, "intervalMs must be positive")
    @volatile private var running = true
    val scrapes = new java.util.concurrent.atomic.AtomicLong(0)
    val failures = new java.util.concurrent.atomic.AtomicLong(0)
    val samples = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile private var lastScrapeMs = 0L
    @volatile private var lastDurationSec = 0.0
    @volatile private var lastError = ""

    /** Snapshot for `/api/v1/targets`. */
    def status: TargetStatus = TargetStatus(url,
      health = if (lastScrapeMs == 0) "unknown"
               else if (lastError.isEmpty) "up" else "down",
      lastScrapeMs, lastDurationSec, lastError,
      scrapes.get, failures.get, samples.get)

    private val thread = new Thread(() => {
      while (running) {
        val t0 = System.nanoTime()
        try {
          val now = System.currentTimeMillis()
          samples.addAndGet(scrapeOnce(spark, url, storePath, now))
          scrapes.incrementAndGet()
          lastScrapeMs = now
          lastDurationSec = (System.nanoTime() - t0) / 1e9
          lastError = ""
        } catch {
          case _: InterruptedException => // closing
          case scala.util.control.NonFatal(e) =>
            failures.incrementAndGet()
            lastScrapeMs = System.currentTimeMillis()
            lastDurationSec = (System.nanoTime() - t0) / 1e9
            lastError = String.valueOf(e.getMessage)
        }
        try { if (running) Thread.sleep(intervalMs) }
        catch { case _: InterruptedException => () }
      }
    }, s"graft-scraper-$url")
    thread.setDaemon(true)
    thread.start()

    override def close(): Unit = {
      running = false
      thread.interrupt()
      thread.join(30000)
    }
  }
}
