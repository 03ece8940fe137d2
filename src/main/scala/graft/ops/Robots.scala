package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt policy gate — the crawl-pipeline front door (RFC 9309 /
  * the Google REP subset a batch pipeline needs): parse per-host
  * robots.txt bodies into agent-scoped path rules, then gate a URL
  * table against them.
  *
  * Semantics implemented (and spec-pinned):
  *  - `#` comments and blank lines stripped; keys case-insensitive;
  *  - a GROUP is a run of consecutive `User-agent:` lines plus the
  *    directives that follow (RFC 9309 §2.1) — a directive before any
  *    group is ignored;
  *  - group selection: groups naming the agent EXACTLY (case-insensitive)
  *    if any exist, else the `*` groups (the crawler obeys the most
  *    specific match, never the union);
  *  - `Allow:` / `Disallow:` are PATH-PREFIX rules (the `*`/`$` wildcard
  *    extension is not implemented — documented subset); empty paths are
  *    ignored (an empty Disallow permits everything);
  *  - decision per URL path: the LONGEST matching rule wins; on a
  *    length tie Allow wins; no matching rule → allowed.
  *
  * Everything is exploded lines + window functions + one prefix join —
  * deliberately expressible in portable SQL, so the whole parse→gate
  * path carries an exact DuckDB oracle like the WebText ops.
  *
  * Scale shape: rules are tiny relative to URLs (one robots.txt per
  * host); the gate broadcasts them and the URL table never shuffles. */
object Robots {

  /** Parse (host, body) robots.txt rows into the rule table for
    * `agent`: (host, allow, path, plen). */
  def rules(robots: DataFrame, agent: String,
            hostCol: String = "host", bodyCol: String = "body"): DataFrame = {
    val byIdx = Window.partitionBy(col("host")).orderBy(col("idx"))
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("idx", "raw")))
      .select(col("host"), col("idx"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("line"))
      .select(col("host"), col("idx"),
        lower(trim(regexp_extract(col("line"), "^([A-Za-z-]+)\\s*:", 1))).as("k"),
        trim(regexp_extract(col("line"), "^[A-Za-z-]+\\s*:(.*)$", 1)).as("v"))
    val grouped = lines
      .where(col("k").isin("user-agent", "allow", "disallow"))
      .withColumn("is_ua", (col("k") === "user-agent").cast("int"))
      .withColumn("starts", (col("is_ua") === 1 &&
        coalesce(lag(col("is_ua"), 1).over(byIdx), lit(0)) === 0).cast("int"))
      .withColumn("gid", sum(col("starts")).over(byIdx))
      .where(col("gid") >= 1) // directives before any group are ignored
    // which groups apply: exact-agent groups if the host has any, else *
    val agents = grouped.where(col("is_ua") === 1)
      .select(col("host"), col("gid"), lower(col("v")).as("ua"))
    val exactHosts = agents.where(col("ua") === agent.toLowerCase)
      .select(col("host")).distinct().withColumn("has_exact", lit(true))
    val target = agents.join(exactHosts, Seq("host"), "left")
      .where(when(coalesce(col("has_exact"), lit(false)),
        col("ua") === agent.toLowerCase).otherwise(col("ua") === "*"))
      .select(col("host"), col("gid")).distinct()
    grouped.where(col("is_ua") === 0 && col("v") =!= "")
      .join(target, Seq("host", "gid"))
      .select(col("host"), (col("k") === "allow").as("allow"),
        col("v").as("path"), length(col("v")).as("plen"))
      .distinct()
  }

  /** Gate URL paths against a [[rules]] table: one verdict row per
    * DISTINCT (host, path) — (host, path, allowed). Callers carrying
    * more columns join the verdict back on the pair. The rule table is
    * broadcast (one robots.txt per host — always small), so the only
    * exchange is the per-pair verdict aggregate, map-side combined;
    * decision = the longest matching prefix rule, Allow winning length
    * ties (struct max: (plen, allow)), no match → allowed. */
  def allowed(urls: DataFrame, ruleTable: DataFrame,
              hostCol: String = "host", pathCol: String = "path"): DataFrame = {
    val r = broadcast(ruleTable
      .withColumnRenamed("path", "rule_path")
      .withColumnRenamed("host", "__rh"))
    urls.select(col(hostCol).as("host"), col(pathCol).as("path"))
      .join(r, col("host") === col("__rh") &&
        col("path").startsWith(col("rule_path")), "left")
      .groupBy(col("host"), col("path"))
      .agg(max(when(col("rule_path").isNotNull,
        struct(col("plen"), col("allow")))).as("best"))
      .select(col("host"), col("path"),
        coalesce(col("best.allow"), lit(true)).as("allowed"))
  }

  /** Politeness schedule over a fetch frontier — the planning step
    * between the [[allowed]] gate and the fetcher: within each host,
    * FIFO slots in deterministic path order, spaced by the host's
    * crawl delay (the de-facto `Crawl-delay` extension — absent hosts
    * get `defaultDelayMs`). Output: (host, path, slot, fetch_at_ms)
    * with `fetch_at_ms = startMs + slot · delay`, so a fetcher fleet
    * that honors the timestamps never exceeds one request per delay
    * per host, regardless of how many workers it spreads across.
    *
    * Scale shape: the delay table is per-host (dim-sized, broadcast);
    * the slot assignment is a per-host window — politeness is
    * INHERENTLY per-host sequential, so a mega-host's long tail is a
    * property of the plan, not the planner (its schedule stretches in
    * TIME, not in any executor's memory: the window sorts one host's
    * frontier partition, nothing global). */
  def crawlSchedule(frontier: DataFrame, delays: DataFrame,
                    defaultDelayMs: Long = 1000L,
                    startMs: Long = 0L,
                    hostCol: String = "host",
                    pathCol: String = "path"): DataFrame = {
    val d = broadcast(delays.select(col("host").as("__dh"),
      col("delay_ms").cast("long").as("__delay")))
    frontier.select(col(hostCol).as("host"), col(pathCol).as("path"))
      .join(d, col("host") === col("__dh"), "left")
      .withColumn("slot", row_number().over(
        Window.partitionBy(col("host")).orderBy(col("path")))
        .cast("long") - 1L)
      .select(col("host"), col("path"), col("slot"),
        (lit(startMs) + col("slot") *
          coalesce(col("__delay"), lit(defaultDelayMs))).as("fetch_at_ms"))
  }
}
