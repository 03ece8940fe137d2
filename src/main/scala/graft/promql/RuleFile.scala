package graft.promql

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tsdb.{Labels, TsQuerier}

/** One rule from a Prometheus rule file: either `record:` (materialize
  * the expression as a new metric) or `alert:` (fire once the
  * condition has held for `for:`). Exactly one of [[record]]/[[alert]]
  * is set. */
final case class Rule(record: Option[String], alert: Option[String],
                      expr: String, forMs: Long,
                      labels: Seq[(String, String)],
                      annotations: Seq[(String, String)]) {
  def name: String = record.orElse(alert).get
  def isAlert: Boolean = alert.isDefined
}

/** A named group of rules sharing an evaluation interval. */
final case class RuleGroup(name: String, intervalMs: Long, rules: Seq[Rule])

/** Prometheus rule-file parsing and serving-time evaluation — the
  * config half of [[RecordingRules]]/[[AlertRules]] plus the state the
  * `/api/v1/rules` and `/api/v1/alerts` endpoints report.
  *
  * The parser covers the rule-file YAML subset the upstream docs
  * show (`groups:` → `- name/interval/rules` → `- record|alert /
  * expr / for / labels / annotations`), indentation-scoped so label
  * names are free to collide with structural keys. Not a general YAML
  * parser — same stance as [[graft.tsdb.GraftConfig]].
  *
  * Serving-time state is computed per request against the querier's
  * CURRENT store view (the server's by-name querier), so alerts
  * reflect data appended since startup — the batch engine's analog of
  * the upstream rule manager's in-memory state. All three states are
  * derived from [[AlertRules.firing]]'s grid semantics:
  * firing = condition held continuously for `for` ending at `ts`;
  * pending = condition holds at `ts` but not yet for `for`;
  * inactive = no sample at `ts`.
  */
object Rules {

  private val structural = Set("groups", "name", "interval", "rules",
    "record", "alert", "expr", "for", "labels", "annotations")

  /** Parse rule-file text. Unknown top-level rule keys are errors (a
    * typo like `fro:` silently changing semantics is worse than a
    * strict parse); unknown keys INSIDE labels:/annotations: are the
    * point of those maps and always accepted. */
  def parse(text: String, where: String = "<inline>"): Seq[RuleGroup] = {
    final case class Line(n: Int, indent: Int, dash: Boolean, key: String, value: String)
    val lines = text.split("\n").zipWithIndex.flatMap { case (raw0, i) =>
      // strip comments outside quotes (PromQL exprs may contain '#'
      // inside quoted label values; rule files rarely do, keep simple:
      // only treat ' #' as a comment start when not inside quotes)
      val raw = stripComment(raw0)
      if (raw.trim.isEmpty) None
      else {
        val indentRaw = raw.takeWhile(_ == ' ').length
        var rest = raw.trim
        val dash = rest.startsWith("- ") || rest == "-"
        if (dash) rest = rest.drop(1).trim
        // the dash consumes two columns of indent; keys on later lines
        // of the same list item align AFTER the dash
        val indent = if (dash) indentRaw + 2 else indentRaw
        val sep = rest.indexOf(':')
        // colon-less lines are legal only as block-scalar continuations
        // (consumed by indent under `expr: |` before key dispatch); keep
        // the whole text as `key` so reconstruction is lossless
        if (sep > 0)
          Some(Line(i + 1, indent, dash,
            rest.substring(0, sep).trim, rest.substring(sep + 1).trim))
        else Some(Line(i + 1, indent, dash, rest, ""))
      }
    }

    val groups = scala.collection.mutable.ArrayBuffer[RuleGroup]()
    var gi = 0
    require(lines.nonEmpty && lines(0).key == "groups",
      s"$where: rule file must start with `groups:`")
    var i = 1
    var groupName = ""; var interval = 60000L
    var rules = scala.collection.mutable.ArrayBuffer[Rule]()
    var inGroup = false

    // current rule under construction
    var rRecord: Option[String] = None; var rAlert: Option[String] = None
    var rExpr = ""; var rFor = 0L
    var rLabels = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var rAnns = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var inRule = false

    def finishRule(n: Int): Unit = if (inRule) {
      require(rRecord.isDefined != rAlert.isDefined,
        s"$where:$n: a rule needs exactly one of `record:`/`alert:`")
      require(rExpr.nonEmpty, s"$where:$n: rule `${rRecord.orElse(rAlert).get}` has no expr")
      require(rAlert.isDefined || rFor == 0L,
        s"$where:$n: `for:` is only valid on alerting rules")
      rules += Rule(rRecord, rAlert, rExpr, rFor, rLabels.toSeq, rAnns.toSeq)
      rRecord = None; rAlert = None; rExpr = ""; rFor = 0L
      rLabels = scala.collection.mutable.ArrayBuffer()
      rAnns = scala.collection.mutable.ArrayBuffer()
      inRule = false
    }
    def finishGroup(n: Int): Unit = if (inGroup) {
      finishRule(n)
      require(groupName.nonEmpty, s"$where:$n: group missing `name:`")
      groups += RuleGroup(groupName, interval, rules.toSeq)
      groupName = ""; interval = 60000L
      rules = scala.collection.mutable.ArrayBuffer()
      inGroup = false
    }

    while (i < lines.length) {
      val l = lines(i)
      l.key match {
        case "name" if l.dash =>                    // new group
          finishGroup(l.n)
          inGroup = true; groupName = unquote(l.value)
          i += 1
        case "interval" =>
          interval = duration(l.value, where, l.n); i += 1
        case "rules" => i += 1
        case "record" | "alert" =>
          if (l.dash) finishRule(l.n)
          require(inGroup, s"$where:${l.n}: rule outside a group")
          inRule = true
          if (l.key == "record") rRecord = Some(unquote(l.value))
          else rAlert = Some(unquote(l.value))
          i += 1
        case "expr" =>
          require(inRule, s"$where:${l.n}: `expr:` outside a rule")
          if (l.value == "|" || l.value == ">" || l.value == "|-" || l.value == ">-") {
            // block scalar: consume deeper-indented raw lines
            val sb = new StringBuilder
            var j = i + 1
            while (j < lines.length && lines(j).indent > l.indent) {
              if (sb.nonEmpty) sb.append(' ')
              sb.append(lines(j).key)
              if (lines(j).value.nonEmpty) sb.append(':').append(lines(j).value)
              j += 1
            }
            rExpr = sb.toString; i = j
          } else { rExpr = unquote(l.value); i += 1 }
        case "for" =>
          require(inRule, s"$where:${l.n}: `for:` outside a rule")
          rFor = duration(l.value, where, l.n); i += 1
        case "labels" | "annotations" =>
          require(inRule, s"$where:${l.n}: `${l.key}:` outside a rule")
          val into = if (l.key == "labels") rLabels else rAnns
          var j = i + 1
          while (j < lines.length && lines(j).indent > l.indent && !lines(j).dash) {
            into += (lines(j).key -> unquote(lines(j).value)); j += 1
          }
          i = j
        case other =>
          throw new IllegalArgumentException(
            s"$where:${l.n}: unknown key `$other` (expected one of ${structural.toSeq.sorted.mkString(", ")})")
      }
    }
    finishGroup(lines.last.n)
    groups.toSeq
  }

  private def stripComment(s: String): String = {
    var inS = false; var inD = false; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '#' if !inS && !inD => return s.substring(0, i)
        case _ =>
      }
      i += 1
    }
    s
  }

  private def unquote(v: String): String =
    if (v.length >= 2 &&
        ((v.head == '"' && v.last == '"') || (v.head == '\'' && v.last == '\'')))
      v.substring(1, v.length - 1)
    else v

  /** `5m`-style duration (PromQL grammar) or bare integer seconds. */
  private[promql] def duration(s: String, where: String, n: Int): Long = {
    val v = unquote(s)
    if (v.nonEmpty && v.forall(_.isDigit)) v.toLong * 1000L
    else PromQL.parse(s"x[$v]") match {
      case PromExpr.Selector(_, Some(ms), _, _) => ms
      case _ => throw new IllegalArgumentException(s"$where:$n: bad duration `$s`")
    }
  }

  // ---- serving-time evaluation --------------------------------------

  /** One active (pending or firing) alert instance. `labels` is the
    * upstream alert label set: expression-result labels minus
    * `__name__`, overridden by rule labels, plus `alertname`.
    * `activeAt` is the earliest instant the condition is PROVEN to
    * have held from (firing: ts - for; pending: ts) — the batch grid
    * carries no memory of the first pending evaluation, so this is a
    * lower bound on upstream's activeAt. */
  final case class ActiveAlert(rule: Rule, group: String,
                               labels: Seq[(String, String)], v: Double,
                               state: String, activeAt: Long)

  /** Active alerts across all groups at `atMs`, computed against the
    * store's current view. Two bounded evaluations per alerting rule
    * (`for`-window firing + instant condition); result sizes are
    * alert-instance-bounded, never raw samples — safe to collect. */
  def activeAlerts(querier: => TsQuerier, groups: Seq[RuleGroup],
                   atMs: Long, lookbackMs: Long = 5 * 60 * 1000L): Seq[ActiveAlert] = {
    groups.flatMap { g =>
      g.rules.filter(_.isAlert).flatMap { r =>
        // step must divide `for` for the grid to align; gcd with the
        // group interval keeps the grid as coarse as the rule allows
        val step = if (r.forMs == 0L) g.intervalMs
                   else gcd(r.forMs, g.intervalMs)
        val firing = collectState(
          AlertRules.firing(querier, r.expr, atMs, atMs, step, r.forMs,
            lookbackMs), r, g.name, "firing", atMs - r.forMs)
        val pendingOrFiring =
          if (r.forMs == 0L) Seq.empty // firing already covers for=0
          else collectState(
            AlertRules.firing(querier, r.expr, atMs, atMs, step, 0L,
              lookbackMs), r, g.name, "pending", atMs)
        val firingKeys = firing.map(_.labels).toSet
        firing ++ pendingOrFiring.filterNot(a => firingKeys(a.labels))
      }
    }
  }

  private def collectState(df: DataFrame, r: Rule, group: String,
                           state: String, activeAt: Long): Seq[ActiveAlert] = {
    df.select(col("labels"), col("v")).collect().toSeq.map { row =>
      val exprLabels = row.getSeq[org.apache.spark.sql.Row](0)
        .map(l => l.getString(0) -> l.getString(1))
        .filterNot(_._1 == Labels.MetricName)
      val overridden = r.labels.map(_._1).toSet + "alertname"
      val merged = (exprLabels.filterNot(kv => overridden(kv._1)) ++
        r.labels :+ ("alertname" -> r.name.toString)).sortBy(_._1)
      ActiveAlert(r, group, merged, row.getDouble(1), state, activeAt)
    }
  }

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)

  /** Run every RECORDING rule in `groups` against `querier` over
    * `[mint, maxt]`, appending outputs to `destPath` (rule labels
    * attached, step = the group interval). Returns (rule, rows). */
  def recordAll(querier: => TsQuerier, destPath: String,
                groups: Seq[RuleGroup], mint: Long, maxt: Long): Seq[(String, Long)] =
    for (g <- groups; r <- g.rules if !r.isAlert) yield
      r.name -> RecordingRules.record(querier, destPath, r.name, r.expr,
        mint, maxt, g.intervalMs, extraLabels = r.labels)

  /** CONTINUOUS evaluation of a rule file over a streaming store: one
    * [[graft.streaming.StreamIngest.rulesStream]] per group — each
    * group evaluates at its own `interval`, recording rules
    * materialize as new metrics, alerting rules as alert-name series,
    * rule labels attached, incremental markers keep replays
    * exactly-once. Returns `(group, query)`; await each to drain (or
    * pass `daemon = true` for a 5 s ticker). */
  def streamAll(spark: org.apache.spark.sql.SparkSession, inputDir: String,
                storePath: String, checkpointRoot: String, startMs: Long,
                groups: Seq[RuleGroup], lagMs: Long = 10 * 60 * 1000L,
                daemon: Boolean = false)
      : Seq[(String, org.apache.spark.sql.streaming.StreamingQuery)] = {
    // marker files (and output series) are keyed by RULE name: a name
    // reused across groups would share markers and interleave outputs
    val names = groups.flatMap(_.rules.map(_.name))
    require(names.distinct.size == names.size,
      s"rule names must be unique across groups for streaming evaluation: " +
        names.diff(names.distinct).distinct.mkString(", "))
    groups.map { g =>
      g.name -> graft.streaming.StreamIngest.rulesStream(
        spark, inputDir, storePath,
        checkpointRoot + "/" + g.name, startMs, g.intervalMs,
        rules = g.rules.filterNot(_.isAlert).map(r => r.name -> r.expr),
        alerts = g.rules.filter(_.isAlert).map(r => (r.name, r.expr, r.forMs)),
        lagMs = lagMs, daemon = daemon,
        ruleLabels = g.rules.map(r => r.name -> r.labels).toMap)
    }
  }
}
