package graft.promql

import org.apache.spark.sql.{Row, SparkSession}

import graft.tsdb.{Labels, TsQuerier, TsSchema}

/** Rule UNIT tests — the `promtool test rules` semantic: a YAML test
  * file declares synthetic input series (upstream's expanding series
  * notation), then asserts PromQL expression results and alert states
  * at given eval times, evaluated by THIS engine's evaluator against
  * rule files parsed by [[Rules]].
  *
  * Supported file subset (upstream rule-test schema):
  * {{{
  * rule_files: [f.yml]          # optional; needed by alert_rule_test
  * evaluation_interval: 1m
  * tests:
  *   - interval: 1m             # input sample spacing (default above)
  *     input_series:
  *       - series: 'up{job="a"}'
  *         values: '0 1+1x5 _ 10x2'
  *     promql_expr_test:        # upstream: promql_expr_test
  *       - expr: sum(up)
  *         eval_time: 5m
  *         exp_samples:
  *           - labels: '{}'
  *             value: 15
  *     alert_rule_test:
  *       - eval_time: 10m
  *         alertname: High
  *         exp_alerts:
  *           - exp_labels: { severity: page, job: a }
  * }}}
  *
  * Values notation (public promtool syntax): `n` literal, `_` gap,
  * `a+bxc` / `a-bxc` = start `a` then `c` MORE samples stepping `±b`,
  * `axc` = `a+0xc`. Times are offsets from t=0 on the test interval.
  */
object RuleTests {

  final case class ExpSample(labels: Seq[(String, String)], value: Double)
  final case class ExprTest(expr: String, evalTimeMs: Long,
                            expSamples: Seq[ExpSample])
  final case class AlertTest(evalTimeMs: Long, alertname: String,
                             expAlerts: Seq[Seq[(String, String)]])
  final case class TestCase(intervalMs: Long,
                            inputSeries: Seq[(String, String)],
                            exprTests: Seq[ExprTest],
                            alertTests: Seq[AlertTest])
  final case class TestFile(ruleFiles: Seq[String], intervalMs: Long,
                            cases: Seq[TestCase])

  /** Expand one `values:` string on the interval grid. Returns
    * (tOffsetMs, v) pairs; gaps (`_`) emit nothing at that slot. */
  private[promql] def expandValues(spec: String, intervalMs: Long): Seq[(Long, Double)] = {
    val out = Seq.newBuilder[(Long, Double)]
    var slot = 0L
    def emit(v: Double): Unit = { out += ((slot * intervalMs, v)); slot += 1 }
    spec.trim.split("\\s+").filter(_.nonEmpty).foreach { tok =>
      if (tok == "_") slot += 1
      else if (tok == "stale") slot += 1 // stale marker: no sample in the store model
      else {
        // a+bxc / a-bxc / axc — the x splits expansion from the base
        val xi = tok.lastIndexOf('x')
        if (xi > 0 && tok.substring(xi + 1).forall(_.isDigit) &&
            tok.substring(xi + 1).nonEmpty) {
          val reps = tok.substring(xi + 1).toInt
          val base = tok.substring(0, xi)
          // step sign is the LAST +/- not at position 0 (a leading sign
          // belongs to the start value)
          val si = math.max(base.lastIndexOf('+'), base.lastIndexOf('-'))
          val (start, step) =
            if (si > 0) (base.substring(0, si).toDouble,
              (if (base.charAt(si) == '-') -1 else 1) * base.substring(si + 1).toDouble)
            else (base.toDouble, 0.0)
          emit(start)
          var v = start
          (0 until reps).foreach { _ => v += step; emit(v) }
        } else emit(tok.toDouble)
      }
    }
    out.result()
  }

  /** Parse a series selector literal (`m{a="b"}` / `{a="b"}` / `{}`)
    * into its label set. Only equality matchers are legal here. */
  private[promql] def labelsOf(sel: String): Seq[(String, String)] = {
    val t = sel.trim
    if (t == "{}" || t.isEmpty) return Seq.empty
    PromQL.parse(t) match {
      case PromExpr.Selector(ms, None, 0L, None) =>
        ms.map { m =>
          require(m.tpe == graft.tsdb.MatchType.Eq,
            s"series literal needs equality matchers only: $sel")
          m.name -> m.value
        }
      case _ => throw new IllegalArgumentException(
        s"not a plain series literal: $sel")
    }
  }

  // ---- YAML subset parse (indentation-scoped, same stance as RuleFile) --

  private final case class Line(n: Int, indent: Int, dash: Boolean,
                                key: String, value: String)

  private def lex(text: String, where: String): Seq[Line] =
    text.split("\n").zipWithIndex.flatMap { case (raw, i) =>
      val noComment = stripComment(raw)
      if (noComment.trim.isEmpty) None
      else {
        val indentRaw = noComment.takeWhile(_ == ' ').length
        var rest = noComment.trim
        val dash = rest.startsWith("- ") || rest == "-"
        if (dash) rest = rest.drop(1).trim
        val indent = if (dash) indentRaw + 2 else indentRaw
        val sep = rest.indexOf(':')
        if (sep > 0 && !(rest.take(sep).contains('{')))
          Some(Line(i + 1, indent, dash, rest.substring(0, sep).trim,
            rest.substring(sep + 1).trim))
        else Some(Line(i + 1, indent, dash, rest, ""))
      }
    }.toSeq

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

  private def flowMap(v: String): Seq[(String, String)] = {
    // { k: v, k2: "v2" } inline map
    val t = v.trim
    require(t.startsWith("{") && t.endsWith("}"), s"expected { ... } map: $v")
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty) Seq.empty
    else body.split(",").toSeq.map { kv =>
      val i = kv.indexOf(':')
      require(i > 0, s"bad map entry: $kv")
      kv.substring(0, i).trim -> unquote(kv.substring(i + 1).trim)
    }
  }

  def parse(text: String, where: String = "<inline>"): TestFile = {
    val lines = lex(text, where)
    var ruleFiles = Seq.empty[String]
    var fileInterval = 60000L
    val cases = scala.collection.mutable.ArrayBuffer[TestCase]()

    def dur(s: String, n: Int): Long = Rules.duration(s, where, n)

    var i = 0
    def parseBlockMapList(baseIndent: Int): Seq[Seq[(String, String)]] = {
      // list of maps in block form under exp_alerts:
      //   - exp_labels: { ... }   OR   - exp_labels:\n      k: v
      val out = Seq.newBuilder[Seq[(String, String)]]
      while (i < lines.length && lines(i).indent > baseIndent) {
        val l = lines(i)
        require(l.key == "exp_labels", s"$where:${l.n}: expected exp_labels")
        if (l.value.nonEmpty) { out += flowMap(l.value); i += 1 }
        else {
          i += 1
          val kv = Seq.newBuilder[(String, String)]
          while (i < lines.length && lines(i).indent > l.indent && !lines(i).dash) {
            kv += (lines(i).key -> unquote(lines(i).value)); i += 1
          }
          out += kv.result()
        }
      }
      out.result()
    }

    def parseExpSamples(baseIndent: Int): Seq[ExpSample] = {
      val out = Seq.newBuilder[ExpSample]
      var labels: Option[Seq[(String, String)]] = None; var value = 0.0
      var has = false
      def finish(): Unit = if (has) {
        out += ExpSample(labels.getOrElse(Seq.empty).sortBy(_._1), value)
        labels = None; value = 0.0; has = false
      }
      while (i < lines.length && lines(i).indent > baseIndent) {
        val l = lines(i)
        if (l.dash) finish()
        l.key match {
          case "labels" => labels = Some(labelsOf(unquote(l.value))); has = true
          case "value" => value = unquote(l.value).toDouble; has = true
          case other => throw new IllegalArgumentException(
            s"$where:${l.n}: unknown exp_samples key `$other`")
        }
        i += 1
      }
      finish()
      out.result()
    }

    while (i < lines.length) {
      val l = lines(i)
      l.key match {
        case "rule_files" =>
          i += 1
          if (l.value.startsWith("[")) {
            ruleFiles = l.value.stripPrefix("[").stripSuffix("]")
              .split(",").map(s => unquote(s.trim)).filter(_.nonEmpty).toSeq
          } else {
            while (i < lines.length && lines(i).dash && lines(i).value.isEmpty &&
                   lines(i).indent > l.indent) {
              ruleFiles :+= unquote(lines(i).key); i += 1
            }
          }
        case "evaluation_interval" =>
          fileInterval = dur(l.value, l.n); i += 1
        case "tests" => i += 1
        case "interval" if l.dash => // new test case
          val caseIndent = l.indent
          var interval = fileInterval
          val input = scala.collection.mutable.ArrayBuffer[(String, String)]()
          val exprs = scala.collection.mutable.ArrayBuffer[ExprTest]()
          val alerts = scala.collection.mutable.ArrayBuffer[AlertTest]()
          interval = dur(l.value, l.n); i += 1
          while (i < lines.length && lines(i).indent >= caseIndent &&
                 !(lines(i).dash && lines(i).indent == caseIndent)) {
            val k = lines(i)
            k.key match {
              case "input_series" =>
                i += 1
                var series = ""; var values = ""
                def flush(n: Int): Unit = if (series.nonEmpty) {
                  require(values.nonEmpty, s"$where:$n: series without values")
                  input += (series -> values); series = ""; values = ""
                }
                while (i < lines.length && lines(i).indent > k.indent) {
                  val e = lines(i)
                  if (e.dash) flush(e.n)
                  e.key match {
                    case "series" => series = unquote(e.value)
                    case "values" => values = unquote(e.value)
                    case other => throw new IllegalArgumentException(
                      s"$where:${e.n}: unknown input_series key `$other`")
                  }
                  i += 1
                }
                flush(k.n)
              case "promql_expr_test" =>
                i += 1
                var expr = ""; var at = 0L
                var samples = Seq.empty[ExpSample]
                def flush(): Unit = if (expr.nonEmpty) {
                  exprs += ExprTest(expr, at, samples)
                  expr = ""; at = 0L; samples = Seq.empty
                }
                while (i < lines.length && lines(i).indent > k.indent) {
                  val e = lines(i)
                  if (e.dash) flush()
                  e.key match {
                    case "expr" => expr = unquote(e.value); i += 1
                    case "eval_time" => at = dur(e.value, e.n); i += 1
                    case "exp_samples" => i += 1; samples = parseExpSamples(e.indent)
                    case other => throw new IllegalArgumentException(
                      s"$where:${e.n}: unknown promql_expr_test key `$other`")
                  }
                }
                flush()
              case "alert_rule_test" =>
                i += 1
                var at = 0L; var name = ""
                var exp = Seq.empty[Seq[(String, String)]]
                def flush(): Unit = if (name.nonEmpty) {
                  alerts += AlertTest(at, name, exp)
                  at = 0L; name = ""; exp = Seq.empty
                }
                while (i < lines.length && lines(i).indent > k.indent) {
                  val e = lines(i)
                  if (e.dash && e.key == "eval_time") flush()
                  e.key match {
                    case "eval_time" => at = dur(e.value, e.n); i += 1
                    case "alertname" => name = unquote(e.value); i += 1
                    case "exp_alerts" => i += 1; exp = parseBlockMapList(e.indent)
                    case other => throw new IllegalArgumentException(
                      s"$where:${e.n}: unknown alert_rule_test key `$other`")
                  }
                }
                flush()
              case other => throw new IllegalArgumentException(
                s"$where:${k.n}: unknown test key `$other`")
            }
          }
          cases += TestCase(interval, input.toSeq, exprs.toSeq, alerts.toSeq)
        case other => throw new IllegalArgumentException(
          s"$where:${l.n}: unknown key `$other`")
      }
    }
    TestFile(ruleFiles, fileInterval, cases.toSeq)
  }

  // ---- execution ----------------------------------------------------

  /** Base epoch for t=0 in test files. Upstream uses the zero time;
    * the engine's block layout wants positive epochs — any fixed base
    * works because every time in a test file is an offset. */
  val BaseMs = 1700000000000L

  private def inputFrame(spark: SparkSession, tc: TestCase)
      : org.apache.spark.sql.DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = tc.inputSeries.flatMap { case (sel, values) =>
      val labels = labelsOf(sel).toMap
      require(labels.nonEmpty, s"input series needs at least one label: $sel")
      expandValues(values, tc.intervalMs).map { case (off, v) =>
        Row(labels, BaseMs + off, v)
      }
    }.asJava
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")
    spark.createDataFrame(rows, schema)
  }

  final case class Failure(what: String)

  /** Run every case; returns failures (empty = success). `loadRules`
    * resolves a rule-file name to parsed groups (injected so the
    * caller owns file IO). Expression results compare on (labels,
    * value) rounded to 1e-6 — the promtool tolerance stance. */
  def run(spark: SparkSession, tf: TestFile,
          loadRules: String => Seq[RuleGroup]): Seq[Failure] = {
    val groups = tf.ruleFiles.flatMap(loadRules)
    val failures = Seq.newBuilder[Failure]
    tf.cases.zipWithIndex.foreach { case (tc, ci) =>
      val in = inputFrame(spark, tc)
      val q = new TsQuerier(TsSchema.canonicalize(in))
      // recording rules participate in expression tests: materialize
      // them into the queried frame (upstream evaluates rules on the
      // grid before expression assertions). Horizon = the longest
      // input series plus one interval.
      val qAll =
        if (groups.exists(_.rules.exists(!_.isAlert))) {
          val horizon = BaseMs + tc.inputSeries.map { case (_, vs) =>
            expandValues(vs, tc.intervalMs).lastOption.map(_._1).getOrElse(0L)
          }.foldLeft(0L)(math.max) + tc.intervalMs
          val extra = for (g <- groups; r <- g.rules if !r.isAlert) yield
            RecordingRules.attachName(
              PromQL.rangeQuery(q, r.expr, BaseMs, horizon, g.intervalMs),
              r.name, r.labels)
          new TsQuerier(TsSchema.canonicalize(
            extra.foldLeft(in)((acc, e) => acc.unionByName(e))))
        } else q

      tc.exprTests.foreach { et =>
        val got = PromQL.instantQuery(qAll, et.expr, BaseMs + et.evalTimeMs)
          .collect().map { r =>
            val ls = r.getSeq[Row](r.fieldIndex("labels"))
              .map(l => l.getString(0) -> l.getString(1)).sortBy(_._1)
            ExpSample(ls, math.rint(r.getDouble(r.fieldIndex("v")) * 1e6) / 1e6)
          }.sortBy(_.labels.toString)
        val want = et.expSamples
          .map(s => s.copy(value = math.rint(s.value * 1e6) / 1e6))
          .sortBy(_.labels.toString)
        if (got.toSeq != want)
          failures += Failure(s"case $ci expr `${et.expr}` @${et.evalTimeMs / 1000}s: " +
            s"got ${got.mkString("[", ", ", "]")}, want ${want.mkString("[", ", ", "]")}")
      }

      tc.alertTests.foreach { at =>
        val active = Rules.activeAlerts(qAll, groups, BaseMs + at.evalTimeMs)
          .filter(a => a.rule.name == at.alertname && a.state == "firing")
        val got = active.map(_.labels.filterNot(_._1 == "alertname").sortBy(_._1))
          .sortBy(_.toString)
        val want = at.expAlerts.map(_.sortBy(_._1)).sortBy(_.toString)
        if (got != want)
          failures += Failure(s"case $ci alert `${at.alertname}` @${at.evalTimeMs / 1000}s: " +
            s"got ${got.mkString("[", ", ", "]")}, want ${want.mkString("[", ", ", "]")}")
      }
    }
    failures.result()
  }
}
