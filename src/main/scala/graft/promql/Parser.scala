package graft.promql

import graft.tsdb.LabelMatcher

/** AST for the supported PromQL subset (see [[Parser]] for the
  * grammar). Durations and offsets are normalized to milliseconds at
  * parse time. */
sealed trait PromExpr
object PromExpr {
  /** `metric{l="v", m=~"re"}[range] offset d @ ts` — matchers include
    * the metric name as an `__name__` equality when present; `atMs`
    * pins the evaluation time (`@` modifier). */
  final case class Selector(matchers: Seq[LabelMatcher], rangeMs: Option[Long],
                            offsetMs: Long,
                            atMs: Option[Long] = None) extends PromExpr
  /** rate / increase / delta / idelta / irate / resets / changes /
    * `<agg>_over_time` applied to a range selector or a subquery. */
  final case class RangeFn(fn: String, arg: PromExpr) extends PromExpr
  /** PromQL subquery `expr[range:step]` — the inner instant expression
    * re-evaluated at `stepMs` resolution, producing the sample stream a
    * range function consumes. `stepMs == 0` means "use the outer
    * evaluation step" (Prometheus defaults to its global interval). */
  final case class Subquery(arg: PromExpr, rangeMs: Long, stepMs: Long,
                            offsetMs: Long) extends PromExpr
  /** abs / ceil / floor / exp / sqrt / ln / log2 / log10 / clamp /
    * clamp_min / clamp_max over an instant vector (+ scalar params). */
  final case class ScalarFn(fn: String, arg: PromExpr,
                            params: Seq[Double]) extends PromExpr
  /** sum / avg / min / max / count / quantile / topk / bottomk, with an
    * optional `by (...)` / `without (...)` grouping and a leading scalar
    * param for quantile/topk/bottomk. */
  final case class Agg(op: String, by: Seq[String], param: Option[Double],
                       arg: PromExpr, without: Boolean = false) extends PromExpr
  /** Binary operator with optional `on(...)` vector matching; `bool`
    * turns a comparison from a filter into a 0/1-valued vector;
    * `group` is Some("left"/"right") for many-to-one matching — the
    * many side's full label set survives to the output, with
    * `groupLabels` (the `group_left(lbl, ...)` list) copied over from
    * the one side. */
  final case class Bin(op: String, l: PromExpr, r: PromExpr,
                       on: Option[Seq[String]],
                       bool: Boolean = false,
                       group: Option[String] = None,
                       groupLabels: Seq[String] = Seq.empty,
                       ignoring: Option[Seq[String]] = None) extends PromExpr
  /** `histogram_quantile(φ, expr)` over an instant vector carrying
    * cumulative `le` buckets. */
  final case class HistQ(phi: Double, arg: PromExpr) extends PromExpr
  /** `histogram_fraction(lo, hi, expr)` over an instant vector carrying
    * cumulative `le` buckets: estimated fraction of observations in
    * `[lo, hi]`, uniform-within-bucket (same interpolation family as
    * `histogram_quantile`). */
  final case class HistFrac(lo: Double, hi: Double, arg: PromExpr)
      extends PromExpr
  /** `histogram_count/sum/avg/stddev/stdvar(expr)` over the classic
    * view of native histograms (`le` bucket series plus the
    * `_count`/`_sum` companion series). `stat` is the suffix after
    * `histogram_`. */
  final case class HistStats(stat: String, arg: PromExpr) extends PromExpr
  /** `absent(selector)` / `absent_over_time(selector[range])`: 1 at
    * each step where the selector matches no series (in the lookback
    * window / in the `[range]` window), labeled from the selector's
    * equality matchers. `sel.rangeMs` picks the variant. */
  final case class Absent(sel: Selector) extends PromExpr
  /** `time()` — the evaluation timestamp in seconds, a per-step
    * scalar. Usable in scalar positions (arithmetic against a vector,
    * inside `vector(...)`), not as a bare vector expression. */
  case object TimeE extends PromExpr
  /** `vector(s)` — lifts a scalar expression to a single-series
    * instant vector with an empty label set. */
  final case class VectorOf(arg: PromExpr) extends PromExpr
  /** `scalar(v)` — the value of a single-series vector as a per-step
    * scalar (NaN at steps where the vector has ≠ 1 series). */
  final case class ScalarOf(arg: PromExpr) extends PromExpr
  /** `label_replace(v, dst, repl, src, regex)` /
    * `label_join(v, dst, sep, src...)` — string args in call order. */
  final case class LabelFn(fn: String, arg: PromExpr,
                           strs: Seq[String]) extends PromExpr
  /** `info(v[, {matchers}])` (3.x experimental): enrich each series of
    * `v` with data labels copied from the `target_info` info metric
    * sharing its identifying labels (`job`, `instance`) at the same
    * step. The optional selector must match the info series' data
    * labels and, when present, restricts the copied labels to the names
    * it mentions. Data-side labels win on collision. */
  final case class InfoFn(arg: PromExpr, sel: Seq[LabelMatcher]) extends PromExpr
  final case class Num(v: Double) extends PromExpr

  /** `sort(v)` / `sort_desc(v)` (order by value) and
    * `sort_by_label(v, "l", ...)` / `sort_by_label_desc(v, "l", ...)`
    * (order by the named labels' values; 3.x feature). Presentation
    * ordering of an instant vector — values and labels pass through
    * untouched. */
  final case class SortFn(fn: String, arg: PromExpr,
                          labels: Seq[String]) extends PromExpr
}

/** Recursive-descent parser for the PromQL subset the evaluator
  * supports:
  *
  * {{{
  * expr     := unary (binop [on-clause] unary)*       // precedence-climbing
  * unary    := '-' unary | '(' expr ')' | number | call | selector
  * call     := aggop [by-clause] '(' [scalar ','] expr ')' [by-clause]
  *           | rangefn '(' selector ')'
  *           | scalarfn '(' expr [',' scalar]* ')'
  * selector := metric ['{' matchers '}'] [ '[' dur ']' ] ['offset' dur]
  *           | '{' matchers '}' [ '[' dur ']' ] ['offset' dur]
  * matcher  := label ('=' | '!=' | '=~' | '!~') string
  * dur      := (int unit)+   with unit in ms s m h d w y
  * }}}
  *
  * Binary precedence (loosest → tightest): comparisons (`> < >= <= ==
  * !=`, filter semantics), `+ -`, `* / %`, `^` (right-assoc). The
  * grammar is the query surface a Prometheus user actually types; the
  * reference itself ships raw samples and leaves evaluation to the
  * upstream server (SURVEY.md §2.4) — this front-end brings that
  * evaluation into the engine.
  */
final class Parser(input: String) {
  import PromExpr._

  // EOF sentinel (a plain constant, not an embedded NUL byte, so the
  // source file stays text to git and grep)
  private val Eof: Char = 0.toChar

  private var pos = 0
  private def err(msg: String): Nothing =
    throw new IllegalArgumentException(s"PromQL parse error at $pos: $msg")

  private def ws(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
  private def peek: Char = if (pos < input.length) input(pos) else Eof
  private def peekAt(i: Int): Char =
    if (pos + i < input.length) input(pos + i) else Eof
  private def eat(c: Char): Unit =
    if (peek == c) pos += 1 else err(s"expected '$c', got '$peek'")
  private def tryEat(s: String): Boolean = {
    ws()
    if (input.startsWith(s, pos)) { pos += s.length; true } else false
  }

  private def identStart(c: Char) = c.isLetter || c == '_' || c == ':'
  private def identChar(c: Char) = c.isLetterOrDigit || c == '_' || c == ':'

  private def ident(): String = {
    ws()
    if (!identStart(peek)) err(s"expected identifier, got '$peek'")
    val start = pos
    while (pos < input.length && identChar(input(pos))) pos += 1
    input.substring(start, pos)
  }

  /** Peek the next identifier LOWERCASED — every caller compares it
    * against keywords (by/without/bool/on/offset/…), and upstream's
    * lexer matches keywords case-insensitively (`BY`, `BOOL`). The
    * consuming [[ident]] keeps the original case for real names. */
  private def peekIdent(): Option[String] = {
    ws()
    if (!identStart(peek)) None
    else {
      var i = pos
      while (i < input.length && identChar(input(i))) i += 1
      Some(input.substring(pos, i).toLowerCase)
    }
  }

  private def stringLit(): String = {
    ws()
    val q = peek
    if (q != '"' && q != '\'') err("expected string literal")
    pos += 1
    val sb = new StringBuilder
    while (peek != q) {
      if (peek == Eof) err("unterminated string")
      if (peek == '\\' && (peekAt(1) == q || peekAt(1) == '\\')) pos += 1
      sb += input(pos); pos += 1
    }
    pos += 1
    sb.toString
  }

  private def number(): Double = {
    ws()
    val start = pos
    if (peek == '+' || peek == '-') pos += 1
    // Prometheus number literals include Inf / NaN (case-insensitive)
    if (peek.isLetter) {
      val w = new StringBuilder
      while (peek.isLetter) { w += peek; pos += 1 }
      val neg = input.charAt(start) == '-'
      w.result().toLowerCase match {
        case "inf" => return if (neg) Double.NegativeInfinity
                             else Double.PositiveInfinity
        case "nan" => return Double.NaN
        case other => err(s"expected number, got '$other'")
      }
    }
    while (peek.isDigit) pos += 1
    if (peek == '.') { pos += 1; while (peek.isDigit) pos += 1 }
    if (peek == 'e' || peek == 'E') {
      pos += 1; if (peek == '+' || peek == '-') pos += 1
      while (peek.isDigit) pos += 1
    }
    if (pos == start) err("expected number")
    input.substring(start, pos).toDouble
  }

  private val unitMs = Map("ms" -> 1L, "s" -> 1000L, "m" -> 60000L,
    "h" -> 3600000L, "d" -> 86400000L, "w" -> 7L * 86400000L,
    "y" -> 365L * 86400000L)

  private def duration(): Long = {
    ws()
    var total = 0L
    var any = false
    while (peek.isDigit) {
      val start = pos
      while (peek.isDigit) pos += 1
      val n = input.substring(start, pos).toLong
      val u =
        if (input.startsWith("ms", pos)) { pos += 2; "ms" }
        else {
          val c = peek
          if (!unitMs.contains(c.toString)) err(s"bad duration unit '$c'")
          pos += 1; c.toString
        }
      total += n * unitMs(u)
      any = true
    }
    if (!any) err("expected duration")
    total
  }

  private val aggOps = Set("sum", "avg", "min", "max", "count",
    "quantile", "topk", "bottomk", "stddev", "stdvar", "group",
    "limitk", "limit_ratio")
  private val paramAggs = Set("quantile", "topk", "bottomk",
    "limitk", "limit_ratio")
  private val rangeFns = Set("rate", "increase", "delta", "idelta", "irate",
    "resets", "changes", "sum_over_time", "avg_over_time", "min_over_time",
    "max_over_time", "count_over_time", "last_over_time",
    "stddev_over_time", "stdvar_over_time", "present_over_time",
    "mad_over_time", "ts_of_max_over_time", "ts_of_min_over_time",
    "ts_of_last_over_time", "deriv", "predict_linear")
  private val scalarFns = Map(
    "abs" -> 0, "ceil" -> 0, "floor" -> 0, "exp" -> 0, "sqrt" -> 0,
    "ln" -> 0, "log2" -> 0, "log10" -> 0, "sgn" -> 0, "round" -> 0,
    "timestamp" -> 0,
    "minute" -> 0, "hour" -> 0, "day_of_week" -> 0, "day_of_month" -> 0,
    "day_of_year" -> 0, "days_in_month" -> 0, "month" -> 0, "year" -> 0,
    "clamp" -> 2, "clamp_min" -> 1, "clamp_max" -> 1,
    "sin" -> 0, "cos" -> 0, "tan" -> 0, "asin" -> 0, "acos" -> 0,
    "atan" -> 0, "sinh" -> 0, "cosh" -> 0, "tanh" -> 0,
    "asinh" -> 0, "acosh" -> 0, "atanh" -> 0, "deg" -> 0, "rad" -> 0)

  /** Calendar functions default their argument to `vector(time())`. */
  private val calendarFns = Set("minute", "hour", "day_of_week",
    "day_of_month", "day_of_year", "days_in_month", "month", "year")

  /** The native-histogram stats family (Prometheus `histogram_count`
    * etc.), served here over the classic view. */
  private val histStatFns = Set("histogram_count", "histogram_sum",
    "histogram_avg", "histogram_stddev", "histogram_stdvar")

  private def labelList(): Seq[String] = {
    ws(); eat('(')
    val out = Seq.newBuilder[String]
    ws()
    if (peek != ')') {
      out += ident()
      while ({ ws(); peek == ',' }) { pos += 1; out += ident() }
    }
    ws(); eat(')')
    out.result()
  }

  private def matcher(): LabelMatcher = {
    val name = ident()
    ws()
    val m: (String, String) => LabelMatcher =
      if (tryEat("=~")) LabelMatcher.re
      else if (tryEat("!=")) LabelMatcher.neq
      else if (tryEat("!~")) LabelMatcher.notRe
      else if (tryEat("=")) LabelMatcher.eq
      else err("expected matcher operator")
    m(name, stringLit())
  }

  /** `offset [-]d` — a negative offset looks into the FUTURE of the
    * window (Prometheus allows them since 2.26). */
  private def signedDuration(): Long = {
    ws()
    val neg = peek == '-'
    if (neg) pos += 1
    (if (neg) -1L else 1L) * duration()
  }

  private def offsetClause(): Long =
    if (peekIdent().contains("offset")) { ident(); signedDuration() } else 0L

  /** `offset d` and `@ ts` in either order. */
  private def modifiers(): (Long, Option[Long]) = {
    var off = 0L
    var at: Option[Long] = None
    var more = true
    while (more) {
      ws()
      if (peekIdent().contains("offset")) { ident(); off = signedDuration() }
      else if (peek == '@') {
        // `@ start()` / `@ end()` pin to the query window edges —
        // encoded as Long.MinValue/MaxValue sentinels the evaluator
        // resolves against its own mint/maxt
        pos += 1; ws()
        at = peekIdent() match {
          case Some("start") =>
            ident(); ws(); eat('('); ws(); eat(')'); Some(Long.MinValue)
          case Some("end") =>
            ident(); ws(); eat('('); ws(); eat(')'); Some(Long.MaxValue)
          case _ => Some(math.round(number() * 1000.0))
        }
      }
      else more = false
    }
    (off, at)
  }

  /** A selector, or — when the bracket carries a `:` — a subquery over
    * the bare instant selector (`m[30m:1m]`). */
  private def selector(metric: Option[String]): PromExpr = {
    val ms = Seq.newBuilder[LabelMatcher]
    metric.foreach(m => ms += LabelMatcher.eq(graft.tsdb.Labels.MetricName, m))
    ws()
    if (peek == '{') {
      pos += 1; ws()
      if (peek != '}') {
        ms += matcher()
        while ({ ws(); peek == ',' }) { pos += 1; ms += matcher() }
      }
      ws(); eat('}')
    }
    val all = ms.result()
    if (all.isEmpty) err("empty selector")
    ws()
    if (peek == '[') {
      pos += 1; val d = duration(); ws()
      if (peek == ':') {
        pos += 1; ws()
        val st = if (peek == ']') 0L else duration()
        ws(); eat(']')
        Subquery(Selector(all, None, 0L), d, st, offsetClause())
      } else {
        eat(']')
        val (off, at) = modifiers()
        Selector(all, Some(d), off, at)
      }
    } else {
      val (off, at) = modifiers()
      Selector(all, None, off, at)
    }
  }

  /** Postfix subquery brackets on a composite expression:
    * `rate(m[5m])[30m:5m]`. */
  private def postfix(e: PromExpr): PromExpr = {
    ws()
    if (peek == '[') {
      pos += 1; val d = duration(); ws(); eat(':'); ws()
      val st = if (peek == ']') 0L else duration()
      ws(); eat(']')
      Subquery(e, d, st, offsetClause())
    } else e
  }

  private def call(name: String): PromExpr = {
    if (name == "count_values") {
      // count_values("label", v): the value-distribution aggregation —
      // the destination label rides in the op name so Agg stays a
      // simple (op, by, param, arg) tuple
      var by = Seq.empty[String]
      var without = false
      def clause(): Boolean = peekIdent() match {
        case Some("by") => ident(); by = labelList(); true
        case Some("without") => ident(); by = labelList(); without = true; true
        case _ => false
      }
      clause()
      ws(); eat('(')
      val lbl = stringLit()
      ws(); eat(',')
      val arg = parseExpr(0)
      ws(); eat(')')
      clause()
      Agg(s"count_values:$lbl", by, None, arg, without)
    } else if (name == "time") {
      ws(); eat('('); ws(); eat(')')
      TimeE
    } else if (name == "pi") {
      ws(); eat('('); ws(); eat(')')
      Num(math.Pi)
    } else if (name == "vector" || name == "scalar") {
      ws(); eat('(')
      val arg = parseExpr(0)
      ws(); eat(')')
      if (name == "vector") VectorOf(arg) else ScalarOf(arg)
    } else if (aggOps(name)) {
      // by/without clause may come before or after the parens
      var by = Seq.empty[String]
      var without = false
      def clause(): Boolean = peekIdent() match {
        case Some("by") => ident(); by = labelList(); true
        case Some("without") => ident(); by = labelList(); without = true; true
        case _ => false
      }
      clause()
      ws(); eat('(')
      // upstream accepts a parenthesized scalar literal as the
      // parameter (`topk((3), v)`); arbitrary scalar EXPRESSIONS as
      // parameters stay unsupported (documented deviation)
      def paramNumber(): Double = {
        ws()
        if (peek == '(') { pos += 1; val v = paramNumber(); ws(); eat(')'); v }
        else number()
      }
      val param =
        if (paramAggs(name)) { val p = paramNumber(); ws(); eat(','); Some(p) }
        else None
      val arg = parseExpr(0)
      ws(); eat(')')
      clause()
      Agg(name, by, param, arg, without)
    } else if (rangeFns(name) || name == "quantile_over_time" ||
               name == "double_exponential_smoothing" || name == "holt_winters") {
      ws(); eat('(')
      // quantile_over_time carries its φ in the fn name ("fn:φ") so
      // RangeFn stays a simple (name, arg) pair
      val phi = if (name == "quantile_over_time") {
        val p = number(); ws(); eat(','); Some(p)
      } else None
      val inner = parseExpr(0)
      // predict_linear(v[r], t) carries its horizon (seconds) in the
      // name the same way quantile_over_time carries φ
      val post = if (name == "predict_linear") {
        ws(); eat(','); Some(number())
      } else None
      // double_exponential_smoothing(v[r], sf, tf) — `holt_winters` is
      // the pre-3.x upstream name for the same function
      val smooth = if (name == "double_exponential_smoothing" || name == "holt_winters") {
        ws(); eat(','); val sf = number(); ws(); eat(','); val tf = number()
        Some((sf, tf))
      } else None
      ws(); eat(')')
      val fnName = phi.map(p => s"quantile_over_time:$p")
        .orElse(post.map(p => s"predict_linear:$p"))
        .orElse(smooth.map { case (sf, tf) => s"double_exponential_smoothing:$sf:$tf" })
        .getOrElse(name)
      inner match {
        case s: Selector if s.rangeMs.isDefined => RangeFn(fnName, s)
        case sq: Subquery => RangeFn(fnName, sq)
        case _ => err(s"$name() needs a [range] selector or subquery")
      }
    } else if (name == "absent" || name == "absent_over_time") {
      ws(); eat('(')
      val inner = parseExpr(0)
      ws(); eat(')')
      inner match {
        case s: Selector if name == "absent" && s.rangeMs.isEmpty => Absent(s)
        case s: Selector if name == "absent_over_time" && s.rangeMs.isDefined =>
          Absent(s)
        case _ if name == "absent" => err("absent() takes an instant selector")
        case _ => err("absent_over_time() takes a [range] selector")
      }
    } else if (name == "sort" || name == "sort_desc") {
      ws(); eat('(')
      val arg = parseExpr(0)
      ws(); eat(')')
      SortFn(name, arg, Nil)
    } else if (name == "sort_by_label" || name == "sort_by_label_desc") {
      ws(); eat('(')
      val arg = parseExpr(0)
      val ls = Seq.newBuilder[String]
      while ({ ws(); peek == ',' }) { pos += 1; ls += stringLit() }
      ws(); eat(')')
      val got = ls.result()
      if (got.isEmpty) err(s"$name(v, \"label\", ...) needs at least one label")
      SortFn(name, arg, got)
    } else if (name == "label_replace" || name == "label_join") {
      ws(); eat('(')
      val arg = parseExpr(0)
      val strs = Seq.newBuilder[String]
      while ({ ws(); peek == ',' }) { pos += 1; strs += stringLit() }
      ws(); eat(')')
      val got = strs.result()
      if (name == "label_replace" && got.size != 4)
        err("label_replace(v, dst, repl, src, regex)")
      if (name == "label_join" && got.size < 2)
        err("label_join(v, dst, sep, src...)")
      LabelFn(name, arg, got)
    } else if (name == "info") {
      ws(); eat('(')
      val arg = parseExpr(0)
      val sel = Seq.newBuilder[LabelMatcher]
      ws()
      if (peek == ',') {
        pos += 1; ws(); eat('{')
        ws()
        if (peek != '}') {
          sel += matcher()
          while ({ ws(); peek == ',' }) { pos += 1; ws(); sel += matcher() }
        }
        ws(); eat('}')
      }
      ws(); eat(')')
      InfoFn(arg, sel.result())
    } else if (name == "histogram_quantile") {
      ws(); eat('(')
      val phi = number()
      ws(); eat(',')
      val arg = parseExpr(0)
      ws(); eat(')')
      HistQ(phi, arg)
    } else if (name == "histogram_fraction") {
      ws(); eat('(')
      val lo = number()
      ws(); eat(',')
      val hi = number()
      ws(); eat(',')
      val arg = parseExpr(0)
      ws(); eat(')')
      HistFrac(lo, hi, arg)
    } else if (histStatFns.contains(name)) {
      ws(); eat('(')
      val arg = parseExpr(0)
      ws(); eat(')')
      HistStats(name.stripPrefix("histogram_"), arg)
    } else if (scalarFns.contains(name)) {
      ws(); eat('(')
      ws()
      if (peek == ')' && calendarFns(name)) {
        pos += 1
        return ScalarFn(name, VectorOf(TimeE), Seq.empty)
      }
      val arg = parseExpr(0)
      val params = (0 until scalarFns(name)).map { _ => ws(); eat(','); number() }
      // round(v[, to_nearest]) takes an optional granularity scalar
      val extra = if (name == "round" && tryEat(",")) Seq(number()) else Seq.empty
      ws(); eat(')')
      ScalarFn(name, arg, params ++ extra)
    } else err(s"unknown function '$name'")
  }

  private def unary(): PromExpr = {
    ws()
    if (peek == '-') { pos += 1; Bin("-", Num(0), unary(), None) }
    else if (peek == '+') { pos += 1; unary() } // upstream unary plus
    else if (peek == '(') {
      pos += 1; val e = parseExpr(0); ws(); eat(')'); postfix(e)
    }
    else if (peek.isDigit || peek == '.') Num(number())
    else if (peek == '{') selector(None)
    else {
      val name = ident()
      ws()
      // inf/nan are NUMBER tokens in the upstream lexer (any case),
      // never metric names — `inf{}` is a parse error there too
      name.toLowerCase match {
        case "inf" => return Num(Double.PositiveInfinity)
        case "nan" => return Num(Double.NaN)
        case _ => ()
      }
      // aggregation operators are KEYWORDS upstream (case-insensitive:
      // `SUM(...) BY (job)` parses); function names stay case-sensitive
      val lower = name.toLowerCase
      val opName =
        if (aggOps(lower) || lower == "count_values") lower else name
      val aggClause = aggOps(opName) &&
        (peekIdent().contains("by") || peekIdent().contains("without"))
      if (peek == '(' || aggClause) postfix(call(opName))
      else selector(Some(name))
    }
  }

  // Prometheus precedence, loosest → tightest; `^` is right-associative.
  // Keyword tiers (or / and,unless) match on identifier boundaries,
  // symbol tiers on longest prefix.
  private val binPrec = Seq(
    Seq("or"),                             // 0 (set union)
    Seq("and", "unless"),                  // 1 (set intersect / minus)
    Seq("==", "!=", ">=", "<=", ">", "<"), // 2 (comparisons filter)
    Seq("+", "-"),                         // 3
    Seq("*", "/", "%", "atan2"),           // 4 (atan2: keyword, same tier)
    Seq("^"))                              // 5
  private val keywordOps = Set("or", "and", "unless", "atan2")

  private def parseExpr(minPrec: Int): PromExpr = {
    var left = unary()
    var done = false
    while (!done) {
      ws()
      val kw = peekIdent().filter(keywordOps)
      val hit = binPrec.zipWithIndex.collectFirst {
        case (ops, p) if p >= minPrec && ops.exists(o =>
            if (keywordOps(o)) kw.contains(o) else input.startsWith(o, pos)) =>
          (ops.filter(o =>
            if (keywordOps(o)) kw.contains(o) else input.startsWith(o, pos))
            .maxBy(_.length), p)
      }
      hit match {
        case Some((op, p)) =>
          pos += op.length
          val bool = peekIdent().contains("bool") && { ident(); true }
          val on = if (peekIdent().contains("on")) { ident(); Some(labelList()) }
                   else None
          val ignoring =
            if (on.isEmpty && peekIdent().contains("ignoring")) {
              ident(); Some(labelList())
            } else None
          var groupLabels = Seq.empty[String]
          val group = peekIdent() match {
            case Some(g @ ("group_left" | "group_right")) =>
              ident()
              ws()
              // label-copy list: these labels transfer from the one
              // side onto the many side's output series
              if (peek == '(') groupLabels = labelList()
              Some(g.stripPrefix("group_"))
            case _ => None
          }
          val right = parseExpr(if (op == "^") p else p + 1)
          left = Bin(op, left, right, on, bool, group, groupLabels, ignoring)
        case None => done = true
      }
    }
    left
  }

  def parse(): PromExpr = {
    val e = parseExpr(0)
    ws()
    if (pos != input.length) err(s"trailing input: '${input.substring(pos)}'")
    e
  }
}
