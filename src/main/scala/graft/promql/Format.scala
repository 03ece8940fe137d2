package graft.promql

import graft.tsdb.{Labels, LabelMatcher, MatchType}

/** PromQL pretty-printer — the inverse of [[Parser]] (the engine's
  * `/api/v1/format_query`, mirroring the upstream endpoint that
  * serves `promql.Prettify`). The contract is ROUND-TRIP FIDELITY,
  * not byte-identity with what the user typed:
  * `parse(format(parse(q))) == parse(q)` for every query the parser
  * accepts (property-gated in PromQLSpec over the grammar fuzzer).
  *
  * Parenthesization is minimal-but-safe: binary sub-expressions are
  * always wrapped (precedence never re-associates), everything else
  * is self-delimiting. Two parser-specific hazards are handled
  * explicitly:
  *  - `group_left` with an empty copy-list prints as `group_left()` —
  *    printed bare, a parenthesized right operand would be eaten as
  *    the label-copy list;
  *  - a metric name that collides with an operator keyword (`on`,
  *    `bool`, `and`, ...) prints in brace form (`{__name__="on"}`) —
  *    after a binary operator the bare word would parse as a
  *    modifier, not a selector.
  */
object Format {

  /** Keywords the expression grammar claims in operand position. */
  private val reserved = Set("bool", "on", "ignoring", "group_left",
    "group_right", "and", "or", "unless", "atan2", "offset")

  def format(e: PromExpr): String = fmt(e)

  // ---- numbers / durations / strings --------------------------------

  /** A scalar literal the lexer reads back to the same Double. */
  def num(v: Double): String =
    if (v.isNaN) "NaN"
    else if (v.isPosInfinity) "Inf"
    else if (v.isNegInfinity) "-Inf"
    else if (v == Math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString // shortest round-trip repr; lexer takes e-notation

  /** Milliseconds → compact PromQL duration (`90061001` → `1d1h1m1s1ms`). */
  def duration(ms: Long): String = {
    require(ms >= 0, s"negative duration $ms")
    if (ms == 0) return "0s"
    val units = Seq("w" -> (7L * 86400000L), "d" -> 86400000L,
      "h" -> 3600000L, "m" -> 60000L, "s" -> 1000L, "ms" -> 1L)
    val sb = new StringBuilder
    var rest = ms
    for ((u, w) <- units if rest >= w) {
      sb.append(rest / w).append(u); rest %= w
    }
    sb.toString
  }

  private def signedDuration(ms: Long): String =
    if (ms < 0) "-" + duration(-ms) else duration(ms)

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c => c.toString
    } + "\""

  // ---- selectors -----------------------------------------------------

  private def matcherOp(t: MatchType): String = t match {
    case MatchType.Eq => "="
    case MatchType.Neq => "!="
    case MatchType.Re => "=~"
    case MatchType.NotRe => "!~"
    case other => sys.error(s"matcher type $other has no PromQL syntax")
  }

  private def identOk(s: String): Boolean =
    s.nonEmpty && (s.head.isLetter || s.head == '_' || s.head == ':') &&
      s.forall(c => c.isLetterOrDigit || c == '_' || c == ':') &&
      !reserved(s)

  /** Matcher list with the parser's metric-prefix convention: a LEADING
    * `__name__` equality prints as the bare metric name (the parser
    * puts it first, so order — and case-class equality — survives). */
  private def selectorBody(matchers: Seq[LabelMatcher]): String = {
    val (metric, rest) = matchers match {
      case head +: tail if head.name == Labels.MetricName &&
          head.tpe == MatchType.Eq && identOk(head.value) =>
        (head.value, tail)
      case all => ("", all)
    }
    val braces =
      if (rest.isEmpty && metric.nonEmpty) ""
      else rest.map(m => s"${m.name}${matcherOp(m.tpe)}${quote(m.value)}")
        .mkString("{", ",", "}")
    metric + braces
  }

  private def modifiers(offsetMs: Long, atMs: Option[Long]): String = {
    val off = if (offsetMs != 0) s" offset ${signedDuration(offsetMs)}" else ""
    val at = atMs match {
      case Some(Long.MinValue) => " @ start()"
      case Some(Long.MaxValue) => " @ end()"
      case Some(ms) if ms % 1000 == 0 => s" @ ${ms / 1000}"
      case Some(ms) => " @ " + num(ms / 1000.0)
      case None => ""
    }
    off + at
  }

  // ---- expressions ----------------------------------------------------

  /** Operand of a binary operator: parens around nested binaries (never
    * re-associates); everything else self-delimits. */
  private def operand(e: PromExpr): String = e match {
    case b: PromExpr.Bin => "(" + fmt(b) + ")"
    case other => fmt(other)
  }

  private def fmt(e: PromExpr): String = e match {
    case PromExpr.Num(v) => num(v)
    case PromExpr.TimeE => "time()"

    case PromExpr.Selector(ms, range, off, at) =>
      selectorBody(ms) +
        range.map(r => s"[${duration(r)}]").getOrElse("") +
        modifiers(off, at)

    case PromExpr.Subquery(arg, range, step, off) =>
      val inner = arg match {
        // a MODIFIED selector under a subquery can only have come from
        // `(sel offset d)[r:s]` — the grammar reads modifiers after the
        // bracket, so the bare form would misparse
        case s: PromExpr.Selector
            if s.rangeMs.isEmpty && s.offsetMs == 0 && s.atMs.isEmpty =>
          fmt(s)
        case s: PromExpr.Selector if s.rangeMs.isEmpty => "(" + fmt(s) + ")"
        case b: PromExpr.Bin => "(" + fmt(b) + ")"
        case n: PromExpr.Num => "(" + fmt(n) + ")"
        case composite => fmt(composite) // calls self-delimit, postfix applies
      }
      val st = if (step == 0) "" else duration(step)
      s"$inner[${duration(range)}:$st]" +
        (if (off != 0) s" offset ${signedDuration(off)}" else "")

    case PromExpr.RangeFn(fn, arg) => fn.split(':') match {
      // packed params ride in the name: quantile_over_time:φ,
      // predict_linear:t, double_exponential_smoothing:sf:tf
      case Array("quantile_over_time", phi) =>
        s"quantile_over_time(${numStr(phi)}, ${fmt(arg)})"
      case Array("predict_linear", t) =>
        s"predict_linear(${fmt(arg)}, ${numStr(t)})"
      case Array("double_exponential_smoothing", sf, tf) =>
        s"double_exponential_smoothing(${fmt(arg)}, ${numStr(sf)}, ${numStr(tf)})"
      case _ => s"$fn(${fmt(arg)})"
    }

    case PromExpr.ScalarFn(fn, arg, params) =>
      val ps = params.map(num).map(", " + _).mkString
      s"$fn(${fmt(arg)}$ps)"

    case PromExpr.Agg(op, by, param, arg, without) =>
      val clause =
        if (by.isEmpty && !without) ""
        else (if (without) " without " else " by ") + by.mkString("(", ", ", ")")
      // split(":", 2): the destination label may itself contain ':'
      val (name, lead) = op.split(":", 2) match {
        case Array("count_values", lbl) => ("count_values", quote(lbl) + ", ")
        case _ => (op, param.map(p => num(p) + ", ").getOrElse(""))
      }
      // count_values only accepts its clause AFTER the call (the bare
      // word before parens parses as a selector in operand position)
      if (name == "count_values") s"$name($lead${fmt(arg)})$clause"
      else s"$name$clause($lead${fmt(arg)})"

    case PromExpr.Bin(op, l, r, on, bool, group, groupLabels, ignoring) =>
      val mods = new StringBuilder
      if (bool) mods.append(" bool")
      on.foreach(ls => mods.append(ls.mkString(" on(", ", ", ")")))
      ignoring.foreach(ls => mods.append(ls.mkString(" ignoring(", ", ", ")")))
      // empty copy-list prints WITH parens: bare `group_left` would eat
      // a parenthesized right operand as its label list
      group.foreach(g =>
        mods.append(groupLabels.mkString(s" group_$g(", ", ", ")")))
      s"${operand(l)} $op${mods.toString} ${operand(r)}"

    case PromExpr.HistQ(phi, arg) =>
      s"histogram_quantile(${num(phi)}, ${fmt(arg)})"
    case PromExpr.HistFrac(lo, hi, arg) =>
      s"histogram_fraction(${num(lo)}, ${num(hi)}, ${fmt(arg)})"
    case PromExpr.HistStats(stat, arg) => s"histogram_$stat(${fmt(arg)})"

    case PromExpr.Absent(sel) =>
      val fn = if (sel.rangeMs.isDefined) "absent_over_time" else "absent"
      s"$fn(${fmt(sel)})"

    case PromExpr.VectorOf(arg) => s"vector(${fmt(arg)})"
    case PromExpr.ScalarOf(arg) => s"scalar(${fmt(arg)})"

    case PromExpr.LabelFn(fn, arg, strs) =>
      s"$fn(${fmt(arg)}${strs.map(s => ", " + quote(s)).mkString})"

    case PromExpr.InfoFn(arg, sel) =>
      val selStr =
        if (sel.isEmpty) ""
        else sel.map(m => s"${m.name}${matcherOp(m.tpe)}${quote(m.value)}")
          .mkString(", {", ",", "}")
      s"info(${fmt(arg)}$selStr)"

    case PromExpr.SortFn(fn, arg, labels) =>
      s"$fn(${fmt(arg)}${labels.map(l => ", " + quote(l)).mkString})"
  }

  /** A number that arrived as a packed-name string segment: normalize
    * through Double so `3600.0` prints `3600`. */
  private def numStr(s: String): String = num(s.toDouble)

  // ---- AST as JSON (the `/api/v1/parse_query` shape) -----------------

  /** Upstream-inspired JSON tree (`type` discriminator per node;
    * selectors carry `matchers`, calls carry `func`/`args`). Field
    * names follow the upstream endpoint where the ASTs align; packed
    * params are unpacked into explicit fields. */
  def json(e: PromExpr): String = {
    def jstr(s: String) = quote(s)
    def jnum(v: Double) =
      if (v.isNaN || v.isInfinite) jstr(num(v)) else num(v)
    def matcher(m: LabelMatcher) =
      s"""{"name":${jstr(m.name)},"type":${jstr(matcherOp(m.tpe))},"value":${jstr(m.value)}}"""
    def go(e: PromExpr): String = e match {
      case PromExpr.Num(v) =>
        s"""{"type":"numberLiteral","val":${jnum(v)}}"""
      case PromExpr.TimeE => """{"type":"call","func":"time","args":[]}"""
      case PromExpr.Selector(ms, range, off, at) =>
        val base = s""""matchers":[${ms.map(matcher).mkString(",")}]""" +
          s""","offsetMs":$off""" +
          at.map(a => s""","atMs":$a""").getOrElse("")
        range match {
          case Some(r) =>
            s"""{"type":"matrixSelector","rangeMs":$r,$base}"""
          case None => s"""{"type":"vectorSelector",$base}"""
        }
      case PromExpr.Subquery(arg, range, step, off) =>
        s"""{"type":"subquery","expr":${go(arg)},"rangeMs":$range,"stepMs":$step,"offsetMs":$off}"""
      case PromExpr.RangeFn(fn, arg) =>
        val (name, extra) = fn.split(':') match {
          case Array(n, p) => (n, s""","param":${jnum(p.toDouble)}""")
          case Array(n, a, b) =>
            (n, s""","params":[${jnum(a.toDouble)},${jnum(b.toDouble)}]""")
          case _ => (fn, "")
        }
        s"""{"type":"call","func":${jstr(name)},"args":[${go(arg)}]$extra}"""
      case PromExpr.ScalarFn(fn, arg, params) =>
        val ps = (go(arg) +: params.map(jnum)).mkString(",")
        s"""{"type":"call","func":${jstr(fn)},"args":[$ps]}"""
      case PromExpr.Agg(op, by, param, arg, without) =>
        val (name, lbl) = op.split(":", 2) match {
          case Array("count_values", l) => ("count_values", Some(l))
          case _ => (op, None)
        }
        s"""{"type":"aggregation","op":${jstr(name)}""" +
          s""","grouping":[${by.map(jstr).mkString(",")}],"without":$without""" +
          param.map(p => s""","param":${jnum(p)}""").getOrElse("") +
          lbl.map(l => s""","valueLabel":${jstr(l)}""").getOrElse("") +
          s""","expr":${go(arg)}}"""
      case PromExpr.Bin(op, l, r, on, bool, group, groupLabels, ignoring) =>
        val matching = on.map(ls =>
            s""","on":[${ls.map(jstr).mkString(",")}]""")
          .orElse(ignoring.map(ls =>
            s""","ignoring":[${ls.map(jstr).mkString(",")}]"""))
          .getOrElse("")
        val grp = group.map(g => s""","group":${jstr(g)},"include":[${
          groupLabels.map(jstr).mkString(",")}]""").getOrElse("")
        s"""{"type":"binaryExpr","op":${jstr(op)},"bool":$bool$matching$grp,"lhs":${go(l)},"rhs":${go(r)}}"""
      case PromExpr.HistQ(phi, arg) =>
        s"""{"type":"call","func":"histogram_quantile","args":[${jnum(phi)},${go(arg)}]}"""
      case PromExpr.HistFrac(lo, hi, arg) =>
        s"""{"type":"call","func":"histogram_fraction","args":[${jnum(lo)},${jnum(hi)},${go(arg)}]}"""
      case PromExpr.HistStats(stat, arg) =>
        s"""{"type":"call","func":${jstr("histogram_" + stat)},"args":[${go(arg)}]}"""
      case PromExpr.Absent(sel) =>
        val fn = if (sel.rangeMs.isDefined) "absent_over_time" else "absent"
        s"""{"type":"call","func":${jstr(fn)},"args":[${go(sel)}]}"""
      case PromExpr.VectorOf(arg) =>
        s"""{"type":"call","func":"vector","args":[${go(arg)}]}"""
      case PromExpr.ScalarOf(arg) =>
        s"""{"type":"call","func":"scalar","args":[${go(arg)}]}"""
      case PromExpr.LabelFn(fn, arg, strs) =>
        s"""{"type":"call","func":${jstr(fn)},"args":[${(go(arg) +: strs.map(jstr)).mkString(",")}]}"""
      case PromExpr.InfoFn(arg, sel) =>
        s"""{"type":"call","func":"info","args":[${go(arg)}],"matchers":[${sel.map(matcher).mkString(",")}]}"""
      case PromExpr.SortFn(fn, arg, labels) =>
        s"""{"type":"call","func":${jstr(fn)},"args":[${(go(arg) +: labels.map(jstr)).mkString(",")}]}"""
    }
    go(e)
  }
}
