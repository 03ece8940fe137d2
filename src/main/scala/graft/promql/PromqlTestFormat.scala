package graft.promql

import org.apache.spark.sql.{Row, SparkSession}

import graft.tsdb.{TsQuerier, TsSchema}

/** The upstream PromQL unit-test NOTATION (the `promql/testdata`
  * `.test` dialect `promtool test` shares its series syntax with):
  * `load`
  * blocks with expanding series values, then `eval` commands asserted
  * against this engine's evaluator —
  *
  * {{{
  * load 1m
  *   m{job="a"} 0+1x10
  *
  * eval instant at 5m sum by (job) (m)
  *   {job="a"} 5
  *
  * eval range from 0 to 10m step 5m m{job="a"}
  *   m{job="a"} 0 5 10
  *
  * eval_fail instant at 0m sum(m) by (job) group_left ()
  * clear
  * }}}
  *
  * Supported commands: `load <step>`, `clear`, `eval instant at <t>`,
  * `eval range from <a> to <b> step <s>`, `eval_ordered` (order-checked
  * expectations, for topk/sort), `eval_fail` (expression must be
  * rejected). Values accept the shared expanding notation
  * ([[RuleTests.expandValues]]), `_` gaps, `NaN`, `Inf`/`+Inf`/`-Inf`.
  *
  * Deliberate deviations from upstream `promtool`, documented here and
  * asserted in `PromqlConformanceSpec`:
  *  - native-histogram literals (`{{schema:..}}`) are not part of the
  *    notation (native histograms are exercised through their own
  *    `ts_promql_native_*` oracle battery);
  *  - `eval` runs with Prometheus's edge-extrapolated rate estimator
  *    (`extrapolate = true`); the engine's DEFAULT is the exact
  *    reset-corrected increase, which is the documented engine stance;
  *  - comparison tolerance is upstream's 1e-6 relative epsilon.
  */
object PromqlTestFormat {

  sealed trait Cmd
  final case class Load(stepMs: Long, series: Seq[(String, String)]) extends Cmd
  final case class EvalInstant(atMs: Long, expr: String,
                               expected: Seq[(Seq[(String, String)], Double)],
                               fail: Boolean, ordered: Boolean) extends Cmd
  final case class EvalRange(fromMs: Long, toMs: Long, stepMs: Long,
                             expr: String,
                             expected: Seq[(Seq[(String, String)],
                               Seq[(Long, Double)])],
                             fail: Boolean) extends Cmd
  case object Clear extends Cmd

  private def dur(s: String, n: Int): Long =
    if (s == "0") 0L else Rules.duration(s, "<promql-test>", n)

  private def num(s: String): Double = s match {
    case "NaN" => Double.NaN
    case "Inf" | "+Inf" => Double.PositiveInfinity
    case "-Inf" => Double.NegativeInfinity
    case v => v.toDouble
  }

  /** Parse a test script into commands. Lines starting at column 0 are
    * commands; indented lines belong to the preceding command. */
  def parse(text: String): Seq[Cmd] = {
    def stripComment(l: String): String = {
      // '#' only starts a comment OUTSIDE double quotes — label values
      // and regexes may legally contain it
      var inq = false
      var j = 0
      while (j < l.length) {
        val ch = l.charAt(j)
        if (inq) { if (ch == '"' && l.charAt(j - 1) != '\\') inq = false }
        else if (ch == '"') inq = true
        else if (ch == '#') return l.substring(0, j)
        j += 1
      }
      l
    }
    val lines = text.split("\n").zipWithIndex
      .map { case (l, i) => (stripComment(l).stripTrailing(), i + 1) }
      .filter(_._1.trim.nonEmpty)
    val out = Seq.newBuilder[Cmd]
    var i = 0
    def body(): Seq[(String, Int)] = {
      val b = Seq.newBuilder[(String, Int)]
      while (i < lines.length && lines(i)._1.startsWith(" ")) {
        b += ((lines(i)._1.trim, lines(i)._2)); i += 1
      }
      b.result()
    }
    def splitSeriesLine(l: String, n: Int): (String, String) = {
      // selector, then whitespace-separated values: the selector ends
      // at the first space OUTSIDE braces/quotes
      var depth = 0; var inq = false; var cut = -1
      var j = 0
      while (j < l.length && cut < 0) {
        val ch = l.charAt(j)
        if (inq) { if (ch == '"' && l.charAt(j - 1) != '\\') inq = false }
        else if (ch == '"') inq = true
        else if (ch == '{') depth += 1
        else if (ch == '}') depth -= 1
        else if (ch == ' ' && depth == 0) cut = j
        j += 1
      }
      require(cut > 0, s"line $n: series line needs values: $l")
      (l.substring(0, cut).trim, l.substring(cut + 1).trim)
    }
    while (i < lines.length) {
      val (l, n) = lines(i)
      i += 1
      val parts = l.trim.split("\\s+").toSeq
      parts.head match {
        case "clear" => out += Clear
        case "load" =>
          require(parts.length == 2, s"line $n: load <step>")
          val step = dur(parts(1), n)
          out += Load(step, body().map { case (sl, sn) =>
            splitSeriesLine(sl, sn) })
        case cmd @ ("eval" | "eval_fail" | "eval_ordered") =>
          val fail = cmd == "eval_fail"
          val ordered = cmd == "eval_ordered"
          parts(1) match {
            case "instant" =>
              require(parts(2) == "at", s"line $n: eval instant at <t> <expr>")
              val at = dur(parts(3), n)
              val expr = l.trim.split("\\s+", 5).last
              val exp = body().map { case (el, en) =>
                // a bare number is upstream's SCALAR expectation form
                // (literals.test) — the engine's top-level scalars
                // surface as an empty-label vector row
                val scalar =
                  try Some(num(el)) catch { case _: NumberFormatException => None }
                scalar match {
                  case Some(v) => (Seq.empty[(String, String)], v)
                  case None =>
                    // upstream promtool requires an explicit value token
                    // on every series expectation line (`NaN` spelled
                    // out) — a missing value is a malformed script
                    require(el.contains(" "),
                      s"line $en: instant expectation needs an explicit" +
                        s" value (use NaN literally): $el")
                    val (sel, v) = splitSeriesLine(el, en)
                    (RuleTests.labelsOf(sel).sortBy(_._1), num(v))
                }
              }
              out += EvalInstant(at, expr, exp, fail, ordered)
            case "range" =>
              require(parts(2) == "from" && parts(4) == "to" &&
                parts(6) == "step", s"line $n: eval range from a to b step s")
              val from = dur(parts(3), n); val to = dur(parts(5), n)
              val step = dur(parts(7), n)
              val expr = l.trim.split("\\s+", 9).last
              val exp = body().map { case (el, en) =>
                val (sel, vs) = splitSeriesLine(el, en)
                (RuleTests.labelsOf(sel).sortBy(_._1),
                  RuleTests.expandValues(vs, step).map { case (off, v) =>
                    (from + off, v) })
              }
              out += EvalRange(from, to, step, expr, exp, fail)
            case other =>
              throw new IllegalArgumentException(
                s"line $n: unknown eval form: $other")
          }
        case other =>
          throw new IllegalArgumentException(s"line $n: unknown command: $other")
      }
    }
    out.result()
  }

  // upstream epsilon stance: relative 1e-6, NaN == NaN
  private def close(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b ||
      math.abs(a - b) <= 1e-6 * math.max(math.abs(a), math.abs(b))

  private def fmtLabels(ls: Seq[(String, String)]): String =
    ls.map { case (k, v) => s"""$k="$v"""" }.mkString("{", ", ", "}")

  /** Run a parsed script; returns human-readable failures (empty =
    * conformant). Evaluation uses upstream semantics: 5m lookback,
    * edge-extrapolated rate family. */
  def run(spark: SparkSession, cmds: Seq[Cmd]): Seq[String] = {
    val failures = Seq.newBuilder[String]
    var loaded = Vector.empty[Row]
    var querier: TsQuerier = null
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "labels map<string,string>, t long, v double")

    def rebuild(): Unit = {
      import scala.jdk.CollectionConverters._
      // an empty store is a valid state: literal-only scripts
      // (upstream literals.test) eval with no load at all
      querier = new TsQuerier(TsSchema.canonicalize(
        spark.createDataFrame(loaded.asJava, schema)))
    }
    rebuild()

    def collectInstant(expr: String, atMs: Long)
      : Seq[(Seq[(String, String)], Double)] =
      PromQL.instantQuery(querier, expr, RuleTests.BaseMs + atMs,
          extrapolate = true)
        .collect().toSeq.map { r =>
          val ls = r.getSeq[Row](r.fieldIndex("labels"))
            .map(l => l.getString(0) -> l.getString(1)).sortBy(_._1)
          (ls, r.getDouble(r.fieldIndex("v")))
        }

    cmds.foreach {
      case Clear => loaded = Vector.empty; rebuild()
      case Load(step, series) =>
        series.foreach { case (sel, values) =>
          val labels = RuleTests.labelsOf(sel).toMap
          RuleTests.expandValues(values, step).foreach { case (off, v) =>
            loaded :+= Row(labels, RuleTests.BaseMs + off, v)
          }
        }
        rebuild()
      case EvalInstant(at, expr, want, fail, ordered) =>
        val got =
          try Right(collectInstant(expr, at))
          catch { case e: Exception => Left(e.getMessage) }
        (got, fail) match {
          case (Left(_), true) => () // expected rejection
          case (Left(msg), false) =>
            failures += s"instant `$expr` @${at / 1000}s threw: $msg"
          case (Right(_), true) =>
            failures += s"instant `$expr` @${at / 1000}s: expected failure, evaluated"
          case (Right(rows), false) =>
            // eval_ordered: the engine's DataFrame output carries no row
            // order guarantee (topk/bottomk end in a window FILTER, and
            // partitioned collect order is incidental), so re-sort by
            // value in the expression's declared direction and compare
            // against the script's sequence — checks the ranking the
            // notation asserts without depending on physical row order
            val desc = expr.matches("^(topk|sort_desc)\\b.*")
            val gotC =
              if (ordered)
                rows.sortBy { case (l, v) =>
                  (if (desc) -v else v, l.toString) }
              else rows.sortBy(_._1.toString)
            val wantC = if (ordered) want else want.sortBy(_._1.toString)
            val ok = gotC.length == wantC.length &&
              gotC.zip(wantC).forall { case ((gl, gv), (wl, wv)) =>
                gl == wl && close(gv, wv) }
            if (!ok) failures += s"instant `$expr` @${at / 1000}s: got " +
              gotC.map { case (l, v) => s"${fmtLabels(l)} $v" }
                .mkString("[", "; ", "]") + " want " +
              wantC.map { case (l, v) => s"${fmtLabels(l)} $v" }
                .mkString("[", "; ", "]")
        }
      case EvalRange(from, to, step, expr, want, fail) =>
        val got =
          try Right(PromQL.rangeQuery(querier, expr, RuleTests.BaseMs + from,
              RuleTests.BaseMs + to, step, extrapolate = true)
            .collect().toSeq.map { r =>
              val ls = r.getSeq[Row](r.fieldIndex("labels"))
                .map(l => l.getString(0) -> l.getString(1)).sortBy(_._1)
              (ls, r.getLong(r.fieldIndex("t")) - RuleTests.BaseMs,
                r.getDouble(r.fieldIndex("v")))
            })
          catch { case e: Exception => Left(e.getMessage) }
        (got, fail) match {
          case (Left(_), true) => ()
          case (Left(msg), false) =>
            failures += s"range `$expr`: threw: $msg"
          case (Right(_), true) =>
            failures += s"range `$expr`: expected failure, evaluated"
          case (Right(rows), false) =>
            val bySeries = rows.groupBy(_._1)
              .view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
            want.foreach { case (wl, wvs) =>
              bySeries.get(wl) match {
                case None => failures += s"range `$expr`: series " +
                  s"${fmtLabels(wl)} missing (got ${bySeries.keys.map(fmtLabels).mkString(", ")})"
                case Some(gvs) =>
                  val gm = gvs.toMap
                  wvs.foreach { case (t, wv) =>
                    gm.get(t) match {
                      case Some(gv) if close(gv, wv) => ()
                      case Some(gv) => failures += s"range `$expr` " +
                        s"${fmtLabels(wl)} @${t / 1000}s: got $gv want $wv"
                      case None => failures += s"range `$expr` " +
                        s"${fmtLabels(wl)} @${t / 1000}s: no sample, want $wv"
                    }
                  }
                  // no EXTRA samples at asserted-series steps
                  val extra = gvs.map(_._1).toSet -- wvs.map(_._1).toSet
                  if (extra.nonEmpty) failures += s"range `$expr` " +
                    s"${fmtLabels(wl)}: unexpected samples at " +
                    extra.toSeq.sorted.map(_ / 1000).mkString(", ")
              }
            }
            val extraSeries = bySeries.keySet -- want.map(_._1).toSet
            if (extraSeries.nonEmpty) failures += s"range `$expr`: " +
              s"unexpected series ${extraSeries.map(fmtLabels).mkString(", ")}"
        }
    }
    failures.result()
  }
}
