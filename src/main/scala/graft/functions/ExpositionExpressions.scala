package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parser for ONE line of the Prometheus text exposition format 0.0.4
  * (the `/metrics` scrape + `/federate` wire format; public spec:
  * prometheus docs "Exposition formats"):
  *
  * {{{ metric_name[{label="value",...}] value [timestamp_ms] }}}
  *
  * Returns `struct(labels: map<string,string>, t: long, v: double)`
  * with the metric name under `__name__` — exactly
  * [[graft.streaming.StreamIngest.inputSchema]] — or NULL for
  * comment/blank/malformed lines (callers count nulls to report
  * drops; a scraper must skip bad lines, not fail the batch). A line
  * without a timestamp gets `t` null (the caller stamps scrape time).
  *
  * Faithful to the reference dialect: label values support the `\\`,
  * `\"` and `\n` escapes; values accept Go-style case-insensitive
  * `inf`/`infinity`/`nan` with optional sign plus ordinary
  * decimal/scientific notation; names match `[a-zA-Z_:][a-zA-Z0-9_:]*`
  * (labels without the colon); duplicate label names invalidate the
  * line; an optional trailing comma before `}` is accepted.
  *
  * Extension ladder step (b): a doc-local codegen'd expression — one
  * pass per line, no regex backtracking, no UDF — so a 100 TB scrape
  * archive parses map-side at scan speed. */
case class ExpositionParseExpr(child: Expression,
                               openMetrics: Boolean = false,
                               exemplars: Boolean = false)
  extends UnaryExpression {
  require(!exemplars || openMetrics,
    "exemplars are an OpenMetrics construct (openMetrics must be set)")

  override def dataType: DataType =
    if (exemplars) ExpositionParseExpr.exemplarSchema
    else ExpositionParseExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String =
    if (exemplars) "openmetrics_parse_ex"
    else if (openMetrics) "openmetrics_parse"
    else "exposition_parse"

  // format constraint the code can't show: label *names* never carry
  // escapes, only quoted label values do
  def compute(input: UTF8String): InternalRow = {
    val s = input.toString
    val n = s.length
    var i = 0
    def skipBlanks(): Unit = {
      while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    }
    def nameStart(c: Char, colon: Boolean): Boolean =
      c == '_' || (colon && c == ':') ||
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    def nameChar(c: Char, colon: Boolean): Boolean =
      nameStart(c, colon) || (c >= '0' && c <= '9')
    // `{name="value",...}` block, cursor ON the '{'; false = malformed
    def labelBlock(keys: java.util.ArrayList[UTF8String],
                   vals: java.util.ArrayList[UTF8String],
                   seen: java.util.HashSet[String]): Boolean = {
      i += 1
      var done = false
      while (!done) {
        skipBlanks()
        if (i >= n) return false
        if (s.charAt(i) == '}') { i += 1; done = true }
        else {
          if (!nameStart(s.charAt(i), colon = false)) return false
          val l0 = i
          while (i < n && nameChar(s.charAt(i), colon = false)) i += 1
          val lname = s.substring(l0, i)
          if (!seen.add(lname)) return false
          skipBlanks()
          if (i >= n || s.charAt(i) != '=') return false
          i += 1
          skipBlanks()
          if (i >= n || s.charAt(i) != '"') return false
          i += 1
          val sb = new java.lang.StringBuilder()
          var closed = false
          while (!closed) {
            if (i >= n) return false
            val c = s.charAt(i)
            if (c == '"') { closed = true; i += 1 }
            else if (c == '\\') {
              if (i + 1 >= n) return false
              s.charAt(i + 1) match {
                case '\\' => sb.append('\\')
                case '"'  => sb.append('"')
                case 'n'  => sb.append('\n')
                case other => sb.append('\\').append(other) // lenient: literal
              }
              i += 2
            } else { sb.append(c); i += 1 }
          }
          keys.add(UTF8String.fromString(lname))
          vals.add(UTF8String.fromString(sb.toString))
          skipBlanks()
          if (i < n && s.charAt(i) == ',') i += 1
          else if (i < n && s.charAt(i) == '}') { i += 1; done = true }
          else return false
        }
      }
      true
    }
    def toMap(keys: java.util.ArrayList[UTF8String],
              vals: java.util.ArrayList[UTF8String]): ArrayBasedMapData = {
      val ka = new Array[AnyRef](keys.size()); keys.toArray(ka)
      val va = new Array[AnyRef](vals.size()); vals.toArray(va)
      new ArrayBasedMapData(new GenericArrayData(ka), new GenericArrayData(va))
    }
    skipBlanks()
    if (i >= n || s.charAt(i) == '#') return null
    // metric name
    if (!nameStart(s.charAt(i), colon = true)) return null
    val nm0 = i
    while (i < n && nameChar(s.charAt(i), colon = true)) i += 1
    val metric = s.substring(nm0, i)
    val keys = new java.util.ArrayList[UTF8String]()
    val vals = new java.util.ArrayList[UTF8String]()
    val seen = new java.util.HashSet[String]()
    keys.add(UTF8String.fromString("__name__"))
    vals.add(UTF8String.fromString(metric))
    seen.add("__name__")
    skipBlanks()
    if (i < n && s.charAt(i) == '{' && !labelBlock(keys, vals, seen))
      return null
    skipBlanks()
    if (i >= n) return null // no value
    val v0 = i
    while (i < n && s.charAt(i) != ' ' && s.charAt(i) != '\t') i += 1
    val value = ExpositionParseExpr.parseValue(s.substring(v0, i))
    if (value.isNaN && !ExpositionParseExpr.isNanToken(s.substring(v0, i)))
      return null
    skipBlanks()
    var ts: java.lang.Long = null
    if (i < n && !(openMetrics && s.charAt(i) == '#')) {
      val t0 = i
      if (openMetrics) {
        // OpenMetrics 1.0: timestamp is DECIMAL SECONDS (float allowed)
        while (i < n && s.charAt(i) != ' ' && s.charAt(i) != '\t') i += 1
        val sec = ExpositionParseExpr.parseValue(s.substring(t0, i))
        if (sec.isNaN || sec.isInfinite) return null
        ts = java.lang.Long.valueOf(math.round(sec * 1000.0))
      } else {
        if (s.charAt(i) == '+' || s.charAt(i) == '-') i += 1
        while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
        if (i == t0 || (i == t0 + 1 && !Character.isDigit(s.charAt(t0)))) return null
        try ts = java.lang.Long.valueOf(s.substring(t0, i))
        catch { case _: NumberFormatException => return null }
      }
      skipBlanks()
    }
    var exMap: ArrayBasedMapData = null
    var exV: java.lang.Double = null
    var exT: java.lang.Long = null
    if (i < n) {
      if (openMetrics && s.charAt(i) == '#') {
        if (!exemplars) i = n
        // OpenMetrics exemplar tail: `# {labels} value [ts_seconds]`
        else {
          i += 1; skipBlanks()
          if (i >= n || s.charAt(i) != '{') return null
          val ek = new java.util.ArrayList[UTF8String]()
          val ev = new java.util.ArrayList[UTF8String]()
          if (!labelBlock(ek, ev, new java.util.HashSet[String]())) return null
          skipBlanks()
          if (i >= n) return null // exemplar value is required
          val e0 = i
          while (i < n && s.charAt(i) != ' ' && s.charAt(i) != '\t') i += 1
          val exval = ExpositionParseExpr.parseValue(s.substring(e0, i))
          if (exval.isNaN && !ExpositionParseExpr.isNanToken(s.substring(e0, i)))
            return null
          exV = exval
          skipBlanks()
          if (i < n) {
            val t0 = i
            while (i < n && s.charAt(i) != ' ' && s.charAt(i) != '\t') i += 1
            val sec = ExpositionParseExpr.parseValue(s.substring(t0, i))
            if (sec.isNaN || sec.isInfinite) return null
            exT = java.lang.Long.valueOf(math.round(sec * 1000.0))
            skipBlanks()
            if (i < n) return null // trailing junk after exemplar
          }
          exMap = toMap(ek, ev)
        }
      }
      else return null // classic dialect: trailing junk
    }
    if (exemplars)
      InternalRow(toMap(keys, vals),
        if (ts == null) null else ts.longValue(): java.lang.Long,
        value, exMap, exV, exT)
    else
      InternalRow(toMap(keys, vals),
        if (ts == null) null else ts.longValue(): java.lang.Long,
        value)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("expoParse", this, classOf[ExpositionParseExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $self.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExpositionParseExpr {
  val schema: StructType = StructType(Seq(
    StructField("labels", MapType(StringType, StringType, valueContainsNull = false),
      nullable = false),
    StructField("t", LongType, nullable = true),
    StructField("v", DoubleType, nullable = false)))

  /** [[schema]] + the OpenMetrics exemplar tail (null fields when the
    * line carries no exemplar). */
  val exemplarSchema: StructType = StructType(schema.fields ++ Seq(
    StructField("ex_labels", MapType(StringType, StringType, valueContainsNull = false),
      nullable = true),
    StructField("ex_v", DoubleType, nullable = true),
    StructField("ex_t", LongType, nullable = true)))

  private[functions] def isNanToken(tok: String): Boolean = {
    val t = if (tok.startsWith("+") || tok.startsWith("-")) tok.substring(1) else tok
    t.equalsIgnoreCase("nan")
  }

  /** Go strconv.ParseFloat dialect: case-insensitive inf/infinity/nan
    * with optional sign, else standard decimal/scientific. Returns NaN
    * for unparseable input — the caller distinguishes a real NaN token
    * via [[isNanToken]]. */
  private[functions] def parseValue(tok: String): Double = {
    if (tok.isEmpty) return Double.NaN
    val neg = tok.startsWith("-")
    val body = if (neg || tok.startsWith("+")) tok.substring(1) else tok
    if (body.isEmpty) return Double.NaN // a bare sign is not a number
    if (body.equalsIgnoreCase("inf") || body.equalsIgnoreCase("infinity"))
      return if (neg) Double.NegativeInfinity else Double.PositiveInfinity
    if (body.equalsIgnoreCase("nan")) return Double.NaN
    // Java accepts a trailing d/f suffix the exposition format does not
    val last = body.charAt(body.length - 1)
    if (last == 'd' || last == 'D' || last == 'f' || last == 'F') return Double.NaN
    try java.lang.Double.parseDouble(tok)
    catch { case _: NumberFormatException => Double.NaN }
  }
}

/** Parser for ONE metadata comment line of the exposition format:
  * `# HELP <name> <docstring>` / `# TYPE <name> <type>` /
  * `# UNIT <name> <unit>` (UNIT is OpenMetrics 1.0). Returns
  * `struct(kind, metric, text)` or NULL for every other line —
  * samples, blanks, plain comments, `# EOF`. HELP docstrings unescape
  * `\\` and `\n` LEFT-TO-RIGHT (the upstream rule: `\\n` is
  * backslash-n, not backslash-newline — a naive double-replace gets
  * this wrong). Same codegen'd one-pass shape as
  * [[ExpositionParseExpr]]. */
case class ExpoMetaParseExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ExpoMetaParseExpr.schema
  override def nullable: Boolean = true
  override def prettyName: String = "exposition_meta_parse"

  def compute(input: UTF8String): InternalRow = {
    val s = input.toString
    val n = s.length
    var i = 0
    while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    if (i >= n || s.charAt(i) != '#') return null
    i += 1
    while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    val k0 = i
    while (i < n && s.charAt(i) != ' ' && s.charAt(i) != '\t') i += 1
    val kind = s.substring(k0, i)
    if (kind != "HELP" && kind != "TYPE" && kind != "UNIT") return null
    while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    val m0 = i
    while (i < n && s.charAt(i) != ' ' && s.charAt(i) != '\t') i += 1
    if (i == m0) return null // no metric name
    val metric = s.substring(m0, i)
    if (i < n) i += 1 // single separator space; rest is the text verbatim
    val raw = s.substring(math.min(i, n))
    val text =
      if (kind == "HELP" && raw.indexOf('\\') >= 0) {
        val sb = new java.lang.StringBuilder(raw.length)
        var j = 0
        while (j < raw.length) {
          val c = raw.charAt(j)
          if (c == '\\' && j + 1 < raw.length) {
            raw.charAt(j + 1) match {
              case '\\' => sb.append('\\'); j += 2
              case 'n'  => sb.append('\n'); j += 2
              case other => sb.append('\\').append(other); j += 2 // lenient
            }
          } else { sb.append(c); j += 1 }
        }
        sb.toString
      } else raw
    InternalRow(UTF8String.fromString(kind), UTF8String.fromString(metric),
      UTF8String.fromString(text))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("expoMetaParse", this, classOf[ExpoMetaParseExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $self.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExpoMetaParseExpr {
  val schema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("metric", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))
}

object ExpositionExpressions {
  /** struct(labels, t, v) from one exposition-format line; null for
    * comment/blank/malformed lines. */
  def exposition_parse(line: Column): Column =
    GraftSqlBridge.column(ExpositionParseExpr(
      GraftSqlBridge.expression(line.cast("string"))))

  /** OpenMetrics 1.0 dialect: decimal-SECONDS timestamps (converted to
    * ms), exemplar tails (` # {...} v t`) accepted and ignored,
    * `# EOF` dropping out as any other comment. */
  def openmetrics_parse(line: Column): Column =
    GraftSqlBridge.column(ExpositionParseExpr(
      GraftSqlBridge.expression(line.cast("string")), openMetrics = true))

  /** `# HELP`/`# TYPE`/`# UNIT` metadata comment lines →
    * `struct(kind, metric, text)`; NULL for everything else. */
  def exposition_meta_parse(line: Column): Column =
    GraftSqlBridge.column(ExpoMetaParseExpr(
      GraftSqlBridge.expression(line.cast("string"))))

  /** OpenMetrics parse that KEEPS the exemplar tail: the sample struct
    * plus `(ex_labels, ex_v, ex_t)` — null when the line has none. */
  def openmetrics_parse_ex(line: Column): Column =
    GraftSqlBridge.column(ExpositionParseExpr(
      GraftSqlBridge.expression(line.cast("string")),
      openMetrics = true, exemplars = true))
}
