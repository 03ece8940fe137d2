package graft.promql

import org.scalatest.funsuite.AnyFunSuite

/** [[Format]]'s contract: for every query the parser accepts,
  * `parse(format(parse(q))) == parse(q)` (structural AST equality),
  * and formatting is a fixpoint (`format . parse . format = format`). */
class FormatSpec extends AnyFunSuite {

  private def roundTrip(q: String): Unit = {
    val ast = PromQL.parse(q)
    val printed = Format.format(ast)
    val back =
      try PromQL.parse(printed)
      catch { case e: Exception =>
        fail(s"format of `$q` printed unparseable `$printed`: ${e.getMessage}") }
    assert(back == ast, s"`$q` -> `$printed` reparsed differently")
    // fixpoint: printing the reparse changes nothing further
    assert(Format.format(back) == printed, s"`$printed` is not a fixpoint")
  }

  test("round-trip: every AST node and modifier") {
    Seq(
      // selectors: metric form, brace form, matcher operators, range,
      // offset (both signs), @ (number / start / end), modifier order
      "up",
      """up{job="api"}""",
      """{__name__=~"req.*",env!="dev",inst!~"i-[0-9]+"}""",
      """{__name__="not an ident"}""",         // stays in brace form
      """rate(req{job="api"}[5m])""",
      "mem[90s] offset 2m",
      "mem offset -1h30m",
      "mem @ 1704844800",
      "mem @ 1704844800.5 offset 1d",
      "mem @ start()", "mem[2m] @ end()",
      // reserved-word metric names survive via brace form
      """up / {__name__="on"}""",
      """up + {__name__="bool"}""",
      // range/scalar/calendar functions, packed params
      "increase(req[1h])",
      "quantile_over_time(0.99, req[10m])",
      "predict_linear(disk[4h], 3600)",
      "double_exponential_smoothing(mem[1h], 0.5, 0.1)",
      "holt_winters(mem[1h], 0.5, 0.1)",       // canonicalizes to d_e_s
      "mad_over_time(req[5m])", "ts_of_max_over_time(req[5m])",
      "clamp(mem, 0, 100)", "round(mem, 0.5)", "abs(mem)", "sgn(mem)",
      "hour()", "day_of_week(vector(time()))", "timestamp(up)",
      // aggregations: clauses, params, count_values, limitk
      "sum(rate(req[5m]))",
      "sum by (job, inst) (req)",
      "avg without (inst) (req)",
      "topk(3, req)", "quantile(0.9, req)", "limit_ratio(0.5, req)",
      """count_values("code", req)""",
      """count_values("code", req) by (job)""",
      // binary operators: precedence, bool, matching, group, keywords
      "a + b * c",
      "(a + b) * c",
      "a ^ b ^ c",
      "-a + b",
      "a > bool 0.5",
      "a / on(job) b",
      "a / ignoring(inst, env) b",
      "a / on(job) group_left b",
      "a / on(job) group_left(env) b",
      "a and b or c unless d",
      "a atan2 b",
      "2 ^ -1",                                 // unary in operand
      // histogram family
      "histogram_quantile(0.9, rate(lat_bucket[5m]))",
      "histogram_fraction(0.5, 1.5, lat)",
      "histogram_count(lat)", "histogram_avg(lat)", "histogram_stdvar(lat)",
      // absent / sort / label fns / info / vector / scalar / time
      "absent(up)", """absent_over_time(up{job="x"}[1h])""",
      "sort(req)", "sort_desc(req)",
      """sort_by_label(req, "job", "inst")""",
      """label_replace(up, "dst", "$1", "src", "(.*)")""",
      """label_join(up, "dst", "-", "a", "b")""",
      "info(up)", """info(up, {k8s_cluster_name="c"})""",
      "scalar(req) * vector(1)",
      "vector(time())",
      "pi()",
      // subqueries: bare, composite, default step, offset
      "avg_over_time(mem[30m:5m])",
      "avg_over_time(mem[30m:])",
      "max_over_time(rate(req[5m])[30m:5m] offset 1h)",
      "min_over_time((a + b)[10m:1m])",
      // string escaping in matchers and function args
      """up{path="c:\\temp\\\"x\""}""",
      """count_values("la:bel", req)""",
      // numbers: negative, scientific, Inf/NaN in param position
      "clamp(mem, -1e9, 1e9)",
      "topk(2.5, req)",
      "clamp(mem, -Inf, Inf)",
      "histogram_quantile(NaN, lat)" // NaN survives textually (see below)
    ).foreach { q =>
      val ast = PromQL.parse(q)
      val printed = Format.format(ast)
      val back = PromQL.parse(printed)
      // NaN != NaN breaks structural equality; compare print fixpoint
      if (q.contains("NaN")) assert(Format.format(back) == printed, q)
      else { assert(back == ast, s"`$q` -> `$printed`")
             assert(Format.format(back) == printed, s"`$printed` not fixpoint") }
    }
  }

  test("group_left with empty copy-list prints defensive parens") {
    // `group_left (b + c)` is a parse AMBIGUITY (the paren reads as the
    // label-copy list); the formatter always prints `group_left()` so a
    // parenthesized right operand survives
    val ast = PromExpr.Bin("/", PromQL.parse("a"),
      PromQL.parse("b + c"), Some(Seq("job")), group = Some("left"))
    val printed = Format.format(ast)
    assert(printed == "a / on(job) group_left() (b + c)", printed)
    assert(PromQL.parse(printed) == ast)
  }

  test("property: grammar-fuzzed queries round-trip structurally") {
    val rnd = new scala.util.Random(23)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    def sel(): String = {
      val m = pick(Seq("req", "mem", "up"))
      val matcher = pick(Seq("", """{inst="i-0"}""", """{inst=~"i-.*"}""",
        """{inst!="i-9",env!~"d.*"}"""))
      val mod = pick(Seq("", "", " offset 2m", " offset -30s",
        " @ 1704844800", " @ start()", " offset 1m @ end()"))
      s"$m$matcher$mod"
    }
    val ranges = Seq("2m", "5m", "90s", "1h30m")
    def gen(depth: Int): String =
      if (depth <= 0) sel()
      else pick[() => String](Seq(
        () => sel(),
        () => s"${pick(Seq("rate", "increase", "delta", "avg_over_time",
          "max_over_time", "present_over_time"))}(${sel()}[${pick(ranges)}])",
        () => s"quantile_over_time(0.5, ${sel()}[${pick(ranges)}])",
        () => s"predict_linear(${sel()}[${pick(ranges)}], 600)",
        () => s"${pick(Seq("sum", "min", "max", "group"))} by (inst) (${gen(depth - 1)})",
        () => s"${pick(Seq("avg", "count", "stddev"))} without (env) (${gen(depth - 1)})",
        () => s"topk(2, ${gen(depth - 1)})",
        () => s"limitk(3, ${gen(depth - 1)})",
        () => s"""count_values("v", ${gen(depth - 1)})""",
        () => s"(${gen(depth - 1)}) ${pick(Seq("+", "-", "*", "/", "%", "^",
          ">", "<=", "and", "or", "unless", "atan2"))} (${gen(depth - 1)})",
        () => s"(${gen(depth - 1)}) > bool (${gen(depth - 1)})",
        () => s"(${gen(depth - 1)}) / on(inst) group_left(env) (${gen(depth - 1)})",
        () => s"(${gen(depth - 1)}) * ignoring(env) (${gen(depth - 1)})",
        () => s"${pick(Seq("abs", "ceil", "floor", "exp", "sqrt", "sgn"))}(${gen(depth - 1)})",
        () => s"clamp(${gen(depth - 1)}, -10, 1e3)",
        () => s"histogram_quantile(0.9, ${gen(depth - 1)})",
        () => s"histogram_stddev(${sel()})",
        () => s"scalar(${gen(depth - 1)}) * vector(${rnd.nextInt(10)})",
        () => s"avg_over_time((${gen(depth - 1)})[4m:1m])",
        () => s"-(${gen(depth - 1)})",
        () => s"""label_replace(${gen(depth - 1)}, "dst", "$$1", "inst", "(.*)")""",
        () => s"""sort_by_label(${gen(depth - 1)}, "inst")""",
        () => s"absent(${sel().takeWhile(_ != ' ')})"
      ))()
    (0 until 300).foreach { i =>
      val q = gen(3)
      val ast = try PromQL.parse(q) catch {
        case _: IllegalArgumentException => null } // fuzz may hit arg-shape rules
      if (ast != null) {
        val printed = Format.format(ast)
        val back =
          try PromQL.parse(printed)
          catch { case e: Exception =>
            fail(s"#$i format of `$q` printed unparseable `$printed`: ${e.getMessage}") }
        assert(back == ast, s"#$i `$q` -> `$printed` reparsed differently")
      }
    }
  }

  test("duration rendering is compact and exact") {
    assert(Format.duration(0) == "0s")
    assert(Format.duration(1) == "1ms")
    assert(Format.duration(90000) == "1m30s")
    assert(Format.duration(90061001L) == "1d1h1m1s1ms")
    assert(Format.duration(14L * 86400000L) == "2w")
    // parse . format = identity on durations
    for (ms <- Seq(1L, 999L, 1000L, 61000L, 3600000L, 86400000L + 1,
                   7L * 86400000L, 123456789L))
      assert(PromQL.parse(s"x[${Format.duration(ms)}]") ==
        PromQL.parse(s"x[${ms}ms]"))
  }

  test("format_query and parse_query endpoints") {
    val server = new graft.remote.RemoteReadServer(null)
    val port = server.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def get(pq: String) = http.send(
        java.net.http.HttpRequest.newBuilder(
          new java.net.URI(s"http://127.0.0.1:$port$pq")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val enc = java.net.URLEncoder.encode(
        "sum by(job)(rate(req{env=\"p\"}[5m]))", "UTF-8")
      val fq = get(s"/api/v1/format_query?query=$enc")
      assert(fq.statusCode() == 200, fq.body())
      assert(fq.body() ==
        """{"status":"success","data":"sum by (job)(rate(req{env=\"p\"}[5m]))"}""")
      val pq = get(s"/api/v1/parse_query?query=$enc")
      assert(pq.statusCode() == 200, pq.body())
      assert(pq.body().contains(""""type":"aggregation""""))
      assert(pq.body().contains(""""grouping":["job"]"""))
      assert(pq.body().contains(""""type":"matrixSelector""""))
      assert(pq.body().contains(""""name":"env""""))
      assert(get("/api/v1/format_query?query=sum%28").statusCode() == 400)
      assert(get("/api/v1/format_query").statusCode() == 400)
    } finally server.stop()
  }
}
