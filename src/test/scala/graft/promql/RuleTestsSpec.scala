package graft.promql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[RuleTests]] — the `promtool test rules` analog: series notation,
  * test-file parse, expression + alert assertions through the real
  * evaluator, and failure reporting. */
class RuleTestsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("series values notation expands like promtool") {
    def vals(s: String) = RuleTests.expandValues(s, 1000L)
    assert(vals("1 2 3") == Seq((0L, 1.0), (1000L, 2.0), (2000L, 3.0)))
    // a+bxc: start then c more samples stepping b
    assert(vals("1+1x3") == Seq((0L, 1.0), (1000L, 2.0), (2000L, 3.0), (3000L, 4.0)))
    assert(vals("10-2x2") == Seq((0L, 10.0), (1000L, 8.0), (2000L, 6.0)))
    // axc repeats the constant
    assert(vals("5x2") == Seq((0L, 5.0), (1000L, 5.0), (2000L, 5.0)))
    // gaps consume a slot without emitting
    assert(vals("1 _ 3") == Seq((0L, 1.0), (2000L, 3.0)))
    // leading sign belongs to the start value
    assert(vals("-2+1x2") == Seq((0L, -2.0), (1000L, -1.0), (2000L, 0.0)))
  }

  private val testYaml =
    """rule_files: [rules.yml]
      |evaluation_interval: 1m
      |tests:
      |  - interval: 1m
      |    input_series:
      |      - series: 'errs{job="a"}'
      |        values: '0+10x10'      # 0 10 20 ... 100
      |      - series: 'errs{job="b"}'
      |        values: '0x10'
      |    promql_expr_test:
      |      - expr: sum(errs)
      |        eval_time: 5m
      |        exp_samples:
      |          - labels: '{}'
      |            value: 50
      |      - expr: errs
      |        eval_time: 2m
      |        exp_samples:
      |          - labels: 'errs{job="a"}'
      |            value: 20
      |          - labels: 'errs{job="b"}'
      |            value: 0
      |      - expr: 'job:errs:sum'   # recording rule participates
      |        eval_time: 4m
      |        exp_samples:
      |          - labels: 'job:errs:sum{job="a", team="infra"}'
      |            value: 40
      |          - labels: 'job:errs:sum{job="b", team="infra"}'
      |            value: 0
      |    alert_rule_test:
      |      - eval_time: 10m
      |        alertname: ErrsHigh
      |        exp_alerts:
      |          - exp_labels: { job: a, severity: page }
      |      - eval_time: 1m          # held only 1m, for=3m -> nothing
      |        alertname: ErrsHigh
      |        exp_alerts:
      |""".stripMargin

  private val rulesYaml =
    """groups:
      |  - name: g
      |    interval: 1m
      |    rules:
      |      - record: job:errs:sum
      |        expr: sum by (job) (errs)
      |        labels:
      |          team: infra
      |      - alert: ErrsHigh
      |        expr: errs > 25
      |        for: 3m
      |        labels:
      |          severity: page
      |""".stripMargin

  test("test file parses: rule_files, cases, notation, exp blocks") {
    val tf = RuleTests.parse(testYaml, "t.yml")
    assert(tf.ruleFiles == Seq("rules.yml"))
    assert(tf.cases.size == 1)
    val tc = tf.cases.head
    assert(tc.intervalMs == 60000L)
    assert(tc.inputSeries.map(_._1) ==
      Seq("""errs{job="a"}""", """errs{job="b"}"""))
    assert(tc.exprTests.map(_.expr) ==
      Seq("sum(errs)", "errs", "job:errs:sum"))
    assert(tc.exprTests(1).expSamples.size == 2)
    assert(tc.alertTests.map(_.evalTimeMs) == Seq(600000L, 60000L))
    assert(tc.alertTests.head.expAlerts ==
      Seq(Seq("job" -> "a", "severity" -> "page")))
    assert(tc.alertTests(1).expAlerts.isEmpty)
  }

  test("run: expression, recording-rule and alert assertions all pass") {
    val tf = RuleTests.parse(testYaml, "t.yml")
    val failures = RuleTests.run(spark, tf,
      rf => { assert(rf == "rules.yml"); Rules.parse(rulesYaml) })
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("run: a wrong expectation is reported with got/want") {
    val bad = testYaml.replace("value: 50", "value: 51")
    val failures = RuleTests.run(spark, RuleTests.parse(bad),
      _ => Rules.parse(rulesYaml))
    assert(failures.size == 1)
    assert(failures.head.what.contains("sum(errs)") &&
      failures.head.what.contains("want"), failures.head.what)
  }

  test("ToolMain test-rules drives files end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("ruletests")
    java.nio.file.Files.writeString(dir.resolve("rules.yml"), rulesYaml)
    java.nio.file.Files.writeString(dir.resolve("t.yml"), testYaml)
    val lines = Seq.newBuilder[String]
    val code = graft.ToolMain.run(spark,
      Array("test-rules", dir.resolve("t.yml").toString), lines += _)
    assert(code == 0, lines.result().mkString("\n"))
    assert(lines.result().head.contains("SUCCESS"))
    // failing file -> exit 1 with the failure detail
    java.nio.file.Files.writeString(dir.resolve("bad.yml"),
      testYaml.replace("value: 50", "value: 99"))
    val lines2 = Seq.newBuilder[String]
    val code2 = graft.ToolMain.run(spark,
      Array("test-rules", dir.resolve("bad.yml").toString), lines2 += _)
    assert(code2 == 1 && lines2.result().head.startsWith("FAILED"))
  }
}
