package graft.promql

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PromQL conformance: the upstream test NOTATION
  * ([[PromqlTestFormat]]) run against this engine's evaluator. The
  * battery (src/test/resources/promql/conformance.test) is
  * self-authored and covers selectors/matchers, lookback, offset,
  * every aggregation form (by/without, topk/bottomk ordered,
  * quantile, stddev/stdvar, group), arithmetic/comparison/set binary
  * ops with on/ignoring/group_left and bool, the scalar/vector bridge
  * functions, label_replace/label_join, sort forms, the full
  * `_over_time` family, the extrapolated rate family (including the
  * counter-reset and extrapolation-cap corners), histogram_quantile,
  * range queries, and parse/type rejections.
  *
  * Deliberate deviations from upstream promtool are listed in the
  * [[PromqlTestFormat]] Scaladoc (native-histogram literals excluded
  * here — they have their own oracle battery — and `extrapolate` is
  * opt-in engine-side, forced ON here for upstream parity). */
class PromqlConformanceSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  private def load(name: String): String = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("upstream-notation conformance battery is green") {
    val cmds = PromqlTestFormat.parse(load("/promql/conformance.test"))
    // the battery must actually exercise the surface
    assert(cmds.count(_.isInstanceOf[PromqlTestFormat.EvalInstant]) >= 60)
    assert(cmds.count(_.isInstanceOf[PromqlTestFormat.EvalRange]) >= 4)
    assert(cmds.exists(_ == PromqlTestFormat.Clear))
    val failures = PromqlTestFormat.run(spark, cmds)
    assert(failures.isEmpty,
      s"\n${failures.size} conformance failures:\n" +
        failures.mkString("  - ", "\n  - ", ""))
  }

  test("notation: '#' inside quoted label values is not a comment") {
    val cmds = PromqlTestFormat.parse(
      """load 1m
        |  m{path="/a#b"} 1 2 3   # a real comment
        |""".stripMargin)
    val l = cmds.head.asInstanceOf[PromqlTestFormat.Load]
    assert(l.series.head._1 == """m{path="/a#b"}""")
    assert(l.series.head._2 == "1 2 3")
  }

  test("notation: expanding values, gaps, signs, series split") {
    val cmds = PromqlTestFormat.parse(
      """load 30s
        |  m{a="b", c="d e"} 1 _ 3+1x2 8-2x1
        |
        |eval instant at 0 m
        |  m{a="b", c="d e"} 1
        |""".stripMargin)
    val l = cmds.head.asInstanceOf[PromqlTestFormat.Load]
    assert(l.stepMs == 30000L)
    assert(l.series.head._2 == "1 _ 3+1x2 8-2x1")
    val e = cmds(1).asInstanceOf[PromqlTestFormat.EvalInstant]
    assert(e.expr == "m" && e.atMs == 0L)
    assert(e.expected.head._1.toMap ==
      Map("__name__" -> "m", "a" -> "b", "c" -> "d e"))
  }
}
