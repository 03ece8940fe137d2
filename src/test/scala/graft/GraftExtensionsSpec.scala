package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function surface registered by [[GraftExtensions]]. Builds a
  * second session over the shared context (extensions apply at session
  * build, so the shared SparkSpec session can't be reused). */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[T](f: SparkSession => T): T = {
    val base = SparkSpec.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions().apply(_))
        .getOrCreate()
      f(s)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("graft_cosine is callable from SQL and matches the HOF formulation") {
    withExtendedSession { s =>
      val r = s.sql(
        """SELECT graft_cosine(array(1.0d, 0.0d, 2.0d), array(2.0d, 1.0d, 4.0d)) AS c"""
      ).head().getDouble(0)
      val expected = 10.0 / (math.sqrt(5.0) * math.sqrt(21.0))
      assert(math.abs(r - expected) < 1e-12)
    }
  }

  test("chunk codec round-trips through SQL") {
    withExtendedSession { s =>
      val out = s.sql(
        """SELECT graft_decode_chunk(graft_encode_chunk(
          |  array(named_struct('t', 1000L, 'v', 1.5d),
          |        named_struct('t', 2000L, 'v', 2.5d)))) AS ss""".stripMargin)
        .selectExpr("inline(ss)").collect()
      assert(out.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        Seq((1000L, 1.5), (2000L, 2.5)))
    }
  }
}
