package graft.tsdb

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Label model semantics (reference: labels.Compare order, canonical form,
  * absent ≡ empty; SURVEY.md §1.1). */
class LabelsSpec extends AnyFunSuite {
  private val ord = Labels.ordering

  test("canonical: sorts by name and drops empty values") {
    val ls = Seq(Label("job", "api"), Label("__name__", "up"), Label("gone", ""))
    assert(Labels.canonical(ls) == Seq(Label("__name__", "up"), Label("job", "api")))
  }

  test("compare: element-wise (name, value), shorter set first") {
    val a = Seq(Label("a", "1"))
    val b = Seq(Label("a", "1"), Label("b", "2"))
    val c = Seq(Label("a", "2"))
    assert(ord.compare(a, b) < 0) // prefix is smaller
    assert(ord.compare(a, c) < 0) // value compare
    assert(ord.compare(Seq(Label("a", "1")), Seq(Label("b", "0"))) < 0) // name first
    assert(ord.compare(a, a) == 0)
  }

  test("fingerprint: stable, order-insensitive via canonicalization, collision-free on fixture") {
    val a = Seq(Label("job", "api"), Label("instance", "i-1"))
    val b = Seq(Label("instance", "i-1"), Label("job", "api"))
    assert(Labels.fingerprint(a) == Labels.fingerprint(b))
    // distinct label sets from the fixture profile all get distinct fingerprints
    val sets = for {
      job <- Seq("api", "api-canary", "web"); inst <- (0 to 9).map("i-" + _)
      code <- Seq("200", "400", "500")
    } yield Seq(Label("__name__", "http_requests_total"), Label("job", job),
      Label("instance", inst), Label("code", code))
    assert(sets.map(Labels.fingerprint).distinct.size == sets.size)
  }

  test("fingerprint: separator prevents (ab,c) == (a,bc) collisions") {
    assert(Labels.fingerprint(Seq(Label("ab", "c"))) !=
      Labels.fingerprint(Seq(Label("a", "bc"))))
  }

  test("property: ordering is a total order consistent with equality") {
    val labelGen = Gen.listOfN(3, for {
      n <- Gen.alphaStr.map(_.take(3)); v <- Gen.alphaStr.map(_.take(3))
    } yield Label(n, v)).map(ls => Labels.canonical(ls))
    (1 to 300).foreach { i =>
      val a = labelGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i)).get
      val b = labelGen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i + 1000)).get
      assert(math.signum(ord.compare(a, b)) == -math.signum(ord.compare(b, a)))
      if (ord.compare(a, b) == 0) assert(a == b)
    }
  }
}

class MatchersSpec extends AnyFunSuite {
  test("equality / negation") {
    assert(LabelMatcher.eq("job", "api").matches("api"))
    assert(!LabelMatcher.eq("job", "api").matches("api-canary"))
    assert(LabelMatcher.neq("job", "api").matches("web"))
  }

  test("regex is anchored (Prometheus semantics, documented deviation from reference bug)") {
    val m = LabelMatcher.re("job", "api")
    assert(m.matches("api"))
    assert(!m.matches("api-canary")) // unanchored would match
    assert(LabelMatcher.re("job", "api.*").matches("api-canary"))
    assert(!LabelMatcher.re("job", "pi.*").matches("api"))
  }

  test("not-regex, prefix, absent") {
    assert(LabelMatcher.notRe("job", "api.*").matches("web"))
    assert(!LabelMatcher.notRe("job", "api.*").matches("api2"))
    assert(LabelMatcher.prefix("job", "api").matches("api-canary"))
    assert(LabelMatcher.absent("mode").matches(""))
    assert(!LabelMatcher.absent("mode").matches("user"))
  }

  test("anchoring wraps with non-capturing group (alternation safe)") {
    // "a|b" unanchored would match "xa"; anchored must not
    val m = LabelMatcher.re("l", "a|b")
    assert(m.matches("a") && m.matches("b") && !m.matches("xa") && !m.matches("ab"))
  }
}
