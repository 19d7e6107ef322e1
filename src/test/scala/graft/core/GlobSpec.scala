package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.GraphiteOps

/** Glob-to-regex kernel vs a naive recursive glob matcher (the same
  * oracle style as the reference's filter tests). */
class GlobSpec extends AnyFunSuite {

  /** Minimal scalacheck bridge (scalatestplus isn't in the offline cache). */
  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  /** Naive reference matcher for the graphite glob subset: `*` = one
    * segment wildcard, `?` = one char, `{a,b}` = alternation. */
  private def naiveMatch(glob: String, path: String): Boolean = {
    def expandAlts(g: String): Seq[String] = {
      val open = g.indexOf('{')
      if (open < 0) Seq(g)
      else {
        val close = g.indexOf('}', open)
        val alts = g.substring(open + 1, close).split(",", -1)
        alts.toSeq.flatMap(a => expandAlts(g.substring(0, open) + a + g.substring(close + 1)))
      }
    }
    def segMatch(g: String, s: String): Boolean = {
      def go(gi: Int, si: Int): Boolean =
        if (gi == g.length) si == s.length
        else g.charAt(gi) match {
          case '*' => (si to s.length).exists(k => go(gi + 1, k))
          case '?' => si < s.length && go(gi + 1, si + 1)
          case c   => si < s.length && s.charAt(si) == c && go(gi + 1, si + 1)
        }
      go(0, 0)
    }
    expandAlts(glob).exists { g =>
      val gs = g.split("\\.", -1)
      val ps = path.split("\\.", -1)
      gs.length == ps.length && gs.zip(ps).forall { case (a, b) => segMatch(a, b) }
    }
  }

  private val segGen = Gen.oneOf("cpu", "load", "host1", "h?st*", "*", "a?c", "x", "*st*")
  private val globGen = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, segGen)).map(_.mkString("."))
  private val pathSeg = Gen.oneOf("cpu", "load", "host1", "hast9", "abc", "x", "yy", "hst")
  private val pathGen = Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, pathSeg)).map(_.mkString("."))

  test("globToRegex equals the naive matcher on random glob/path pairs") {
    checkProp(Prop.forAll(globGen, pathGen) { (glob: String, path: String) =>
      GraphiteOps.globToRegex(glob).r.matches(path) == naiveMatch(glob, path)
    })
  }

  test("comma is literal outside braces; glob metas literal inside classes") {
    // `a,b` is the literal path "a,b", NOT an alternation
    assert(GraphiteOps.globToRegex("a,b").r.matches("a,b"))
    assert(!GraphiteOps.globToRegex("a,b").r.matches("a"))
    // but inside braces it alternates, including nested context
    assert(GraphiteOps.globToRegex("{a,b},c").r.matches("a,c"))
    assert(GraphiteOps.globToRegex("{a,b},c").r.matches("b,c"))
    // `*` and `?` inside a character class are literal characters
    assert(GraphiteOps.globToRegex("m[*]x").r.matches("m*x"))
    assert(!GraphiteOps.globToRegex("m[*]x").r.matches("mzx"))
    assert(GraphiteOps.globToRegex("m[?a]x").r.matches("m?x"))
    assert(GraphiteOps.globToRegex("m[?a]x").r.matches("max"))
    // unbalanced braces / unclosed class are rejected up front, not at
    // rlike time with an uncompilable pattern
    intercept[IllegalArgumentException](GraphiteOps.globToRegex("a{b"))
    intercept[IllegalArgumentException](GraphiteOps.globToRegex("a}b"))
    intercept[IllegalArgumentException](GraphiteOps.globToRegex("a[b"))
  }

  test("alternation and char classes") {
    val re = GraphiteOps.globToRegex("evt.{purchase,refund}.u[0-3].*").r
    assert(re.matches("evt.purchase.u2.sum"))
    assert(re.matches("evt.refund.u0.max"))
    assert(!re.matches("evt.error.u2.sum"))
    assert(!re.matches("evt.purchase.u7.sum"))
    assert(!re.matches("evt.purchase.u2.a.b"), "* must not cross segments")
  }
}
