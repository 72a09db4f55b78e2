package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.StatExpressions._

/** Kernel-level accuracy checks for the statistical special functions
  * (StatExpressions.scala) against independently-known values: erf from the
  * JDK-independent classical table / Python math.erf, the beta family at
  * integer parameters from the exact closed-form binomial sum, and symmetry /
  * roundtrip identities that hold for ANY correct implementation. */
class StatExpressionsSpec extends AnyFunSuite {

  private def approxEq(a: Double, b: Double, tol: Double = 1e-12): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  test("erf matches reference values to 1e-12") {
    // Python math.erf reference points
    val ref = Seq(
      0.5 -> 0.5204998778130465,
      1.0 -> 0.8427007929497149,
      2.0 -> 0.9953222650189527,
      0.1 -> 0.1124629160182849,
      3.5 -> 0.999999256901628)
    for ((x, e) <- ref) {
      assert(approxEq(erf(x), e), s"erf($x) = ${erf(x)}, want $e")
      assert(approxEq(erf(-x), -e), s"erf(-$x) odd symmetry")
    }
    assert(erf(0.0) == 0.0)
  }

  test("erfc is the stable complement (no cancellation at large x)") {
    // math.erfc reference: erfc(3) ≈ 2.209049699858544e-05
    assert(approxEq(erfc(3.0), 2.20904969985854e-5, 1e-10))
    assert(approxEq(erfc(0.5), 1 - 0.5204998778130465))
    assert(approxEq(erfc(-1.0), 1 + 0.8427007929497149))
    // far tail keeps relative precision (1 - erf would return exactly 0)
    assert(erfc(6.0) > 0 && approxEq(erfc(6.0), 2.1519736712498913e-17, 1e-9))
  }

  test("betaInc matches the exact closed form at integer parameters") {
    // I_x(a,b) = Σ_{j=a}^{a+b-1} C(a+b-1,j) x^j (1-x)^(a+b-1-j)
    def exact(x: Double, a: Int, b: Int): Double = {
      val n = a + b - 1
      (a to n).map { j =>
        var c = 1.0
        for (i <- 0 until j) c = c * (n - i) / (i + 1)
        c * math.pow(x, j) * math.pow(1 - x, n - j)
      }.sum
    }
    for (x <- Seq(0.1, 0.25, 0.5, 0.75, 0.9); (a, b) <- Seq((2, 3), (3, 2), (4, 4), (2, 5)))
      assert(approxEq(betaInc(x, a, b), exact(x, a, b), 1e-12),
        s"I_$x($a,$b) = ${betaInc(x, a, b)}, want ${exact(x, a, b)}")
    // continuous parameters: I_x(1/2, 1/2) = (2/π) asin(√x)
    for (x <- Seq(0.2, 0.5, 0.8))
      assert(approxEq(betaInc(x, 0.5, 0.5), 2 / math.Pi * math.asin(math.sqrt(x)), 1e-12))
  }

  test("betaInv inverts betaCdf and betaPdf integrates consistently") {
    for (p <- Seq(0.05, 0.3, 0.5, 0.7, 0.95); (a, b) <- Seq((2.0, 3.0), (0.5, 0.5), (5.0, 1.5))) {
      val x = betaInv(p, a, b)
      assert(approxEq(betaCdf(x, a, b), p, 1e-10), s"cdf(inv($p)) roundtrip at ($a,$b)")
    }
    // pdf at integer params: Beta(2,2) pdf = 6x(1-x)
    assert(approxEq(betaPdf(0.3, 2, 2), 6 * 0.3 * 0.7))
    assert(betaPdf(-0.1, 2, 2) == 0.0 && betaPdf(1.1, 2, 2) == 0.0)
  }

  test("tCdf matches known Student-t quantiles") {
    // t-distribution: CDF(0) = 0.5; CDF(t, v=1) is the Cauchy 1/2 + atan(t)/π
    assert(approxEq(tCdf(0.0, 5.0), 0.5))
    for (t <- Seq(-2.0, -0.5, 0.7, 3.0))
      assert(approxEq(tCdf(t, 1.0), 0.5 + math.atan(t) / math.Pi, 1e-12),
        s"t=$t v=1 vs Cauchy")
    // symmetry
    assert(approxEq(tCdf(1.7, 8.0) + tCdf(-1.7, 8.0), 1.0))
  }
}
