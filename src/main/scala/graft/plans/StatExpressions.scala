package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KQL statistical special functions (`erf`/`erfc`, the `beta_cdf`/`beta_pdf`/
  * `beta_inv` family; reference KQL surface `/root/reference/README.md:33-34`)
  * as native codegen'd Catalyst expressions. The iterative special-function
  * kernels (Lentz continued fractions, Lanczos log-gamma) have no Column-
  * combinator formulation at full double precision — a 50-term continued
  * fraction as a Column tree would be a thousand-node expression per call —
  * so they run as static JVM methods invoked from WholeStageCodegen, the same
  * pattern as CodecExpressions. All kernels are the standard textbook
  * algorithms (Lanczos g=7 series; incomplete-gamma series/continued-fraction
  * split at x = a+1; modified Lentz for the incomplete-beta continued
  * fraction), implemented from the published math.
  *
  * Every method is deterministic double arithmetic — same bits on every
  * executor, safe for the driver's hash-compare oracle when the query rounds
  * to a stable number of decimals.
  */
object StatExpressions {

  /** registry name ↔ static method (wired in GraftExtensions) */
  val names: Map[String, String] = Map(
    "erf" -> "graft_erf",
    "erfc" -> "graft_erfc",
    "beta_cdf" -> "graft_beta_cdf",
    "beta_pdf" -> "graft_beta_pdf",
    "beta_inv" -> "graft_beta_inv",
    "t_cdf" -> "graft_t_cdf")

  // Lanczos g=7, 9-term coefficients (public constants)
  private val LG = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** log Γ(x); reflection for x < 0.5. */
  def lgamma(x0: Double): Double = {
    if (x0 < 0.5) {
      math.log(math.Pi / math.abs(math.sin(math.Pi * x0))) - lgamma(1.0 - x0)
    } else {
      val x = x0 - 1.0
      var a = LG(0)
      var i = 1
      while (i < 9) { a += LG(i) / (x + i); i += 1 }
      val t = x + 7.5
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized lower incomplete gamma P(a, x): series for x < a+1,
    * Lentz continued fraction (on Q) otherwise. */
  def gammaP(a: Double, x: Double): Double = {
    if (x <= 0.0) 0.0
    else if (x < a + 1.0) {
      var sum = 1.0 / a
      var term = sum
      var n = 1
      while (n < 500 && math.abs(term) > math.abs(sum) * 1e-16) {
        term *= x / (a + n); sum += term; n += 1
      }
      sum * math.exp(-x + a * math.log(x) - lgamma(a))
    } else 1.0 - gammaQcf(a, x)
  }

  /** Regularized upper incomplete gamma Q(a, x) for x ≥ a+1 (modified Lentz). */
  private def gammaQcf(a: Double, x: Double): Double = {
    var b = x + 1.0 - a
    var c = 1e300
    var d = 1.0 / b
    var h = d
    var i = 1
    var done = false
    while (i < 500 && !done) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < 1e-300) d = 1e-300
      c = b + an / c; if (math.abs(c) < 1e-300) c = 1e-300
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-16) done = true
      i += 1
    }
    math.exp(-x + a * math.log(x) - lgamma(a)) * h
  }

  /** erf via the incomplete gamma identity erf(x) = sgn(x) · P(1/2, x²). */
  def erf(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (x >= 0) gammaP(0.5, x * x)
    else -gammaP(0.5, x * x)

  /** erfc without the 1−erf cancellation for large positive x. */
  def erfc(x: Double): Double =
    if (x.isNaN) Double.NaN
    else if (x < 0) 1.0 + gammaP(0.5, x * x)
    else if (x * x >= 1.5) gammaQcf(0.5, x * x) // CF valid once x² ≥ a+1
    else 1.0 - gammaP(0.5, x * x)

  /** Incomplete-beta continued fraction (modified Lentz). */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < 1e-300) d = 1e-300
    d = 1.0 / d
    var h = d
    var m = 1
    var done = false
    while (m <= 300 && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < 1e-300) d = 1e-300
      c = 1.0 + aa / c; if (math.abs(c) < 1e-300) c = 1e-300
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < 1e-300) d = 1e-300
      c = 1.0 + aa / c; if (math.abs(c) < 1e-300) c = 1e-300
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < 1e-15) done = true
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b). */
  def betaInc(x: Double, a: Double, b: Double): Double = {
    if (x.isNaN || a.isNaN || b.isNaN || a <= 0 || b <= 0) Double.NaN
    else if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val front = math.exp(
        lgamma(a + b) - lgamma(a) - lgamma(b) +
          a * math.log(x) + b * math.log(1.0 - x))
      if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(a, b, x) / a
      else 1.0 - front * betacf(b, a, 1.0 - x) / b
    }
  }

  def betaCdf(x: Double, a: Double, b: Double): Double = betaInc(x, a, b)

  def betaPdf(x: Double, a: Double, b: Double): Double = {
    if (x.isNaN || a.isNaN || b.isNaN || a <= 0 || b <= 0) Double.NaN
    else if (x < 0.0 || x > 1.0) 0.0
    else if (x == 0.0) { if (a > 1) 0.0 else if (a == 1) b else Double.PositiveInfinity }
    else if (x == 1.0) { if (b > 1) 0.0 else if (b == 1) a else Double.PositiveInfinity }
    else math.exp(
      (a - 1.0) * math.log(x) + (b - 1.0) * math.log(1.0 - x) +
        lgamma(a + b) - lgamma(a) - lgamma(b))
  }

  /** Inverse regularized incomplete beta: 90 bisection steps (≈1e-27 interval,
    * below double ulp everywhere in (0,1)) — deterministic, no derivative
    * blow-ups near the endpoints. */
  def betaInv(p: Double, a: Double, b: Double): Double = {
    if (p.isNaN || a.isNaN || b.isNaN || a <= 0 || b <= 0 || p < 0 || p > 1) Double.NaN
    else if (p == 0.0) 0.0
    else if (p == 1.0) 1.0
    else {
      var lo = 0.0
      var hi = 1.0
      var i = 0
      while (i < 90) {
        val mid = 0.5 * (lo + hi)
        if (betaInc(mid, a, b) < p) lo = mid else hi = mid
        i += 1
      }
      0.5 * (lo + hi)
    }
  }

  /** Student-t CDF via I_x(v/2, 1/2) with x = v/(v+t²). */
  def tCdf(t: Double, v: Double): Double = {
    if (t.isNaN || v.isNaN || v <= 0) Double.NaN
    else {
      val ib = betaInc(v / (v + t * t), v / 2.0, 0.5)
      if (t >= 0) 1.0 - 0.5 * ib else 0.5 * ib
    }
  }
}

/** double→double stat scalar (erf / erfc). */
case class StatExpr1(child: Expression, method: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected double, got $other")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any = method match {
    case "erf" => StatExpressions.erf(input.asInstanceOf[Double])
    case "erfc" => StatExpressions.erfc(input.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.StatExpressions.$method($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = s"graft_$method"
}

/** (double, double, double)→double stat scalar (beta family, t-CDF). */
case class StatExpr3(first: Expression, second: Expression, third: Expression,
                     method: String) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected doubles, got ${children.map(_.dataType).mkString(", ")}")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(x: Any, a: Any, b: Any): Any = {
    val (xd, ad, bd) = (x.asInstanceOf[Double], a.asInstanceOf[Double], b.asInstanceOf[Double])
    method match {
      case "betaCdf" => StatExpressions.betaCdf(xd, ad, bd)
      case "betaPdf" => StatExpressions.betaPdf(xd, ad, bd)
      case "betaInv" => StatExpressions.betaInv(xd, ad, bd)
      case "tCdf2" => StatExpressions.tCdf(xd, ad) // third arg ignored (arity pad)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    method match {
      case "tCdf2" =>
        defineCodeGen(ctx, ev, (x, a, _) => s"graft.plans.StatExpressions.tCdf($x, $a)")
      case m =>
        defineCodeGen(ctx, ev, (x, a, b) => s"graft.plans.StatExpressions.$m($x, $a, $b)")
    }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def prettyName: String = s"graft_$method"
}
