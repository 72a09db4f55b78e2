package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** KQL unit-conversion scalar family (`convert_length`, `convert_mass`, …)
  * and the gamma special functions (reference KQL surface: README.md:33-34).
  *
  * Conversions are the single expression `value * factor(from) / factor(to)`
  * over SI base-unit factors — two IEEE operations, both correctly rounded,
  * so any engine replaying the same factors produces bit-identical doubles
  * (the property the DuckDB oracle compare relies on). Unit names are
  * resolved at PLAN time from literal strings; unknown units fail the parse,
  * not the job. */
object Units {

  val length: Map[String, Double] = Map(
    "meter" -> 1.0, "kilometer" -> 1000.0, "centimeter" -> 0.01,
    "millimeter" -> 0.001, "micrometer" -> 1e-6, "nanometer" -> 1e-9,
    "foot" -> 0.3048, "inch" -> 0.0254, "yard" -> 0.9144,
    "mile" -> 1609.344, "nauticalmile" -> 1852.0)

  val mass: Map[String, Double] = Map(
    "kilogram" -> 1.0, "gram" -> 0.001, "milligram" -> 1e-6,
    "tonne" -> 1000.0, "pound" -> 0.45359237, "ounce" -> 0.028349523125,
    "stone" -> 6.35029318)

  val angle: Map[String, Double] = Map(
    "radian" -> 1.0, "degree" -> math.Pi / 180, "gradian" -> math.Pi / 200,
    "revolution" -> 2 * math.Pi)

  val speed: Map[String, Double] = Map(
    "meterpersecond" -> 1.0, "kilometerperhour" -> 1000.0 / 3600,
    "mileperhour" -> 0.44704, "knot" -> 1852.0 / 3600,
    "footpersecond" -> 0.3048)

  val energy: Map[String, Double] = Map(
    "joule" -> 1.0, "kilojoule" -> 1000.0, "megajoule" -> 1e6,
    "calorie" -> 4.184, "kilocalorie" -> 4184.0, "watthour" -> 3600.0,
    "kilowatthour" -> 3.6e6, "britishthermalunit" -> 1055.05585262)

  val force: Map[String, Double] = Map(
    "newton" -> 1.0, "kilonewton" -> 1000.0, "kilogramforce" -> 9.80665,
    "poundforce" -> 4.4482216152605)

  val volume: Map[String, Double] = Map(
    "cubicmeter" -> 1.0, "liter" -> 0.001, "milliliter" -> 1e-6,
    "usgallon" -> 0.003785411784, "imperialgallon" -> 0.00454609,
    "cubicfoot" -> 0.028316846592)

  def convert(v: Column, from: String, to: String,
              table: Map[String, Double], fam: String): Column = {
    def f(u: String): Double = table.getOrElse(u.toLowerCase,
      throw new IllegalArgumentException(s"convert_$fam: unknown unit '$u'"))
    v.cast("double") * f(from) / f(to)
  }

  /** Temperature is affine, not linear — route through Kelvin with the exact
    * published offsets, keeping the operation chain fixed so an oracle can
    * replay it term-for-term. */
  def convertTemperature(v: Column, from: String, to: String): Column = {
    val k = from.toLowerCase match {
      case "kelvin" => v.cast("double")
      case "celsius" | "degreecelsius" => v.cast("double") + 273.15
      case "fahrenheit" | "degreefahrenheit" =>
        (v.cast("double") - 32.0) * 5.0 / 9.0 + 273.15
      case u => throw new IllegalArgumentException(
        s"convert_temperature: unknown unit '$u'")
    }
    to.toLowerCase match {
      case "kelvin" => k
      case "celsius" | "degreecelsius" => k - 273.15
      case "fahrenheit" | "degreefahrenheit" =>
        (k - 273.15) * 9.0 / 5.0 + 32.0
      case u => throw new IllegalArgumentException(
        s"convert_temperature: unknown unit '$u'")
    }
  }

  // ------------------------------------------------------------------
  // gamma / loggamma — Lanczos approximation (g = 7, 9 terms; public
  // coefficients from the standard Numerical-Recipes-style derivation),
  // ~15 significant digits over the positive axis. Pure codegen'd
  // arithmetic: no UDF, stays inside WholeStageCodegen.
  // ------------------------------------------------------------------

  private val lanczos = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  /** log Γ(x) for x ≥ 0.5 (the Lanczos core). */
  private def lgammaPos(x: Column): Column = {
    val z = x.cast("double") - 1.0
    val a = lanczos.zipWithIndex.tail.foldLeft(lit(lanczos(0)): Column) {
      case (acc, (c, i)) => acc + lit(c) / (z + i.toDouble)
    }
    val t = z + 7.5
    lit(0.5 * math.log(2 * math.Pi)) + (z + 0.5) * log(t) - t + log(a)
  }

  /** Γ(x); x < 0.5 via the reflection formula Γ(x)Γ(1−x) = π / sin(πx)
    * (poles at non-positive integers surface as ±Infinity, like Kusto). */
  def gamma(x: Column): Column = {
    val xd = x.cast("double")
    when(xd >= 0.5, exp(lgammaPos(xd)))
      .otherwise(lit(math.Pi) / (sin(lit(math.Pi) * xd) * exp(lgammaPos(lit(1.0) - xd))))
  }

  /** log |Γ(x)| (Kusto's loggamma is the log of the absolute value). */
  def loggamma(x: Column): Column = {
    val xd = x.cast("double")
    when(xd >= 0.5, lgammaPos(xd))
      .otherwise(log(abs(lit(math.Pi) / sin(lit(math.Pi) * xd))) - lgammaPos(lit(1.0) - xd))
  }
}
