package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** lgamma / tgamma via the Lanczos approximation (g=7, n=9 — the
  * standard public coefficients; ~15 significant digits, and the
  * reference's tests compare at 6 dp). ref src/Functions/lgamma.cpp,
  * tgamma.cpp delegate to libm.
  */
object MathExtra {
  private val g = 7.0
  private val coef = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def lgamma(x0: Double): Double = {
    if (x0.isNaN) return Double.NaN
    if (x0.isInfinite) return Double.PositiveInfinity
    if (x0 <= 0 && x0 == math.floor(x0)) return Double.PositiveInfinity
    if (x0 < 0.5) {
      // reflection: Γ(x)Γ(1-x) = π / sin(πx)
      math.log(math.Pi / math.abs(math.sin(math.Pi * x0))) - lgamma(1 - x0)
    } else {
      val x = x0 - 1
      var a = coef(0)
      val t = x + g + 0.5
      var i = 1
      while (i < coef.length) { a += coef(i) / (x + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  def tgamma(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x <= 0 && x == math.floor(x)) return Double.NaN
    if (x < 0.5)
      math.Pi / (math.sin(math.Pi * x) * tgamma(1 - x))
    else {
      val sign = 1.0
      sign * math.exp(lgamma(x))
    }
  }
}

case class ChGamma(child: Expression, log: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val x = input match {
      case d: java.lang.Double => d.doubleValue()
      case f: java.lang.Float => f.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case n: Number => n.doubleValue()
    }
    java.lang.Double.valueOf(
      if (log) MathExtra.lgamma(x) else MathExtra.tgamma(x))
  }
  override protected def withNewChildInternal(c: Expression): ChGamma =
    copy(child = c)
  override def prettyName: String = if (log) "lgamma" else "tgamma"
}
