package graft.functions

import org.apache.commons.math3.distribution.{ChiSquaredDistribution, FDistribution, NormalDistribution, TDistribution}
import org.apache.commons.math3.special.Gamma

/** Deterministic scalar statistical kernels backed by commons-math3
  * (shipped with Spark MLlib). These are the engine equivalents of the
  * R quantile/distribution calls used throughout the reference:
  *   - qnorm/pnorm — `Meta_analysis.R:82-84,1226` (p↔z conversion)
  *   - qchisq      — `Meta_analysis.R:805-806` (QQ plots, Cochran Q)
  *   - pt          — limma moderated-t p-values (`DiffExpression_closedPlatform.R:546`)
  *   - pf          — eBayes F-moments
  *
  * All methods are pure static functions so they can be invoked from
  * codegen via `StaticInvoke` (see [[StatFunctions]]).
  */
object StatKernels {
  private val stdNormal = new NormalDistribution(null, 0.0, 1.0)

  /** Standard normal quantile (R qnorm). */
  def qnorm(p: Double): Double =
    if (p.isNaN) Double.NaN
    else if (p <= 0.0) Double.NegativeInfinity
    else if (p >= 1.0) Double.PositiveInfinity
    else stdNormal.inverseCumulativeProbability(p)

  /** Standard normal CDF (R pnorm). */
  def pnorm(z: Double): Double =
    if (z.isNaN) Double.NaN else stdNormal.cumulativeProbability(z)

  /** Two-sided p-value from a z score: pnorm(-|z|) * 2
    * (`Meta_analysis.R:1226`). */
  def zToTwoSidedP(z: Double): Double =
    if (z.isNaN) Double.NaN else 2.0 * stdNormal.cumulativeProbability(-math.abs(z))

  /** Chi-squared quantile (R qchisq). */
  def qchisq(p: Double, df: Double): Double =
    if (p.isNaN || df.isNaN || df <= 0) Double.NaN
    else new ChiSquaredDistribution(null, df).inverseCumulativeProbability(p)

  /** Chi-squared upper-tail probability. */
  def pchisqUpper(x: Double, df: Double): Double =
    if (x.isNaN || df <= 0) Double.NaN
    else if (x <= 0) 1.0
    else 1.0 - new ChiSquaredDistribution(null, df).cumulativeProbability(x)

  /** Student-t CDF (R pt). */
  def pt(t: Double, df: Double): Double =
    if (t.isNaN || df <= 0) Double.NaN
    else new TDistribution(null, df).cumulativeProbability(t)

  /** Two-sided p-value from a t statistic. */
  def tToTwoSidedP(t: Double, df: Double): Double =
    if (t.isNaN || df <= 0) Double.NaN
    else 2.0 * new TDistribution(null, df).cumulativeProbability(-math.abs(t))

  /** F distribution CDF. */
  def pf(x: Double, df1: Double, df2: Double): Double =
    if (x.isNaN || df1 <= 0 || df2 <= 0) Double.NaN
    else new FDistribution(null, df1, df2).cumulativeProbability(x)

  def digamma(x: Double): Double = Gamma.digamma(x)
  def trigamma(x: Double): Double = Gamma.trigamma(x)

  /** Inverse of trigamma by Newton iteration (limma's trigammaInverse),
    * needed for eBayes d0 estimation (Smyth 2004 §6). */
  def trigammaInverse(x: Double): Double = {
    if (x.isNaN) return Double.NaN
    if (x > 1e7) return 1.0 / math.sqrt(x)
    if (x < 1e-6) return 1.0 / x
    var y = 0.5 + 1.0 / x
    var i = 0
    while (i < 50) {
      val tri = Gamma.trigamma(y)
      val dif = tri * (1.0 - tri / x) / tetragamma(y)
      y += dif
      if (-dif / y < 1e-8) i = 50 else i += 1
    }
    y
  }

  /** psi'''? no — psi_2, derivative of trigamma, via central difference. */
  private def tetragamma(y: Double): Double = {
    val h = 1e-4 * math.max(1.0, math.abs(y))
    (Gamma.trigamma(y + h) - Gamma.trigamma(y - h)) / (2.0 * h)
  }
}
