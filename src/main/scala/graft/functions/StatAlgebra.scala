package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Normal density / CDF as PURE COLUMN ALGEBRA (no StaticInvoke):
  * used where the DuckDB oracle must replay the exact arithmetic —
  * both engines evaluate the same double-precision expression tree,
  * so hash gates hold bit-for-bit (the Acklam-qnorm oracle trick).
  * [[graft.functions.StatFunctions.pnorm]] (commons-math, ~1e-16)
  * remains the default for operators whose oracles avoid Φ; this
  * A&S 7.1.26 form carries |ε| ≤ 1.5e-7 against the true CDF, which
  * is irrelevant for the background-correction use and invisible to
  * the 4-dp rounded gates. */
object StatAlgebra {

  /** erf by Abramowitz–Stegun 7.1.26 (Horner form, odd symmetry). */
  def erfAS(x: Column): Column = {
    val ax = abs(x)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * ax)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t
      + lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    val e = lit(1.0) - poly * exp(-ax * ax)
    when(x < 0, -e).otherwise(e)
  }

  /** Standard normal CDF via [[erfAS]]. */
  def pnormAS(z: Column): Column =
    lit(0.5) * (lit(1.0) + erfAS(z / lit(math.sqrt(2.0))))

  /** Standard normal density. */
  def dnorm(z: Column): Column =
    exp(-z * z / lit(2.0)) / lit(math.sqrt(2.0 * math.Pi))
}
