package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DoubleType

/** Column-level statistical functions.
  *
  * Each is a [[StaticInvoke]] of a pure static kernel in
  * [[StatKernels]]: Catalyst generates a direct call inside
  * whole-stage codegen — no UDF serialization, no codegen break —
  * which keeps these usable in 100 TB-scale hot paths (e.g. the
  * Stouffer combine over every gene, `Meta_analysis.R:1211-1228`).
  */
object StatFunctions {
  private def invoke1(method: String, c: Column): Column =
    ColumnBridge.column(StaticInvoke(
      StatKernels.getClass, DoubleType, method,
      Seq(ColumnBridge.expression(c.cast(DoubleType))),
      Seq(DoubleType), propagateNull = true, returnNullable = false))

  private def invoke2(method: String, a: Column, b: Column): Column =
    ColumnBridge.column(StaticInvoke(
      StatKernels.getClass, DoubleType, method,
      Seq(ColumnBridge.expression(a.cast(DoubleType)),
          ColumnBridge.expression(b.cast(DoubleType))),
      Seq(DoubleType, DoubleType), propagateNull = true, returnNullable = false))

  private def invoke4(method: String, a: Column, b: Column, c: Column, d: Column): Column =
    ColumnBridge.column(StaticInvoke(
      StatKernels.getClass, DoubleType, method,
      Seq(ColumnBridge.expression(a.cast(DoubleType)),
          ColumnBridge.expression(b.cast(DoubleType)),
          ColumnBridge.expression(c.cast(DoubleType)),
          ColumnBridge.expression(d.cast(DoubleType))),
      Seq(DoubleType, DoubleType, DoubleType, DoubleType),
      propagateNull = true, returnNullable = false))

  /** R qnorm: standard normal quantile. */
  def qnorm(p: Column): Column = invoke1("qnorm", p)
  /** R pnorm: standard normal CDF. */
  def pnorm(z: Column): Column = invoke1("pnorm", z)
  /** Two-sided p from z: 2*pnorm(-|z|). */
  def zP2(z: Column): Column = invoke1("zToTwoSidedP", z)
  /** Two-sided p from t with df. */
  def tP2(t: Column, df: Column): Column = invoke2("tToTwoSidedP", t, df)
  /** Chi-squared upper tail (for Cochran Q heterogeneity p). */
  def pchisqUpper(x: Column, df: Column): Column = invoke2("pchisqUpper", x, df)
  def qchisq(p: Column, df: Column): Column = invoke2("qchisq", p, df)
  /** Hypergeometric upper tail P(X >= overlap) for
    * Hyper(N=nUniverse, K=nSig, n=termSize); engine-invariant
    * mode-anchored pmf recurrence (see [[StatKernels.hyperTail]]). */
  def hyperTail(nUniverse: Column, nSig: Column, termSize: Column, overlap: Column): Column =
    invoke4("hyperTail", nUniverse, nSig, termSize, overlap)
}
