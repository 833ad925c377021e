package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Piecewise-linear interpolation through a driver-side knot table —
  * R's `approxfun(..., rule = 2)` as a native codegen expression.
  *
  * The knot arrays are plan constants (`ctx.addReferenceObj`), NOT
  * child expressions: a 60k-knot trend would be impossible as a
  * folded comparison chain (the old ≤20-anchor segment-index idiom)
  * and wasteful as a broadcast join (one join per interpolation).
  * Here every row does one binary search + one fused multiply in
  * whole-stage codegen — zero shuffles, zero joins, any knot count.
  *
  * Outside the knot span the end value is held (rule = 2). `xs` must
  * be strictly increasing; ties must be collapsed by the caller. */
case class Interp1(child: Expression, xs: Array[Double], ys: Array[Double])
    extends UnaryExpression {
  require(xs.length == ys.length && xs.nonEmpty, "interp1 needs matching non-empty knots")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"interp1 requires a double input, got ${child.dataType}")

  override def nullSafeEval(x: Any): Any =
    StatKernels.interp1(x.asInstanceOf[Double], xs, ys)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xsRef = ctx.addReferenceObj("interp1Xs", xs, "double[]")
    val ysRef = ctx.addReferenceObj("interp1Ys", ys, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StatKernels.interp1($c, $xsRef, $ysRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Interp1 {
  /** Column API: evaluate the piecewise-linear curve through
    * (xs, ys) at `c`, clamped flat outside the span. */
  def interp1(c: Column, xs: Array[Double], ys: Array[Double]): Column =
    ColumnBridge.column(Interp1(ColumnBridge.expression(c), xs, ys))
}
