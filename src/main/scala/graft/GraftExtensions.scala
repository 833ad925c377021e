package graft

import graft.functions.{StatKernels, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

/** SparkSessionExtensions entry point: registers the engine's scalar
  * functions for SQL use, so
  * `spark.sql("SELECT qnorm(0.975), vec_dot(a, b) ...")` works in any
  * session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * All functions resolve to codegen-friendly expressions
  * ([[StaticInvoke]] of pure kernels / [[VecDot]]); none are Scala
  * UDF closures.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def invoke1(method: String)(args: Seq[Expression]): Expression =
    StaticInvoke(StatKernels.getClass, DoubleType, method,
      args.map(a => org.apache.spark.sql.catalyst.expressions.Cast(a, DoubleType)),
      Seq(DoubleType), propagateNull = true, returnNullable = false)

  private def invoke2(method: String)(args: Seq[Expression]): Expression =
    StaticInvoke(StatKernels.getClass, DoubleType, method,
      args.map(a => org.apache.spark.sql.catalyst.expressions.Cast(a, DoubleType)),
      Seq(DoubleType, DoubleType), propagateNull = true, returnNullable = false)

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String) = new ExpressionInfo("graft", name)
    ext.injectFunction((FunctionIdentifier("qnorm"), info("qnorm"),
      (args: Seq[Expression]) => invoke1("qnorm")(args)))
    ext.injectFunction((FunctionIdentifier("pnorm"), info("pnorm"),
      (args: Seq[Expression]) => invoke1("pnorm")(args)))
    ext.injectFunction((FunctionIdentifier("z_p2"), info("z_p2"),
      (args: Seq[Expression]) => invoke1("zToTwoSidedP")(args)))
    ext.injectFunction((FunctionIdentifier("t_p2"), info("t_p2"),
      (args: Seq[Expression]) => invoke2("tToTwoSidedP")(args)))
    ext.injectFunction((FunctionIdentifier("qchisq"), info("qchisq"),
      (args: Seq[Expression]) => invoke2("qchisq")(args)))
    ext.injectFunction((FunctionIdentifier("vec_dot"), info("vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("compression_ratio"),
      info("compression_ratio"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "compression_ratio expects exactly one argument")
        graft.functions.TextFunctions.compressionRatioExpr(
          org.apache.spark.sql.catalyst.expressions.Cast(
            args.head, org.apache.spark.sql.types.StringType))
      }))
  }
}
