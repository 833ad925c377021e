package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a driver-built Bloom filter — the sketch
  * is a plan constant (`ctx.addReferenceObj`, the [[Interp1]] idiom),
  * so every row costs a handful of hash-bit reads inside whole-stage
  * codegen: zero shuffles, zero joins, no per-row closure UDF.
  *
  * The input is a 64-bit key (`xxhash64` of the content fingerprint)
  * probed with `mightContainLong`; build and probe sides must hash
  * the same way. False positives at the filter's `fpp` rate are BY
  * DESIGN — callers that need exactness (e.g.
  * [[graft.operators.TextDedup.dedupAgainstReference]]) follow the
  * probe with an exact confirm join over the positives only. */
case class BloomContains(child: Expression, bf: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_contains requires a bigint key, got ${child.dataType}")

  override def nullSafeEval(x: Any): Any =
    bf.mightContainLong(x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bf,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bfRef.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomContains {
  /** Column API: true when `key` (a bigint, conventionally
    * `xxhash64(fingerprint)`) might be in `bf`; false means
    * definitely absent. */
  def bloomContains(key: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomContains(ColumnBridge.expression(key), bf))
}
