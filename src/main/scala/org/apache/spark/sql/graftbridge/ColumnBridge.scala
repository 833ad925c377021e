package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge from Catalyst [[Expression]] to the public [[Column]] API.
  *
  * Spark 4 moved `Column` onto `ColumnNode`; wrapping a raw Catalyst
  * expression needs the `private[sql]` `ExpressionUtils.column`. This
  * shim lives under `org.apache.spark.sql` so graft can register
  * codegen-friendly native expressions (see `graft.functions`)
  * instead of falling back to Scala UDFs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
