package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for the graft native expressions.
  *
  * Spark 4 made `ExpressionUtils` private[sql]; the standard pattern for
  * extension libraries that ship their own `Expression`s (the build rules'
  * (b)-tier) is a bridge object in a subpackage of org.apache.spark.sql —
  * no internals are modified, only the supported conversion is re-exported.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
