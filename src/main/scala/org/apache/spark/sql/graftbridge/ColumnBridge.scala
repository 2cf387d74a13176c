package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. ExpressionUtils is
  * private[sql] in Spark 4, so custom native expressions (e.g.
  * graft.functions.CosineSimilarity) go through this shim package --
  * the standard pattern for libraries shipping codegen expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
