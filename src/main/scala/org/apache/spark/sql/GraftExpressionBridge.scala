package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the Column ↔ catalyst Expression conversions, which Spark 4
  * scopes `private[sql]` (the public Column API is implementation-agnostic
  * since the Connect refactor). Needed to expose custom codegen
  * expressions (graft.functions.CosineSimilarity) as Columns.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
