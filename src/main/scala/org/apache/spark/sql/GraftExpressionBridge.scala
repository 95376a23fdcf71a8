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

/** Bridge to Dataset.ofRows (private[sql] in Spark 4) — needed to wrap a
  * custom LogicalPlan (graft.plans.AsOfJoinNode) as a DataFrame.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
