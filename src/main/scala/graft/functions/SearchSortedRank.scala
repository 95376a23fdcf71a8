package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Rank of a double against a sorted literal boundary array: the number
  * of boundaries `b` with `value >= b` — i.e. the quantile-bucket index a
  * clustered/Z-order writer assigns the row.
  *
  * Decision record (optimization round 15, guide §1.2/§7.2): the Column
  * form was a SUM of one `when(col >= lit(b), 1).otherwise(0)` per
  * boundary — at 6 bits × 2 dimensions that is ~126 expression nodes
  * evaluated per row AND serialized into every task binary of the scan
  * stage (the "Broadcasting large task binary" warnings on the z-order
  * write). This kernel carries the boundaries as ONE flat reference
  * object and binary-searches them — one plan node, O(log n) per row.
  *
  * Parity with the when-chain (pinned in CompactionSpec):
  *  - NULL input → 0 (each when falls to otherwise(0); the sum is 0, not
  *    NULL — so this expression is non-nullable and does NOT null-propagate);
  *  - NaN input → bounds.length (Spark orders NaN above every double, so
  *    every `NaN >= b` is true);
  *  - boundaries are assumed sorted ascending and distinct (the callers
  *    sort+distinct the approxQuantile output).
  */
case class SearchSortedRank(child: Expression, bounds: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"search_sorted_rank requires double, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SearchSortedRank.rank(v.asInstanceOf[Double], bounds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boundsRef = ctx.addReferenceObj("ssrBounds", bounds, "double[]")
    val childGen = child.genCode(ctx)
    val v = childGen.value
    val code =
      code"""
         |${childGen.code}
         |long ${ev.value} = 0L;
         |if (!${childGen.isNull}) {
         |  ${ev.value} = graft.functions.SearchSortedRank.rank((double) $v, $boundsRef);
         |}
       """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SearchSortedRank {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** #bounds <= v under Spark's double ordering (NaN above everything). */
  def rank(v: Double, bounds: Array[Double]): Long = {
    if (v.isNaN) return bounds.length.toLong
    // first index whose boundary exceeds v; bounds sorted ascending
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v >= bounds(mid)) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  def searchSortedRank(v: Column, bounds: Array[Double]): Column =
    column(SearchSortedRank(expression(v), bounds))
}
