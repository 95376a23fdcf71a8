package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rounded-4 Jaccard similarity of two shingle arrays in ONE fused kernel:
  * round(|A∩B| / (|a|+|b|-|A∩B|), 4), where |A∩B| is the DISTINCT
  * intersection cardinality (array_intersect semantics) and |a|,|b| are the
  * raw array lengths (size() semantics) — bit-identical to the Column form
  *   round(size(array_intersect(a,b)) /
  *         (size(a)+size(b)-size(array_intersect(a,b))), 4)
  * including Spark's Round behavior on the 0/0 = NaN empty edge
  * (DedupSpec pins the parity).
  *
  * Decision record (optimization round 15, guide §1.2): in the
  * prefix-Jaccard verify step the optimizer pushes the threshold filter
  * into the broadcast-join CONDITION, inlining `shared` — so
  * array_intersect (hash set + materialized output array per evaluation)
  * ran up to FOUR times per candidate pair. This kernel computes the
  * count without materializing the intersection, once per evaluation.
  */
case class JaccardShingles(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaccard_shingles requires two array<string>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardShingles.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardShingles.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardShingles {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** round(|A∩B|/(|a|+|b|-|A∩B|), 4) with array_intersect's distinct
    * semantics (null elements intersect iff present on both sides) and
    * Spark Round's pass-through on non-finite ratios.
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[UTF8String]()
    var aHasNull = false
    var i = 0
    while (i < na) {
      if (a.isNullAt(i)) aHasNull = true
      else setA.add(a.getUTF8String(i)): Unit
      i += 1
    }
    val matched = new java.util.HashSet[UTF8String]()
    var nullMatched = false
    var j = 0
    while (j < nb) {
      if (b.isNullAt(j)) { if (aHasNull) nullMatched = true }
      else {
        val e = b.getUTF8String(j)
        if (setA.contains(e)) matched.add(e): Unit
      }
      j += 1
    }
    val shared = matched.size + (if (nullMatched) 1 else 0)
    val ratio = shared.toDouble / (na + nb - shared).toDouble
    if (ratio.isNaN || ratio.isInfinite) ratio
    else java.math.BigDecimal.valueOf(ratio)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
  }

  def jaccardShingles(a: Column, b: Column): Column =
    column(JaccardShingles(expression(a), expression(b)))
}
