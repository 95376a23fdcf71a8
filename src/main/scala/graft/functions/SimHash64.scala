package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit SimHash of a token array, fused into one native kernel.
  *
  * Decision record (SURVEY.md §7.3 "measure first"): the per-row HOF form
  * (Dedup.simhash: aggregate + zip_with towers) is interpreted, and the
  * explode + 64-conditional-sum-aggregates form costs a full shuffle per
  * signature build (~0.45 s of x_simhash_pairs at sf0.1). This expression
  * computes the whole signature per row inside whole-stage codegen — no
  * explode, no aggregate, no shuffle: signature construction runs at scan
  * speed, which is the property that matters when the corpus is 100 TB.
  *
  * Bit semantics are identical to both prior forms: per token,
  * xxhash64(token) (Spark's seed-42 XXH64 over the UTF-8 bytes)
  * contributes +1/-1 to each bit position's counter; bit i of the result
  * is set iff counter(i) >= 0. A doc with zero tokens therefore yields
  * all-bits-set (-1L), the same value the HOF form produces.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHash64.simhash($arr);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object SimHash64 {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Shared kernel for interpreted eval and codegen. Null elements are
    * skipped, matching Spark's xxhash64 semantics over arrays with nulls —
    * internal callers never emit them, but the function is SQL-registered
    * so arbitrary `array('a', NULL)` input must not NPE.
    */
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column API: 64-bit SimHash of an array<string> of tokens. */
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
}
