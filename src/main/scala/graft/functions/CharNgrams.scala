package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All overlapping character n-grams of a string as `array<string>`, as a
  * fused native expression.
  *
  * Decision record (SURVEY.md §7.3 "measure first"): the HOF form
  * (`transform(sequence(...), i -> substring(s, i, n))`) is interpreted and
  * was the slowest remaining query at bench scale (~2 s for ~3 M grams at
  * sf0.1). Semantics match SQL `substring` exactly (character-based via
  * UTF8String.substringSQL), so the DuckDB `t[i:i+2]` oracle still
  * hash-matches. Strings shorter than n yield [s] (like the HOF+guard
  * form the query used).
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_ngrams requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    CharNgrams.ngrams(s, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) " +
        s"graft.functions.CharNgrams.ngrams($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object CharNgrams {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Shared kernel for interpreted eval and codegen. */
  def ngrams(s: UTF8String, n: Int): GenericArrayData = {
    val len = s.numChars()
    if (len <= n) return new GenericArrayData(Array[Any](s))
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: overlapping character n-grams. */
  def charNgrams(c: Column, n: Int): Column = column(CharNgrams(expression(c), n))
}
