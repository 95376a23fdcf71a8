package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All overlapping word n-grams of a token array, space-joined, as a fused
  * native expression: `["a","b","c"]`, n=2 → `["a b","b c"]`; fewer than n
  * tokens yield the whole text as one gram (`concat_ws(" ", toks)` — the
  * guard the HOF form used).
  *
  * Decision record (SURVEY.md §7.3 "measure first", same history as
  * [[CharNgrams]]): the HOF form `transform(sequence(1, size-n+1),
  * i -> concat_ws(" ", slice(toks, i, n)))` is interpreted
  * (higher-order functions are CodegenFallback) and measured ~23× slower
  * than a plain token explode at sf0.1 — it made x_bigram_lm the slowest
  * bench query (4.3 s, 10× the unigram cousin). This kernel does one pass
  * over the token array per row inside codegen. Tokenization stays in the
  * caller (`TextFunctions.tokens` — codegen'd split/regexp), so the
  * expression composes with any upstream token source and the DuckDB
  * list_transform/array_to_string oracles still hash-match (identical
  * join-with-space semantics; split never yields null elements).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordNgrams.ngrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) " +
        s"graft.functions.WordNgrams.ngrams($toks, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object WordNgrams {
  import org.apache.spark.sql.GraftExpressionBridge._

  private val SEP = UTF8String.fromString(" ")

  /** Shared kernel for interpreted eval and codegen. */
  def ngrams(toks: ArrayData, n: Int): GenericArrayData = {
    val len = toks.numElements()
    if (len < n) {
      val all = new Array[UTF8String](len)
      var j = 0
      while (j < len) { all(j) = toks.getUTF8String(j); j += 1 }
      return new GenericArrayData(Array[Any](UTF8String.concatWs(SEP, all: _*)))
    }
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(SEP, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: overlapping word n-grams of a token-array column. */
  def wordNgrams(toks: Column, n: Int): Column = column(WordNgrams(expression(toks), n))
}
