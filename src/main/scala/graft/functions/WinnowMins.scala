package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Winnowing fingerprint kernel: 24-bit md5 prefix per n-gram, sliding
  * window-of-`w` minimum, sorted distinct — the hot inner loops of
  * `TextFunctions.winnowFingerprints` as ONE codegen expression over the
  * (already codegen'd, [[WordNgrams]]) gram array.
  *
  * Decision record (optimization round 14, guide §1.2 "per-task work"):
  * the HOF form — `transform(grams, md5…)` then `transform(sequence, i =>
  * array_min(slice(hashes, i, w)))` — is interpreted (HOFs are
  * CodegenFallback) and O(n·w) in slice copies; it accounted for ~60 s of
  * task time in x_winnow_pairs at sf0.1. This expression computes the
  * same values in generated Java with a monotonic-deque sliding minimum
  * (O(n)); the window MINIMA are identical, so output is bit-identical to
  * the HOF spec (pinned in TextFunctionsSpec).
  *
  * Exact HOF semantics replicated:
  *  - hash = long of the first 6 lowercase-hex chars of md5(gram UTF-8)
  *    (`conv(substring(md5(g),1,6),16,10)`);
  *  - 0 grams → `array(array_min(empty))` = `[null]`;
  *  - n <= w → one window over everything;
  *  - else windows i = 1..n-w+1 over `slice(hashes, i, w)`;
  *  - `array_sort(array_distinct(...))` — ascending, nulls last.
  */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {
  require(w > 1, s"need w > 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"winnow_mins requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val grams = input.asInstanceOf[ArrayData]
    new GenericArrayData(WinnowMins.compute(grams, w))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowMins.compute($v, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object WinnowMins {
  import org.apache.spark.sql.GraftExpressionBridge._

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 24-bit md5 prefix of a UTF-8 string — the value of
    * `conv(substring(md5(g), 1, 6), 16, 10)`.
    */
  private def hash24(s: String): Long = {
    val md = digest.get()
    md.reset()
    val h = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)
  }

  /** Shared eval/codegen body: boxed Long array (nullable — the 0-gram
    * edge yields `[null]`, matching `array_min` over an empty slice).
    */
  def compute(grams: ArrayData, w: Int): Array[java.lang.Long] = {
    val n = grams.numElements()
    if (n == 0) return Array[java.lang.Long](null)
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = hash24(grams.getUTF8String(i).toString); i += 1 }
    val mins = new java.util.TreeSet[java.lang.Long]()
    if (n <= w) {
      var m = hashes(0); i = 1
      while (i < n) { if (hashes(i) < m) m = hashes(i); i += 1 }
      mins.add(m)
    } else {
      // monotonic deque: indices of increasing hash values in the window
      val deque = new Array[Int](n)
      var head = 0; var tail = 0 // [head, tail)
      i = 0
      while (i < n) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) mins.add(hashes(deque(head)))
        i += 1
      }
    }
    val out = new Array[java.lang.Long](mins.size())
    val it = mins.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Column API: sorted distinct sliding-window (`w`) minima of the
    * 24-bit md5 hashes of `grams`.
    */
  def winnowMins(grams: Column, w: Int): Column =
    column(WinnowMins(expression(grams), w))
}
