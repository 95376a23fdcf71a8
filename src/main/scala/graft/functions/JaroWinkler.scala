package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen expression — the
  * fuzzy-match kernel behind entity resolution / record linkage, which
  * Spark has no built-in for (only `levenshtein`). A Scala UDF here would
  * break whole-stage codegen on what is by definition a pairwise hot path
  * (every candidate pair of a blocked join evaluates it).
  *
  * Semantics are the textbook Jaro (match window ⌊max(|a|,|b|)/2⌋−1,
  * half-transpositions) with the Winkler prefix boost `j + ℓ·0.1·(1−j)`
  * applied only when jaro > 0.7, ℓ = common prefix capped at 4 — verified
  * bit-for-bit against DuckDB's `jaro_winkler_similarity` on a 14-case
  * battery (equal strings, empties, transpositions, window-miss pairs,
  * boost and no-boost cases), so oracle hash-compares are exact. The
  * arithmetic mirrors that reference ORDER OF OPERATIONS exactly:
  * `(m/|a| + m/|b| + (m−t)/m) / 3`, then `(ℓ·0.1)·(1−j)`.
  *
  * Comparison is on UTF-16 code units (Java chars) — identical to
  * code-point comparison for BMP text; the corpus and the part-name
  * query are ASCII.
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires (string, string), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.sim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Shared kernel for interpreted eval and codegen. */
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val matchDist = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(l2, i + matchDist + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: matched chars of s1 in order vs matched chars
    // of s2 in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro > 0.7) {
      var pl = 0
      val cap = math.min(4, math.min(l1, l2))
      while (pl < cap && s1.charAt(pl) == s2.charAt(pl)) pl += 1
      jaro + pl * 0.1 * (1.0 - jaro)
    } else jaro
  }

  /** Column API: Jaro–Winkler similarity of two string columns. */
  def jaroWinkler(a: Column, b: Column): Column =
    column(JaroWinkler(expression(a), expression(b)))
}
