package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a fused native expression —
  * the canonical first step of any web-scale text pipeline: the same
  * user-visible string can arrive as composed codepoints or base+combining
  * sequences, and every downstream exact-match operator (fingerprint dedup,
  * token counts, shingle hashing) silently misses equivalences until the
  * corpus is normalized to one form.
  *
  * Spark has no built-in for this, and a Scala UDF would break whole-stage
  * codegen on what is by definition a full-corpus scan — so it follows the
  * [[CharNgrams]] native-expression pattern: one kernel shared by
  * interpreted eval and codegen, a pure per-row map fused into the scan,
  * zero shuffle at any corpus size. The kernel short-circuits through
  * `Normalizer.isNormalized` (one scan, no allocation) since real corpora
  * are overwhelmingly already-NFC.
  *
  * Semantics are identical to DuckDB's `nfc_normalize` for form=NFC (both
  * implement UAX #15), which the x_nfc_normalize oracle pins.
  */
case class NormalizeUnicode(child: Expression, form: String) extends UnaryExpression {
  require(NormalizeUnicode.forms.contains(form), s"unknown normalization form $form")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalize_unicode requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NormalizeUnicode.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.NormalizeUnicode.normalize($s, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object NormalizeUnicode {
  import org.apache.spark.sql.GraftExpressionBridge._

  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Shared kernel for interpreted eval and codegen. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = java.text.Normalizer.Form.valueOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Column API: normalize to the given Unicode form (default NFC). */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    column(NormalizeUnicode(expression(c), form))
}
