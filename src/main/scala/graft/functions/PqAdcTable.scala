package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Per-query PQ ADC lookup table: entry s·k + j = squared L2 between the
  * query's subvector s and codeword j, as ONE fused loop over the flat
  * codebook — the query-side sibling of [[PqEncode]].
  *
  * Decision record (optimization round 14, guide §1/§7.2): the Column
  * form (`PQ.adcTable` — m·k literal-codeword `sqDist` expressions) put
  * ~10k expression nodes into a single projection; at m=16, k=32 the
  * ANALYSIS/OPTIMIZATION of that tree cost ~2 s of driver time per
  * x_pq_recall / x_ivfpq_recall run — more than the query's entire task
  * time. The codebook rides along as a flat `double[(s·k + j)·dsub + i]`
  * reference object, so the plan carries ONE node regardless of m·k.
  *
  * Arithmetic is bit-identical to the Column form (pinned in PQSpec):
  * per entry, diff² terms accumulate in ascending element order from an
  * acc of 0.0 — exactly `aggregate(zip_with(...))`'s fold — FOR inputs
  * with at least m·dsub elements (every caller: vectors are fixed-width
  * by construction). On a SHORTER input the two forms diverge by design
  * of the HOF: zip_with null-pads the shorter array, so the HOF's
  * aggregate yields NULL entries, while this kernel SKIPS the missing
  * elements and returns the partial sum (a defined value is strictly
  * more useful than NULL, and PQSpec pins the divergence so it can't
  * drift silently). The input must already be L2-normalized (the caller
  * normalizes once, as before).
  */
case class PqAdcTable(child: Expression, books: Array[Double], m: Int, k: Int)
    extends UnaryExpression {
  require(m > 0 && k > 0 && books.length % (m * k) == 0 && books.length > 0,
    s"codebook length ${books.length} not divisible by m*k=${m * k}")

  private val dsub: Int = books.length / (m * k)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"pq_adc_table expects an array, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_table requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    val n = v.numElements()
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val idx = s * dsub + t
          if (idx < n) {
            val x = if (isFloat) v.getFloat(idx).toDouble else v.getDouble(idx)
            val diff = x - books((s * k + j) * dsub + t)
            d += diff * diff
          }
          t += 1
        }
        out(s * k + j) = d
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    val booksRef = ctx.addReferenceObj("adcBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val t = ctx.freshName("t"); val x = ctx.freshName("x")
      val d = ctx.freshName("d"); val diff = ctx.freshName("diff")
      val idx = ctx.freshName("idx")
      s"""
         |int $n = $v.numElements();
         |double[] $out = new double[${m * k}];
         |for (int $s = 0; $s < $m; $s++) {
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      int $idx = $s * $dsub + $t;
         |      if ($idx < $n) {
         |        double $x = (double) $v.$get($idx);
         |        double $diff = $x - $booksRef[($s * $k + $j) * $dsub + $t];
         |        $d += $diff * $diff;
         |      }
         |    }
         |    $out[$s * $k + $j] = $d;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object PqAdcTable {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column API: the m·k ADC table of an (already L2-normalized) query
    * vector under a flat codebook laid out `[(s·k + j)·dsub + i]`.
    */
  def pqAdcTable(v: Column, books: Array[Double], m: Int, k: Int): Column =
    column(PqAdcTable(expression(v), books, m, k))
}
