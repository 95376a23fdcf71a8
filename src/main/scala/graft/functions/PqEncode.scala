package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder: all `m` subvector codes of an embedding
  * in one fused codegen loop, as `array<int>` (index = subquantizer).
  *
  * Decision record (SURVEY.md §7.3 "measure first"): the HOF form
  * (graft.ext.PQ.encodeHof — an `aggregate(zip_with(...))` sqDist per
  * codeword) is interpreted and evaluates m·k codeword distances per row
  * (~8 s/run at sf0.01 with m=16, k=32); this expression runs the whole
  * m·k·dsub multiply-add volume in generated Java at scan speed — the
  * same HOF→native upgrade as CosineSimilarity/SrpBuckets/MinHashSig.
  *
  * The input is L2-normalized INSIDE the loop (one norm pass, factor
  * reused) so L2 codeword argmin equals cosine ranking; codes are
  * bit-identical to the HOF executable spec (pinned in PQSpec). Ties go
  * to the lower code id. The codebook rides along as a flat
  * `double[(s·k + j)·dsub + i]` reference object — model-free codegen,
  * no literal-size limits.
  */
case class PqEncode(child: Expression, books: Array[Double], m: Int, k: Int)
    extends UnaryExpression {
  require(m > 0 && k > 0 && books.length % (m * k) == 0 && books.length > 0,
    s"codebook length ${books.length} not divisible by m*k=${m * k}")

  private val dsub: Int = books.length / (m * k)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"pq_encode expects an array, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    val n = math.min(v.numElements(), m * dsub)
    var ss = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      ss += x * x
      i += 1
    }
    val f = if (ss == 0.0) 1.0 else 1.0 / math.sqrt(ss)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        var d = 0.0
        var t = 0
        while (t < dsub) {
          val idx = s * dsub + t
          val x = if (idx >= n) 0.0 else (if (isFloat) v.getFloat(idx).toDouble else v.getDouble(idx))
          val diff = x * f - books((s * k + j) * dsub + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      // all locals through freshName (round-3 lesson: fixed names collide
      // when two instances land in one generated method)
      val n = ctx.freshName("n"); val ss = ctx.freshName("ss")
      val f = ctx.freshName("f"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      val t = ctx.freshName("t"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val idx = ctx.freshName("idx")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), ${m * dsub});
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $v.$get($i);
         |  $ss += $x * $x;
         |}
         |double $f = ($ss == 0.0) ? 1.0 : 1.0 / java.lang.Math.sqrt($ss);
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $dsub; $t++) {
         |      int $idx = $s * $dsub + $t;
         |      double $x = ($idx >= $n) ? 0.0 : (double) $v.$get($idx);
         |      double $diff = $x * $f - $booksRef[($s * $k + $j) * $dsub + $t];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $j; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object PqEncode {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column API: PQ codes (array<int>, length m) of a vector under a flat
    * codebook laid out `[(s·k + j)·dsub + i]`.
    */
  def pqEncode(v: Column, books: Array[Double], m: Int, k: Int): Column =
    column(PqEncode(expression(v), books, m, k))
}
