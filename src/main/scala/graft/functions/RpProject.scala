package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Rademacher random projection (Achlioptas, "Database-friendly random
  * projections"): y_j = (Σ_i x_i · s_{j,i}) / √k with s ∈ {+1,−1}, the
  * Johnson–Lindenstrauss dimensionality reduction that needs no Gaussian
  * sampling — a sign matrix is enough, and ±1 multiplies are exact in
  * IEEE, so the projection is bit-deterministic in any engine that sums
  * in index order.
  *
  * One fused codegen loop per row (the k·d multiply-add volume at scan
  * speed — same HOF→native rationale as [[PqEncode]]); the sign matrix
  * rides along as a flat `double[j·d + i]` reference object, so there is
  * no literal-size limit and the same array can be rendered into a SQL
  * oracle. Inner sum runs i-ascending, then one division by √k — the
  * exact op sequence of `list_dot_product(x, signs_j) / sqrt(k)`.
  * Input shorter than d is zero-padded (missing dims contribute 0).
  */
case class RpProject(child: Expression, signs: Array[Double], k: Int)
    extends UnaryExpression {
  require(k > 0 && signs.length % k == 0 && signs.length > 0,
    s"sign matrix length ${signs.length} not divisible by k=$k")

  private val d: Int = signs.length / k

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"rp_project expects an array, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rp_project requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    val n = math.min(v.numElements(), d)
    // DIVIDE by √k (not multiply by a reciprocal): x/√k and x·(1/√k)
    // differ in IEEE for general k, and the SQL oracle divides
    val sqrtK = math.sqrt(k.toDouble)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * signs(j * d + i)
        i += 1
      }
      out(j) = s / sqrtK
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    val signsRef = ctx.addReferenceObj("rpSigns", signs, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val sqrtK = ctx.freshName("sqrtK")
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $d);
         |double $sqrtK = java.lang.Math.sqrt((double) $k);
         |double[] $out = new double[$k];
         |for (int $j = 0; $j < $k; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $v.$get($i)) * $signsRef[$j * $d + $i];
         |  }
         |  $out[$j] = $s / $sqrtK;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object RpProject {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column API: k-dim Rademacher projection under a flat ±1 sign matrix
    * laid out `[j·d + i]`.
    */
  def rpProject(v: Column, signs: Array[Double], k: Int): Column =
    column(RpProject(expression(v), signs, k))

  /** Deterministic ±1 sign matrix from MD5 parity of "rp_<j>_<i>" — the
    * same bytes any engine computes, so an oracle can re-derive or inline
    * the identical matrix.
    */
  def signMatrix(k: Int, d: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k * d) { idx =>
      val j = idx / d; val i = idx % d
      val h = md.digest(s"rp_${j}_$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
  }
}
