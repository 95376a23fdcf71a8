package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `tables` sign-random-projection LSH buckets of a vector, fused into
  * one codegen loop, as `array<long>` (index = table).
  *
  * Decision record (SURVEY.md §7.3 "measure first"): the HOF form
  * (VectorFunctions.srpBucket, one `aggregate(zip_with(...))` chain per
  * plane) is interpreted — with 4 tables × 8 bits it dominated the ANN
  * bench query (≈7 s at sf0.1 for 2 000 vectors). This expression computes
  * tables × nBits × dim multiply-adds in generated Java.
  *
  * Hyperplane coefficients are deterministic, model-free pseudo-randoms:
  * coef(p, j) = XXH64(p·1000003 + j, seed 42) / Long.MaxValue ∈ [-1, 1] —
  * the same construction (hash of plane×dim) as the HOF form, evaluated
  * from the same engine-side primitive, so buckets are stable across runs
  * and sessions.
  */
case class SrpBuckets(child: Expression, nBits: Int, tables: Int) extends UnaryExpression {
  require(nBits > 0 && nBits <= 63 && tables > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(s"srp_buckets expects an array, got $other")
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"srp_buckets requires array<float|double>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val isFloat = elemType == FloatType
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < nBits) {
        val p = t * nBits + i
        var proj = 0.0
        var j = 0
        while (j < n) {
          val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
          proj += x * SrpBuckets.coef(p, j)
          j += 1
        }
        if (proj >= 0.0) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      // every local through freshName: two srp_buckets calls can land in
      // the SAME generated method, where fixed names collide (janino
      // "Redefinition of local variable" → silent interpreted fallback)
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val bucket = ctx.freshName("bucket")
      val i = ctx.freshName("i"); val p = ctx.freshName("p")
      val proj = ctx.freshName("proj"); val j = ctx.freshName("j")
      s"""
         |int $n = $v.numElements();
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $i = 0; $i < $nBits; $i++) {
         |    int $p = $t * $nBits + $i;
         |    double $proj = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $proj += ((double) $v.$get($j)) * graft.functions.SrpBuckets.coef($p, $j);
         |    }
         |    if ($proj >= 0.0) $bucket |= (1L << $i);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object SrpBuckets {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Deterministic plane coefficient in [-1, 1]; called from generated code. */
  def coef(planeId: Int, dimIdx: Int): Double =
    XXH64.hashInt(planeId * 1000003 + dimIdx, 42L).toDouble / Long.MaxValue.toDouble

  /** Column API: per-table SRP buckets as array<long>. */
  def srpBuckets(v: Column, nBits: Int, tables: Int): Column =
    column(SrpBuckets(expression(v), nBits, tables))
}
