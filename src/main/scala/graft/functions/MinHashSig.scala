package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature of a shingle array — all `numHashes` components in
  * one native kernel per row.
  *
  * Decision record (SURVEY.md §7.3 "measure first"): the HOF form
  * (numHashes × `array_min(transform(...))`) is interpreted; the explode +
  * numHashes min-aggregates form is codegen'd but costs a shuffle per
  * signature build and forces callers to cache the result for reuse. This
  * expression computes component i = min over shingles of
  * xxhash64(i, shingle) in a single fused loop — signature construction is
  * a pure projection at scan speed, cheap enough to recompute instead of
  * cache, which is the property that matters when the corpus is 100 TB.
  *
  * Hash parity with the prior forms: Spark's `xxhash64(lit(i), s)` folds
  * seed 42 through its children — hashInt(i, 42) then hashBytes(s, ·) —
  * reproduced here exactly (seeds precomputed per component), so
  * signatures are bit-identical to the explode/HOF forms.
  *
  * An empty shingle array yields Long.MaxValue components (min over the
  * empty set); `Dedup.shingles` never emits an empty array.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData) " +
        s"graft.functions.MinHashSig.sig($arr, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.GraftExpressionBridge._

  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes,
      n => Array.tabulate(n)(i => XXH64.hashInt(i, 42L)))

  /** Shared kernel for interpreted eval and codegen. Null elements are
    * skipped, matching Spark's xxhash64 semantics over arrays with nulls —
    * internal callers never emit them, but the function is SQL-registered
    * so arbitrary `array('a', NULL)` input must not NPE.
    */
  def sig(arr: ArrayData, numHashes: Int): GenericArrayData = {
    val sds = seeds(numHashes)
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, sds(j))
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: MinHash signature (array<long>) of an array<string>. */
  def minhashSig(shingles: Column, numHashes: Int): Column =
    column(MinHashSig(expression(shingles), numHashes))
}
