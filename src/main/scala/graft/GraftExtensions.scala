package graft

import graft.functions.{CosineSimilarity, SrpBuckets}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's custom codegen expressions.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` (spark-submit / conf) —
  *    the [[SparkSessionExtensions]] injection point;
  *  - [[GraftExtensions.register]] for an already-running session.
  *
  * SQL: `cosine_sim(vecA, vecB)`, `srp_buckets(vec, nBits, tables)`,
  * `simhash64(tokens)`, `minhash_sig(shingles, numHashes)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // whole-operator extension: plans graft.plans.AsOfJoinNode
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // algebraic rewrite: day-string filters → raw ts ranges (scan pushdown)
    e.injectOptimizerRule(_ => graft.plans.TsRangePushdown)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      "cosine_sim",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim(vecA, vecB)")
        CosineSimilarity(exprs(0), exprs(1))
      }),
    (
      "srp_buckets",
      new ExpressionInfo(classOf[SrpBuckets].getName, "srp_buckets"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "srp_buckets(vec, nBits, tables)")
        SrpBuckets(exprs(0), intLit(exprs(1), "nBits"), intLit(exprs(2), "tables"))
      }),
    (
      "simhash64",
      new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash64(tokens)")
        graft.functions.SimHash64(exprs(0))
      }),
    (
      "minhash_sig",
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "minhash_sig(shingles, numHashes)")
        graft.functions.MinHashSig(exprs(0), intLit(exprs(1), "numHashes"))
      }),
    (
      "char_ngrams",
      new ExpressionInfo(classOf[graft.functions.CharNgrams].getName, "char_ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "char_ngrams(text, n)")
        graft.functions.CharNgrams(exprs(0), intLit(exprs(1), "n"))
      }),
    (
      "word_ngrams",
      new ExpressionInfo(classOf[graft.functions.WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "word_ngrams(tokens, n)")
        graft.functions.WordNgrams(exprs(0), intLit(exprs(1), "n"))
      }),
    (
      "jaro_winkler",
      new ExpressionInfo(classOf[graft.functions.JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "jaro_winkler(a, b)")
        graft.functions.JaroWinkler(exprs(0), exprs(1))
      }),
    (
      "pq_encode",
      new ExpressionInfo(classOf[graft.functions.PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4, "pq_encode(vec, flatBooks, m, k)")
        // the codebook must be a compile-time constant (it becomes a
        // reference object in generated code); constant folding has not
        // run yet at function-resolution time, so accept any FOLDABLE
        // array<double> (array(1.0D, ...) is CreateArray, not Literal)
        val books = exprs(1) match {
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType, false) =>
            e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.DoubleType, true) =>
            e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"flatBooks must be a foldable array<double>, got $other")
        }
        graft.functions.PqEncode(exprs(0), books, intLit(exprs(2), "m"), intLit(exprs(3), "k"))
      }),
    (
      "dot_product",
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "dot_product(vecA, vecB)")
        graft.functions.DotProduct(exprs(0), exprs(1))
      }),
    (
      "normalize_unicode",
      new ExpressionInfo(classOf[graft.functions.NormalizeUnicode].getName, "normalize_unicode"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "normalize_unicode(text, 'NFC'|'NFKC'|'NFD'|'NFKD')")
        val form = exprs(1) match {
          case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case other => throw new IllegalArgumentException(
            s"form must be a string literal, got $other")
        }
        graft.functions.NormalizeUnicode(exprs(0), form)
      })
  )

  /** Register the functions into a live session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}
