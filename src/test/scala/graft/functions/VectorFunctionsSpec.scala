package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions.reverse
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs = Seq(
    (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
    (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f))
  ).toDF("a", "b")

  test("dot, l2Norm, cosine, sqDist") {
    val rows = pairs.select(
      VectorFunctions.dot($"a", $"b"),
      VectorFunctions.l2Norm($"a"),
      VectorFunctions.cosine($"a", $"b"),
      VectorFunctions.sqDist($"a", $"b")).as[(Double, Double, Double, Double)].collect()
    assert(rows(0)._1 === 32.0)
    assert(math.abs(rows(0)._2 - math.sqrt(14)) < 1e-12)
    assert(math.abs(rows(0)._3 - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-12)
    assert(rows(0)._4 === 27.0)
    assert(rows(1)._3 === 0.0)  // orthogonal
    assert(rows(2)._3 === 0.0)  // zero-norm guard, not NaN
  }

  test("native dot expression is bit-identical to the HOF specification") {
    val embs = graft.sources.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
    val a = embs.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = embs.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val diffs = a.join(b, $"ia" % 37 === $"ib" % 37)
      .select(
        VectorFunctions.dot($"va", $"vb").as("native"),
        VectorFunctions.dotHof($"va", $"vb").as("hof"))
      .where($"native" =!= $"hof")
      .count()
    assert(diffs === 0L)
  }

  test("native cosine expression is bit-identical to the HOF specification") {
    val embs = graft.sources.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
    val a = embs.select($"vec_id".as("ia"), $"embedding".as("va"))
    val b = embs.select($"vec_id".as("ib"), $"embedding".as("vb"))
    val diffs = a.join(b, $"ia" % 37 === $"ib" % 37) // a spread of pairs
      .select(
        VectorFunctions.cosine($"va", $"vb").as("native"),
        VectorFunctions.cosineHof($"va", $"vb").as("hof"))
      .where($"native" =!= $"hof")
      .count()
    assert(diffs === 0L)
  }

  test("two native expressions in one projection stay codegen-compilable") {
    // regression: doGenCode used fixed Java local names ("i", "n", ...), so
    // two instances fused into the SAME generated method collided (janino
    // "Redefinition of local variable") and silently fell back to the
    // interpreter. Compile the fused stage directly — a fallback would pass
    // a value-only check.
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    // parquet-backed input: a local Seq relation is constant-folded to a
    // LocalRelation at optimize time and never reaches codegen at all
    val embs = graft.sources.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
    // distinct child trees on purpose: identical instances are merged by
    // subexpression elimination and would not reproduce the collision
    val df = embs.select(
      CosineSimilarity.cosineSim($"embedding", $"embedding").as("c1"),
      CosineSimilarity.cosineSim(reverse($"embedding"), $"embedding").as("c2"),
      SrpBuckets.srpBuckets($"embedding", 8, 2).as("s1"),
      SrpBuckets.srpBuckets(reverse($"embedding"), 8, 2).as("s2"))
    val stages = df.queryExecution.executedPlan.collect { case w: WholeStageCodegenExec => w }
    assert(stages.nonEmpty, "projection did not fuse into whole-stage codegen")
    stages.foreach { w => CodeGenerator.compile(w.doCodeGen()._2) } // throws on janino error
    val r = df.collect()
    assert(r.forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-9)) // cos(v, v) = 1
  }

  test("srpBucket is deterministic and bucket-stable for identical vectors") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f)),
      (3L, Seq(-1.0f, -2.0f, -3.0f))
    ).toDF("id", "v")
    val buckets = df.select(VectorFunctions.srpBucket($"v", 8)).as[Long].collect()
    assert(buckets(0) === buckets(1))
    // antipodal vector flips every sign bit
    assert((buckets(0) ^ buckets(2)) === 0xffL)
  }
}
