package graft.functions

import graft.TestSpark
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
