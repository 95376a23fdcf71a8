package graft.ext

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PQSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def embs = Tables.load(spark, TestSpark.sfDir, "embeddings")
  private lazy val model = PQ.train(embs, "vec_id", "embedding", dim = 64, m = 8, k = 16)

  test("train is deterministic and shapes the codebook correctly") {
    val m2 = PQ.train(embs, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    assert(model.codebooks.length === 8)
    assert(model.codebooks.forall(b => b.length === 16 && b.forall(_.length === 8)))
    assert(model.flatBooks.toSeq === m2.flatBooks.toSeq, "training must be bit-reproducible")
    intercept[IllegalArgumentException] {
      PQ.train(embs, "vec_id", "embedding", dim = 64, m = 7)
    }
  }

  test("native PqEncode codes are bit-identical to the HOF executable spec") {
    val nat = PQ.encode(embs, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val hof = PQ.encodeHof(embs, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(nat.size === hof.size)
    nat.foreach { case (id, codes) =>
      assert(codes.length === 8 && codes.forall(c => c >= 0 && c < 16))
      assert(codes === hof(id), s"code mismatch for vec $id")
    }
  }

  test("native PqAdcTable is bit-identical to the literal-codeword Column spec") {
    import graft.functions.VectorFunctions
    val q = embs.filter(col("vec_id") < 50)
      .select(col("vec_id"), VectorFunctions.l2Normalize(col("embedding")).as("nq"))
    val nat = q.select(col("vec_id"),
        graft.functions.PqAdcTable.pqAdcTable(col("nq"), model.flatBooks, model.m, model.k).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val hof = q.select(col("vec_id"), PQ.adcTableHof(col("nq"), model).as("adc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(nat.size === hof.size && nat.nonEmpty)
    nat.foreach { case (id, adc) =>
      assert(adc.length === model.m * model.k)
      assert(adc === hof(id), s"ADC table mismatch for query $id")
    }
  }

  test("PqAdcTable under-length input: kernel returns partial sums where the HOF null-pads") {
    // The bit-identity contract above holds for inputs with >= m*dsub
    // elements (every caller: fixed-width vectors). On a SHORTER input
    // the forms diverge BY DESIGN of the HOF: zip_with null-pads, so the
    // HOF's aggregate yields NULL entries, while the native kernel skips
    // missing elements and returns the partial sum. Pin the divergence so
    // it can never drift silently into a caller with variable-width input.
    import spark.implicits._
    val dsub = model.flatBooks.length / (model.m * model.k)
    val short = Seq((1L, Array.fill(dsub / 2 + 1)(0.25))).toDF("vec_id", "nq")
    val nat = short.select(
        graft.functions.PqAdcTable.pqAdcTable(col("nq"), model.flatBooks, model.m, model.k).as("adc"))
      .head().getSeq[Double](0)
    assert(nat.length === model.m * model.k && nat.forall(d => !d.isNaN),
      "kernel must return defined partial sums for under-length input")
    val hof = short.select(PQ.adcTableHof(col("nq"), model).as("adc")).head()
    val hofArr = hof.getSeq[java.lang.Double](0)
    // every entry is NULL under the HOF: even subvector 0 is partial, so
    // zip_with null-pads the missing elements and the aggregate goes NULL
    assert(hofArr.forall(_ == null),
      "HOF spec must null-pad under-length subvectors — if this ever changes, " +
        "re-examine PqAdcTable's skip semantics")
  }

  test("PqEncode fuses into whole-stage codegen and the generated code compiles") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    // parquet-backed, no repartition in between: pure projection over the
    // scan (a local Seq relation constant-folds; NOTES.md). Two DISTINCT
    // instances on purpose — fixed codegen local names would collide in
    // the fused method (the round-3 janino lesson).
    val df = embs.select(
      graft.functions.PqEncode.pqEncode(col("embedding"), model.flatBooks, 8, 16).as("c1"),
      graft.functions.PqEncode.pqEncode(reverse(col("embedding")), model.flatBooks, 8, 16).as("c2"))
    val stages = df.queryExecution.executedPlan.collect { case w: WholeStageCodegenExec => w }
    assert(stages.nonEmpty, "projection did not fuse into whole-stage codegen")
    stages.foreach { w => CodeGenerator.compile(w.doCodeGen()._2) } // throws on janino error
    assert(df.count() === embs.count())
  }

  test("adcTopK with exact rerank recovers most of the brute-force top-k") {
    val q = embs.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(embs, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = PQ.adcTopK(embs, q, "vec_id", "embedding", 10, model, shortlist = 300)
      .collect()
    // rerank scores are the exact cosine: spot-check determinism + shape
    assert(ann.length === 200) // 20 queries x k=10
    val recall = ann.map(r => (r.getLong(0), r.getLong(2))).count(brute) / brute.size.toDouble
    assert(recall >= 0.9, s"PQ recall $recall below expectation at this shortlist")
  }

  test("the recall gate query passes every decile") {
    val rows = graft.SparkEntry.queries("x_pq_recall")(spark, TestSpark.sfDir).collect()
    assert(rows.length === 10)
    rows.foreach(r => assert(r.getBoolean(3), s"decile ${r.getLong(0)} below gate"))
  }

  test("ivfAdcTopK: compound IVF+PQ recall clears the gate; scores are exact cosines") {
    val (cents, _) = Similarity.kmeansCentroids(embs, "vec_id", "embedding", k = 8, iters = 0, dim = 64)
    val q = embs.filter(col("vec_id") < 10)
    val got = PQ.ivfAdcTopK(embs, q, "vec_id", "embedding", 5, cents, nProbe = 7, model, shortlist = 200)
      .collect()
    assert(got.length === 50) // 10 queries x k=5
    val brute = Similarity.bruteTopK(embs, q, "vec_id", "embedding", 5)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    // rerank scores are true cosines wherever the sets overlap
    got.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach(exp => assert(r.getDouble(3) === exp))
    }
    val recall = got.map(r => (r.getLong(0), r.getLong(2))).count(brute.contains) / brute.size.toDouble
    assert(recall >= 0.8, s"compound recall $recall unexpectedly low at these parameters")
    // the gate query itself
    val rows = graft.SparkEntry.queries("x_ivfpq_recall")(spark, TestSpark.sfDir).collect()
    assert(rows.length === 10 && rows.forall(_.getBoolean(3)))
  }
}
