package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeUnicodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("NFC composes combining sequences; ASCII and already-NFC pass through") {
    val d = Seq(
      (1L, "cafe\u0301"),          // e + combining acute -> é
      (2L, "caf\u00e9"),           // already composed
      (3L, "plain ascii"),
      (4L, "u\u0308ber a\u030angstro\u0308m") // multiple marks
    ).toDF("id", "s")
    val out = d.select($"id", NormalizeUnicode.normalizeUnicode($"s").as("n"),
      length($"s").as("lr"), length(NormalizeUnicode.normalizeUnicode($"s")).as("ln"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L)._1 === "caf\u00e9" && out(1L)._2 === 5 && out(1L)._3 === 4)
    assert(out(2L)._1 === "caf\u00e9" && out(2L)._2 === 4)
    assert(out(3L)._1 === "plain ascii")
    assert(out(4L)._1 === "\u00fcber \u00e5ngstr\u00f6m" && out(4L)._3 === out(4L)._2 - 3)
  }

  test("NFD decomposes; NFKC folds compatibility forms; bad form rejected") {
    val one = Seq(Tuple1("caf\u00e9 \ufb01ne \u2460")).toDF("s") // é, fi-ligature, circled-1
    val r = one.select(
      NormalizeUnicode.normalizeUnicode($"s", "NFD").as("nfd"),
      NormalizeUnicode.normalizeUnicode($"s", "NFKC").as("nfkc")).head()
    assert(r.getString(0).startsWith("cafe\u0301"))
    assert(r.getString(1) === "caf\u00e9 fine 1")
    intercept[IllegalArgumentException] {
      NormalizeUnicode.normalizeUnicode($"s", "NFX")
    }
  }

  test("normalization stays inside whole-stage codegen on a parquet scan") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val docs = graft.sources.Tables.load(spark, graft.TestSpark.sfDir, "documents")
    val df = docs.select(
      NormalizeUnicode.normalizeUnicode($"text").as("n1"),
      NormalizeUnicode.normalizeUnicode(upper($"text")).as("n2"))
    val stages = df.queryExecution.executedPlan.collect { case w: WholeStageCodegenExec => w }
    assert(stages.nonEmpty, "projection did not fuse into whole-stage codegen")
    stages.foreach { w => CodeGenerator.compile(w.doCodeGen()._2) }
    assert(df.count() > 0)
  }
}
