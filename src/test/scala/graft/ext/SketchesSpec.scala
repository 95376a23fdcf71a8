package graft.ext

import graft.TestSpark
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("heavyHittersChecked: exact list, one-sided sketch guarantee holds") {
    // 100 a's (50%), 40 b's (20%), 60 spread over c0..c59 (<=0.5% each)
    val rows = Seq.fill(100)("a") ++ Seq.fill(40)("b") ++ (0 until 60).map(i => s"c$i")
    val df = rows.toDF("k").repartition(8)
    val got = Sketches.heavyHittersChecked(df, "k", num = 1, denom = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(t => (t._1, t._2)).toSet === Set(("a", 100L), ("b", 40L)))
    assert(got.forall(_._3), "freqItems containment guarantee violated")
  }

  test("heavyHittersChecked on the documents corpus: every >2% token is in-sketch") {
    val toks = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(explode(TextFunctions.tokens(col("text"))).as("term"))
    val got = Sketches.heavyHittersChecked(toks, "term", num = 1, denom = 50).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getBoolean(2)))
  }

  test("rejects degenerate thresholds") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHittersChecked(Seq("x").toDF("k"), "k", num = 3, denom = 2)
    }
  }

  test("countMinChecked: exact counts, both CMS bounds hold, rank-K tie deterministic") {
    val keys = (Seq.fill(30)("hot") ++ Seq.fill(20)("warm") ++
      Seq.fill(5)("tie_a") ++ Seq.fill(5)("tie_b") ++ (1 to 10).map(i => s"cold$i")).toDF("k")
    val got = Sketches.countMinChecked(keys, "k", topK = 3, eps = 0.01, confidence = 0.99, seed = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    // ties at the boundary break by key: tie_a wins over tie_b
    assert(got.map(t => (t._1, t._2)).sortBy(-_._2).toSeq ===
      Seq(("hot", 30L), ("warm", 20L), ("tie_a", 5L)))
    assert(got.forall(t => t._3 && t._4), s"CMS bounds must hold: ${got.mkString(",")}")
  }
}
