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

  test("kmvDayIntersect: estimator path (days >> k) stays within the gate, exact side exact") {
    // two days of 2000 users overlapping in 800 — k=64 forces real
    // estimation (neither day's sketch holds the whole set)
    val du = ((0 until 2000).map(u => ("2024-01-01", u.toLong)) ++
      (1200 until 3200).map(u => ("2024-01-02", u.toLong)))
      .toDF("day", "user_id").repartition(8)
    val got = Sketches.kmvDayIntersect(du, k = 64, horizon = 7, relPct = 50, absErr = 20)
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("n_a") === 2000L && r.getAs[Long]("n_b") === 2000L)
    assert(r.getAs[Long]("inter") === 800L)
    assert(r.getAs[Double]("jacc") === 0.25)
    assert(r.getAs[Boolean]("approx_ok"), "k=64 estimate left the 50%+20 band")
    // tightening the band to 0%+0 must flip the gate unless the estimate
    // is exactly 800 — pins that the sketch path is genuinely estimating
    // (not silently falling back to the exact join)
    val strict = Sketches.kmvDayIntersect(du, k = 64, horizon = 7, relPct = 0, absErr = 0)
      .collect().head
    val full = Sketches.kmvDayIntersect(du, k = 4096, horizon = 7, relPct = 0, absErr = 0)
      .collect().head
    // with k >= |day| the sketch IS the set: zero-width gate must hold
    assert(full.getAs[Boolean]("approx_ok"), "complete sketch must be exact")
    assert(!strict.getAs[Boolean]("approx_ok") || strict.getAs[Long]("inter") === 800L)
  }
}
