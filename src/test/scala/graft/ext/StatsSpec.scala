package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groupedLinReg recovers an exact linear relation (slope, intercept, r = 1)") {
    val df = (1 to 50).flatMap(i => Seq(("g1", i, 2 * i + 3), ("g2", i, 7 * i - 5)))
      .toDF("g", "x", "y")
    val got = Stats.groupedLinReg(df, Seq("g"), col("x"), col("y"))
      .orderBy("g").collect()
    assert(got.length === 2)
    val g1 = got(0); val g2 = got(1)
    assert(g1.getString(0) === "g1" && g1.getLong(1) === 50L)
    assert(g1.getDouble(2) === 2.0 && g1.getDouble(3) === 3.0 && g1.getDouble(4) === 1.0)
    assert(g2.getDouble(2) === 7.0 && g2.getDouble(3) === -5.0 && g2.getDouble(4) === 1.0)
  }

  test("groupedLinReg: negative slope and r = -1 on a descending relation") {
    val df = (1 to 20).map(i => ("g", i, 100 - 4 * i)).toDF("g", "x", "y")
    val r = Stats.groupedLinReg(df, Seq("g"), col("x"), col("y")).collect().head
    assert(r.getDouble(2) === -4.0 && r.getDouble(3) === 100.0 && r.getDouble(4) === -1.0)
  }

  test("groupedLinReg: zero x-variance group yields NULL slope/intercept/r, not a crash") {
    val df = Seq(("g", 5, 1), ("g", 5, 2), ("g", 5, 3)).toDF("g", "x", "y")
    val r = Stats.groupedLinReg(df, Seq("g"), col("x"), col("y")).collect().head
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }

  test("groupedLinReg is one map-side-combined aggregation — a single exchange, no join") {
    val df = (1 to 100).map(i => (s"g${i % 4}", i, 3 * i + 1)).toDF("g", "x", "y")
    val plan = Stats.groupedLinReg(df, Seq("g"), col("x"), col("y"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"closed-form solve must not join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 1, s"exactly one exchange expected:\n$plan")
  }

  test("logisticIrls is partitioning-invariant: decimal sums make the fit bit-identical") {
    // the classic nondeterminism failure mode for iterative fits is
    // float accumulation order varying with partitioning; the quantized
    // Newton steps must not exhibit it
    val pts = (1 to 500).map(i => (i % 37, if (i % 37 > 18 ^ i % 11 == 0) 1 else 0))
      .toDF("x", "y")
    def fit(d: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val (_, coef) = Stats.logisticIrls(d, col("x"), col("y"), 3)
      val r = coef.collect().head
      (r.getDouble(0), r.getDouble(1))
    }
    val a = fit(pts.repartition(1))
    val b = fit(pts.repartition(13))
    assert(a === b, s"fit varies with partitioning: $a vs $b")
    // and the fit moved off the origin (the data is actually separable-ish)
    assert(a._1 != 0.0 || a._2 != 0.0)
  }

  test("logisticIrls recovers the direction of a monotone relationship") {
    // y mostly 1 above the midpoint of x: slope must come out positive
    val pts = (1 to 400).map { i =>
      val x = i % 21
      (x, if (x + (i % 3) > 11) 1 else 0)
    }.toDF("x", "y")
    val (_, coef) = Stats.logisticIrls(pts, col("x"), col("y"), 3)
    val r = coef.collect().head
    assert(r.getDouble(1) > 0.0, s"expected positive slope, got ${r.getDouble(1)}")
  }
}
