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
}
