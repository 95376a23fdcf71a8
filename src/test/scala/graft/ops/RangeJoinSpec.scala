package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("banded range join equals the naive theta-join") {
    val a = Seq((1L, "u", 100L), (2L, "u", 250L), (3L, "v", 500L), (4L, "u", 1000L))
      .toDF("id", "k", "ts")
    val b = Seq((10L, "u", 120L), (11L, "u", 340L), (12L, "v", 499L), (13L, "w", 100L))
      .toDF("id", "k", "ts")

    val banded = RangeJoin.within(a, b, "k", "ts", band = 100L)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = a.as("a").join(b.as("b"),
        col("a.k") === col("b.k") && abs(col("a.ts") - col("b.ts")) <= 100)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(banded === naive)
    assert(banded === Set((1L, 10L), (2L, 11L), (3L, 12L))) // (2,10) is 130 apart — out of band
  }

  test("banded range join is an equi-join in the plan, not a nested loop") {
    val a = Seq((1L, "u", 100L)).toDF("id", "k", "ts")
    val plan = RangeJoin.within(a, a, "k", "ts", 50L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("interval overlap join equals the naive theta-join, each pair exactly once") {
    // spans many bins, zero-length intervals, touching endpoints, disjoint
    val a = Seq((1L, 0L, 1000L), (2L, 50L, 50L), (3L, 2000L, 2500L), (4L, 5000L, 5001L))
      .toDF("id", "s", "e")
    val b = Seq((10L, 999L, 1500L), (11L, 50L, 50L), (12L, 0L, 5000L), (13L, 6000L, 7000L))
      .toDF("id", "s", "e")
    for (w <- Seq(1L, 7L, 100L, 10000L)) {
      val binned = RangeJoin.intervalOverlap(a, b, "s", "e", binWidth = w)
        .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = a.as("a").join(b.as("b"),
          col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
        .select(col("a.id"), col("b.id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned.length === binned.toSet.size, s"duplicated pairs at binWidth=$w")
      assert(binned.toSet === naive, s"wrong pair set at binWidth=$w")
    }
  }

  test("interval overlap join is an equi-join in the plan, not a nested loop") {
    val a = Seq((1L, 0L, 10L)).toDF("id", "s", "e")
    val plan = RangeJoin.intervalOverlap(a, a, "s", "e", 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"overlap join must stay an equi-join:\n$plan")
  }
}
