package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AnonymizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (city, job): "a"-city rows are plentiful, the ("b", "y") class is a
  // singleton that only reaches k at full suppression
  private lazy val df = Seq(
    ("a", "x", 1L), ("a", "x", 2L), ("a", "y", 3L), ("a", "y", 4L),
    ("b", "y", 5L)).toDF("city", "job", "id")

  test("ladder assigns the smallest level whose class reaches k") {
    val out = Anonymize.fullDomainLadder(df, Seq("city", "job"), k = 2)
      .select("id", "anon_level", "gen_city", "gen_job")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2), r.getString(3)))).toMap
    assert(out(1L) === ((0, "a", "x")) && out(2L) === ((0, "a", "x")))
    assert(out(3L) === ((0, "a", "y")) && out(4L) === ((0, "a", "y")))
    // ("b","y") class size 1; city "b" class size 1; only full suppression left
    assert(out(5L) === ((2, "*", "*")))
  }

  test("every emitted class at each level satisfies k over the kept prefix") {
    val out = Anonymize.fullDomainLadder(df, Seq("city", "job"), k = 2)
      .select("gen_city", "gen_job").collect().map(r => (r.getString(0), r.getString(1)))
    val sizes = out.groupBy(identity).view.mapValues(_.length)
    sizes.foreach { case (cls, n) =>
      if (cls != (("*", "*"))) assert(n >= 2, s"class $cls leaked with size $n")
    }
  }

  test("class sizes reach the scan as broadcasts — the data never shuffles") {
    val plan = Anonymize.fullDomainLadder(df, Seq("city", "job"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"QI count tables must broadcast:\n$plan")
  }
}
