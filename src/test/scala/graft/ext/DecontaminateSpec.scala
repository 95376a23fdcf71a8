package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // planted corpus: doc 10 contains benchmark doc 1's opening 4-gram,
  // doc 11 shares nothing, doc 12 is an exact copy of benchmark doc 2
  private def bench = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six seven")
  ).toDF("doc_id", "text")
  private def train = Seq(
    (10L, "noise alpha beta gamma delta other words here"),
    (11L, "completely disjoint vocabulary with no overlap at all"),
    (12L, "one two three four five six seven")
  ).toDF("doc_id", "text")

  test("contaminatedDocs finds exactly the leaky documents") {
    val got = Decontaminate.contaminatedDocs(train, bench, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 10: grams "alpha beta gamma delta" + "beta gamma delta epsilon"? no —
    // doc 10 lacks epsilon, so exactly 1 shared gram. doc 12: full copy of a
    // 7-token doc = 4 shared 4-grams.
    assert(got === Map(10L -> 1L, 12L -> 4L))
  }

  test("decontaminate removes leaky docs and keeps the clean ones") {
    val kept = Decontaminate.decontaminate(train, bench, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L))
  }

  test("contaminationReport keeps zero-leak benchmark docs with zeros") {
    val bench3 = bench.unionByName(Seq((3L, "untouched pristine held out sentence tokens")).toDF("doc_id", "text"))
    val got = Decontaminate.contaminationReport(train, bench3, "doc_id", "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 1L), (2L, 1L, 4L), (3L, 0L, 0L)))
  }

  test("probe side is a broadcast join — the corpus never shuffles for candidates") {
    val plan = Decontaminate.contaminatedDocs(train, bench, "doc_id", "text", n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast probe, got:\n$plan")
  }
}
