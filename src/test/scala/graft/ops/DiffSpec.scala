package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def src = Seq(
    ("a", "Jan"), ("b", "Jan"), ("c", "Feb"), ("d", "Feb"), ("e", "Mar")
  ).toDF("id", "month")
  // sink: missing all of Mar (partition gap) and id 'b' (row gap)
  private def sink = Seq(("a", "Jan"), ("c", "Feb"), ("d", "Feb")).toDF("id", "month")

  test("partitionDiff finds only wholly/partially missing partitions' keys") {
    val missing = Diff.partitionDiff(src, sink, "month").as[String].collect().sorted
    assert(missing === Array("Mar"))
  }

  test("idDiff finds missing row ids") {
    val missing = Diff.idDiff(src, sink, "id").as[String].collect().sorted
    assert(missing === Array("b", "e"))
  }

  test("countReconcile reports mismatched partitions with coalesced zeros") {
    val rec = Diff.countReconcile(src, sink, "month")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rec === Array(("Jan", 2L, 1L), ("Mar", 1L, 0L))) // Feb matches → absent
  }

  test("missingRows fuses idDiff + fetch") {
    val rows = Diff.missingRows(src, sink, "id").select("id").as[String].collect().sorted
    assert(rows === Array("b", "e"))
  }

  test("idDiffBloom equals plain idDiff on the events table") {
    val events = graft.sources.Tables.load(spark, graft.TestSpark.sfDir, "events")
    val sink = events.filter($"event_id" % 10 =!= 0)
    val plain = Diff.idDiff(events, sink, "event_id").as[Long].collect().sorted
    val bloom = Diff.idDiffBloom(events, sink, "event_id", expectedSinkIds = 1000L, fpp = 0.03)
      .as[Long].collect().sorted
    assert(bloom.toSeq === plain.toSeq)
  }

  test("fetchByKeys is a semi-join (no duplication, no key-side columns)") {
    val keys = Seq("a", "a", "e").toDF("id") // duplicate keys must not duplicate rows
    val got = Diff.fetchByKeys(src, keys, "id").select("id").as[String].collect().sorted
    assert(got === Array("a", "e"))
  }
}
