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

  test("contentReconcile catches count-equal value drift that countReconcile misses") {
    val s2 = Seq(("a", "Jan", "10"), ("b", "Jan", "11"), ("c", "Feb", "12")).toDF("id", "month", "v")
    // same ids, same counts, one drifted value in Jan
    val k2 = Seq(("a", "Jan", "10"), ("b", "Jan", "99"), ("c", "Feb", "12")).toDF("id", "month", "v")
    assert(Diff.countReconcile(s2, k2, "month").count() === 0L) // counts agree: blind
    val drift = Diff.contentReconcile(s2, k2, "month", Seq("id", "v")).collect()
    assert(drift.map(_.getString(0)).toSeq === Seq("Jan"))
    val row = drift.head
    assert(row.getLong(1) === row.getLong(2)) // counts equal...
    assert(row.getLong(3) !== row.getLong(4)) // ...sums differ
    // identical content reconciles to empty
    assert(Diff.contentReconcile(s2, s2.toDF(), "month", Seq("id", "v")).count() === 0L)
    // a missing partition still surfaces (count path)
    val k3 = k2.filter($"month" =!= "Feb")
    assert(Diff.contentReconcile(s2, k3, "month", Seq("id", "v"))
      .collect().map(_.getString(0)).toSet === Set("Jan", "Feb"))
  }

  test("changeSet emits exactly I/U/D, drops unchanged, null-safe on values") {
    val oldSnap = Seq(
      (1L, Some(10.0)), // unchanged → dropped
      (2L, Some(20.0)), // value changes → U
      (3L, Some(30.0)), // disappears → D
      (4L, None),       // null → value → U (null-safe compare)
      (5L, None)        // null → null → unchanged, dropped
    ).toDF("user_id", "value")
    val newSnap = Seq(
      (1L, Some(10.0)),
      (2L, Some(21.0)),
      (4L, Some(40.0)),
      (5L, None),
      (6L, Some(60.0)) // appears → I
    ).toDF("user_id", "value")
    val got = Diff.changeSet(oldSnap, newSnap, "user_id", Seq("value"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getString(3)))
      .toSet
    assert(got === Set(
      (2L, Some(20.0), Some(21.0), "U"),
      (3L, Some(30.0), None, "D"),
      (4L, None, Some(40.0), "U"),
      (6L, None, Some(60.0), "I")))
  }
}
