package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mostRecent matches each left row with the latest right row at-or-before it") {
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u1", 300L),
      (4L, "u2", 150L), (5L, "u3", 500L)
    ).toDF("event_id", "user_id", "ts_ms")
    val right = Seq(
      ("u1", 100L, 10.0, 90L),  // exactly at left ts 100 → inclusive match
      ("u1", 250L, 20.0, 91L),
      ("u2", 160L, 30.0, 92L)   // after u2's event → no match
    ).toDF("user_id", "ts_ms", "value", "rid")

    val out = AsOfJoin.mostRecent(left, right, "user_id", "ts_ms", Seq("value"), tieBreak = "rid")
      .select(col("event_id"), col("asof_value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double])))
      .sortBy(_._1)

    assert(out === Array(
      (1L, Some(10.0)),  // ts 100 matches right at 100 (inclusive)
      (2L, Some(10.0)),  // ts 200: latest right ≤ 200 is 100
      (3L, Some(20.0)),  // ts 300: right at 250
      (4L, None),        // u2's only right row is later
      (5L, None)         // u3 has no right rows
    ))
  }

  test("native as-of join equals the composed form on the events table") {
    val e = graft.sources.Tables.loadEvents(spark, TestSpark.sfDir)
      .withColumn("ts_ms", unix_millis(col("ts")))
    val left = e.select("event_id", "user_id", "ts_ms")
    val right = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts_ms", "value", "event_id")

    def collectOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("asof_value"))
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1).toSeq

    val composed = collectOf(
      AsOfJoin.mostRecent(left, right, "user_id", "ts_ms", Seq("value"), tieBreak = "event_id"))
    val native = collectOf(
      AsOfJoin.mostRecentNative(left, right, "user_id", "ts_ms", Seq("value"), tieBreak = "event_id"))
    assert(native === composed)
  }

  test("native as-of join handles null keys/ts and empty right side") {
    val left = Seq(
      (1L, Option("u1"), Option(100L)),
      (2L, None: Option[String], Option(100L)),
      (3L, Option("u1"), None: Option[Long])
    ).toDF("event_id", "user_id", "ts_ms")
    val right = Seq(
      (Option("u1"), Option(50L), 1.0, 1L),
      (None: Option[String], Option(60L), 2.0, 2L),
      (Option("u1"), None: Option[Long], 3.0, 3L)
    ).toDF("user_id", "ts_ms", "value", "rid")
    val out = AsOfJoin.mostRecentNative(left, right, "user_id", "ts_ms", Seq("value"), "rid")
      .select(col("event_id"), col("asof_value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1).toSeq
    assert(out === Seq((1L, Some(1.0)), (2L, None), (3L, None)))

    val emptyRight = right.filter(col("rid") < 0)
    val out2 = AsOfJoin.mostRecentNative(left, emptyRight, "user_id", "ts_ms", Seq("value"), "rid")
      .count()
    assert(out2 === 3L)
  }

  test("native fast path (long keys) handles null keys and null ts") {
    val left = Seq(
      (1L, Option(5L), Option(100L)),
      (2L, Option.empty[Long], Option(100L)),
      (3L, Option(5L), Option.empty[Long])
    ).toDF("event_id", "user_id", "ts_ms")
    val right = Seq(
      (Option(5L), Option(50L), 1.0, 1L),
      (Option.empty[Long], Option(60L), 2.0, 2L),
      (Option(5L), Option.empty[Long], 3.0, 3L)
    ).toDF("user_id", "ts_ms", "value", "rid")
    val out = AsOfJoin.mostRecentNative(left, right, "user_id", "ts_ms", Seq("value"), "rid")
      .select(col("event_id"), col("asof_value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).sortBy(_._1).toSeq
    assert(out === Seq((1L, Some(1.0)), (2L, None), (3L, None)))
  }

  test("native as-of join plans one exchange per side and the custom exec") {
    val e = graft.sources.Tables.loadEvents(spark, TestSpark.sfDir)
      .withColumn("ts_ms", unix_millis(col("ts")))
    val left = e.select("event_id", "user_id", "ts_ms")
    val right = e.select("user_id", "ts_ms", "value", "event_id")
    val p = AsOfJoin.mostRecentNative(left, right, "user_id", "ts_ms", Seq("value"), "event_id")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoinExec") || p.contains("AsOfJoin"), s"custom exec must plan:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2,
      s"exactly one co-partitioning exchange per side:\n$p")
    assert(!p.contains("Window"), s"no window machinery in the native plan:\n$p")
  }

  test("null payload values backfill per column like the composed ignore-nulls window") {
    val left = Seq((1L, "u", 100L)).toDF("event_id", "user_id", "ts_ms")
    val right = Seq(
      ("u", 90L, Option(2.0), 5L),
      ("u", 100L, Option.empty[Double], 9L) // later row, null value: must not erase 2.0
    ).toDF("user_id", "ts_ms", "value", "rid")
    val composed = AsOfJoin.mostRecent(left, right, "user_id", "ts_ms", Seq("value"), "rid")
      .select("asof_value").as[Option[Double]].head()
    val native = AsOfJoin.mostRecentNative(left, right, "user_id", "ts_ms", Seq("value"), "rid")
      .select("asof_value").as[Option[Double]].head()
    assert(native === composed)
    assert(native === Some(2.0))
  }

  test("native tie-breaking matches composed when the tiebreak is null (nulls last)") {
    val left = Seq((1L, "u", 100L)).toDF("event_id", "user_id", "ts_ms")
    val right = Seq(
      ("u", 100L, 2.0, Some(5L)),
      ("u", 100L, 1.0, Option.empty[Long])
    ).toDF("user_id", "ts_ms", "value", "rid")
    val composed = AsOfJoin.mostRecent(left, right, "user_id", "ts_ms", Seq("value"), "rid")
      .select("asof_value").as[Double].head()
    val native = AsOfJoin.mostRecentNative(left, right, "user_id", "ts_ms", Seq("value"), "rid")
      .select("asof_value").as[Double].head()
    assert(native === composed)
    assert(native === 1.0) // the null-tie row sorts last among equal ts and wins
  }

  test("ties inside the right side at equal ts resolve to the highest tieBreak") {
    val left = Seq((1L, "u", 100L)).toDF("event_id", "user_id", "ts_ms")
    val right = Seq(("u", 100L, 1.0, 7L), ("u", 100L, 2.0, 9L), ("u", 100L, 1.5, 8L))
      .toDF("user_id", "ts_ms", "value", "rid")
    val v = AsOfJoin.mostRecent(left, right, "user_id", "ts_ms", Seq("value"), "rid")
      .select("asof_value").as[Double].head()
    assert(v === 2.0) // rid 9 sorts last among the ties → wins
  }
}
