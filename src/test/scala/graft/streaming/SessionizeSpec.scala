package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gap-based sessionization closes sessions at inactivity boundaries") {
    // user 1: two sessions (gap of 10 min between them); user 2: one long session
    val rows = Seq(
      (1L, 0L), (1L, 60_000L), (1L, 120_000L),            // session A: 3 events
      (1L, 720_000L), (1L, 750_000L),                     // session B: 2 events (gap 10 min)
      (2L, 0L), (2L, 100_000L), (2L, 200_000L), (2L, 900_000L) // gap 700s > 5 min
    ).map { case (u, ms) => (u, new java.sql.Timestamp(ms)) }
    val events = rows.toDF("user_id", "ts")

    val sessions = EventStream.sessionize(events, gapMs = 300_000L)
      .select("user_id", "n_events", "first_ts", "last_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3))

    // batch mode emits only gap-closed sessions (trailing open sessions
    // remain in state; in a stream they close via timeout)
    assert(sessions === Array(
      (1L, 3L, 0L, 120_000L),
      (2L, 3L, 0L, 200_000L)
    ))
  }

  test("batch gaps-and-islands sessionization agrees with the stateful form on closed sessions") {
    val rows = Seq(
      (1L, 0L), (1L, 60_000L), (1L, 120_000L), (1L, 720_000L), (1L, 750_000L),
      (2L, 0L), (2L, 100_000L), (2L, 200_000L), (2L, 900_000L)
    ).map { case (u, ms) => (u, new java.sql.Timestamp(ms)) }
    val events = rows.toDF("user_id", "ts")

    val batch = EventStream.sessionizeBatch(events, gapMs = 300_000L)
      .select("user_id", "n_events", "first_ms", "last_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val stateful = EventStream.sessionize(events, gapMs = 300_000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    // every stateful-closed session appears in the batch result; batch also
    // contains the trailing sessions the stateful form holds open
    assert(stateful.subsetOf(batch))
    assert(batch.size === stateful.size + 2)
  }

  test("sessionize handles unordered input within a batch") {
    val rows = Seq((1L, 120_000L), (1L, 0L), (1L, 60_000L), (1L, 900_000L))
      .map { case (u, ms) => (u, new java.sql.Timestamp(ms)) }
    val sessions = EventStream.sessionize(rows.toDF("user_id", "ts"), gapMs = 300_000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sessions.toSeq === Seq((1L, 3L))) // sorted before gap detection
  }
}
