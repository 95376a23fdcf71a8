package graft.sync

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The two reference pipelines run end to end against the real testdata:
  * partition-level sync (data-s3-elastic-transfer) then row-level
  * reconciliation (ID-based-transfer), finishing in the reference's own
  * "fully in sync" acceptance state.
  */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("flagship partition sync then id reconciliation reaches in-sync state on events") {
    val idx = Files.createTempDirectory("graft_e2e").toString + "/idx"
    val events = Tables.withDay(Tables.loadEvents(spark, TestSpark.sfDir))

    // day 1: the source only has the first half of the month
    val half = events.filter(col("day") < "2024-01-16")
    val r1 = IncrementalSync.runPartitionSync(half, idx, "day", "event_id")
    assert(r1.partitionsMoved.nonEmpty && r1.rowsMoved === half.count())

    // re-run with the same source: nothing to move (T5 skip-completed)
    val r2 = IncrementalSync.runPartitionSync(half, idx, "day", "event_id")
    assert(r2.partitionsMoved.isEmpty && r2.rowsMoved === 0L)

    // day 2: the full month arrives; only the new days move
    val r3 = IncrementalSync.runPartitionSync(events, idx, "day", "event_id")
    assert(r3.partitionsMoved.forall(_ >= "2024-01-16"))
    assert(IncrementalSync.verifyInSync(events, spark.read.parquet(idx), "day", "event_id") === ((0L, 0L)))

    // sabotage: drop some rows from the sink → count reconcile detects it,
    // id-level reconciliation repairs it (the second reference pipeline)
    val damaged = spark.read.parquet(idx).filter(col("event_id") % 13 =!= 0)
    damaged.write.mode("overwrite").parquet(idx + "2")
    val moved = IncrementalSync.reconcileByIds(
      events, spark.read.parquet(idx + "2"), "day", "event_id", idx + "2", "__v")
    assert(moved > 0L)
    assert(IncrementalSync.verifyInSync(events, spark.read.parquet(idx + "2"), "day", "event_id") === ((0L, 0L)))
  }
}
