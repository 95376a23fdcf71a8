package graft.sync

import graft.ops.Diff
import graft.sinks.{EsBulkSink, Upsert}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's two pipelines re-expressed as distributed plans
  * (SURVEY.md §3.1/§3.2, §2.9).
  *
  * `data-s3-elastic-transfer.py  main()` — partition-incremental sync — was:
  * collect source months, collect sink months, Python set-diff, then per
  * month: scan, rdd.map to dicts, zipWithIndex re-scan per 50 000-row batch,
  * POST from the driver. Here the whole thing is TWO jobs regardless of how
  * many partitions are missing: one anti-join to plan, one distributed
  * semi-join + write to move the data. No per-batch re-scans, nothing
  * funnels through the driver.
  *
  * `ID-based-transfer.py  main()` — row-level reconciliation — was serial
  * driver Python (Athena polling, 10 000-doc ES cursor pages, Python set
  * difference, chunked IN-lists, pandas iterrows). Here: one count
  * reconciliation plan + one anti-join + one idempotent upsert.
  */
object IncrementalSync {

  /** Result of a partition-level sync: which partitions moved, how many rows. */
  final case class SyncReport(partitionsMoved: Seq[String], rowsMoved: Long)

  /** T1+T5: move every source partition absent from the sink, skipping
    * already-present ones (`data-s3-elastic-transfer.py:287-291`). One
    * semi-join selects all missing partitions' rows at once — per-partition
    * looping (reference `:296`) is left to Spark's task scheduler.
    *
    * Progress accounting (the reference's printed running totals,
    * `data-s3-elastic-transfer.py:344-356`) rides on `observe()` metrics:
    * the row count and per-partition spread are measured DURING the sink
    * write, not by a separate `count()` job — one scan of the moved data
    * instead of two, which at 100 TB is the whole cost of the sync again.
    * `writeSink` must run at least one action over the rows it receives
    * (every sink does — that's what makes it a sink); the observation is
    * filled by that action.
    */
  def syncMissingPartitions(
      source: DataFrame,
      sinkState: DataFrame,
      partCol: String,
      writeSink: DataFrame => Unit): SyncReport = {
    val missing = Diff.partitionDiff(source, sinkState, partCol).cache()
    try {
      val parts = missing.collect().map(_.getString(0)).toSeq.sorted
      if (parts.isEmpty) SyncReport(Seq.empty, 0L)
      else {
        val obs = org.apache.spark.sql.Observation("graft_sync")
        val rows = source.join(missing, Seq(partCol), "left_semi")
          .observe(obs, count(lit(1)).as("rows_moved"),
            // CollectMetrics forbids DISTINCT aggregates; the HLL sketch
            // is progress telemetry, exactness lives in `parts`
            approx_count_distinct(col(partCol)).as("parts_seen"))
        writeSink(rows)
        SyncReport(parts, obs.get("rows_moved").asInstanceOf[Long])
      }
    } finally { missing.unpersist(): Unit }
  }

  /** T2: row-level reconciliation — rows whose id the sink lacks, coerced
    * and upserted idempotently (K3). `reconcile first`: only partitions whose
    * counts mismatch are even scanned for ids, mirroring
    * `ID-based-transfer.py:299-309` but as joins.
    */
  def reconcileByIds(
      source: DataFrame,
      sinkState: DataFrame,
      partCol: String,
      idCol: String,
      indexDir: String,
      versionCol: String): Long = {
    val mismatched = Diff.countReconcile(source, sinkState, partCol).select(partCol)
    val candidates = source.join(mismatched, Seq(partCol), "left_semi")
    val missing = Diff.missingRows(candidates, sinkState, idCol)
      .withColumn(versionCol, lit(System.currentTimeMillis()))
    val n = missing.count()
    if (n > 0) EsBulkSink.upsertById(missing, indexDir, idCol, versionCol)
    n
  }

  /** The flagship pipeline (`data-s3-elastic-transfer.py main()`) end to
    * end: discover sink state, plan missing partitions, move their rows
    * into the emulated index as idempotent upserts, and report. The
    * reference's version is ~120 lines of driver orchestration with
    * per-batch re-scans; this is one plan + one write per run, and safely
    * re-runnable (idempotent ids + partition skip).
    */
  def runPartitionSync(source: DataFrame, indexDir: String, partCol: String, idCol: String): SyncReport = {
    val spark = source.sparkSession
    val sinkState =
      if (new java.io.File(indexDir).exists()) spark.read.parquet(indexDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], source.schema.add("__v", "long"))
    syncMissingPartitions(source, sinkState, partCol,
      rows => EsBulkSink.upsertById(
        rows.withColumn("__v", lit(System.currentTimeMillis())), indexDir, idCol, "__v"))
  }

  /** T5 at the AGGREGATE level: incremental materialized-view refresh.
    * The MV is a partition-per-`partCol` parquet table of `agg` results;
    * a refresh computes `agg` ONLY over source partitions the MV lacks
    * (partition-pruned scan) and appends them — new data never triggers a
    * full recompute. At 100 TB this is the difference between aggregating
    * one day and aggregating years; correctness holds because `agg` is
    * computed per-partition (no cross-partition state).
    * Returns the partitions added this refresh.
    */
  def incrementalAggRefresh(
      source: DataFrame,
      aggDir: String,
      partCol: String,
      agg: DataFrame => DataFrame): Seq[String] = {
    val spark = source.sparkSession
    val have =
      if (new java.io.File(aggDir).exists())
        spark.read.parquet(aggDir).select(partCol).distinct()
      else source.select(partCol).distinct().limit(0)
    val missing = Diff.partitionDiff(source, have, partCol).cache()
    try {
      val parts = missing.collect().map(_.getString(0)).toSeq.sorted
      if (parts.nonEmpty) {
        agg(source.join(missing, Seq(partCol), "left_semi"))
          .write.mode("append").partitionBy(partCol).parquet(aggDir)
      }
      parts
    } finally { missing.unpersist(): Unit }
  }

  /** Post-sync acceptance check, ported from the reference's own invariant
    * (`ID-based-transfer.py:94-106`): per-partition counts must match and
    * the id sets must be equal. Returns (mismatchedPartitionCount,
    * missingIdCount) — (0, 0) means in sync.
    */
  def verifyInSync(source: DataFrame, sink: DataFrame, partCol: String, idCol: String): (Long, Long) = {
    val dedupSink = Upsert.dedupKeepMin(sink, Seq(idCol), idCol)
    val countMismatches = Diff.countReconcile(source, dedupSink, partCol).count()
    val missingIds = Diff.idDiff(source, dedupSink, idCol).count()
    (countMismatches, missingIds)
  }
}
