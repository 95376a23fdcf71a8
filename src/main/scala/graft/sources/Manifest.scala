package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max manifest and manifest-driven file pruning — the
  * Delta/Iceberg-style coarse index over a parquet layout. The reference's
  * only scan-narrowing device is partition-directory listing
  * (data-s3-elastic-transfer.py:281-291 walks S3 prefixes); a manifest
  * generalizes that from DIRECTORY names to VALUE RANGES PER FILE, so a
  * range predicate on any clustered column skips whole files before a
  * single task is scheduled.
  *
  * [[build]] computes one row per data file: row count plus min/max of the
  * requested columns. Here that is one aggregation over the data (grouped
  * by `input_file_name()`); in a production writer the same rows fall out
  * of the write itself (per-task aggregates at commit time, the
  * Delta-transaction-log pattern) or straight from parquet footer
  * statistics without touching data pages. Either way the manifest is
  * METADATA-scale — one row per file — so consulting it costs a scan of
  * file COUNT rows, never data bytes, and the result list is a bounded
  * driver collect like every partition-list decision in this engine.
  *
  * [[prunedRead]] turns a range predicate into: (a) a manifest filter
  * keeping files whose [min,max] interval intersects [lo,hi]; (b) a
  * parquet read of ONLY those files; (c) the caller re-applies the exact
  * predicate as the residual (file grain is coarse — kept files still get
  * parquet row-group min/max skipping from the pushed filter). With a
  * clustered layout ([[graft.sinks.Compaction]].clusteredWrite /
  * zorderWrite) the kept fraction approaches the predicate's selectivity;
  * unclustered, every file spans the domain and pruning keeps everything —
  * the manifest is what makes clustering actionable at the file level.
  */
object Manifest {

  /** One row per data file under `dir`: file URI, row_count, and
    * (min_c, max_c) for each column in `statsCols`.
    */
  def build(spark: SparkSession, dir: String, statsCols: Seq[String]): DataFrame = {
    val stats = statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("row_count"), stats: _*)
  }

  /** Hard ceiling on the kept-file list [[filesInRange]] will materialize
    * on the driver. The collect is metadata-scale BY CONTRACT, not by
    * luck: 4M path strings (~100 TB at 128 MB files, each path ~100
    * bytes) is ~400 MB of driver heap — the point where a pruned read
    * should be re-expressed as partition pruning (directory grain, no
    * per-file list) rather than silently OOM the driver. Exceeding the
    * ceiling throws with that guidance instead of degrading.
    */
  val MaxPrunedFiles: Int = 4 * 1000 * 1000

  /** Files whose [min_c, max_c] intersects the CLOSED interval [lo, hi] —
    * a conservative superset for any predicate contained in it (boundary
    * files are kept; the residual filter discards their out-of-range
    * rows). Driver collect bounded by [[MaxPrunedFiles]]: the limit is
    * pushed into the plan (`limit n+1`), so a manifest over the ceiling
    * ships at most n+1 rows before failing fast — never the full list.
    */
  def filesInRange(manifest: DataFrame, c: String, lo: Double, hi: Double): Seq[String] =
    filesInRange(manifest, c, lo, hi, MaxPrunedFiles)

  /** [[filesInRange]] with an explicit ceiling (tests pin the gate with
    * a small one; production uses the [[MaxPrunedFiles]] default).
    */
  def filesInRange(manifest: DataFrame, c: String, lo: Double, hi: Double,
      maxFiles: Int): Seq[String] = {
    // probe one past the ceiling to detect overflow; Long-safe min so an
    // explicit Int.MaxValue ceiling can't wrap to a negative limit
    val probe = math.min(maxFiles.toLong + 1L, Int.MaxValue.toLong).toInt
    val kept = manifest
      .filter(col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo))
      .select("file").limit(probe)
      .collect().map(_.getString(0)).toIndexedSeq
    if (kept.length > maxFiles)
      throw new IllegalStateException(
        s"manifest prune kept > $maxFiles files — file-grain pruning is no longer " +
          "metadata-scale for this layout; prune by partition directory first or coarsen the manifest")
    kept
  }

  /** Read only the files [[filesInRange]] keeps. The caller applies its
    * exact predicate on top (and Catalyst pushes it into the kept files'
    * row groups). An empty kept list degenerates to an empty scan of the
    * full layout's schema.
    */
  def prunedRead(
      spark: SparkSession,
      dir: String,
      manifest: DataFrame,
      c: String,
      lo: Double,
      hi: Double): DataFrame = {
    val files = filesInRange(manifest, c, lo, hi)
    if (files.isEmpty) spark.read.parquet(dir).filter(lit(false))
    // basePath keeps hive-style partition columns (day=…/) resolvable when
    // the scan is handed explicit file paths instead of the root dir
    else spark.read.option("basePath", dir).parquet(files: _*)
  }

  /** Write-time manifest maintenance for a (micro)batch ingest — the
    * production path [[build]]'s scaladoc promises: stats come from the
    * just-written batch, never from rescanning the layout. The batch lands
    * under `batch=<id>/` and its manifest rows under `_manifest/batch=<id>/`,
    * both with OVERWRITE — a replayed foreachBatch (checkpoint recovery)
    * rewrites the same directories and converges, the t12 idempotence
    * contract. Readers see the layout as one table (`batch` is just a
    * partition column; `_manifest` is underscore-hidden from scans) and
    * [[prunedRead]] works unchanged over
    * `spark.read.parquet(s"$dir/_manifest")`. Manifest upkeep cost per
    * batch: one aggregate over rows already in memory — O(batch), zero
    * history rescan, at any table size.
    */
  def appendBatch(batch: DataFrame, batchId: Long, dir: String, statsCols: Seq[String]): Unit = {
    val bdir = s"$dir/batch=$batchId"
    batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(bdir)
    build(batch.sparkSession, bdir, statsCols)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/_manifest/batch=$batchId")
  }

  /** File-level dynamic-partition-pruning analog for a fact-to-dim join:
    * the DIMENSION side's key domain [min, max] is one metadata-scale
    * aggregate; fact files whose `factKey` interval misses it cannot
    * produce a join match and are never scanned. Spark's own DPP prunes
    * PARTITION directories at runtime — this prunes at FILE grain, which a
    * `factKey`-clustered layout makes far finer. Conservative: the range
    * is a superset of the dim's key SET, so the join itself still filters;
    * results are identical to the unpruned join (ManifestSpec pins it).
    */
  def prunedForJoin(
      spark: SparkSession,
      dir: String,
      manifest: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String): DataFrame = {
    val r = dim.agg(
      min(col(dimKey).cast("double")).as("lo"),
      max(col(dimKey).cast("double")).as("hi")).head()
    if (r.isNullAt(0)) spark.read.parquet(dir).filter(lit(false))
    else prunedRead(spark, dir, manifest, factKey, r.getDouble(0), r.getDouble(1))
  }
}
