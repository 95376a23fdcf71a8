package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Size-bounded batching (SURVEY.md §2.8 W1/W2).
  *
  * The reference paginates an RDD into 50 000-row bulk requests with
  * `zipWithIndex().filter(start<=i<end).collect()` per batch
  * (`data-s3-elastic-transfer.py:330-343`) — a FULL re-scan of the month per
  * batch, with every row funneled through the driver. We keep only the
  * semantic (bounded request size) and discard the realization:
  *
  *  - `grouped` — the scale path: chunk each partition's iterator locally
  *    inside `foreachPartition`; zero shuffles, zero driver involvement,
  *    O(rows) total.
  *  - `withOrdinalBatch` — the parity path for when a *global* ordinal is
  *    genuinely required (the reference's batch numbering): one
  *    `row_number` window. Note the single-direction sort is a scale
  *    bottleneck by design — documented, not hidden.
  *  - `globalOrdinal` / `withOrdinalBatchDistributed` — the scale path for
  *    that same global ordinal: quantile-bucketed distributed prefix-rank,
  *    identical numbering, no single-task stage.
  */
object Batching {

  /** Scale path: per-partition local chunking. `handle` receives at most
    * `batchSize` rows at a time; runs on executors, never the driver.
    */
  def foreachBulk[T](df: DataFrame, batchSize: Int)(handle: Seq[org.apache.spark.sql.Row] => Unit): Unit =
    df.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.grouped(batchSize).foreach(chunk => handle(chunk))
    }

  /** Parity path: global 1-based batch number by `orderCol`. The window
    * funnels through one task (keyed on a constant partition — explicit,
    * rather than an unkeyed WindowExec) — use only when batch identity must
    * be deterministic across the whole dataset (tests / reference parity).
    */
  def withOrdinalBatch(df: DataFrame, orderCol: String, batchSize: Int): DataFrame = {
    val rn = row_number().over(Window.partitionBy(Windows.constKey(col(orderCol))).orderBy(col(orderCol)))
    df.withColumn("batch", (floor((rn - lit(1)) / lit(batchSize.toDouble)) + lit(1)).cast("bigint"))
  }

  /** Scale path for a GLOBAL ordinal: distributed rank by `orderCol` with
    * no single-task window (the plain `row_number() OVER (ORDER BY ...)`
    * moves the entire dataset to one partition — at 100 TB that is not a
    * slow plan, it is a dead one).
    *
    * Shape (classic distributed prefix-rank):
    *   1. one cheap pre-pass reads ONLY `orderCol` (column-pruned scan) and
    *      sketches `buckets-1` approximate quantile boundaries;
    *   2. each row gets a bucket id = number of boundaries <= value — a
    *      codegen'd monotone function of the VALUE, so bucket order equals
    *      value order and equal keys always share a bucket;
    *   3. a second column-pruned pass counts rows per bucket — `buckets`
    *      numbers, i.e. metadata-scale — and the driver prefix-sums them
    *      into a literal bucket→offset map (no broadcast join node, no
    *      tiny single-partition window);
    *   4. `row_number` partitioned BY BUCKET runs on all buckets in
    *      parallel; global ordinal = map(bucket) + local rank. The main
    *      plan is ONE hash exchange + a fully parallel window.
    *
    * Boundary accuracy affects only balance, never correctness: the
    * ordinal is exact for any monotone bucketing. Ties on `orderCol` get
    * arbitrary relative order, exactly like the single-task window (and
    * like the reference's `zipWithIndex`, data-s3-elastic-transfer.py:340).
    * `orderCol` must be numeric and non-null, and `df` must be
    * DETERMINISTIC across jobs: the quantile sketch, the per-bucket counts,
    * and the final ranked pass are three independent jobs over `df`, so a
    * non-deterministic source (fresh random columns, a table mutated
    * between jobs) can make counts disagree with the final pass — silently
    * gapped/duplicated ordinals, or under ANSI mode an `element_at`
    * MAP_KEY_DOES_NOT_EXIST error for a bucket absent from the offset map.
    * Persist or localCheckpoint such inputs first. The two pre-passes
    * touch one column each; when only bounded-size *batches* are needed
    * (not a true global ordinal), `foreachBulk` above is the right tool —
    * zero passes, zero shuffles.
    */
  def globalOrdinal(df: DataFrame, orderCol: String, outCol: String = "rn", buckets: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val b = math.max(1, if (buckets > 0) buckets else spark.sessionState.conf.numShufflePartitions)
    val probes = (1 until b).map(_.toDouble / b).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else df.select(col(orderCol).cast("double").as("_v"))
        .stat.approxQuantile("_v", probes, 0.01)
        .distinct.sorted
    // bucket = count of boundaries <= v: a when-chain over <=buckets-1
    // literals, fully inside whole-stage codegen
    val bucket = bounds
      .map(bv => when(col(orderCol).cast("double") >= lit(bv), 1).otherwise(0))
      .reduceOption((a, c) => a + c).getOrElse(lit(0))
    // driver-side exclusive prefix sum over <=buckets counts
    val cnts = df.groupBy(bucket.as("_g_b")).agg(count(lit(1)).as("_g_cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = cnts.map(_._1).zip(cnts.scanLeft(0L)(_ + _._2))
    val offMap = map(offsets.flatMap { case (k, off) => Seq(lit(k), lit(off)) }.toIndexedSeq: _*)
    df.withColumn("_g_b", bucket)
      .withColumn(outCol,
        element_at(offMap, col("_g_b")) +
          row_number().over(Window.partitionBy(col("_g_b")).orderBy(col(orderCol))).cast("long"))
      .drop("_g_b")
  }

  /** `withOrdinalBatch`, realized through the distributed ordinal: same
    * batch numbering, no single-task sort anywhere in the plan.
    */
  def withOrdinalBatchDistributed(df: DataFrame, orderCol: String, batchSize: Int): DataFrame =
    globalOrdinal(df, orderCol, "_g_rn")
      .withColumn("batch",
        (floor((col("_g_rn") - lit(1)) / lit(batchSize.toDouble)) + lit(1)).cast("bigint"))
      .drop("_g_rn")

  /** W2: keyset pagination ("search_after") — rows strictly after a cursor
    * value, first `pageSize` in key order. The reference pages 10 000 docs
    * serially (`ID-based-transfer.py:118-154`); under a distributed scan
    * this is only needed when an external caller demands an ordered cursor.
    * Spark plans this as TakeOrderedAndProject (no full sort materialized).
    */
  def keysetPage(df: DataFrame, keyCol: String, after: Option[Column], pageSize: Int): DataFrame = {
    val base = after.map(c => df.filter(col(keyCol) > c)).getOrElse(df)
    base.orderBy(col(keyCol)).limit(pageSize)
  }
}
