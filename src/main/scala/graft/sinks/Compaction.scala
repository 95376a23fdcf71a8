package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output-file sizing / small-file compaction (SURVEY.md §3.3 — the
  * reference's `Partition-script.py` IS a repartition job: read, bucket by
  * a partition column, rewrite). At 100 TB the sizing of output files is
  * a first-order operational concern: too-large files break downstream
  * range readers, too-small files melt the namenode/listing layer and
  * schedule millions of tiny tasks.
  *
  * Plan shape: ONE metadata-scale pre-pass counts rows per partition
  * value (bounded by |partitions|, collected to the driver like every
  * other partition-list decision in this engine), from which a target
  * file count per partition is derived; rows are then hash-routed to
  * (partition, bucket) in ONE shuffle and written with
  * `maxRecordsPerFile` as the hard per-file cap.
  *
  * Guarantees (pinned in CompactionSpec):
  *  - no output file ever exceeds `maxRecords` rows (`maxRecordsPerFile`
  *    is enforced by the writer regardless of routing);
  *  - write parallelism scales with total file count, not |partitions| —
  *    a hot partition is written by ~ceil(cnt/maxRecords) tasks, never 1;
  *  - hash-collision bucket merges only ever REDUCE file count (a task
  *    writes one file per partition dir), never violate the size cap.
  */
object Compaction {

  /** Rewrite `df` under `outDir` partitioned by `partCol` with files of at
    * most `maxRecords` rows, routed for parallel writes. `keyCol` is any
    * well-distributed column (an id) used for intra-partition routing.
    * Returns the total target file count (>= actual file count).
    */
  def compactTo(
      df: DataFrame,
      partCol: String,
      keyCol: String,
      maxRecords: Long,
      outDir: String): Long = {
    require(maxRecords > 0, "maxRecords must be positive")
    // metadata-scale: one row per partition VALUE
    val counts = df.groupBy(col(partCol).cast("string").as("_p"))
      .agg(count(lit(1)).as("_c")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val filesFor = counts.map { case (p, c) => p -> math.max(1L, (c + maxRecords - 1) / maxRecords) }
    val total = filesFor.map(_._2).sum
    val fMap = map(filesFor.flatMap { case (p, n) => Seq(lit(p), lit(n)) }.toIndexedSeq: _*)
    val spark = df.sparkSession
    val shuffleN = math.max(total, spark.sessionState.conf.numShufflePartitions.toLong).toInt
    df.withColumn("_c_b", pmod(xxhash64(col(keyCol)), element_at(fMap, col(partCol).cast("string"))))
      .repartition(shuffleN, col(partCol), col("_c_b"))
      .drop("_c_b")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecords)
      .partitionBy(partCol)
      .parquet(outDir)
    total
  }

  /** Clustered write: range-partition on (partition, cluster key) and sort
    * within tasks, so each output file covers a NARROW, (near-)disjoint
    * range of `clusterCol` and parquet column min/max statistics become
    * selective — a pushed range predicate then skips whole row groups
    * instead of scanning everything (Z-order-lite, single dimension). The
    * difference is invisible at 60 k rows and decisive at 100 TB: an
    * unclustered layout has every-file stats spanning the full value
    * domain, so pushdown prunes nothing.
    *
    * Range boundaries come from Spark's range partitioner sample; a
    * boundary row can land on either side, so ranges are disjoint up to
    * boundary duplicates — the property CompactionSpec pins is bounded
    * overlap vs the unclustered layout, not perfect disjointness.
    */
  def clusteredWrite(
      df: DataFrame,
      partCol: String,
      clusterCol: String,
      outDir: String,
      numFiles: Int): Unit = {
    require(numFiles > 0)
    df.repartitionByRange(numFiles, col(partCol), col(clusterCol))
      .sortWithinPartitions(col(partCol), col(clusterCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .parquet(outDir)
  }

  /** Morton (Z-order) key over two numeric columns: each value is
    * quantized to its `bits`-bit quantile rank (one metadata-scale
    * approxQuantile pre-pass per dimension — boundary accuracy affects
    * balance, never correctness), then ranks are bit-interleaved. Rows
    * close in Z-key are close in BOTH dimensions, so clustering by the
    * key gives every output file a compact 2-D bounding box — predicates
    * on EITHER column skip files, where single-column clustering leaves
    * the other dimension spanning the full domain.
    */
  def zorderKey(df: DataFrame, dimA: String, dimB: String, bits: Int = 6): Column =
    zorderKeyN(df, Seq(dimA, dimB), bits)

  /** [[zorderKey]] over ANY number of numeric dimensions: bit `i` of
    * dimension `j`'s quantile rank lands at interleaved position
    * `i * dims + j`, so the key cycles through the dimensions bit by bit
    * and every file clustered on it gets a compact d-dimensional bounding
    * box. `dims * bits` must fit a long; past ~3 dimensions the
    * per-dimension resolution (and with it the skipping power) dilutes —
    * the curse that caps Z-order fan-out in every lakehouse engine, worth
    * stating rather than hiding.
    */
  def zorderKeyN(df: DataFrame, dims: Seq[String], bits: Int = 6): Column = {
    val d = dims.length
    require(d > 0, "at least one dimension")
    require(bits > 0 && d * bits <= 62, s"$d dims x $bits bits overflows the key")
    val probes = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    // ONE quantile-sketch pass over ALL dimensions (multi-column
    // approxQuantile builds one sketch per column in a single scan) —
    // the per-dimension form re-scanned the input once per dimension
    // (guide §6: the sampling jobs dominated the write's cost). The
    // per-column sketch is identical to the single-column call's, so the
    // boundaries (and the key) are unchanged.
    val projected = df.select(dims.map(c => col(c).cast("double").as(c)): _*)
    val allBounds = projected.stat.approxQuantile(dims.toArray, probes, 0.005)
    // native binary-search rank (one plan node per dimension) — the
    // when-chain form put (2^bits - 1) expression nodes per dimension
    // into every task binary of the scan stage; parity (incl. NULL→0 and
    // NaN→top-bucket) pinned in CompactionSpec
    def rank(c: String, bounds: Array[Double]): Column =
      graft.functions.SearchSortedRank.searchSortedRank(
        col(c).cast("double"), bounds.distinct.sorted)
    val ranks = dims.lazyZip(allBounds).map(rank).toSeq
    (for { i <- 0 until bits; j <- 0 until d } yield
      shiftright(ranks(j), i).bitwiseAND(lit(1L)) * lit(1L << (i * d + j)))
      .reduce(_ + _)
  }

  /** [[clusteredWrite]] in two dimensions: range-partition and sort by
    * the Morton key within each partition value. Same numFiles caveat as
    * clusteredWrite (boundaries must subdivide within partitions).
    */
  def zorderWrite(
      df: DataFrame,
      partCol: String,
      dimA: String,
      dimB: String,
      outDir: String,
      numFiles: Int,
      bits: Int = 6): Unit = {
    require(numFiles > 0)
    df.withColumn("_zk", zorderKey(df, dimA, dimB, bits))
      .repartitionByRange(numFiles, col(partCol), col("_zk"))
      .sortWithinPartitions(col(partCol), col("_zk"))
      .drop("_zk")
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCol)
      .parquet(outDir)
  }
}
