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
  */
object Batching {

  /** Scale path: per-partition local chunking. `handle` receives at most
    * `batchSize` rows at a time; runs on executors, never the driver.
    */
  def foreachBulk[T](df: DataFrame, batchSize: Int)(handle: Seq[org.apache.spark.sql.Row] => Unit): Unit =
    df.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.grouped(batchSize).foreach(chunk => handle(chunk))
    }

  /** Parity path: global 1-based batch number by `orderCol`. The global
    * window funnels through one task — use only when batch identity must be
    * deterministic across the whole dataset (tests / reference parity).
    */
  def withOrdinalBatch(df: DataFrame, orderCol: String, batchSize: Int): DataFrame = {
    val rn = row_number().over(Window.orderBy(col(orderCol)))
    df.withColumn("batch", (floor((rn - lit(1)) / lit(batchSize.toDouble)) + lit(1)).cast("bigint"))
  }

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
