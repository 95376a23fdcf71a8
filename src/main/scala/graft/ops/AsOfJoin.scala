package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row with the same
  * key and right.ts <= left.ts (SURVEY.md §2.10 — an operator Spark lacks;
  * preference order (a): composed from built-ins).
  *
  * Realization: tag and union both sides, then one `last(col, ignoreNulls)`
  * window per carried column, ordered by (ts, side) within each key —
  * right rows sort before left rows at equal ts, so "at or before" is
  * inclusive. This is ONE shuffle by key + a partition-local sort: O(n log
  * n) per key group, no range join, no cross product — at 100 TB it scales
  * like any keyed window. (The custom-LogicalPlan/Strategy route (c) would
  * only pay off if the sort itself were the bottleneck.)
  *
  * Ties inside the right side at equal ts are broken by `tieBreak`
  * (ascending; the LAST one wins) — fully deterministic, and mirrored
  * verbatim in the SQL oracle.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (null when no match). */
  def mostRecent(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val side = "__side"
    val l = left
      .withColumn(side, lit(1))
      .withColumn("__tb", lit(null).cast("long"))
      .select((leftCols.map(col) :+ col(side) :+ col("__tb")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right
      .withColumn(side, lit(0))
      .withColumn("__tb", col(tieBreak).cast("long"))
      .select((leftCols.map(c => if (c == keyCol || c == tsCol) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col(side) :+ col("__tb")) ++ valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(side).asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .select((leftCols.map(col) :+ col(side)) ++
        valueCols.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
    joined.filter(col(side) === 1).drop(side)
  }

  /** The same as-of semantics through the custom operator
    * (graft.plans.AsOfJoinNode / AsOfJoinExec — SURVEY.md §2.10 route (c)):
    * one co-partitioning exchange per side, one forward-only merge per
    * partition, O(1) merge state. Output contract matches [[mostRecent]]:
    * all left columns plus `asof_<valueCol>` payload columns (null when no
    * right row qualifies).
    */
  def mostRecentNative(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      tieBreak: String): DataFrame = {
    val spark = left.sparkSession
    graft.plans.AsOfJoinStrategy.register(spark)
    // alias the right side to fresh attribute ids: in the common self-join
    // case both children would otherwise share ids, making references
    // ambiguous inside the custom node
    val r2 = right.select(right.columns.toSeq.map(c => col(c).as(s"__r_$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val payloadAttrs = valueCols.map(c => attr(rPlan, s"__r_$c"))
    val payloadOut = valueCols.zip(payloadAttrs).map { case (c, a) =>
      AttributeReference(s"asof_$c", a.dataType, nullable = true)()
    }
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark,
      graft.plans.AsOfJoinNode(
        lPlan, rPlan,
        attr(lPlan, keyCol), attr(rPlan, s"__r_$keyCol"),
        attr(lPlan, tsCol), attr(rPlan, s"__r_$tsCol"),
        attr(rPlan, s"__r_$tieBreak"),
        payloadAttrs, payloadOut))
  }
}
