package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, NullsLast, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (SURVEY.md §2.10, preference order (c): custom
  * LogicalPlan + SparkStrategy + SparkPlan — the whole-operator route for
  * semantics Spark lacks).
  *
  * Semantics (identical to the composed `graft.ops.AsOfJoin.mostRecent`):
  * for every left row, each payload column independently carries the LAST
  * non-null value among right rows with the same key and right.ts <=
  * left.ts, in (ts, tie) order — exactly the composed form's
  * `last(col, ignoreNulls = true)` window, so a null value in a later
  * right row does not erase an earlier one. Right-side ties at equal ts
  * are broken by `rightTie` ascending nulls-last (the last wins); left
  * rows with no qualifying right row — or with a null key/ts — carry
  * nulls.
  *
  * Why a custom operator: the composed form unions both sides and runs an
  * ignore-nulls `last` window per carried column, paying the window
  * machinery (frame evaluation, one pass per column) over |L|+|R| rows.
  * This plan declares the SAME distribution+ordering requirements a
  * sort-merge join would (cluster by key, sort by (key, ts)) — so
  * EnsureRequirements inserts exactly one co-partitioning exchange per
  * side — and then streams BOTH sorted sides through a single O(|L|+|R|)
  * forward-only merge per partition, all payload columns at once, with
  * O(1) state (the current candidate). At 100 TB: one shuffle each side,
  * no window buffers, no per-column passes.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut attrs are born here, not consumed from children
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoinNode → AsOfJoinExec. Registered either via
  * `spark.experimental.extraStrategies` ([[register]]) or through
  * `graft.GraftExtensions` (spark.sql.extensions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, tie, payload, payloadOut) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie, payload, payloadOut) :: Nil
    case _ => Nil
  }

  /** Idempotently add the strategy to a live session's planner. */
  def register(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTie: Expression,
    payload: Seq[Expression],
    payloadOut: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // the same contract a sort-merge join declares: hash-cluster both sides
  // on the key (EnsureRequirements co-partitions them), sort within
  // partitions by (key, ts[, tie]) — then the merge below is one forward
  // pass, no buffering beyond the current candidate
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    // tie NULLS LAST to match the composed form's asc_nulls_last: among
    // equal (key, ts) right rows the null-tie row is consumed LAST and wins
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending, NullsLast, Seq.empty)))

  // left rows pass through in order, one output row per left row
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of left rows with an as-of match"))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val nPayload = payloadOut.size
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    // fast path when both key and ts are long-backed (the common shape:
    // bigint keys, epoch-millis timestamps): codegen'd UnsafeProjection
    // extraction + primitive comparisons, no per-row boxing
    val longBacked = Seq(leftKey, rightKey).forall(_.dataType == org.apache.spark.sql.types.LongType) &&
      Seq(leftTs, rightTs).forall(_.dataType == org.apache.spark.sql.types.LongType)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val pProj = UnsafeProjection.create(payload.map(BindReferences.bindReference(_, rOut)))
      val resultProj = UnsafeProjection.create(output, lOut ++ payloadOut)
      val nullPayload = new GenericInternalRow(nPayload)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      // Per-column ignore-nulls candidate, matching the composed form's
      // last(col, ignoreNulls) window exactly: each payload column
      // independently carries the LAST non-null value among the current
      // key's consumed right rows (a null value in a later row does not
      // erase an earlier one). The candidate survives across left rows
      // because left is (key, ts)-sorted too; nulls-first child ordering
      // means null-keyed/ts right rows lead each partition and are skipped,
      // and null-keyed/ts left rows emit nulls.
      val pTypes = payloadOut.map(_.dataType).toArray
      val candVals = new Array[Any](nPayload)
      val candRow = new GenericInternalRow(candVals)
      def resetCand(): Unit = {
        var c = 0
        while (c < nPayload) { candVals(c) = null; c += 1 }
      }
      def absorb(rRow: InternalRow): Unit = {
        val p = pProj(rRow)
        var c = 0
        while (c < nPayload) {
          if (!p.isNullAt(c)) candVals(c) = InternalRow.copyValue(p.get(c, pTypes(c)))
          c += 1
        }
      }

      if (longBacked) {
        val lProj = UnsafeProjection.create(Seq(leftKey, leftTs).map(BindReferences.bindReference(_, lOut)))
        val rProj = UnsafeProjection.create(Seq(rightKey, rightTs).map(BindReferences.bindReference(_, rOut)))
        var candKey = 0L
        var hasCand = false
        lIt.map { lRow =>
          numOutputRows += 1
          val lr = lProj(lRow)
          if (lr.isNullAt(0) || lr.isNullAt(1)) resultProj(joined(lRow, nullPayload))
          else {
            val lKey = lr.getLong(0)
            val lTs = lr.getLong(1)
            var done = false
            while (!done && rBuf.hasNext) {
              val rRow = rBuf.head
              val rr = rProj(rRow)
              if (rr.isNullAt(0) || rr.isNullAt(1)) { rBuf.next(); () }
              else {
                val rKey = rr.getLong(0)
                if (rKey < lKey) { rBuf.next(); () } // key exhausted; drop
                else if (rKey == lKey && rr.getLong(1) <= lTs) {
                  if (!hasCand || candKey != rKey) resetCand()
                  candKey = rKey
                  hasCand = true
                  absorb(rRow) // copies values; buffer reused after next()
                  rBuf.next(); ()
                } else done = true // right is ahead of this left row
              }
            }
            if (hasCand && candKey == lKey) {
              numMatched += 1
              resultProj(joined(lRow, candRow))
            } else resultProj(joined(lRow, nullPayload))
          }
        }
      } else {
        val lk = BindReferences.bindReference(leftKey, lOut)
        val lt = BindReferences.bindReference(leftTs, lOut)
        val rk = BindReferences.bindReference(rightKey, rOut)
        val rt = BindReferences.bindReference(rightTs, rOut)
        @inline def cmp(a: Any, b: Any): Int = a.asInstanceOf[Comparable[Any]].compareTo(b)
        var candKey: Any = null
        lIt.map { lRow =>
          numOutputRows += 1
          val lKeyV = lk.eval(lRow)
          val lTsV = lt.eval(lRow)
          if (lKeyV == null || lTsV == null) resultProj(joined(lRow, nullPayload))
          else {
            var done = false
            while (!done && rBuf.hasNext) {
              val rRow = rBuf.head
              val rKeyV = rk.eval(rRow)
              val rTsV = rt.eval(rRow)
              if (rKeyV == null || rTsV == null) { rBuf.next(); () }
              else {
                val c = cmp(rKeyV, lKeyV)
                if (c < 0) { rBuf.next(); () } // key exhausted; drop
                else if (c == 0 && cmp(rTsV, lTsV) <= 0) {
                  if (candKey == null || cmp(candKey, rKeyV) != 0) resetCand()
                  candKey = InternalRow.copyValue(rKeyV)
                  absorb(rRow)
                  rBuf.next(); ()
                } else done = true // right is ahead of this left row
              }
            }
            if (candKey != null && cmp(candKey, lKeyV) == 0) {
              numMatched += 1
              resultProj(joined(lRow, candRow))
            } else resultProj(joined(lRow, nullPayload))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
