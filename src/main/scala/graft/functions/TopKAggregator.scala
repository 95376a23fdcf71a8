package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A scored item flowing through [[TopKAggregator]]. */
final case class Scored(score: Double, id: Long)

/** Typed top-k aggregator (SURVEY.md §2.10 Aggregator surface): keeps the k
  * highest-scored items per group with a bounded buffer.
  *
  * Scale rationale vs the window form (`row_number().over(partitionBy...)`
  * then `rank <= k`): the window must shuffle and SORT every row of every
  * group; this aggregator carries at most k items per partition per group
  * into the shuffle (classic partial-aggregation top-k), so cost is
  * O(n log k) map-side and the exchange is k·|groups| rows, independent of
  * group size. Ties are broken by ascending id — deterministic.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  private def best(items: Seq[Scored]): Seq[Scored] =
    items.sortBy(s => (-s.score, s.id)).take(k)

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], item: Scored): Seq[Scored] =
    if (buf.sizeIs >= k && {
        val worst = buf.last // buf kept sorted by best()
        item.score < worst.score || (item.score == worst.score && item.id > worst.id)
      }) buf
    else best(buf :+ item)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = best(a ++ b)

  override def finish(reduction: Seq[Scored]): Seq[Scored] = best(reduction)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
