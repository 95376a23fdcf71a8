package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (range) join: pairs within a numeric distance of each other
  * (SURVEY.md §2.10 — an operator Spark plans as BroadcastNestedLoopJoin,
  * i.e. O(n·m), when written naively).
  *
  * Realization: quantize both sides into `band`-wide buckets; a pair within
  * `band` of each other is in the same or an adjacent bucket, so the right
  * side is expanded 3× into (bucket-1, bucket, bucket+1) and the join
  * becomes an EQUI-join on bucket followed by the precise |a-b| <= band
  * filter. Cost: 3·|right| shuffle instead of |left|·|right| compare —
  * the same bucket-join trick the dedup/ANN paths use, applied to ranges.
  */
object RangeJoin {

  /** Pairs (left, right) with |left.ts - right.ts| <= band and equal key.
    * Columns are prefixed l_/r_ in the output. Expects the value columns
    * to be long-typed.
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      band: Long): DataFrame = {
    require(band > 0)
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
      .withColumn("__bucket", floor(col(s"l_$tsCol") / band))
    val r0 = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    val r = r0
      .withColumn("__bucket",
        explode(array(
          floor(col(s"r_$tsCol") / band) - 1,
          floor(col(s"r_$tsCol") / band),
          floor(col(s"r_$tsCol") / band) + 1)))
    l.join(r, l(s"l_$keyCol") === r(s"r_$keyCol") && l("__bucket") === r("__bucket"))
      .filter(abs(col(s"l_$tsCol") - col(s"r_$tsCol")) <= band)
      .drop("__bucket", s"r_$keyCol")
  }
}
