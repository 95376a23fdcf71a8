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

  /** Interval-overlap join WITHOUT an equi-key: pairs (a, b) with
    * `a.start <= b.end AND b.start <= a.end`. Written naively Spark plans
    * this as BroadcastNestedLoopJoin — O(n·m) compares and a broadcast of a
    * whole side; with both sides large that is the classic scale-killer.
    *
    * Realization (grid/bin overlap join): quantize the TIME AXIS into
    * `binWidth`-wide bins; every interval explodes to the bins it touches
    * (`sequence(floor(start/W), floor(end/W))`), and overlapping intervals
    * necessarily share at least one bin, so the join becomes an EQUI-join
    * on bin followed by the precise overlap filter. Each overlapping pair
    * would match once per shared bin, so instead of a `distinct` (a second
    * full shuffle of the matched set) the match is kept only in the pair's
    * FIRST shared bin — the bin containing `greatest(a.start, b.start)`,
    * which lies inside the intersection by definition of overlap. Emitted
    * exactly once, no dedup pass.
    *
    * Cost: Σ ceil(len/W + 1) rows shuffled per side instead of |l|·|r|
    * compares. Pick `binWidth` near the median interval length: W too
    * small explodes long intervals into many bins; W too large degrades
    * the equi-join to few giant buckets (skew). Mixed workloads at 100 TB
    * split the long-interval tail (len >> W) into its own pass with a
    * coarser W rather than inflating the common case.
    *
    * Output: all `l_`/`r_`-prefixed columns of both sides.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    def binned(df: DataFrame, p: String): DataFrame = {
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
      renamed.withColumn("__bin",
        explode(sequence(
          floor(col(s"$p$startCol") / binWidth),
          floor(col(s"$p$endCol") / binWidth))))
    }
    val l = binned(left, "l_")
    val r = binned(right, "r_")
    l.join(r, l("__bin") === r("__bin"))
      .filter(col(s"l_$startCol") <= col(s"r_$endCol") &&
        col(s"r_$startCol") <= col(s"l_$endCol"))
      // first-shared-bin guard: count each overlapping pair exactly once
      .filter(l("__bin") ===
        floor(greatest(col(s"l_$startCol"), col(s"r_$startCol")) / binWidth))
      .drop("__bin")
  }
}
