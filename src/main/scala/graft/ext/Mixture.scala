package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic data mixing for LLM training-data pipelines (north-star
  * extension; SURVEY.md §2.10): downsample each source/domain to a target
  * mixture weight with a CONTENT-HASH keep decision instead of `rand()` —
  * the same document always gets the same verdict, so reruns, retries and
  * incremental syncs of a 100 TB corpus are reproducible, and no seed
  * state needs coordinating across 1000 executors.
  *
  * The decision is `md5(text) prefix < rate · 2^24` — a pure per-row
  * projection fused into the scan (zero shuffle, zero state), portable
  * bit-for-bit to any engine with md5 (the oracle recomputes it in SQL).
  * md5 here is a uniformizer, not a security primitive. Rates are
  * expressed in 2^-24 units, so the threshold compare is exact integer
  * arithmetic — no float crosses the keep/drop boundary.
  */
object Mixture {

  /** Uniform 24-bit content hash: first 6 hex chars of md5 as an int in
    * [0, 2^24). Collision-insensitive use — only uniformity matters.
    */
  def hash24(c: Column): Column =
    conv(substring(md5(c), 1, 6), 16, 10).cast("int")

  /** Exact integer threshold for `rate` in [0,1]: keep when
    * hash24 < round(rate · 2^24).
    */
  def keepAtRate(c: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    hash24(c) < lit(math.round(rate * (1 << 24)).toInt)
  }

  /** Downsample to per-source target rates (sources absent from the map
    * keep `defaultRate`). One scan, one per-row predicate — the mixture
    * of a 100 TB corpus costs exactly one pass, and the same rows survive
    * every rerun.
    */
  def sampleMixture(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val thresh = rates.foldLeft(lit(math.round(defaultRate * (1 << 24)).toInt)) {
      case (acc, (src, r)) =>
        require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1], got $r for $src")
        when(col(sourceCol) === src, lit(math.round(r * (1 << 24)).toInt)).otherwise(acc)
    }
    docs.filter(hash24(col(textCol)) < thresh)
  }

  /** Mixture audit: per source, corpus count vs kept count and the
    * realized keep rate. Output: source, n_total, n_kept, kept_rate.
    */
  def mixtureReport(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      rates: Map[String, Double],
      defaultRate: Double): DataFrame = {
    val keptFlag = {
      val thresh = rates.foldLeft(lit(math.round(defaultRate * (1 << 24)).toInt)) {
        case (acc, (src, r)) =>
          when(col(sourceCol) === src, lit(math.round(r * (1 << 24)).toInt)).otherwise(acc)
      }
      when(hash24(col(textCol)) < thresh, 1L).otherwise(0L)
    }
    graft.sources.Tables.spread(docs)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_total"), sum(keptFlag).as("n_kept"))
      .withColumn("kept_rate", round(col("n_kept").cast("double") / col("n_total").cast("double"), 4))
  }
}
