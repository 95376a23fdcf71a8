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
      defaultRate: Double): DataFrame =
    docs.filter(keepPredicate(sourceCol, textCol, rates, defaultRate))

  /** The keep decision of [[sampleMixture]] as a COLUMN — lets a caller
    * that needs per-stage counts evaluate the mixture decision as a flag
    * in one pass instead of re-running the filtered lineage per stage
    * (x_train_funnel). Exactly the predicate sampleMixture filters on.
    */
  def keepPredicate(
      sourceCol: String,
      textCol: String,
      rates: Map[String, Double],
      defaultRate: Double): Column = {
    val thresh = rates.foldLeft(lit(math.round(defaultRate * (1 << 24)).toInt)) {
      case (acc, (src, r)) =>
        require(r >= 0.0 && r <= 1.0, s"rate must be in [0,1], got $r for $src")
        when(col(sourceCol) === src, lit(math.round(r * (1 << 24)).toInt)).otherwise(acc)
    }
    hash24(col(textCol)) < thresh
  }

  /** Temperature-weighted mixture (multilingual-LM style, α = 1/2): keep
    * rates computed FROM the data so that expected kept counts follow
    * p_src^α instead of p_src — small sources are kept whole, large ones
    * downsampled by sqrt(n_min/n_src). α is fixed at 1/2 because sqrt is
    * the one power correctly rounded by IEEE-754 in every engine, keeping
    * the integer keep-threshold `round(rate·2^24)` bit-identical between
    * Spark and the SQL oracle (general pow() is not).
    *
    * Plan: one map-side-combined count per source (tiny), a broadcast of
    * the |sources|-row rate table back onto the corpus, and the same
    * zero-state content-hash keep decision as [[sampleMixture]] — mixing
    * 100 TB costs one scan plus a metadata-size aggregate.
    * Output: source, n_total, target_rate, n_kept.
    */
  def sqrtTemperatureReport(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val counts = graft.sources.Tables.spread(docs)
      .groupBy(col(sourceCol).as("source")).agg(count(lit(1)).as("n_total"))
    val minN = counts.agg(min("n_total").as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("__r", sqrt(col("n_min").cast("double") / col("n_total")))
      .withColumn("target_rate", round(col("__r"), 6))
      .withColumn("__thresh", round(col("__r") * lit(1 << 24), 0).cast("long"))
      .select("source", "n_total", "target_rate", "__thresh")
    docs.select(col(sourceCol).as("source"), col(textCol).as("__text"))
      .join(broadcast(rates), "source")
      .groupBy("source", "n_total", "target_rate")
      .agg(sum(when(hash24(col("__text")) < col("__thresh"), 1L).otherwise(0L)).as("n_kept"))
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

  /** Deterministic weighted sampling WITHOUT replacement, k per group —
    * Efraimidis–Spirakis A-ES: each row draws a uniform u and competes on
    * key = ln(u)/w (equivalent to u^(1/w); larger is better), so row i
    * wins a slot with probability proportional to its weight, exactly the
    * "sample k docs per source, length-weighted" step of corpus curation.
    * The uniform is the CONTENT-HASH uniformizer (`hash24` of the id, +1
    * so u>0, over 2^24+1 so u<1) — same verdict on every rerun, no seed
    * coordination, oracle-recomputable.
    *
    * Scale: one per-row projection plus a top-k-per-group window —
    * `row_number <= k` triggers WindowGroupLimit, so each map task ships
    * at most k rows per group into the single exchange (the
    * x_stratified_sample plan): sampling 100 TB moves k·tasks rows, not
    * the corpus.
    *
    * Determinism across engines: key is rounded half-up at 6 dp via the
    * floor idiom (ln may differ by 1 ulp between libm and java.lang.Math;
    * a rounded key plus the id tie-break makes the selection stable
    * everywhere except a key within 1 ulp of a 1e-6 boundary — measure
    * zero, same exposure the ln-based drift scores carry).
    * Output: groupCol, pick_rank, idCol, weight, key (rounded 6).
    */
  def weightedSampleWithoutReplacement(
      df: DataFrame, groupCol: String, idCol: String, weight: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = (hash24(col(idCol).cast("string")).cast("double") + lit(1.0)) /
      lit((1 << 24).toDouble + 1.0)
    val w = greatest(weight.cast("double"), lit(1.0))
    val key = floor(log(u) / w * lit(1e6) + lit(0.5)) / lit(1e6)
    val win = Window.partitionBy(col(groupCol)).orderBy(col("key").desc, col(idCol).asc)
    df.select(col(groupCol), col(idCol), w.as("weight"), key.as("key"))
      .withColumn("pick_rank", row_number().over(win))
      .filter(col("pick_rank") <= k)
      .select(col(groupCol), col("pick_rank"), col(idCol), col("weight"), col("key"))
  }
}
