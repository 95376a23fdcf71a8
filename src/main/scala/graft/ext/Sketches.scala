package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-backed frequency analysis (north-star extension; SURVEY.md
  * §2.10): approximate heavy hitters over an unbounded key stream — the
  * "what dominates this corpus" question (top terms, top domains, top
  * users) answered in ONE pass with bounded memory, where an exact
  * groupBy-count would shuffle every distinct key.
  *
  * Realization: `DataFrameStatFunctions.freqItems` — Spark's
  * Karp/Shenker/Papadimitriou counter (a generalized Misra–Gries): each
  * partition keeps at most 1/support counters, partials merge
  * associatively, and the result is guaranteed to CONTAIN every value with
  * true frequency > support·N (it may also contain false positives — the
  * classic one-sided sketch guarantee). One scan, map-side state of
  * O(1/support), driver result of O(1/support): the 100 TB plan is the
  * same as the 100 MB plan.
  *
  * [[heavyHittersChecked]] turns that one-sided guarantee into a checkable
  * gate (the same pattern as the ANN recall gates): the deterministic exact
  * heavy-hitter list — computable in any engine — annotated with sketch
  * membership, which the guarantee forces TRUE on every row. A refactor
  * that breaks the sketch (or a support/threshold mismatch) flips a bool
  * the oracle pins.
  */
object Sketches {

  /** Exact heavy hitters of `keyCol` (count·denom > N·num, i.e. frequency
    * strictly above num/denom), each annotated with whether the one-pass
    * freqItems sketch at `support = num/denom` also surfaced it. The
    * sketch guarantee makes `in_sketch` TRUE for every emitted row.
    * Integer-only comparisons — no float crosses an engine boundary.
    * Output: key, cnt, in_sketch.
    */
  def heavyHittersChecked(df: DataFrame, keyCol: String, num: Int, denom: Int): DataFrame = {
    require(num > 0 && denom > num, s"need 0 < num/denom < 1, got $num/$denom")
    val keyed = df.select(col(keyCol).cast("string").as("key"))
    // one-pass bounded-memory sketch; result is a 1-row array, broadcast
    val sketch = keyed.stat.freqItems(Seq("key"), num.toDouble / denom)
      .withColumnRenamed("key_freqItems", "sketch_keys")
    val total = keyed.agg(count(lit(1)).as("n_total"))
    keyed
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * denom > col("n_total") * num)
      .crossJoin(broadcast(sketch))
      .select(col("key"), col("cnt"), array_contains(col("sketch_keys"), col("key")).as("in_sketch"))
  }

  /** Count-min sketch point-frequency gate: the exact top-`topK` keys (the
    * checkable side), each annotated with the CMS two-sided guarantee —
    * `lower_ok` (estimate >= true count: structural, CMS never
    * undercounts) and `upper_ok` (estimate <= true + ceil(eps·N): the
    * width guarantee). With a FIXED seed the sketch is fully deterministic,
    * so both flags are reproducible bits, not probabilistic outcomes.
    *
    * Scale story: `count_min_sketch` is a one-pass MERGEABLE aggregate —
    * per-partition sketches of d·w counters union by cell-wise add, so
    * counting key frequencies over 100 TB shuffles d·w longs per map
    * partition instead of every distinct key (and unlike freqItems it
    * answers ANY point query after the fact, not just the heavy set).
    * Probing the sketch for the topK report rows is bounded driver work on
    * one binary blob — the same metadata-scale exception as the bloom and
    * partition-list paths. Output: key, cnt, lower_ok, upper_ok.
    */
  def countMinChecked(
      df: DataFrame, keyCol: String, topK: Int,
      eps: Double, confidence: Double, seed: Int): DataFrame = {
    require(topK > 0 && eps > 0 && confidence > 0 && confidence < 1)
    val spark = df.sparkSession
    val keyed = df.select(col(keyCol).cast("string").as("key"))
    val skRow = keyed
      .agg(count_min_sketch(col("key"), lit(eps), lit(confidence), lit(seed)).as("sk"),
        count(lit(1)).as("n"))
      .head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skRow.getAs[Array[Byte]](0)))
    val bound = math.ceil(eps * skRow.getLong(1)).toLong
    val top = keyed.groupBy("key").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("key")) // deterministic across the rank-K tie
      .limit(topK)
      .collect() // topK rows — bounded
      .map { r =>
        val est = sketch.estimateCount(r.getString(0))
        (r.getString(0), r.getLong(1), est >= r.getLong(1), est <= r.getLong(1) + bound)
      }
    import spark.implicits._
    top.toSeq.toDF("key", "cnt", "lower_ok", "upper_ok")
  }
}
