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

  /** KMV / Theta-sketch set INTERSECTION across day pairs — the set
    * operation HLL cannot do directly (hll_union gives only A∪B;
    * inclusion–exclusion degrades with more than two sets, while theta
    * sketches intersect compositionally: θ = min(θ_a, θ_b), sample =
    * common hashes below θ, |A∩B| ≈ |sample|/θ — Dasgupta et al.,
    * "Theta-Sketch Framework").
    *
    * Per day: the `k` minimum 48-bit md5 hashes of the member ids (the
    * same md5-uniform construction as the DP release path), kept via a
    * per-day row_number ≤ k — WindowGroupLimit ships at most k rows per
    * day out of each map task. θ_d = the k-th minimum (or 1.0 when the
    * day holds fewer than k distinct members, making the sketch exact).
    * Pair estimates touch only sketch rows: k·|days| hashes, a calendar-
    * bounded equi-join on the hash value — metadata at any corpus scale.
    *
    * The returned frame carries the EXACT pair intersection (a bounded-
    * horizon member equi-join — the checkable side, computable in any
    * engine) with `approx_ok`: |est − exact| ≤ relPct%·exact + absErr,
    * which the oracle pins TRUE row by row. At 100 TB one drops the
    * exact columns and keeps the sketch path; the gate exists to pin the
    * estimator at test scale. Output: day_a, day_b, n_a, n_b, inter,
    * jacc, approx_ok.
    */
  def kmvDayIntersect(
      du: DataFrame, k: Int, horizon: Int, relPct: Int, absErr: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 1 && horizon >= 1 && relPct >= 0 && absErr >= 0)
    // uniform [0,1) from the top 48 bits of md5 — exact in a double
    val h = du.withColumn("h",
      conv(substring(md5(col("user_id").cast("string")), 1, 12), 16, 10)
        .cast("double") / lit(281474976710656.0))
    val w = Window.partitionBy("day").orderBy(col("h"), col("user_id"))
    val sk = h.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
    val th = sk.groupBy("day").agg(count(lit(1)).as("n_kept"), max(col("h")).as("hmax"))
      .select(col("day"),
        when(col("n_kept") < k, lit(1.0)).otherwise(col("hmax")).as("theta"))
    val act = du.groupBy("day").agg(count(lit(1)).as("n"))
    def inHorizon(a: Column, b: Column): Column =
      to_date(b) > to_date(a) && to_date(b) <= date_add(to_date(a), horizon)
    // calendar-bounded pair grid (|days|² theta join over the day AGGREGATE)
    val grid = act.select(col("day").as("day_a"), col("n").as("n_a"))
      .join(act.select(col("day").as("day_b"), col("n").as("n_b")),
        inHorizon(col("day_a"), col("day_b")))
    val common = sk.select(col("day").as("day_a"), col("h"))
      .join(sk.select(col("day").as("day_b"), col("h").as("h2")),
        col("h") === col("h2") && inHorizon(col("day_a"), col("day_b")))
    val thA = th.select(col("day").as("day_a"), col("theta").as("theta_a"))
    val thB = th.select(col("day").as("day_b"), col("theta").as("theta_b"))
    val cb = common.join(broadcast(thA), "day_a").join(broadcast(thB), "day_b")
      .filter(col("h") < least(col("theta_a"), col("theta_b")))
      .groupBy("day_a", "day_b").agg(count(lit(1)).as("nc"))
    val exact = du.select(col("day").as("day_a"), col("user_id"))
      .join(du.select(col("day").as("day_b"), col("user_id").as("u2")),
        col("user_id") === col("u2") && inHorizon(col("day_a"), col("day_b")))
      .groupBy("day_a", "day_b").agg(count(lit(1)).as("inter"))
    val est = col("nc").cast("double") / least(col("theta_a"), col("theta_b"))
    grid.join(broadcast(thA), "day_a").join(broadcast(thB), "day_b")
      .join(cb, Seq("day_a", "day_b"), "left")
      .join(exact, Seq("day_a", "day_b"), "left")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("est", coalesce(est, lit(0.0)))
      .select(col("day_a"), col("day_b"), col("n_a"), col("n_b"), col("inter"),
        (floor(col("inter").cast("double")
          / (col("n_a") + col("n_b") - col("inter")).cast("double") * lit(1e4) + lit(0.5))
          / lit(1e4)).as("jacc"),
        (abs(col("est") - col("inter").cast("double")) * 100
          <= col("inter").cast("double") * relPct + absErr * 100).as("approx_ok"))
      .orderBy("day_a", "day_b")
  }
}
