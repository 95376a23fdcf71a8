package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed closed-form regression / correlation over grouped data
  * (north-star extension; SURVEY.md §2.10) — the profiling step behind
  * corpus heuristics like "does doc length predict token count per
  * source?" and feature sanity checks before training a quality
  * classifier.
  *
  * Scale design: everything reduces to the five classical sufficient
  * statistics (n, Σx, Σy, Σxy, Σx², Σy²) computed in ONE
  * map-side-combined groupBy — the shuffle carries partitions×groups
  * partial rows, never data rows, and the closed-form solve is a per-group
  * projection on the aggregate output (no driver round-trip, no iteration).
  * This is the same one-pass shape at 5000 rows and at 100 TB.
  *
  * Cross-engine determinism: x and y are INTEGER expressions here, so the
  * sufficient statistics are exact (LongType sums; caller guarantees the
  * SUMS fit in 2^63 — true through petabyte-scale groups for
  * character/token counts). The n·Σxy − Σx·Σy style numerators are then
  * formed in DECIMAL(38,0), exact whenever the sums themselves fit in
  * long. The closed forms after that are a fixed sequence of IEEE double
  * ops on exact inputs — identical in any engine — with one final
  * floor-round to 6 decimals.
  */
object Stats {

  /** Per-group simple OLS y = slope·x + intercept plus Pearson r, from
    * exact integer sufficient statistics. Groups where the x variance is
    * zero yield NULL slope/intercept/r (division by zero → NULL in both
    * Spark non-ANSI and DuckDB via nullif).
    *
    * Output: groupCols*, n, slope, intercept, r (each rounded 6).
    */
  def groupedLinReg(
      df: DataFrame, groupCols: Seq[String], x: Column, y: Column): DataFrame = {
    val stats = df
      .select(groupCols.map(col) ++ Seq(
        x.cast("long").as("__x"), y.cast("long").as("__y")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
    // cov/var numerators are formed in DECIMAL(38,0): each is a product of
    // two long-bounded sums, so the exact value stays under 10^38 whenever
    // the inputs fit in long — whereas a 64-bit n·sxy product wraps
    // silently (Spark non-ANSI) long before the individual sums overflow,
    // and DuckDB would raise where Spark wrapped. The oracle mirrors this
    // with HUGEINT products. One cast to double AFTER the exact subtract.
    def d38(c: Column): Column = c.cast("decimal(38,0)")
    val covN = (d38(col("n")) * d38(col("sxy")) - d38(col("sx")) * d38(col("sy"))).cast("double")
    val varXN = (d38(col("n")) * d38(col("sxx")) - d38(col("sx")) * d38(col("sx"))).cast("double")
    val varYN = (d38(col("n")) * d38(col("syy")) - d38(col("sy")) * d38(col("sy"))).cast("double")
    // round-half-up via floor(x·1e6+0.5)/1e6, NOT round(): the values are
    // outputs of double division chains, where round() may disagree across
    // engines on exact .xxxxxx5 halves (NOTES.md round-4 parity lesson);
    // the floor idiom is the same IEEE op sequence everywhere
    def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val slope = covN / nullif(varXN, lit(0.0))
    stats.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        r6(slope).as("slope"),
        r6((col("sy").cast("double") - slope * col("sx").cast("double"))
          / col("n").cast("double")).as("intercept"),
        r6(covN / nullif(sqrt(varXN) * sqrt(varYN), lit(0.0))).as("r")): _*)
  }

  /** Logistic regression P(y=1 | x) by distributed IRLS over the (x, y)
    * JOINT HISTOGRAM: `iters` quantized Newton steps, each one five
    * DECIMAL sums over the bounded value grid with the coefficient pair
    * broadcast as a 1-row frame — per-iteration cluster traffic is five
    * numbers regardless of corpus size, and the corpus contributes only
    * the one shuffle that builds the histogram. The per-cell sigmoid is
    * floor-6-quantized and clamped to [1e-6, 1−1e-6] (log-likelihood
    * never hits ln 0); coefficients floor-6 after every step, so an
    * engine replaying the same unrolled stages (the oracle's CTE chain)
    * reproduces the solve bit-for-bit. Returns the histogram and the
    * final 1-row coefficient frame (b0, b1).
    */
  def logisticIrls(pts: DataFrame, x: Column, y: Column, iters: Int): (DataFrame, DataFrame) = {
    require(iters >= 1)
    val hist = pts.select(x.as("x"), y.as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("f")).localCheckpoint()
    def f6(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    def d6(c: Column) = f6(c).cast("decimal(28,6)")
    val xD = col("x").cast("double"); val fD = col("f").cast("double")
    val yD = col("y").cast("double")
    def pCol = greatest(least(
      f6(lit(1.0) / (lit(1.0) + exp(-(col("b0") + col("b1") * xD)))),
      lit(0.999999)), lit(0.000001))
    var coef = hist.sparkSession.range(1)
      .select(lit(0.0).as("b0"), lit(0.0).as("b1"))
    for (_ <- 1 to iters) {
      val cells = hist.crossJoin(broadcast(coef))
        .withColumn("p", pCol)
        .withColumn("w", col("p") * (lit(1.0) - col("p")))
      val ag = cells.agg(
        sum(d6(fD * (yD - col("p")))).cast("double").as("g0"),
        sum(d6(fD * (yD - col("p")) * xD)).cast("double").as("g1"),
        sum(d6(fD * col("w"))).cast("double").as("h00"),
        sum(d6(fD * col("w") * xD)).cast("double").as("h01"),
        sum(d6(fD * col("w") * xD * xD)).cast("double").as("h11"))
      val det = col("h00") * col("h11") - col("h01") * col("h01")
      coef = ag.crossJoin(broadcast(coef)).select(
        f6(col("b0") + (col("h11") * col("g0") - col("h01") * col("g1")) / det).as("b0"),
        f6(col("b1") + (col("h00") * col("g1") - col("h01") * col("g0")) / det).as("b1"))
    }
    (hist, coef)
  }

  /** The clamped floor-6 sigmoid of [[logisticIrls]] for a given
    * coefficient frame — callers scoring rows or computing likelihoods
    * must use the identical quantized tree. */
  def logisticP(x: Column): Column = {
    def f6(c: Column) = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    greatest(least(
      f6(lit(1.0) / (lit(1.0) + exp(-(col("b0") + col("b1") * x.cast("double"))))),
      lit(0.999999)), lit(0.000001))
  }
}
