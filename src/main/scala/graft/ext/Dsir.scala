package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style importance weighting for training-data selection (north-star
  * extension; SURVEY.md §2.10): score every raw document by how much more
  * it looks like a TARGET distribution than like the raw corpus, using
  * hashed-unigram bag-of-words language models — the cheap, scan-speed
  * core of "Data Selection via Importance Resampling" (Xie et al., 2023,
  * arXiv:2302.03169). Documents with positive log-weight are
  * more-target-like; the weights feed importance resampling (or a simple
  * threshold) to pick pretraining data that matches a trusted domain.
  *
  * Model: token → md5-prefix hash bucket (engine-portable, vocabulary-free
  * — the hash IS the feature map, so the model size is the BUCKET count,
  * fixed at any corpus scale). Bucket distributions with add-one
  * smoothing over B buckets:
  *   p(b) = (c(b) + 1) / (N + B)
  * fit once for the target slice and once for the whole corpus; per-doc
  *   log w(x) = Σ_tok [ln p_target(b(tok)) − ln p_raw(b(tok))].
  *
  * Scale design: ONE map-side-combined groupBy over B buckets fits BOTH
  * models (conditional sums share the shuffle); the B-row log-ratio table
  * broadcasts back onto the exploded token stream, which re-aggregates per
  * document with map-side partial sums — the corpus text itself never
  * shuffles, and driver/broadcast state is O(B) regardless of corpus
  * size. Per-token log-ratios are rounded to 6 decimals and summed as
  * DECIMAL — exact and order-independent, so results are bit-identical
  * under any partitioning (and in the SQL oracle).
  */
object Dsir {

  /** Hash a token to one of `buckets` features — the md5-prefix idiom
    * every engine (and the DuckDB oracle) computes identically.
    */
  def bucketOf(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 6), 16, 10).cast("long") % buckets

  /** Per-document importance weights.
    *
    * @param isTarget row predicate defining the target slice (e.g.
    *                 `col("lang") === "en"` for an English-target fit);
    *                 evaluated on the ORIGINAL row so any metadata column
    *                 can define the target.
    * Output: idCol, n_tokens, logw (round-4 double), tlike (logw > 0,
    * decided on the EXACT decimal sum so the boundary can't wobble).
    */
  /** A fitted hashed-bucket LM pair: per-bucket (target, raw) counts plus
    * totals. ≤ `buckets` rows of integers — bounded driver/broadcast
    * state at ANY corpus size (the IVF-centroid-table discipline), and
    * trivially persistable for INCREMENTAL scoring of later batches.
    */
  final case class BucketLm(counts: Array[(Long, Long, Long)], nt: Long, nr: Long, buckets: Int)

  private def toks(docs: DataFrame, idCol: String, textCol: String, buckets: Int) =
    graft.sources.Tables.spread(docs)
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("b", bucketOf(col("tok"), buckets))

  /** FIT pass: both LMs from one bucket-keyed, map-side-combined
    * aggregation, collected to the driver. Collecting once means the
    * totals come from local arithmetic instead of another corpus scan.
    */
  def fitBucketLm(docs: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 1024): BucketLm = {
    val rows = graft.sources.Tables.spread(docs)
      .select(isTarget.as("is_t"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .withColumn("b", bucketOf(col("tok"), buckets))
      .groupBy("b").agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    BucketLm(rows, rows.map(_._2).sum, rows.map(_._3).sum, buckets)
  }

  /** SCORE pass with a FROZEN model: broadcast probe + per-doc decimal
    * re-agg. The log-ratio table is completed over ALL buckets (range ⟕
    * counts, zeros filled) so buckets the fit corpus never saw — possible
    * when scoring a DELTA batch against a persisted LM — take the same
    * add-one formula at c = 0 instead of dropping tokens. ln/round stay
    * ENGINE expressions (not driver Math.log) so the arithmetic matches
    * every other engine-side score bit-for-bit; each ln rounded to 6 then
    * differenced in decimal (exact).
    */
  def scoreWithLm(docs: DataFrame, idCol: String, textCol: String, lm: BucketLm): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cnt = lm.counts.toSeq.toDF("b", "ct", "cr")
    val lw = spark.range(lm.buckets).toDF("b")
      .join(cnt, Seq("b"), "left")
      .na.fill(0L, Seq("ct", "cr"))
      .select(col("b"),
        (round(log((col("ct") + 1).cast("double") / lit(lm.nt + lm.buckets).cast("double")), 6)
            .cast("decimal(18,6)")
          - round(log((col("cr") + 1).cast("double") / lit(lm.nr + lm.buckets).cast("double")), 6)
            .cast("decimal(18,6)")).as("lw"))
    toks(docs, idCol, textCol, lm.buckets).join(broadcast(lw), Seq("b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lw")).as("lwsum"))
      // round the EXACT DECIMAL sum (half-up is exact there), THEN cast:
      // rounding after the double cast diverges between engines when the
      // sum of 6-dp terms lands exactly on a 4-dp half (observed: doc with
      // lwsum = -5.06915 → Spark -5.0692 vs DuckDB-on-double -5.0691)
      .select(col(idCol), col("n_tokens"),
        round(col("lwsum"), 4).cast("double").as("logw"),
        (col("lwsum") > 0).as("tlike"))
  }

  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024): DataFrame =
    scoreWithLm(docs, idCol, textCol, fitBucketLm(docs, textCol, isTarget, buckets))
}
