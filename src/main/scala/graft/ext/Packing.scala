package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data pipelines (north-star extension;
  * SURVEY.md §2.10): concatenate every document's tokens in a deterministic
  * order and cut the stream into fixed-budget packs — the standard
  * "concat-and-chunk" batching used to fill transformer context windows
  * without padding. A document whose token span straddles a pack boundary
  * contributes to BOTH packs (its tail starts the next pack), exactly like
  * the training-side implementation that slices one long token stream.
  *
  * Scale design: the only global state is each document's starting token
  * offset — an exclusive prefix SUM over the corpus in id order. A plain
  * `sum(...) over (order by id)` window funnels 100 TB through one task, so
  * the offset is computed with the same distributed prefix machinery as
  * [[graft.ops.Batching.globalOrdinal]] (quantile-bucketed two-pass):
  *   1. a column-pruned pre-pass sketches bucket boundaries on the id;
  *   2. a second column-pruned pass sums tokens per bucket — `buckets`
  *      numbers, metadata-scale — and the driver prefix-sums them into a
  *      literal bucket→token-offset map;
  *   3. the main pass runs the cumulative sum as a window partitioned BY
  *      BUCKET (all buckets in parallel) and adds the bucket offset.
  * Pack-id expansion is then a per-row `sequence` + `explode` — a map,
  * no further shuffle. Spans are exact for any monotone bucketing, so
  * boundary accuracy affects only balance (same argument as globalOrdinal).
  *
  * Like globalOrdinal, the input must be DETERMINISTIC across the three
  * jobs (persist/localCheckpoint non-deterministic sources first) and the
  * id column non-null and unique.
  */
object Packing {

  /** Per-document pack assignment under `budget` tokens per pack.
    *
    * Output: one row per (document, pack) it contributes to —
    * `doc_id, n_tokens, tok_start, pack_id, toks_in_pack` — where
    * `pack_id = tok_start div budget … (tok_start+n_tokens-1) div budget`
    * and `toks_in_pack` is the portion of the document inside that pack.
    * Every pack except the last sums to exactly `budget` tokens.
    * Zero-token documents are dropped (they occupy no span).
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      nTokens: Column,
      budget: Int,
      buckets: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    val base = graft.sources.Tables.spread(docs)
      .select(col(idCol).cast("long").as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)

    val b = math.max(1, if (buckets > 0) buckets else spark.sessionState.conf.numShufflePartitions)
    val probes = (1 until b).map(_.toDouble / b).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else base.select(col("doc_id").cast("double").as("_v"))
        .stat.approxQuantile("_v", probes, 0.01)
        .distinct.sorted
    val bucket = bounds
      .map(bv => when(col("doc_id").cast("double") >= lit(bv), 1).otherwise(0))
      .reduceOption((a, c) => a + c).getOrElse(lit(0))
    // driver-side exclusive prefix sum of per-bucket TOKEN counts
    val sums = base.groupBy(bucket.as("_p_b")).agg(sum(col("n_tokens")).as("_p_sum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sums.map(_._1).zip(sums.scanLeft(0L)(_ + _._2))
    val offMap = map(offsets.flatMap { case (k, off) => Seq(lit(k), lit(off)) }.toIndexedSeq: _*)

    val w = Window.partitionBy(col("_p_b")).orderBy(col("doc_id"))
    val spanned = base
      .withColumn("_p_b", bucket)
      .withColumn("tok_start",
        element_at(offMap, col("_p_b")) + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .drop("_p_b")
    spanned
      .withColumn("pack_id",
        explode(sequence(
          expr(s"tok_start DIV $budget"),
          expr(s"(tok_start + n_tokens - 1) DIV $budget"))))
      .withColumn("toks_in_pack",
        least(col("tok_start") + col("n_tokens"), (col("pack_id") + 1) * budget) -
          greatest(col("tok_start"), col("pack_id") * budget))
      .select("doc_id", "n_tokens", "tok_start", "pack_id", "toks_in_pack")
  }

  /** Pack-level audit of [[packSequences]]: tokens and contributing docs
    * per pack. Every pack but the last must hold exactly `budget` tokens —
    * the invariant PackingSpec pins.
    */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks_in_pack")).as("n_tokens"))
      .orderBy("pack_id")

  /** Length bucketing for pad-to-max training batches — the alternative to
    * [[packSequences]] when examples can't be concatenated (supervised
    * pairs, contrastive sets): group examples of similar length so each
    * batch pads to ITS bucket's max, not the corpus max. Output: one row
    * per bucket plus a `zz_all` corpus row, with `padding_waste` =
    * n·max − Σlen — the tokens a pad-to-max batch burns. The bucketed
    * waste is structurally ≤ the corpus row's (each bucket's max ≤ global
    * max), and the delta is the measured value of bucketing on THIS
    * corpus. Plain groupBy on a derived label: one map-side-combined
    * shuffle of |buckets| rows per partition, any scale.
    *
    * `bounds` are the half-open bucket edges: (-inf,b0), [b0,b1), …,
    * [bn,inf). Labels are zero-padded so lexicographic ORDER BY is length
    * order in any engine.
    */
  def lengthBucketStats(df: DataFrame, lenCol: Column, bounds: Seq[Int]): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.distinct == bounds,
      "bounds must be distinct ascending")
    val b = bounds
    var label = when(lenCol < b.head, f"b00_lt${b.head}%03d")
    for (((lo, hi), i) <- b.zip(b.tail).zipWithIndex)
      label = label.when(lenCol < hi, f"b${i + 1}%02d_${lo}%03d_${hi}%03d")
    val labeled = df.select(
      label.otherwise(f"b${b.length}%02d_ge${b.last}%03d").as("bucket"),
      lenCol.cast("long").as("_len"))
    val stats = Seq(
      count(lit(1)).as("n_docs"), sum(col("_len")).as("sum_tokens"),
      max(col("_len")).as("max_tokens"),
      (max(col("_len")) * count(lit(1)) - sum(col("_len"))).as("padding_waste"))
    labeled.groupBy("bucket").agg(stats.head, stats.tail: _*)
      .unionByName(labeled.groupBy(lit("zz_all").as("bucket")).agg(stats.head, stats.tail: _*))
      .orderBy("bucket")
  }
}
