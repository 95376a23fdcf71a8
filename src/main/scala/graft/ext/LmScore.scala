package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram language-model quality scoring (north-star extension; SURVEY.md
  * §2.10): the CCNet/Wikipedia-LM recipe shrunk to its order-0 core — fit
  * token frequencies on the corpus itself, then score each document by its
  * mean token log-probability (a perplexity proxy) plus its out-of-vocab
  * ratio. Low mean log-prob ⇒ gibberish / wrong-language / boilerplate;
  * high OOV ratio ⇒ vocabulary mismatch. Both are standard filter axes for
  * web-scale corpus cleaning.
  *
  * Model: add-one smoothing over a min-count vocabulary.
  *   p(tok) = (c(tok) + 1) / (N + |V| + 1)   for vocab tokens
  *   p(oov) =          1  / (N + |V| + 1)    (the same formula at c = 0)
  *
  * Scale design: the vocabulary fit is ONE map-side-combined token count
  * (the min-count threshold — not a global top-K sort — caps it scale-
  * safely: rare tokens fall out regardless of corpus size). Scoring joins
  * the exploded tokens against the vocab BROADCAST, then re-aggregates by
  * document with map-side partial sums. Per-token log-probs are rounded to
  * 6 decimals and summed as DECIMAL(18,6) — exact and order-independent —
  * so the result is bit-identical under any partitioning (and in the SQL
  * oracle).
  */
object LmScore {

  /** Token counts at or above `minCount` — the vocabulary. Output: tok, c. */
  def vocab(docs: DataFrame, textCol: String, minCount: Int): DataFrame =
    graft.sources.Tables.spread(docs)
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)

  /** Bigram counts at or above `minCount` — the transition model. The
    * min-count threshold is what keeps the model broadcastable at any
    * corpus size: bigrams BELOW it are scored as unseen via the same
    * smoothing formula at c = 0, so growing the corpus grows counts, not
    * the model. Output: bg ("w1 w2"), c2.
    */
  def bigramModel(docs: DataFrame, textCol: String, minCount: Int): DataFrame =
    graft.sources.Tables.spread(docs)
      .select(explode(TextFunctions.ngramsAll(col(textCol), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)

  /** Per-document bigram-LM score — the order-1 step of the CCNet recipe:
    * each transition w_{i-1} → w_i scores
    * ln((c2(w_{i-1} w_i) + 1) / (c1(w_{i-1}) + |V| + 1)) with add-one
    * smoothing over the min-count unigram vocabulary; a document of looped
    * or template text scores high (its transitions are corpus-frequent),
    * shuffled-word gibberish scores low even when every TOKEN is in-vocab —
    * the signal the unigram model cannot see.
    *
    * Scale design mirrors [[scoreDocs]]: both model fits are one
    * map-side-combined aggregation each, both models join back BROADCAST
    * (min-count keeps them bounded), scoring re-aggregates by document
    * with the rounded-DECIMAL sum so results are partitioning-independent.
    * Output: idCol, n_bigrams, n_unseen, mean_logp2, unseen_ratio.
    */
  def scoreBigrams(
      docs: DataFrame, idCol: String, textCol: String,
      uniMinCount: Int, biMinCount: Int): DataFrame = {
    val v1 = vocab(docs, textCol, uniMinCount)
    val v2 = bigramModel(docs, textCol, biMinCount)
    val vsize = v1.agg(count(lit(1)).as("v"))
    graft.sources.Tables.spread(docs)
      .select(col(idCol).as("doc_id"), explode(TextFunctions.ngramsAll(col(textCol), 2)).as("bg"))
      .withColumn("prev", split(col("bg"), " ").getItem(0))
      .join(broadcast(v2), Seq("bg"), "left")
      .join(broadcast(v1.withColumnRenamed("tok", "prev").withColumnRenamed("c", "c1")),
        Seq("prev"), "left")
      .crossJoin(broadcast(vsize))
      .withColumn("__lp",
        round(log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + col("v") + lit(1))), 6)
          .cast("decimal(18,6)"))
      .withColumn("__unseen", when(col("c2").isNull, 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("__unseen")).as("n_unseen"),
        round(sum(col("__lp")).cast("double") / count(lit(1)), 4).as("mean_logp2"),
        round(sum(col("__unseen")).cast("double") / count(lit(1)), 4).as("unseen_ratio"))
      .withColumnRenamed("doc_id", idCol)
  }

  /** Per-document LM score. Output: idCol, n_tokens, n_oov, mean_logp,
    * oov_ratio.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String, minCount: Int): DataFrame = {
    val v = vocab(docs, textCol, minCount)
    // N counts ALL tokens (including future OOV); |V| is the kept vocab.
    val stats = graft.sources.Tables.spread(docs)
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(v.agg(count(lit(1)).as("v")))
    val toks = graft.sources.Tables.spread(docs)
      .select(col(idCol).as("doc_id"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
    toks
      .join(broadcast(v), Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("__lp",
        round(log((coalesce(col("c"), lit(0L)) + lit(1.0)) / (col("n") + col("v") + lit(1))), 6)
          .cast("decimal(18,6)"))
      .withColumn("__oov", when(col("c").isNull, 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("__oov")).as("n_oov"),
        round(sum(col("__lp")).cast("double") / count(lit(1)), 4).as("mean_logp"),
        round(sum(col("__oov")).cast("double") / count(lit(1)), 4).as("oov_ratio"))
      .withColumnRenamed("doc_id", idCol)
  }
}
