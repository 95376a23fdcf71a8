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
    val toks = docs.select(col(idCol).as("doc_id"), explode(TextFunctions.tokens(col(textCol))).as("tok"))
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
