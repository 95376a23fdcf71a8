package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge discovery and application — the tokenizer
  * step of an LLM data pipeline (the token-counting side lives in
  * [[graft.functions.TextFunctions.subwordCount]]).
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the corpus: the
  * corpus-scale work is one groupBy(word).count, after which every merge
  * iteration touches only the vocabulary (bounded by the language, ~10^6
  * rows at web scale — metadata relative to 100 TB of text). Each
  * iteration is one aggregation over that table (adjacent-pair counts
  * weighted by word frequency) plus a map applying the chosen merge; the
  * chosen pair itself is a single driver-side row per iteration, exactly
  * like a broadcast threshold. ENCODING follows the same shape: encode
  * the vocabulary once, broadcast the (word → token count) table, and
  * the corpus pass is an equi-join — the folds never run per corpus row.
  */
object Bpe {

  /** Learned state: the merge list (rank, lhs, rhs, merged, weighted pair
    * count at selection time), the vocabulary with final token arrays
    * (materialized — consumers replay NO merge folds), and its row count
    * (already paid for by the materialization; join-strategy gates read it
    * for free).
    */
  final case class Learned(
      merges: Seq[(Int, String, String, String, Long)], vocab: DataFrame, vocabRows: Long)

  /** Greedy training core: each round picks the most frequent adjacent
    * token pair (ties broken lexicographically — deterministic) and
    * rewrites every vocab word's token array by greedy left-to-right
    * non-overlapping replacement. Stops early when no pairs remain.
    *
    * Each iteration `localCheckpoint`s the rewritten vocab (eager): the
    * lineage stays depth 1, so the per-round pair count reads ONE
    * materialized table instead of replaying every earlier fold from the
    * scan — linear O(nMerges) work, not the O(nMerges²) recompute stack
    * this had before round 8 (x_token_fertility 9.6 s → the fold replay
    * was the whole bill). The checkpointed vocab is what [[Learned]]
    * hands to consumers, so encode passes replay no folds either.
    */
  def learn(words: DataFrame, wordCol: String, freqCol: String, nMerges: Int): Learned = {
    var toks = words.select(
      col(wordCol).as("w"), split(col(wordCol), "").as("t"), col(freqCol).cast("long").as("f"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val top = toks
        .select(explode(arrays_zip(
          slice(col("t"), lit(1), size(col("t")) - 1).as("l"),
          slice(col("t"), lit(2), size(col("t")) - 1).as("r"))).as("p"), col("f"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .head(1)
      if (top.isEmpty) exhausted = true
      else {
        val Row(l: String, r: String, cnt: Long) = top(0)
        merges += ((rank, l, r, l + r, cnt))
        // greedy left fold: merge (l, r) wherever the accumulator's last
        // token is l and the incoming token is r
        toks = toks.select(
          col("w"),
          aggregate(
            slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
            slice(col("t"), lit(1), lit(1)),
            (acc, x) => when(element_at(acc, -1) === lit(l) && x === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x)))).as("t"),
          col("f"))
          .localCheckpoint()
        rank += 1
      }
    }
    Learned(merges.toSeq, toks, toks.count())
  }

  /** The merge table as a DataFrame: rank, lhs, rhs, merged, cnt. */
  def learnMerges(words: DataFrame, wordCol: String, freqCol: String, nMerges: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    learn(words, wordCol, freqCol, nMerges).merges.toDF("rank", "lhs", "rhs", "merged", "cnt")
  }

  /** Rows above which the encoded vocab stops being broadcast and the
    * corpus join falls back to a shuffle join. Real web text's distinct
    * "words" (typos, URLs, numbers, code) run 10^8–10^9 at 100 TB — far
    * past what a driver can broadcast — so the hint must be size-gated,
    * not unconditional. 2M rows × ~30 bytes ≈ 60 MB, comfortably within
    * executor broadcast budgets.
    */
  val maxBroadcastVocab: Long = 2000000L

  /** The vocab side of a corpus encode join, with the broadcast decision
    * made from the MEASURED vocab size ([[Learned.vocabRows]], free — the
    * vocab is already materialized): small vocabs broadcast (zero corpus
    * shuffle), huge vocabs join plain and AQE picks the strategy. The
    * corpus side never pays a shuffle it doesn't need, and the driver
    * never OOMs on a web-scale word table.
    */
  def vocabJoinSide(enc: DataFrame, vocabRows: Long): DataFrame =
    if (vocabRows <= maxBroadcastVocab) broadcast(enc) else enc

  /** Encode a corpus with a learned vocabulary: per doc, the word count
    * and the BPE token count. The encoded vocab (word → token count) is
    * broadcast when it fits ([[vocabJoinSide]]); the corpus-side plan is
    * explode + equi-join + re-agg — no fold runs per corpus row, and
    * words outside the vocab (impossible when the vocab was counted from
    * this corpus) would drop out rather than silently miscount.
    */
  def encodeTokenCounts(docs: DataFrame, idCol: String, toksCol: org.apache.spark.sql.Column,
      learned: Learned): DataFrame = {
    val enc = learned.vocab.select(col("w").as("word"), size(col("t")).as("n_tok"))
    docs.select(col(idCol), explode(toksCol).as("word"))
      .join(vocabJoinSide(enc, learned.vocabRows), Seq("word"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_bpe_tokens"))
  }
}
