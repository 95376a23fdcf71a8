package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (SentencePiece's second algorithm, Kudo
  * 2018) — the BPE alternative whose segmentation is a global argmax
  * instead of greedy merges: every word is split into the piece sequence
  * maximizing the sum of piece log-probabilities, found by Viterbi DP.
  *
  * Scale contract (the [[Bpe]] principle): ALL model work runs on the
  * word-frequency table, never the corpus. The corpus contributes one
  * groupBy(word).count; candidate pieces are the ≤`maxPiece`-char
  * substrings of the (bounded) vocabulary; the Viterbi DP is a per-WORD
  * array fold (HOF, no shuffle) over a per-word piece-score map built by
  * one equi-join. Scoring a 100 TB corpus is then a word equi-join against
  * the segmented vocabulary — no DP ever runs per corpus row.
  *
  * Cross-engine determinism: piece scores are round-6 ln's cast to
  * DECIMAL(18,6); DP path sums stay DECIMAL (order-free, exact compare);
  * argmax ties break (fewer pieces, then smaller split point) — mirrored
  * by the oracle's unrolled DP stages ranked `ORDER BY s DESC, n, j`.
  *
  * Words longer than [[maxWordLen]] are excluded from BOTH the model and
  * the corpus aggregation (bounds the DP depth and the oracle's unrolled
  * stage count; document them as pass-through bytes in a real pipeline).
  */
object UnigramTok {

  /** DP depth bound = number of unrolled oracle stages. */
  val maxWordLen = 20

  /** Whitespace tokens, lowercased, length-bounded — the shared corpus
    * tokenization for model fit and scoring.
    */
  def tokens(text: Column): Column =
    filter(
      split(trim(regexp_replace(lower(text), "\\s+", " ")), " "),
      t => length(t) >= 1 && length(t) <= maxWordLen)

  /** Piece vocabulary with log-prob scores from a (word, freq) table:
    * candidate pieces are all substrings of length 1..`maxPiece`,
    * weighted by word frequency per occurrence; pieces seen at least
    * `minCount` times survive, single characters always survive (full
    * coverage — every word is segmentable). score = round-6
    * ln(cnt/total) as DECIMAL(18,6).
    * Output: piece, cnt, score.
    */
  def fitVocab(words: DataFrame, wordCol: String, freqCol: String,
      maxPiece: Int, minCount: Long): DataFrame = {
    val w = col(wordCol)
    val subs = words.select(
      explode(flatten(transform(sequence(lit(1), length(w)), p =>
        transform(sequence(lit(1), least(lit(maxPiece), length(w) - p + lit(1))), l =>
          w.substr(p, l))))).as("piece"),
      col(freqCol).cast("long").as("f"))
    val counts = subs.groupBy("piece").agg(sum(col("f")).as("cnt"))
    val vocab = graft.CacheScope.cached( // total + score read it; bounded
      counts.filter(length(col("piece")) === 1 || col("cnt") >= minCount))
    val total = vocab.agg(sum(col("cnt")).as("t"))
    vocab.crossJoin(broadcast(total))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("t").cast("double")), 6)
          .cast("decimal(18,6)").as("score"))
  }

  /** Viterbi-segment every word: max-sum piece decomposition under
    * `vocab` scores. The per-word DP runs as ONE array fold: position i's
    * best state is the max over predecessors j of (dp[j] + score of the
    * piece w[j+1..i]), looked up in a per-word (j,i)→score map built by a
    * single equi-join of the word's substrings against the vocabulary.
    * Ties: fewer pieces, then smaller j — encoded as struct max over
    * (s, -n, -j).
    * Output: word, n_pieces, logp (DECIMAL 18,6).
    */
  def segmentWords(words: DataFrame, wordCol: String, vocab: DataFrame,
      maxPiece: Int): DataFrame = {
    // pre-project to a stable "w" column FIRST: aliasing w and exploding
    // an expression over w in the same select makes the analyzer bind the
    // second reference to the select's own alias (LateralColumnAliasReference
    // internal error)
    val ws = words.select(col(wordCol).as("w"))
    val w = col("w")
    // (j, i, piece) for piece = chars j+1..i (1-based substr), i-j <= maxPiece
    val entries = ws.select(w,
      explode(flatten(transform(sequence(lit(1), length(w)), p =>
        transform(sequence(lit(1), least(lit(maxPiece), length(w) - p + lit(1))), l =>
          struct((p - 1).as("j"), (p + l - 1).as("i"), w.substr(p, l).as("piece")))))).as("e"))
      .select(col("w"), col("e.j").as("j"), col("e.i").as("i"), col("e.piece").as("piece"))
    val scoredMap = entries.join(vocab.select(col("piece"), col("score")), "piece")
      .groupBy("w")
      // key j*32+i is injective for maxWordLen < 32
      .agg(map_from_entries(collect_list(struct(
        (col("j") * 32 + col("i")).cast("int").as("k"), col("score").as("v")))).as("m"))
    val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(18,6)")
    val dp = aggregate(
      sequence(lit(1), length(col("w"))),
      array(struct(zero.as("s"), lit(0).as("n"))),
      (acc, i) => {
        val cands = filter(
          transform(sequence(greatest(i - lit(maxPiece), lit(0)), i - lit(1)), j => {
            val sc = element_at(col("m"), (j * 32 + i).cast("int"))
            when(sc.isNotNull, struct(
              (element_at(acc, j + 1).getField("s") + sc).cast("decimal(18,6)").as("s"),
              (-(element_at(acc, j + 1).getField("n") + 1)).as("negn"),
              (-j).as("negj")))
          }),
          c => c.isNotNull)
        val best = array_max(cands)
        concat(acc, array(struct(
          best.getField("s").cast("decimal(18,6)").as("s"),
          (-best.getField("negn")).as("n"))))
      })
    scoredMap
      .withColumn("__dp", element_at(dp, length(col("w")) + 1))
      .select(col("w").as("word"), col("__dp.n").as("n_pieces"),
        col("__dp.s").as("logp"))
  }
}
