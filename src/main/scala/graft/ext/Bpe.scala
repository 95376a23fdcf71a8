package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge discovery — the tokenizer-training step of an
  * LLM data pipeline (north-star extension; the token-counting side lives
  * in [[graft.functions.TextFunctions.subwordCount]]).
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the corpus: the
  * corpus-scale work is one groupBy(word).count, after which every merge
  * iteration touches only the vocabulary (bounded by the language, ~10^6
  * rows at web scale — metadata relative to 100 TB of text). Each
  * iteration is one aggregation over that table (adjacent-pair counts
  * weighted by word frequency) plus a map applying the chosen merge; the
  * chosen pair itself is a single driver-side row per iteration, exactly
  * like a broadcast threshold.
  */
object Bpe {

  /** Learn `nMerges` merges greedily: each round picks the most frequent
    * adjacent token pair (ties broken lexicographically — deterministic)
    * and rewrites every word's token array by greedy left-to-right
    * non-overlapping replacement. Output: rank, lhs, rhs, merged, cnt
    * (the pair's weighted frequency when it was chosen).
    */
  def learnMerges(words: DataFrame, wordCol: String, freqCol: String, nMerges: Int): DataFrame = {
    val spark = words.sparkSession
    var toks = words.select(
      split(col(wordCol), "").as("t"), col(freqCol).cast("long").as("f"))
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
          aggregate(
            slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
            slice(col("t"), lit(1), lit(1)),
            (acc, x) => when(element_at(acc, -1) === lit(l) && x === lit(r),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x)))).as("t"),
          col("f"))
        rank += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "lhs", "rhs", "merged", "cnt")
  }
}
