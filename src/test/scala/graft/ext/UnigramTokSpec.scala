package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UnigramTokSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fitVocab: single chars always survive; multi-char pieces gated by minCount") {
    val words = Seq(("abab", 10L), ("ab", 50L)).toDF("w", "f")
    val vocab = UnigramTok.fitVocab(words, "w", "f", maxPiece = 2, minCount = 60L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "ab" occurs twice in abab (2*10) + once in ab (50) = 70 >= 60; "ba" = 10 < 60
    assert(vocab.keySet === Set("a", "b", "ab"))
    assert(vocab("ab") === 70L)
    assert(vocab("a") === 70L) // 2 per abab*10 + 1 per ab*50
  }

  test("segmentWords: Viterbi prefers the high-probability long piece; fewer pieces on ties") {
    val words = Seq(("abab", 10L), ("ab", 50L)).toDF("w", "f")
    val vocab = UnigramTok.fitVocab(words, "w", "f", maxPiece = 2, minCount = 60L)
    val seg = UnigramTok.segmentWords(words.select("w"), "w", vocab, maxPiece = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // ln p("ab") = ln(70/210) beats two singles 2*ln(70/210): picking "ab"
    // halves the (equal-score) piece count — ab+ab for abab
    assert(seg("abab") === 2)
    assert(seg("ab") === 1)
  }

  test("segmentWords: full coverage via single chars when no multi-char piece qualifies") {
    val words = Seq(("xyzzy", 1L)).toDF("w", "f")
    val vocab = UnigramTok.fitVocab(words, "w", "f", maxPiece = 4, minCount = 1000L)
    val seg = UnigramTok.segmentWords(words.select("w"), "w", vocab, maxPiece = 4)
      .collect().head
    assert(seg.getInt(1) === 5, "every char its own piece")
  }

  test("segmentWords path sum equals the sum of chosen piece scores (decimal-exact rerun)") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents").limit(50)
    val toks = docs.select(explode(UnigramTok.tokens(col("text"))).as("w"))
    val words = toks.groupBy("w").agg(count(lit(1)).as("f"))
    val vocab = UnigramTok.fitVocab(words, "w", "f", maxPiece = 4, minCount = 20L)
    def run() = UnigramTok.segmentWords(words.select("w"), "w", vocab, maxPiece = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDecimal(2))).toSet
    val a = run()
    assert(a.nonEmpty)
    assert(a === run(), "deterministic across runs")
    // every word's piece count is within [ceil(len/4), len]
    a.foreach { case (w, n, _) =>
      assert(n >= (w.length + 3) / 4 && n <= w.length, s"$w -> $n pieces out of range")
    }
  }
}
