package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learnMerges picks weighted-max pairs and folds them greedily") {
    // "ab"×2 + "abab"×1: (a,b) count 4 first; after folding, (ab,ab) count 1
    val w = Seq(("ab", 2L), ("abab", 1L)).toDF("word", "freq")
    val out = Bpe.learnMerges(w, "word", "freq", nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq((1, "a", "b", "ab", 4L), (2, "ab", "ab", "abab", 1L)))
  }

  test("greedy left-to-right fold: 'aaa' merges to [aa, a], not [a, aa]") {
    val w = Seq(("aaa", 1L)).toDF("word", "freq")
    // merge 1 is (a,a) cnt 2; applying it greedily leaves exactly ONE
    // (aa,a) adjacency for round 2 — [a,aa] would instead leave (a,aa)
    val out = Bpe.learnMerges(w, "word", "freq", nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(out.toSeq === Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("ties break lexicographically and exhaustion stops early") {
    // (a,b) and (c,d) both count 1 → (a,b) first; after 2 merges both words
    // are single tokens, so merge 3 never materializes
    val w = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "freq")
    val out = Bpe.learnMerges(w, "word", "freq", nMerges = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq((1, "a", "b"), (2, "c", "d")))
  }
}
