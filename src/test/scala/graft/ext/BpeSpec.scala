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

  test("encodeTokenCounts: vocab encoded once, corpus counts follow the merges") {
    import org.apache.spark.sql.functions.{col, split}
    val w = Seq(("ab", 2L), ("abab", 1L)).toDF("word", "freq")
    val docs = Seq((1L, "ab abab ab"), (2L, "abab")).toDF("doc_id", "text")
    def counts(n: Int) = {
      val learned = Bpe.learn(w, "word", "freq", nMerges = n)
      Bpe.encodeTokenCounts(docs, "doc_id", split(col("text"), " "), learned)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    // after 1 merge (a,b): ab=[ab] (1 tok), abab=[ab,ab] (2 toks)
    assert(counts(1) === Map(1L -> ((3L, 4L)), 2L -> ((1L, 2L))))
    // after 2 merges (+ (ab,ab)): abab=[abab] (1 tok)
    assert(counts(2) === Map(1L -> ((3L, 3L)), 2L -> ((1L, 1L))))
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
