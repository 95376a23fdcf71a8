package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class LmScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "cat dog cat dog cat dog"),
    (2L, "cat dog cat dog zyxxy"), // one rare token
    (3L, "cat cat cat dog dog dog")
  ).toDF("doc_id", "text")

  test("vocab keeps only tokens at or above minCount") {
    val v = LmScore.vocab(corpus, "text", minCount = 2)
      .as[(String, Long)].collect().toMap
    assert(v === Map("cat" -> 8L, "dog" -> 8L)) // zyxxy (c=1) falls out
  }

  test("scoreBigrams: transition smoothing and unseen accounting are exact") {
    // bigram counts: cat-dog 6, dog-cat 3, cat-cat 2, dog-dog 2 (>= 2 kept);
    // dog-zyxxy (c=1) falls out of the model -> scored unseen at c2 = 0.
    // V = 2 (cat, dog at uniMinCount = 2); denom = c1(prev) + V + 1 = 11.
    val out = LmScore.scoreBigrams(corpus, "doc_id", "text", uniMinCount = 2, biMinCount = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    def lp(num: Double) =
      BigDecimal(math.log(num / 11)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val (cd, dc, cc, dd, un) = (lp(7), lp(4), lp(3), lp(3), lp(1))
    def mean(sum: BigDecimal, n: Int) =
      (sum / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) === ((1L, 5L, 0L, mean(cd * 3 + dc * 2, 5), 0.0)))
    assert(out(1) === ((2L, 4L, 1L, mean(cd * 2 + dc + un, 4), 0.25)))
    assert(out(2) === ((3L, 5L, 0L, mean(cc * 2 + cd + dd * 2, 5), 0.0)))
    // the doc with an unseen transition scores strictly lower than doc 1
    assert(out(1)._4 < out(0)._4)
  }

  test("scoreDocs: OOV accounting and smoothing arithmetic are exact") {
    val out = LmScore.scoreDocs(corpus, "doc_id", "text", minCount = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    // N = 17 tokens, V = 2 -> denom 20; p(cat)=p(dog)=9/20, p(oov)=1/20
    val lpIn = BigDecimal(math.log(9.0 / 20)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val lpOov = BigDecimal(math.log(1.0 / 20)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def mean(sum: BigDecimal, n: Int) =
      (sum / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) === ((1L, 6L, 0L, mean(lpIn * 6, 6), 0.0)))
    assert(out(1) === ((2L, 5L, 1L, mean(lpIn * 4 + lpOov, 5), 0.2)))
    assert(out(2) === ((3L, 6L, 0L, mean(lpIn * 6, 6), 0.0)))
    // the OOV-bearing doc scores strictly lower
    assert(out(1)._4 < out(0)._4)
  }
}
