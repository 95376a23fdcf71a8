package graft

import org.scalatest.funsuite.AnyFunSuite

class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("oracle coverage: every query without SQL is an explicitly known exception") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // xxhash64 signatures, JSON text formatting, HLL sketch values, and
    // hash-derived ANN buckets/cells aren't SQL-portable across engines
    assert(rowsOnly === Set("f3_to_json", "x_minhash_lsh", "x_simhash_pairs", "x_ann_lsh",
      "x_ann_ivf", "a7_approx_distinct", "x_multimodal_features"))
  }

  test("all queries execute and are non-empty at sf0.001 (except known-sparse pair miners)") {
    val maybeEmpty = Set("x_ngram_jaccard", "x_embed_neardup", "x_minhash_lsh", "x_simhash_pairs")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sfDir).count()
      if (!maybeEmpty.contains(name)) assert(n > 0, s"$name returned no rows")
    }
  }
}
