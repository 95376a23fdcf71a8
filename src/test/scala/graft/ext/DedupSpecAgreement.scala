package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DedupSpecAgreement extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("LSH candidate set is a superset of exact pairs above the S-curve knee") {
    val row = graft.SparkEntry.queries("x_lsh_exact_agreement")(spark, TestSpark.sfDir).collect()
    assert(row.length === 1)
    assert(row(0).getLong(0) > 100, "gate must be non-vacuous: expected >100 exact pairs")
    assert(row(0).getLong(1) === 0L, s"LSH missed ${row(0).getLong(1)} above-knee pairs")
  }
}
