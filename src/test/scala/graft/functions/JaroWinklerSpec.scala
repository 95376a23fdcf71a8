package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(UTF8String.fromString(a), UTF8String.fromString(b))

  test("matches the DuckDB jaro_winkler_similarity battery bit-for-bit") {
    // expected values are DuckDB 1.x jaro_winkler_similarity outputs,
    // captured verbatim (the oracle for x_jaro_names hash-compares
    // doubles, so parity must be exact, not approximate)
    val battery = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("a", "", 0.0),
      ("crate", "trace", 0.7333333333333334),
      ("dwayne", "duane", 0.8400000000000001),
      ("ab", "abcdefgh", 0.8),
      ("apple", "applesauce", 0.9),
      ("x", "x", 1.0),
      ("ba", "ab", 0.0), // match window 0 -> no matches despite anagram
      ("hello world", "hello wrold", 0.9818181818181818),
      ("supplier123", "supplier124", 0.9636363636363636))
    battery.foreach { case (a, b, expected) =>
      assert(jw(a, b) === expected, s"jw($a, $b)")
      assert(jw(b, a) === expected, s"jw($b, $a) (symmetry)")
    }
  }

  test("boost applies only above 0.7 and caps the prefix at 4") {
    // crate/trace: jaro 0.7333 > 0.7 but common prefix 0 -> no boost
    assert(jw("crate", "trace") === 0.7333333333333334)
    // 5-char shared prefix still boosts with l=4 only
    val j10 = jw("abcdefghij", "abcdeXghij")
    val j4cap = {
      val jaro = (9.0 / 10 + 9.0 / 10 + 9.0 / 9.0) / 3.0
      jaro + 4 * 0.1 * (1.0 - jaro)
    }
    assert(j10 === j4cap)
  }

  test("SQL registration and codegen/interpreted agreement on real names") {
    graft.GraftExtensions.register(spark)
    val names = graft.sources.Tables.load(spark, TestSpark.sfDir, "part")
      .select($"p_name").distinct()
    val viaSql = names.selectExpr("p_name", "jaro_winkler(p_name, 'small ring') AS s")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    viaSql.foreach { case (n, s) =>
      assert(s === jw(n, "small ring"), s"codegen vs kernel for $n")
    }
    assert(viaSql("small ring") === 1.0)
  }

  test("nulls propagate") {
    val r = Seq(("a", null: String)).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler($"a", $"b")).head()
    assert(r.isNullAt(0))
  }
}
