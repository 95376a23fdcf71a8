package graft.ext

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.load(spark, TestSpark.sfDir, "documents")

  test("sampleMixture is deterministic and respects per-source thresholds") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.0)
    val kept = Mixture.sampleMixture(docs, "source", "text", rates, defaultRate = 0.5)
    val k1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val k2 = Mixture.sampleMixture(docs, "source", "text", rates, defaultRate = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k1 === k2, "same rows must survive every run")
    val bySource = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("src0") === totals("src0")) // rate 1.0 keeps everything
    assert(!bySource.contains("src1")) // rate 0.0 keeps nothing
  }

  test("mixtureReport realized rates are near the targets on a uniform hash") {
    val rep = Mixture.mixtureReport(docs, "source", "text",
      Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.1).collect()
    val bySrc = rep.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySrc("src0")._1 === bySrc("src0")._2)
    val (t1, k1) = bySrc("src1")
    assert(math.abs(k1.toDouble / t1 - 0.5) < 0.25, s"src1 kept $k1/$t1, far from 0.5")
  }

  test("hash24 matches a hand-computed md5 prefix and keepAtRate bounds") {
    val h = Seq("hello").toDF("t").select(Mixture.hash24(col("t"))).head().getInt(0)
    assert(h === Integer.parseInt("5d4140", 16)) // md5("hello") = 5d41402a...
    intercept[IllegalArgumentException] { Mixture.keepAtRate(col("t"), 1.5) }
  }

  test("weightedSampleWithoutReplacement: k per group, ranks 1..k, rerun-identical") {
    val rows = (1L to 200L).map(i => (s"g${i % 3}", i, (i % 7 + 1) * 100))
      .toDF("g", "id", "w")
    def run() = Mixture.weightedSampleWithoutReplacement(rows, "g", "id", col("w"), k = 4)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val got = run()
    assert(got.size === 12) // 3 groups × k
    Seq("g0", "g1", "g2").foreach { g =>
      assert(got.filter(_._1 == g).map(_._2).toSeq.sorted === Seq(1, 2, 3, 4))
    }
    assert(run() === got, "content-hash uniforms must make reruns identical")
  }

  test("weightedSampleWithoutReplacement: key is ln(u)/w of the content-hash uniform") {
    val one = Seq(("g", 123L, 50L)).toDF("g", "id", "w")
    val r = Mixture.weightedSampleWithoutReplacement(one, "g", "id", col("w"), k = 1).head()
    val h = Seq("123").toDF("t").select(Mixture.hash24(col("t"))).head().getInt(0)
    val expected = math.floor(math.log((h + 1.0) / 16777217.0) / 50.0 * 1e6 + 0.5) / 1e6
    assert(r.getDouble(4) === expected)
    assert(r.getDouble(3) === 50.0)
  }

  test("weightedSampleWithoutReplacement favors heavy rows: expected-weight sanity") {
    // two-point weights 1 vs 1000: the heavy tenth should dominate picks
    val rows = (1L to 300L).map(i => ("g", i, if (i % 10 == 0) 100000L else 1L))
      .toDF("g", "id", "w")
    val picks = Mixture.weightedSampleWithoutReplacement(rows, "g", "id", col("w"), k = 10)
      .collect().map(_.getLong(2))
    val heavy = picks.count(_ % 10 == 0)
    assert(heavy >= 8, s"with 1e5:1 weights the heavy rows should win ~all slots, got $heavy/10")
  }

  test("weightedSampleWithoutReplacement plans as WindowGroupLimit — partial top-k before the exchange") {
    val rows = (1L to 100L).map(i => (s"g${i % 2}", i, i)).toDF("g", "id", "w")
    val plan = Mixture.weightedSampleWithoutReplacement(rows, "g", "id", col("w"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"top-k per group must run partial:\n$plan")
  }
}
