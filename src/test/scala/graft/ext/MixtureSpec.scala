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
}
