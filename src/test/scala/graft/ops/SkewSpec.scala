package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows share key "hot"
  private def skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k${i % 10}", i.toDouble))).toDF("k", "v").repartition(8)

  test("saltedAggregate equals the plain aggregate") {
    val salted = Skew.saltedAggregate(
      skewed, "k", salts = 4,
      partialAggs = Seq(count(lit(1)).as("pc"), sum($"v").as("ps")),
      mergeAggs = Seq(sum($"pc").as("cnt"), sum($"ps").as("total")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("cnt"), sum($"v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(salted.map(t => (t._1, t._2)).toSeq === plain.map(t => (t._1, t._2)).toSeq)
    salted.zip(plain).foreach { case (s, p) => assert(math.abs(s._3 - p._3) < 1e-6) }
  }

  test("saltedJoin equals the plain join") {
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "label")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 4)
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val plain = skewed.join(dim, "k")
      .groupBy("k", "label").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(salted.toSeq === plain.toSeq)
  }
}
