package graft.functions

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed top-k aggregator matches the window row_number formulation") {
    val events = Tables.loadEvents(spark, TestSpark.sfDir)
      .select(col("event_type"), col("value").as("score"), col("event_id").as("id"))

    val viaAgg = events.as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => Scored(t._2, t._3))
      .agg(new TopKAggregator(5).toColumn)
      .flatMap { case (et, top) => top.map(s => (et, s.id, s.score)) }
      .collect().toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("score").desc, col("id"))
    val viaWindow = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("event_type", "id", "score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    assert(viaAgg === viaWindow)
  }

  test("reduce keeps the buffer bounded and deterministic under ties") {
    val agg = new TopKAggregator(2)
    val items = Seq(Scored(1.0, 5), Scored(1.0, 3), Scored(1.0, 9), Scored(2.0, 7))
    val out = items.foldLeft(agg.zero)(agg.reduce)
    assert(out === Seq(Scored(2.0, 7), Scored(1.0, 3))) // ties → lowest id wins
  }
}
