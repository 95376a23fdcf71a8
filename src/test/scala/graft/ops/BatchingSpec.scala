package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
class BatchingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBulk bounds every chunk and delivers every row exactly once") {
    // side effects run on executor threads with a serialized closure copy —
    // observe through accumulators, not captured collections
    val df = (1 to 1003).toDF("n").repartition(4)
    val sizes = spark.sparkContext.collectionAccumulator[Int]("sizes")
    val seen = spark.sparkContext.collectionAccumulator[Int]("seen")
    Batching.foreachBulk(df, batchSize = 100) { chunk =>
      sizes.add(chunk.size)
      chunk.foreach(r => seen.add(r.getInt(0)))
    }
    import scala.jdk.CollectionConverters._
    assert(sizes.value.asScala.forall(_ <= 100))
    assert(seen.value.asScala.toSeq.sorted === (1 to 1003))
  }

  test("withOrdinalBatch assigns contiguous 1-based batches in key order") {
    val df = (1 to 250).toDF("n")
    val batches = Batching.withOrdinalBatch(df, "n", 100)
      .groupBy("batch").agg(count(lit(1)).as("c"), min("n").as("lo"), max("n").as("hi"))
      .orderBy("batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(batches === Array((1L, 100L, 1, 100), (2L, 100L, 101, 200), (3L, 50L, 201, 250)))
  }

  test("keysetPage returns the page strictly after the cursor, in order") {
    val df = (1 to 50).toDF("n")
    val page = Batching.keysetPage(df, "n", Some(lit(20)), 10).as[Int].collect()
    assert(page.toSeq === (21 to 30))
    val first = Batching.keysetPage(df, "n", None, 5).as[Int].collect()
    assert(first.toSeq === (1 to 5))
  }
}
