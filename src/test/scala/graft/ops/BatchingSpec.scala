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

  test("globalOrdinal ranks exactly like a single global window, without one") {
    // unsorted, duplicated-free key; shuffled input partitions
    val df = (1 to 5000).map(i => (i * 7919) % 15137).distinct.toDF("n").repartition(8)
    val got = Batching.globalOrdinal(df, "n", "rn", buckets = 8)
      .orderBy("n").select("n", "rn").as[(Int, Long)].collect()
    val want = got.map(_._1).sorted.zipWithIndex.map { case (n, i) => (n, i + 1L) }
    assert(got.toSeq === want.toSeq)
    // plan property: no empty-partition-spec window anywhere (the failure
    // mode this operator exists to avoid)
    val plan = Batching.globalOrdinal(df, "n").queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(n"), "found a global (unpartitioned) window")
  }

  test("globalOrdinal handles NaN like the single-window form (NaN sorts greatest)") {
    // Spark's total order puts NaN above every double in BOTH comparisons
    // and sorts; the bucket expression must agree with the window sort or
    // NaN rows would be numbered into the wrong bucket
    val df = (Seq(5.0, 1.0, Double.NaN, 3.0, Double.NaN, 2.0)).toDF("v").repartition(3)
    val got = Batching.globalOrdinal(df, "v", "rn", buckets = 3)
      .select("v", "rn").as[(Double, Long)].collect().sortBy(_._2)
    // NaN must take the TOP ranks in the distributed form, as in the window
    assert(got.takeRight(2).forall(p => p._1.isNaN), s"NaN not ranked greatest: ${got.toSeq}")
    assert(got.map(_._2).toSeq == (1L to 6L), s"ranks not a permutation: ${got.toSeq}")
    assert(got.dropRight(2).map(_._1).toSeq == Seq(1.0, 2.0, 3.0, 5.0))
  }

  test("withOrdinalBatchDistributed numbers batches identically to the parity form") {
    val df = (1 to 2500).toDF("n")
    def stats(b: org.apache.spark.sql.DataFrame) =
      b.groupBy("batch").agg(count(lit(1)).as("c"), min("n").as("lo"), max("n").as("hi"))
        .orderBy("batch").collect().toSeq
    assert(stats(Batching.withOrdinalBatchDistributed(df, "n", 100)) ===
      stats(Batching.withOrdinalBatch(df, "n", 100)))
  }

  test("keysetPage returns the page strictly after the cursor, in order") {
    val df = (1 to 50).toDF("n")
    val page = Batching.keysetPage(df, "n", Some(lit(20)), 10).as[Int].collect()
    assert(page.toSeq === (21 to 30))
    val first = Batching.keysetPage(df, "n", None, 5).as[Int].collect()
    assert(first.toSeq === (1 to 5))
  }
}
