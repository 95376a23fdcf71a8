package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed fact-to-fact join plans without a shuffle and returns correct rows") {
    val li = Tables.load(spark, TestSpark.sfDir, "lineitem")
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8, sortCols = Seq("l_orderkey"))
    Bucketing.writeBucketed(o, "o_b", "o_orderkey", 8, sortCols = Seq("o_orderkey"))

    // force the sort-merge path (at test scale the planner would broadcast,
    // which hides the property under test: bucket co-location)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
