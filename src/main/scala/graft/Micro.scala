package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Micro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.props.getOrElse("micro.parts", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.props.getOrElse("micro.aqe", "true"))
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = spark.range(1000).select(col("id"), (col("id") % 7).as("k")).localCheckpoint()
    // warmup
    (1 to 3).foreach(_ => base.groupBy("k").count().count())
    if (sys.props.contains("micro.spin")) {
      while (true) { base.filter(col("id") > 1).count(); () }
    }
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = 20
      (1 to n).foreach { i => base.groupBy("k").agg(sum(col("id") + i).as("s")).count() }
      println(f"AGG_JOB avg ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms")
      val t1 = System.nanoTime()
      (1 to n).foreach { i => base.filter(col("id") > i).count() }
      println(f"SCAN_JOB avg ${(System.nanoTime() - t1) / 1e6 / n}%.1f ms")
      val t2 = System.nanoTime()
      (1 to n).foreach { i =>
        base.join(base.select((col("id") + i).as("id"), col("k").as("k2")), "id").count()
      }
      println(f"JOIN_JOB avg ${(System.nanoTime() - t2) / 1e6 / n}%.1f ms")
      val t3 = System.nanoTime()
      (1 to n).foreach { i => base.select(col("id") + i).localCheckpoint(true) }
      println(f"CKPT_JOB avg ${(System.nanoTime() - t3) / 1e6 / n}%.1f ms")
      val t4 = System.nanoTime()
      (1 to n).foreach { i => base.filter(col("id") > i).groupBy("k").count().queryExecution.executedPlan }
      println(f"PLAN_ONLY avg ${(System.nanoTime() - t4) / 1e6 / n}%.1f ms")
      val t5 = System.nanoTime()
      (1 to n).foreach { i =>
        val df = base.filter(col("id") > i).groupBy("k").count()
        df.queryExecution.executedPlan
        val p0 = System.nanoTime()
        df.count()
        ()
      }
      println(f"PREPLANNED_COUNT avg ${(System.nanoTime() - t5) / 1e6 / n}%.1f ms")
      val t6 = System.nanoTime()
      (1 to n).foreach { i => spark.sparkContext.parallelize(1 to 32, 32).map(_ + i).count() }
      println(f"RAW_RDD_JOB avg ${(System.nanoTime() - t6) / 1e6 / n}%.1f ms")
    }
    spark.stop()
  }
}
