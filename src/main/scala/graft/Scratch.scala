package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness: runMain graft.Scratch <sfDir> <name...> — times
  * each named query 3× after a warmup, prints seconds per run.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TsRangePushdown.register(spark)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count()
      spark.catalog.clearCache()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"TIMING $n%-28s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
