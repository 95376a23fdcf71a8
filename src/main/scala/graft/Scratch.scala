package graft

import org.apache.spark.sql.SparkSession

/** Local best-of-3 timing for named queries — the re-measure discipline
  * NOTES.md mandates before optimizing anything (driver BENCH absolutes
  * can be 2× local best-of-3 under co-tenant load). Usage:
  *   sbt "runMain graft.Scratch 0.1 x_token_fertility x_minhash_lsh"
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
    // an absolute path selects a synthesized corpus (e.g. MakeScale's sf1)
    val sfDir = if (sf.startsWith("/")) sf else s"/root/testdata/sf$sf"
    val spark = GraftSession.withScratchLocalDir(SparkSession.builder(), "local[32]")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // JVM-wide compiled-codegen cache (STATIC conf, read once at first
      // codegen): the default 100 entries thrashes under a many-query
      // session — every cache miss is a fresh Janino compile on the task
      // path (measured: x_dbscan -47%, x_mmr_rerank -33% at sf0.1 from
      // this alone). Sized for one long-lived JVM running the full query
      // surface; compiled classes are small, heap cost is negligible.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TsRangePushdown.register(spark)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup (JIT/codegen), then three timed runs — report each + min
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
      CacheScope.drain()
      spark.catalog.clearCache()
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable => println(s"$name ERROR ${e.getClass.getSimpleName}: ${e.getMessage}"); -1.0 }
        CacheScope.drain()
        spark.catalog.clearCache()
        r
      }
      println(f"SCRATCH $name%-28s runs=${times.map(t => f"$t%.2f").mkString(",")} min=${times.min}%.2f")
    }
    spark.stop()
  }
}
