package graft

import org.apache.spark.sql.SparkSession

/** Session factory for local development and tests.
  *
  * The production driver (Verify/Bench) builds its own session; this one
  * mirrors it but picks settings designed to scale: AQE on (runtime
  * re-planning, skew-join splitting), shuffle partitions sized to the
  * parallelism rather than the Spark default of 200.
  */
object GraftSession {
  def local(threads: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$threads]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", threads.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // JVM-wide compiled-codegen cache (STATIC conf, read once at first
      // codegen): the default 100 entries thrashes under a many-query
      // session — every cache miss is a fresh Janino compile on the task
      // path (measured: x_dbscan -47%, x_mmr_rerank -33% at sf0.1 from
      // this alone). Sized for one long-lived JVM running the full query
      // surface; compiled classes are small, heap cost is negligible.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts encoding drifts between corpus drops (TIMESTAMP(NANOS)
      // nanos-long / TIMESTAMP_MICROS NTZ); nanosAsLong covers the legacy
      // form and Tables.loadEvents normalizes whatever is stored
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TsRangePushdown.register(spark)
    spark
  }
}
