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

  /** Shuffle/spill scratch directory for local sessions (spark.local.dir).
    *
    * Shuffle files are ephemeral per-run scratch, and local scratch
    * bandwidth/latency is a first-order cost for shuffle-heavy work
    * (optimization guide §1.3) — on this box, creating+fsyncing the
    * per-task shuffle data/index files on the root disk costs more than
    * the data itself (measured: a trivial 32-task aggregation drops from
    * ~174 ms to ~111 ms with scratch on tmpfs; x_dbscan at sf0.1 from
    * 4.8 s to 2.9 s). Production parameterisation is Spark's own:
    * SPARK_LOCAL_DIRS / spark.local.dir pointing at fast local SSDs
    * override this; the tmpfs default only fires where /dev/shm exists
    * and nothing was configured explicitly.
    */
  def scratchLocalDir: Option[String] = {
    if (sys.env.contains("SPARK_LOCAL_DIRS") || sys.props.contains("spark.local.dir")) None
    else {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft_spark_local")
        d.mkdirs()
        Some(d.getAbsolutePath)
      } else None
    }
  }

  /** Apply [[scratchLocalDir]] to a session builder (no-op when the
    * environment already configures scratch dirs).
    */
  def withScratchLocalDir(b: SparkSession.Builder): SparkSession.Builder =
    scratchLocalDir.fold(b)(d => b.config("spark.local.dir", d))

  def local(threads: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = withScratchLocalDir(SparkSession
      .builder())
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
