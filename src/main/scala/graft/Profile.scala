package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Measurement harness (optimization guide §1): runs named queries once
  * (after a warmup) under a SparkListener that tallies jobs, stages, tasks
  * and per-stage wall time, so "where do the seconds go" is answered with
  * numbers instead of guesses. Usage:
  *   tools/run_main.sh graft.Profile 0.1 x_pagerank x_dbscan
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.headline
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

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    val runMs = new AtomicLong(0)
    val deserMs = new AtomicLong(0)
    val gcMs = new AtomicLong(0)
    val cpuMs = new AtomicLong(0)
    val stageRows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageTaskMs = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(0L)
        val tms = Option(stageTaskMs.get(si.stageId)).map(_.get).getOrElse(0L)
        stageRows.add(f"    stage ${si.stageId}%4d wall=${wall}%5d ms taskMs=${tms}%7d tasks=${si.numTasks}%3d  ${si.name.take(60)}")
        ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) {
          taskTimeMs.addAndGet(t.taskInfo.duration)
          stageTaskMs.computeIfAbsent(t.stageId, _ => new AtomicLong(0)).addAndGet(t.taskInfo.duration)
        }
        if (t.taskMetrics != null) {
          runMs.addAndGet(t.taskMetrics.executorRunTime)
          deserMs.addAndGet(t.taskMetrics.executorDeserializeTime)
          gcMs.addAndGet(t.taskMetrics.jvmGCTime)
          cpuMs.addAndGet(t.taskMetrics.executorCpuTime / 1000000L)
        }
        ()
      }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () } // warmup
      CacheScope.drain(); spark.catalog.clearCache()
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0); stageRows.clear(); stageTaskMs.clear(); runMs.set(0); deserMs.set(0); gcMs.set(0); cpuMs.set(0)
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); () } catch { case e: Throwable => println(s"$name ERROR: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      // let queued listener events drain before reading the counters
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      CacheScope.drain(); spark.catalog.clearCache()
      println(f"PROFILE $name%-28s wall=$wall%6.2f s jobs=${jobs.get}%3d stages=${stages.get}%4d tasks=${tasks.get}%5d taskTime=${taskTimeMs.get / 1000.0}%7.1f s run=${runMs.get / 1000.0}%.1f deser=${deserMs.get / 1000.0}%.1f gc=${gcMs.get / 1000.0}%.1f cpu=${cpuMs.get / 1000.0}%.1f")
      if (args.contains("--stages")) {
        stageRows.forEach(r => println(r))
      }
    }
    spark.stop()
  }
}
