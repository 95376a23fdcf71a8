package graft
import org.apache.spark.sql.SparkSession

/** Scaling-slope report: time every query at sf0.01 AND sf0.1 in one
  * session and report t(large)/t(small) per query. This converts "the
  * plan is scale-shaped" from a review opinion into a measurement: a plan
  * linear in data shows a ratio at or (usually, with per-job fixed
  * overhead dominating the small SF) well below the 10× data ratio, while
  * a super-linear plan — the r8 x_gini histogram-crossJoin class — shows
  * up mechanically as ratio >> 10 without anyone eyeballing the plan.
  *
  * Output: BENCH_SCALING.json with per-query {small, large, ratio} plus a
  * `flagged` list (ratio > FLAG_RATIO and large-SF time above the noise
  * floor). Run manually per round; not part of the driver contract.
  */
object BenchScaling {
  /** Flag threshold: the data ratio is 10×; 15 allows shuffle-partition
    * and JIT jitter while still catching anything quadratic (which at
    * 10× data shows ~100× time).
    */
  val FlagRatio = 15.0

  /** Queries below this many seconds at the LARGE sf are inside local-mode
    * scheduling noise — a 0.04 s → 0.7 s "ratio 17" is jitter, not a
    * scale signal.
    */
  val NoiseFloorSec = 0.75

  def main(args: Array[String]): Unit = {
    val small = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val large = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TsRangePushdown.register(spark)
    def timeBest(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                 dir: String, passes: Int): Either[String, Double] = {
      val ts = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val r =
          try { fn(spark, dir).count(); Right((System.nanoTime() - t0) / 1e9) }
          catch { case e: Throwable => Left(e.getClass.getSimpleName) }
        CacheScope.drain()
        spark.catalog.clearCache()
        r
      }
      ts.collectFirst { case Left(e) => Left(e) }
        .getOrElse(Right(ts.collect { case Right(t) => t }.min))
    }
    // warmup both SFs (JIT, codegen, FS cache), then best-of-2 timed each
    SparkEntry.queries.foreach { case (_, fn) =>
      Seq(small, large).foreach { d =>
        try { fn(spark, d).count(); () } catch { case _: Throwable => () }
        CacheScope.drain()
        spark.catalog.clearCache()
      }
    }
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val ts = timeBest(fn, small, 2)
      val tl = timeBest(fn, large, 2)
      (name, ts, tl)
    }
    val entries = rows.collect { case (name, Right(ts), Right(tl)) =>
      val ratio = if (ts > 0) tl / ts else Double.NaN
      (name, ts, tl, ratio)
    }
    val flagged = entries.filter { case (_, _, tl, ratio) =>
      tl >= NoiseFloorSec && ratio > FlagRatio
    }
    val errs = rows.collect {
      case (name, Left(e), _) => s"\"$name\":\"small:$e\""
      case (name, _, Left(e)) => s"\"$name\":\"large:$e\""
    }.mkString("{", ",", "}")
    val qjson = entries.map { case (n, ts, tl, r) =>
      s""""$n":{"small":${f(ts)},"large":${f(tl)},"ratio":${f(r)}}"""
    }.mkString("{", ",", "}")
    val fjson = flagged.map { case (n, _, _, r) => s""""$n":${f(r)}""" }.mkString("{", ",", "}")
    val out =
      s"""{"small_sf":"$small","large_sf":"$large","data_ratio":10.0,"flag_ratio":$FlagRatio,"noise_floor_sec":$NoiseFloorSec,"flagged":$fjson,"errors":$errs,"queries":$qjson}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/BENCH_SCALING.json"),
      out.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"flagged: ${flagged.map(_._1).mkString(", ")} (${flagged.size})")
    spark.stop()
  }
}
