package graft.sinks

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def events = Tables.withDay(Tables.loadEvents(spark, TestSpark.sfDir))

  test("SearchSortedRank is bit-identical to the when-chain rank, incl. NULL/NaN/boundary edges") {
    import spark.implicits._
    val bounds = Array(-3.5, 0.0, 1.0, 2.5, 7.25)
    // values straddling, hitting, and escaping every boundary + the edges
    val vs: Seq[java.lang.Double] = Seq(
      -100.0, -3.5, -3.4999999, 0.0, -0.0, 0.5, 1.0, 2.5, 2.5000001, 7.25,
      1e18, java.lang.Double.NaN, java.lang.Double.POSITIVE_INFINITY,
      java.lang.Double.NEGATIVE_INFINITY, null)
    val df = vs.toDF("v")
    val whenChain = bounds.toIndexedSeq
      .map(bv => when(col("v") >= lit(bv), 1L).otherwise(0L))
      .reduce((a, x) => a + x)
    val got = df.select(
        graft.functions.SearchSortedRank.searchSortedRank(col("v"), bounds).as("native"),
        whenChain.as("spec"))
      .collect()
    got.zip(vs).foreach { case (r, v) =>
      assert(r.getLong(0) === r.getLong(1), s"rank mismatch for input $v")
    }
    // and it fuses: over a parquet scan (a LocalTableScan pre-evaluates),
    // the rank must run inside whole-stage codegen
    val plan = events.select(
        graft.functions.SearchSortedRank.searchSortedRank(col("value").cast("double"), bounds))
      .queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[searchsortedrank""".r.findFirstIn(plan).isDefined,
      s"rank must fuse into a whole-stage-codegen'd Project (the *(n) prefix):\n$plan")
  }

  test("compactTo: size cap holds, parallelism scales with data, data survives") {
    val out = Files.createTempDirectory("graft_compact").toString + "/out"
    val maxRecords = 40L
    val target = Compaction.compactTo(events, "day", "event_id", maxRecords, out)

    val back = spark.read.parquet(out)
    // roundtrip: nothing lost, nothing duplicated
    assert(back.count() === events.count())

    // every physical file obeys the row cap
    val files = new java.io.File(out).listFiles().filter(_.isDirectory).flatMap(
      _.listFiles().filter(f => f.getName.endsWith(".parquet")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= maxRecords, s"${f.getName} holds $n rows > cap $maxRecords")
    }

    // total file count is near the target: collisions only merge DOWN,
    // maxRecordsPerFile splits only when a merge overfills
    val total = events.count()
    val lower = (total + maxRecords - 1) / maxRecords
    assert(target >= lower)
    assert(files.length.toLong >= lower, s"${files.length} files < theoretical floor $lower")
    assert(files.length.toLong <= 2 * target, s"${files.length} files vs target $target — sizing broken")

    // a partition bigger than maxRecords is written by MULTIPLE files
    // (i.e. multiple routing buckets), never collapsed to one task's file
    val hotDay = events.groupBy("day").count().filter(col("count") > maxRecords)
      .select("day").collect().headOption.map(_.getString(0))
    hotDay.foreach { d =>
      val dayFiles = new java.io.File(s"$out/day=$d").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(dayFiles > 1, s"hot partition day=$d compacted to a single file")
    }
  }

  test("compactTo rejects a non-positive cap") {
    intercept[IllegalArgumentException] {
      Compaction.compactTo(events, "day", "event_id", 0, "/tmp/never")
    }
  }

  test("clusteredWrite narrows per-file value ranges; naive layout spans the domain") {
    import spark.implicits._
    // 3 days x 400 rows, values interleaved so arrival order is unclustered
    val rows = for (d <- 1 to 3; i <- 0 until 400)
      yield (d.toLong * 1000 + i, s"2024-02-0$d", (i % 100).toDouble + d)
    val df = rows.toDF("event_id", "day", "value")

    def fileRanges(out: String): Seq[(String, Double, Double)] =
      new java.io.File(out).listFiles().filter(_.isDirectory).toSeq.flatMap { dayDir =>
        dayDir.listFiles().filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val mm = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("value")), max(col("value"))).head()
          (dayDir.getName, mm.getDouble(0), mm.getDouble(1))
        }
      }
    def avgSpan(rs: Seq[(String, Double, Double)]): Double =
      rs.map(r => r._3 - r._2).sum / rs.length

    val clustered = Files.createTempDirectory("graft_clustered").toString + "/out"
    Compaction.clusteredWrite(df, "day", "value", clustered, numFiles = 12)
    val naive = Files.createTempDirectory("graft_naive").toString + "/out"
    df.repartition(12).write.partitionBy("day").parquet(naive)

    val cr = fileRanges(clustered)
    val nr = fileRanges(naive)
    assert(cr.groupBy(_._1).values.forall(_.size > 1), "need several files per day to cluster")
    // clustered files cover a small slice of the value domain; naive files
    // cover nearly all of it — the property that lets stats skip row groups
    assert(avgSpan(cr) < avgSpan(nr) / 2,
      s"clustered avg span ${avgSpan(cr)} not well below naive ${avgSpan(nr)}")
    // roundtrip intact
    assert(spark.read.parquet(clustered).count() === df.count())
  }

  test("zorderWrite narrows BOTH dimensions where single-column clustering leaves one wide") {
    import spark.implicits._
    // one partition, 2000 rows on a 50x50 grid with decorrelated dims
    val rows = (0 until 2000).map(i => (i.toLong, "2024-03-01", (i % 50).toDouble, ((i * 7) % 50).toLong))
    val df = rows.toDF("event_id", "day", "a", "b")

    def spanB(out: String): Double = {
      val fs = new java.io.File(s"$out/day=2024-03-01").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val spans = fs.toSeq.map { f =>
        val mm = spark.read.parquet(f.getAbsolutePath).agg(min(col("b")), max(col("b"))).head()
        (mm.getLong(1) - mm.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }

    val z = Files.createTempDirectory("graft_z").toString + "/out"
    Compaction.zorderWrite(df, "day", "a", "b", z, numFiles = 16)
    val single = Files.createTempDirectory("graft_single").toString + "/out"
    Compaction.clusteredWrite(df, "day", "a", single, numFiles = 16)

    // clustering by `a` alone leaves every file spanning (almost) all of b;
    // the Morton key bounds both dimensions
    assert(spanB(z) < spanB(single) / 2,
      s"z-order avg b-span ${spanB(z)} not well below single-dim ${spanB(single)}")
    assert(spark.read.parquet(z).count() === 2000L)
  }

  test("zorderKeyN interleaves three dimensions: every dim's span narrows vs 1-D clustering") {
    import spark.implicits._
    // 4096 rows on a decorrelated 16x16x16 grid
    val rows = (0 until 4096).map(i =>
      (i.toLong, "2024-03-01", (i % 16).toDouble, ((i / 16) % 16).toDouble, ((i / 256) % 16).toDouble))
    val df = rows.toDF("event_id", "day", "a", "b", "c")

    def avgSpan(out: String, dim: String): Double = {
      val fs = new java.io.File(s"$out/day=2024-03-01").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      val spans = fs.toSeq.map { f =>
        val mm = spark.read.parquet(f.getAbsolutePath).agg(min(col(dim)), max(col(dim))).head()
        mm.getDouble(1) - mm.getDouble(0)
      }
      spans.sum / spans.length
    }

    def write(key: org.apache.spark.sql.Column, out: String): Unit =
      df.withColumn("_zk", key)
        .repartitionByRange(16, col("day"), col("_zk"))
        .sortWithinPartitions(col("day"), col("_zk"))
        .drop("_zk")
        .write.mode("overwrite").partitionBy("day").parquet(out)

    val z3 = Files.createTempDirectory("graft_z3").toString + "/out"
    write(Compaction.zorderKeyN(df, Seq("a", "b", "c"), bits = 4), z3)
    val flat = Files.createTempDirectory("graft_z3_flat").toString + "/out"
    write(col("a"), flat) // 1-D clustering: b and c spans stay full-width

    for (dim <- Seq("b", "c"))
      assert(avgSpan(z3, dim) < avgSpan(flat, dim) / 2,
        s"3-D z-order $dim-span ${avgSpan(z3, dim)} not well below 1-D ${avgSpan(flat, dim)}")
    // the traded cost: `a` no longer perfectly contiguous, but still bounded
    assert(avgSpan(z3, "a") < 16.0 * 0.8, "a-span must not degrade to full width")
    assert(spark.read.parquet(z3).count() === 4096L)
  }
}
