package graft.sinks

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def events = Tables.withDay(Tables.loadEvents(spark, TestSpark.sfDir))

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
}
