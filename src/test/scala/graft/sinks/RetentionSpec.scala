package graft.sinks

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class RetentionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDataset(): String = {
    val dir = Files.createTempDirectory("graft_retention").toString + "/data"
    Seq(
      (1L, "Jan", "a"), (2L, "Jan", "b"), (3L, "Feb", "c"),
      (4L, "Feb", "d"), (5L, "Mar", "e"), (6L, "Mar", "f")
    ).toDF("id", "month", "payload")
      .write.partitionBy("month").parquet(dir)
    dir
  }

  private def files(dir: String, part: String): Map[String, Long] = {
    val d = new java.io.File(s"$dir/month=$part")
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
  }

  test("deleteByIds rewrites only affected partitions; untouched files keep their mtime") {
    val dir = freshDataset()
    val janBefore = files(dir, "Jan")
    val febBefore = files(dir, "Feb")
    assert(janBefore.nonEmpty && febBefore.nonEmpty)

    val (affected, deleted) = Retention.deleteByIds(
      spark, dir, "month", "id", Seq(3L).toDF("id"))
    assert(affected === Seq("Feb") && deleted === 1L)

    // Feb rewritten, Jan byte-untouched (same file names and mtimes)
    assert(files(dir, "Jan") === janBefore)
    assert(files(dir, "Feb") !== febBefore)
    val back = spark.read.parquet(dir).select("id").as[Long].collect().sorted
    assert(back === Array(1L, 2L, 4L, 5L, 6L))
  }

  test("a fully-emptied partition's directory is removed") {
    val dir = freshDataset()
    val (affected, deleted) = Retention.deleteByIds(
      spark, dir, "month", "id", Seq(5L, 6L).toDF("id"))
    assert(affected === Seq("Mar") && deleted === 2L)
    assert(!new java.io.File(s"$dir/month=Mar").exists())
    assert(spark.read.parquet(dir).count() === 4L)
  }

  test("deleting unknown ids is a no-op") {
    val dir = freshDataset()
    val before = files(dir, "Jan") ++ files(dir, "Feb") ++ files(dir, "Mar")
    val (affected, deleted) = Retention.deleteByIds(
      spark, dir, "month", "id", Seq(99L).toDF("id"))
    assert(affected.isEmpty && deleted === 0L)
    assert((files(dir, "Jan") ++ files(dir, "Feb") ++ files(dir, "Mar")) === before)
  }
}
