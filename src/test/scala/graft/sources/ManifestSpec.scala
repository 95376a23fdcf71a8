package graft.sources

import graft.TestSpark
import graft.sinks.Compaction
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def events = Tables.withDay(Tables.loadEvents(spark, TestSpark.sfDir))
    .select(col("event_id"), col("day"), col("value"))

  test("manifest pruning: skips files on a clustered layout, result matches full read") {
    val out = Files.createTempDirectory("graft_manifest").toString + "/out"
    Compaction.clusteredWrite(events, "day", "value", out, numFiles = 96)

    val mf = Manifest.build(spark, out, Seq("value"))
    val totalFiles = mf.count()
    assert(totalFiles > 10, "layout must actually split into many files")

    // manifest row count totals the data
    assert(mf.agg(sum("row_count")).head().getLong(0) === events.count())

    // a narrow range keeps a minority of files on a value-clustered layout
    val kept = Manifest.filesInRange(mf, "value", 40.0, 60.0)
    assert(kept.nonEmpty)
    assert(kept.length * 2 < totalFiles,
      s"pruning kept ${kept.length}/$totalFiles files — clustering not actionable")

    // pruned read + residual predicate == full read + same predicate
    val residual = col("value") >= 40.0 && col("value") < 60.0
    val pruned = Manifest.prunedRead(spark, out, mf, "value", 40.0, 60.0)
      .filter(residual).select("event_id").collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(out)
      .filter(residual).select("event_id").collect().map(_.getLong(0)).toSet
    assert(pruned === full)
  }

  test("join pruning: dim key domain skips fact files, join result unchanged") {
    val out = Files.createTempDirectory("graft_manifest_join").toString + "/out"
    // fact clustered by the join key
    val fact = Tables.loadEvents(spark, TestSpark.sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    Compaction.clusteredWrite(
      fact.withColumn("bucket", lit("all")), "bucket", "user_id", out, numFiles = 32)
    val mf = Manifest.build(spark, out, Seq("user_id"))

    // a dim covering a narrow slice of the user domain
    val users = fact.select(col("user_id")).distinct()
    val cut = users.agg(expr("percentile(user_id, 0.1)")).head().getDouble(0)
    val dim = users.filter(col("user_id") <= cut)

    val keptFiles = {
      val r = dim.agg(min(col("user_id")), max(col("user_id"))).head()
      Manifest.filesInRange(mf, "user_id", r.getLong(0).toDouble, r.getLong(1).toDouble)
    }
    assert(keptFiles.length * 2 < mf.count(),
      s"join pruning kept ${keptFiles.length}/${mf.count()} files")

    val pruned = Manifest.prunedForJoin(spark, out, mf, "user_id", dim, "user_id")
      .join(dim, "user_id").select("event_id").collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(out)
      .join(dim, "user_id").select("event_id").collect().map(_.getLong(0)).toSet
    assert(pruned === full)
    assert(pruned.nonEmpty)

    // an empty dim prunes to an empty scan without erroring
    val emptyDim = users.filter(lit(false))
    assert(Manifest.prunedForJoin(spark, out, mf, "user_id", emptyDim, "user_id").count() === 0L)
  }

  test("appendBatch: write-time stats accumulate per batch, replay converges, pruning works") {
    val dir = Files.createTempDirectory("graft_manifest_batch").toString + "/layout"
    val ev = Tables.withDay(Tables.loadEvents(spark, TestSpark.sfDir))
      .select(col("event_id"), col("day"), col("value"))
    val b0 = ev.filter(col("event_id") % 2 === 0)
    val b1 = ev.filter(col("event_id") % 2 === 1)
    Manifest.appendBatch(b0, 0L, dir, Seq("value"))
    Manifest.appendBatch(b1, 1L, dir, Seq("value"))

    // the layout reads as ONE table (batch is a partition col, _manifest hidden)
    assert(spark.read.parquet(dir).count() === ev.count())
    val mf = spark.read.parquet(s"$dir/_manifest")
    assert(mf.agg(sum("row_count")).head().getLong(0) === ev.count())
    assert(mf.select("batch").distinct().count() === 2L)

    // replaying a batch (checkpoint recovery) overwrites, never duplicates
    Manifest.appendBatch(b0, 0L, dir, Seq("value"))
    assert(spark.read.parquet(dir).count() === ev.count())
    assert(spark.read.parquet(s"$dir/_manifest").agg(sum("row_count")).head().getLong(0) === ev.count())

    // pruned read over the incrementally-built manifest matches the full
    // scan (fresh read: the pre-replay `mf` plan's file listing is stale
    // after the overwrite)
    val mf2 = spark.read.parquet(s"$dir/_manifest")
    val residual = col("value") >= 40.0 && col("value") < 60.0
    val pruned = Manifest.prunedRead(spark, dir, mf2, "value", 40.0, 60.0)
      .filter(residual).select("event_id").collect().map(_.getLong(0)).toSet
    val full = spark.read.parquet(dir)
      .filter(residual).select("event_id").collect().map(_.getLong(0)).toSet
    assert(pruned === full && pruned.nonEmpty)
  }

  test("manifest pruning keeps everything on an unclustered layout, nothing out of range") {
    val out = Files.createTempDirectory("graft_manifest_flat").toString + "/out"
    // hash-shuffled layout, files big enough that each one virtually
    // certainly spans the predicate range: pruning has nothing to skip
    events.repartition(16, col("event_id"))
      .write.mode("overwrite").parquet(out)
    val mf = Manifest.build(spark, out, Seq("value"))
    val total = mf.count()
    val kept = Manifest.filesInRange(mf, "value", 40.0, 60.0)
    assert(kept.length * 2 > total,
      "unclustered files span the domain — pruning can't skip a majority")

    // empty interval beyond the domain prunes to an empty (but readable) scan
    val none = Manifest.prunedRead(spark, out, mf, "value", 1e9, 2e9)
    assert(none.count() === 0L)
    assert(none.columns.contains("event_id"))
  }

  test("file-list collect is bounded by contract: over-ceiling prune fails fast, never OOMs") {
    val out = Files.createTempDirectory("graft_manifest_gate").toString + "/out"
    events.repartition(16, col("event_id")).write.mode("overwrite").parquet(out)
    val mf = Manifest.build(spark, out, Seq("value"))
    // under the cap: same answer as the default path
    val all = Manifest.filesInRange(mf, "value", Double.MinValue, Double.MaxValue)
    assert(Manifest.filesInRange(mf, "value", Double.MinValue, Double.MaxValue, 16).toSet
      === all.toSet)
    // over the cap: IllegalStateException with guidance, after shipping
    // at most cap+1 rows to the driver (the limit is in the plan)
    val e = intercept[IllegalStateException] {
      Manifest.filesInRange(mf, "value", Double.MinValue, Double.MaxValue, 3)
    }
    assert(e.getMessage.contains("prune by partition directory"))
    assert(Manifest.MaxPrunedFiles === 4000000)
  }
}
