package graft.ext

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("asMedia + extractFeatures: schema, determinism, and byte accounting") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents").limit(50)
    val media = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    val feats = Multimodal.extractFeatures(media, batchSize = 16)

    assert(feats.columns.toSeq ===
      Seq("id", "n_bytes", "width", "height", "n_frames", "features"))
    val rows = feats.collect()
    assert(rows.length === 50)
    assert(rows.forall(_.features.length === Multimodal.featureDim))
    assert(rows.forall(r => r.n_frames === 1 + r.n_bytes / 100))

    // deterministic: a second run produces identical features
    val again = Multimodal.extractFeatures(media, batchSize = 7).collect()
    val a = rows.sortBy(_.id).map(_.features.toSeq)
    val b = again.sortBy(_.id).map(_.features.toSeq)
    assert(a.toSeq === b.toSeq) // batch size must not affect results
  }

  test("resizePlan fits into the bounding box preserving aspect ratio, never upscales") {
    import spark.implicits._
    val df = Seq((1L, 1000, 500), (2L, 100, 100), (3L, 200, 800)).toDF("id", "width", "height")
    val out = Multimodal.resizePlan(df, maxW = 400, maxH = 400)
      .select("id", "out_w", "out_h").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(out(0) === ((1L, 400, 200))) // landscape capped by width
    assert(out(1) === ((2L, 100, 100))) // already fits: no upscale
    assert(out(2) === ((3L, 100, 400))) // portrait capped by height
  }

  test("sampleFrames emits every stride-th frame index") {
    import spark.implicits._
    val df = Seq((1L, 10), (2L, 1)).toDF("id", "n_frames")
    val frames = Multimodal.sampleFrames(df, "id", "n_frames", stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.toSet === Set((1L, 0), (1L, 4), (1L, 8), (2L, 0)))
  }
}
