package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension).
  *
  * Images/audio/video are carried as opaque `binary` columns with typed
  * metadata. The Spark-side plumbing — schema, partition-sized batching,
  * feature schema — is real and tested. CONTAINER decoding is real too:
  * [[decodeHeader]] parses PNG/GIF/BMP headers (dimensions, channels)
  * with pure-JVM byte arithmetic, oracled end-to-end by
  * x_multimodal_decode. Only the PIXEL decode / embedding forward pass
  * remains a clearly marked STUB (no image/audio codec libraries exist
  * in this container): it produces deterministic fake features from the
  * bytes, so tests are reproducible and the pipeline shape (batched
  * mapPartitions, fixed-width feature vectors) is exactly what a real
  * model would slot into.
  *
  * Scale design: decode runs per-partition with local batching (`grouped`),
  * so decoder state (a model, a codec context) is initialized once per
  * batch, not per row, and no shuffle is introduced — the feature extract
  * is a map over the scan.
  */
object Multimodal {

  /** A media row: opaque payload plus typed metadata. */
  final case class MediaRow(id: Long, media: Array[Byte], format: String)

  /** Extracted features: shape metadata + fixed-width feature vector. */
  final case class MediaFeatures(
      id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  val featureDim = 8

  /** Decoded container metadata: format, pixel dimensions, channel count,
    * payload size — what a real ingest pipeline indexes before any pixel
    * decode happens.
    */
  final case class MediaMeta(
      doc_id: Long, format: String, width: Int, height: Int, channels: Int, n_bytes: Long)

  /** REAL pure-JVM image-container header decoder (no native codecs
    * needed for metadata): PNG (8-byte signature + IHDR — width/height
    * big-endian at offsets 16/20, color type at 25 mapping to channel
    * count), GIF87a/89a (logical-screen width/height little-endian uint16
    * at 6/8; palette RGB → 3 channels), and BMP (BITMAPINFOHEADER —
    * width/height little-endian int32 at 18/22, height may be negative
    * for top-down rows, bit count at 28 → channels). Unrecognized bytes
    * return None and fall back to the documented stub path, so opaque
    * payloads still flow.
    */
  def decodeHeader(p: Array[Byte]): Option[(String, Int, Int, Int)] = {
    def u8(i: Int): Int = p(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (p.length >= 26 && u8(0) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') {
      val channels = u8(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => 0
      }
      Some(("png", be32(16), be32(20), channels))
    } else if (p.length >= 13 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') {
      Some(("gif", le16(6), le16(8), 3))
    } else if (p.length >= 30 && p(0) == 'B' && p(1) == 'M') {
      Some(("bmp", le32(18), math.abs(le32(22)), u8(28) / 8))
    } else if (p.length >= 36 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F'
        && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') {
      // WAV (RIFF/WAVE fmt chunk): audio reuses the image meta slots —
      // width = sample rate (LE32 @24), height = bits/sample (LE16 @34),
      // channels = channel count (LE16 @22)
      Some(("wav", le32(24), le16(34), le16(22)))
    } else None
  }

  /** Batched header decode over a media Dataset — the same per-partition
    * `grouped` batch shape as [[extractFeatures]], producing the indexable
    * metadata row per payload (format "unknown", zeros for unrecognized
    * bytes). No shuffle: a map over the scan at any corpus size.
    */
  def decodeMeta(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val (fmt, w, h, ch) = decodeHeader(r.media).getOrElse(("unknown", 0, 0, 0))
          MediaMeta(r.id, fmt, w, h, ch, r.media.length.toLong)
        }
      }
    }
  }

  /** STUB decoder — stands in for an image/audio codec. Deterministic in
    * the payload bytes. A real implementation replaces ONLY this function.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val width = 64 + math.abs(h % 1024)        // fake width
    val height = 64 + math.abs((h >> 10) % 1024) // fake height
    val frames = 1 + payload.length / 100       // fake frame count
    (width, height, frames)
  }

  /** STUB feature extractor — stands in for an embedding model forward
    * pass. Deterministic in the payload.
    */
  def featuresStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    var i = 0
    while (i < payload.length) {
      out(i % featureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Wrap a string column as a binary media payload (testdata has no real
    * media; `documents.text` bytes play the payload role).
    */
  def asMedia(docs: DataFrame, idCol: String, payloadCol: String, format: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col(idCol).cast("long").as("id"),
        col(payloadCol).cast("binary").as("media"),
        lit(format).as("format"))
      .as[MediaRow]
  }

  /** Batched decode + feature extraction: mapPartitions with local
    * `grouped(batchSize)` — the batch shape a vectorized decoder (or a
    * Pandas-UDF-style columnar kernel) needs, with no shuffle.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real decoder would process `batch` as one vectorized call;
        // recognized image containers take the REAL header decode
        // (decodeHeader), opaque payloads the deterministic stub
        batch.iterator.map { r =>
          val (w, h, f) = decodeHeader(r.media)
            .map { case (_, dw, dh, _) => (dw, dh, 1) }
            .getOrElse(decodeStub(r.media))
          MediaFeatures(r.id, r.media.length.toLong, w, h, f, featuresStub(r.media))
        }
      }
    }
  }

  /** Resize plan: pure column math fitting (width, height) into a bounding
    * box preserving aspect ratio — the metadata half of an image resize;
    * the pixel half belongs to the (stubbed) decoder. Adds out_w, out_h,
    * scale (rounded 4).
    */
  def resizePlan(features: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width").cast("double"),
      lit(maxH.toDouble) / col("height").cast("double"),
      lit(1.0))
    features
      .withColumn("scale", round(scale, 4))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
  }

  /** Deterministic frame sampling plan for video payloads: every
    * `stride`-th frame index, as rows. Pure column math (no decode) — the
    * decode of chosen frames happens in [[extractFeatures]].
    */
  def sampleFrames(media: DataFrame, idCol: String, nFramesCol: String, stride: Int): DataFrame =
    media.select(
      col(idCol),
      explode(sequence(lit(0), greatest(col(nFramesCol) - 1, lit(0)), lit(stride))).as("frame_idx"))
}
