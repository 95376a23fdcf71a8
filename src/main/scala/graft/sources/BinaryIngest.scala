package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque-media ingest via Spark's `binaryFile` source — the on-ramp for
  * the multimodal family ([[graft.ext.Multimodal]]): real image/audio
  * corpora arrive as FILES, one payload per object, and the binaryFile
  * reader turns a directory of them into (path, length, content) rows
  * with the bytes left opaque, exactly the shape `Multimodal.asMedia`
  * consumes. The reference ingests documents wholesale from object
  * storage the same way (data-s3-elastic-transfer.py:258-300 reads whole
  * objects, never parsing payloads).
  *
  * Scale notes: binaryFile parallelizes per FILE (no intra-file splits),
  * so partition count follows the object count — right for media corpora
  * (many objects), wrong for a few giant archives (those want a manifest
  * + range reads instead). `pathGlobFilter` prunes at LISTING time; the
  * id lives in the file name, so extracting it costs no payload decode.
  */
object BinaryIngest {

  /** Fixture writer: materialize (id, text) rows as one `doc_<id>.bin`
    * file each under `dir`, UTF-8 bytes. Runs on the EXECUTORS
    * (foreachPartition) — in local mode they share the local FS; on a
    * cluster `dir` must be shared storage, which is also where a real
    * media corpus would already live (this writer only exists because the
    * container has no media files to ingest).
    */
  def writeFixture(docs: DataFrame, idCol: String, textCol: String, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    docs.select(col(idCol).cast("long"), col(textCol)).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach { r =>
          Files.write(
            Paths.get(dir, s"doc_${r.getLong(0)}.bin"),
            r.getString(1).getBytes(StandardCharsets.UTF_8))
        }
    }
  }

  /** Read a directory of `doc_<id>.bin` payloads: id from the file name,
    * size from the file status (no content read needed for it), digest
    * from the bytes. Columns: doc_id, byte_len, digest.
    *
    * ZERO-BYTE files produce no scan splits and silently disappear from
    * the result (pinned in BinaryIngestSpec) — an ingest that must notice
    * truncated/empty objects needs a listing-level reconcile (the
    * [[graft.sync.IncrementalSync]] counts pattern), not this scan.
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        col("length").as("byte_len"),
        md5(col("content")).as("digest"))
}
