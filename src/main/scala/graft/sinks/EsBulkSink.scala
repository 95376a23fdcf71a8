package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Emulated Elasticsearch bulk sink (SURVEY.md §2.2 K2–K5).
  *
  * The harness has no network, so the "index" is modeled as a parquet
  * directory and the bulk protocol as NDJSON lines — which is exactly what
  * the reference builds by hand (`data-s3-elastic-transfer.py:192-196`).
  * In production this layer is the elasticsearch-spark connector
  * (`df.write.format("es")`, `es.mapping.id=id`); everything above it —
  * doc building, batching, idempotency — is engine code and identical.
  *
  * Two write disciplines, both present in the reference:
  *  - [[indexAppend]] (K2): auto-id append. Retries can duplicate — the
  *    reference acknowledges this by needing its second reconciliation
  *    script. Preserved deliberately (SURVEY.md §7.4 #4).
  *  - [[Upsert.lastWriteWins]]-based [[upsertById]] (K3): explicit `_id` ⇒
  *    idempotent, last write wins.
  */
object EsBulkSink {

  /** K4 parity: the reference tunes the index for bulk load — replicas 0,
    * refresh 30 s (`data-s3-elastic-transfer.py:23-43`) — and bounds batch
    * size/retries (`:19-21`). With the elasticsearch-spark connector these
    * are options on the write; the emulated sink has no server to tune, so
    * this map documents the production mapping and feeds the retry/batch
    * parameters used by [[withRetry]] and Batching.foreachBulk.
    */
  val bulkLoadSettings: Map[String, String] = Map(
    "es.index.number_of_replicas" -> "0",   // replicas=0 during load
    "es.index.refresh_interval" -> "30s",   // refresh_interval=30s
    "es.batch.size.entries" -> "50000",     // BATCH_SIZE
    "es.batch.write.retry.count" -> "3",    // MAX_RETRIES
    "es.batch.write.retry.wait" -> "20s",   // linear backoff base
    "es.http.timeout" -> "120s"             // bulk request timeout
  )

  /** F3: row → JSON document, one string column `doc`, plus the bulk action
    * metadata line. `to_json(struct(...))` is codegen'd — no per-row
    * Python/UDF crossing (replaces `data-s3-elastic-transfer.py:154-186`).
    */
  def toNdjson(df: DataFrame, index: String, idCol: Option[String]): DataFrame = {
    val action = idCol match {
      case Some(id) =>
        concat(lit(s"""{"index":{"_index":"$index","_id":""""), col(id).cast("string"), lit("\"}}"))
      case None => lit(s"""{"index":{"_index":"$index"}}""")
    }
    val doc = to_json(struct(df.columns.map(col).toIndexedSeq: _*))
    df.select(concat(action, lit("\n"), doc).as("bulk_line"))
  }

  /** K2: append to the emulated index (auto-id — duplicates possible on
    * retry, as in the reference). Distributed write; no driver funnel.
    */
  def indexAppend(df: DataFrame, indexDir: String): Unit =
    df.write.mode(SaveMode.Append).parquet(indexDir)

  /** K3: idempotent upsert by id into the emulated index: read current
    * state, last-write-wins merge, atomic replace. Write-twice ⇒ same state.
    */
  def upsertById(df: DataFrame, indexDir: String, idCol: String, versionCol: String): Unit = {
    val spark = df.sparkSession
    val exists = new java.io.File(indexDir).exists()
    val merged =
      if (exists) Upsert.lastWriteWins(spark.read.parquet(indexDir).unionByName(df), idCol, versionCol)
      else Upsert.lastWriteWins(df, idCol, versionCol)
    // Stage then swap: parquet can't overwrite its own input in place.
    val tmp = indexDir + ".staging"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dir = new java.io.File(indexDir)
    if (exists) deleteRecursively(dir)
    if (!new java.io.File(tmp).renameTo(dir))
      throw new java.io.IOException(s"failed to commit $tmp -> $indexDir")
  }

  /** Outcome of a bulk delivery: batches/rows attempted, rows delivered,
    * rows failed after retries, and a bounded sample of error messages —
    * the reference's per-item error parsing and partial-success accounting
    * (`data-s3-elastic-transfer.py:210-241`).
    */
  final case class BulkReport(batches: Long, rows: Long, delivered: Long, failed: Long,
      errorSample: Seq[String])

  /** K2+K5+A6: deliver NDJSON batches via `post` with bounded retry, and
    * account partial failures across the cluster via accumulators (the only
    * executor→driver channel that doesn't funnel data). A batch that still
    * fails after retries is COUNTED and skipped, not rethrown — matching
    * the reference's continue-on-partial-failure behavior; callers restore
    * exactly-once via the idempotent upsert path.
    */
  def bulkIndexWithAccounting(
      df: DataFrame,
      batchSize: Int,
      maxRetries: Int = 3,
      backoffMs: Int = 0,
      errorSampleSize: Int = 5)(post: Seq[String] => Unit): BulkReport = {
    val sc = df.sparkSession.sparkContext
    val batches = sc.longAccumulator("bulk.batches")
    val rows = sc.longAccumulator("bulk.rows")
    val delivered = sc.longAccumulator("bulk.delivered")
    val failed = sc.longAccumulator("bulk.failed")
    val errors = sc.collectionAccumulator[String]("bulk.errors")
    val lines = toNdjsonLines(df)
    lines.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.grouped(batchSize).foreach { chunk =>
        val payload = chunk.map(_.getString(0))
        batches.add(1)
        rows.add(payload.size)
        try {
          withRetry(maxRetries, backoffMs)(() => post(payload))
          delivered.add(payload.size)
        } catch {
          case e: Throwable =>
            failed.add(payload.size)
            errors.add(e.getMessage)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    BulkReport(batches.value, rows.value, delivered.value, failed.value,
      errors.value.asScala.take(errorSampleSize).toSeq)
  }

  /** The single-column (`bulk_line`) frame [[bulkIndexWithAccounting]]
    * posts: doc JSON only — callers needing action metadata use
    * [[toNdjson]].
    */
  private def toNdjsonLines(df: DataFrame): DataFrame =
    if (df.columns.sameElements(Array("bulk_line"))) df
    else df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("bulk_line"))

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** K5: bounded retry with linear backoff (3 attempts, 20 s·attempt in the
    * reference — `data-s3-elastic-transfer.py:249-253`). Runs on the
    * executor inside `foreachPartition`; at-least-once, made effectively-
    * once by pairing with [[upsertById]].
    */
  def withRetry[T](maxRetries: Int = 3, backoffMs: Int = 20_000, sleep: Long => Unit = Thread.sleep)(
      attempt: () => T): T = {
    var i = 0
    var last: Throwable = null
    while (i < maxRetries) {
      try return attempt()
      catch {
        case e: Throwable =>
          last = e
          i += 1
          if (i < maxRetries) sleep((i.toLong) * backoffMs)
      }
    }
    throw last
  }
}
