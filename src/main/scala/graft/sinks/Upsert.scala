package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent last-write-wins semantics (SURVEY.md §2.2 K3).
  *
  * Elasticsearch's index-with-`_id` is last-write-wins per document
  * (`ID-based-transfer.py:202`). Emulated relationally: rank versions per id
  * descending, keep rank 1. The window shuffles by `idCol` only — at scale
  * this is one hash-partition exchange, no global sort.
  */
object Upsert {

  /** Keep the highest-`versionCol` row per `idCol` (ties broken stably by
    * the remaining columns never being compared — version must be a total
    * order per id for determinism; use an ingest timestamp or batch epoch).
    */
  def lastWriteWins(df: DataFrame, idCol: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-duplicate drop by a subset of columns, deterministic keeper:
    * lowest `idCol` wins (unlike `dropDuplicates`, whose survivor is
    * partition-order dependent).
    */
  def dedupKeepMin(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
