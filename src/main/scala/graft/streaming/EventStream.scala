package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming form of the reference's incremental semantics
  * (SURVEY.md §2.9 T1–T5).
  *
  * The reference polls for new partitions in batch
  * (`data-s3-elastic-transfer.py:281-291`). The streaming-native
  * equivalent is a file source + `Trigger.AvailableNow`: new files since
  * the last checkpoint ARE the "missing partitions", discovered and
  * processed exactly once per trigger, with progress durably recorded in
  * the checkpoint — replacing the hand-rolled "months already in ES → skip"
  * high-water-mark logic (T5) and making delivery effectively-once (T3)
  * when paired with the idempotent sink.
  */
object EventStream {

  /** Schema of the driver testdata `events` table (streams can't infer).
    * `ts` is parquet TIMESTAMP(NANOS) → read as nanos-long (see
    * Tables.loadEvents), converted to TimestampType in [[readEvents]].
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** File-source stream over a directory of events parquet. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** T4: event-time tumbling daily counts with a watermark — the streaming
    * form of the reference's month bucketing. Late data beyond 1 day is
    * dropped deterministically instead of silently re-writing partitions.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("cnt"), col("total_value"))

  /** Run a (bounded) streaming query to a named in-memory table and block
    * until the file source is drained — the test/smoke harness.
    */
  def runToMemory(df: DataFrame, name: String, checkpointDir: String): StreamingQuery = {
    val q = df.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** T3/T5 as a stream: incremental append of new files into the emulated
    * index directory with exactly-once file-source progress via checkpoint.
    */
  def syncToIndex(events: DataFrame, indexDir: String, checkpointDir: String): StreamingQuery = {
    val q = events.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", indexDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
