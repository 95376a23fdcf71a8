package graft.sources

import graft.TestSpark
import graft.streaming.EventStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.time.{Instant, LocalDateTime, ZoneOffset}

/** Pins `ts` normalization across every parquet encoding the driver corpus
  * has shipped. The round-6 regression: a corpus regeneration flipped
  * `events.ts` from TIMESTAMP(NANOS) (read as nanos-long under
  * `nanosAsLong`) to TIMESTAMP_MICROS with isAdjustedToUTC=false (read as
  * TIMESTAMP_NTZ), and every consumer that assumed the old encoding either
  * threw at analysis (`unix_millis` over NTZ) or silently collapsed event
  * time 1000× (long schema over micros data). This spec writes the SAME
  * logical rows in all three encodings — nanos-long, TIMESTAMP_MICROS
  * (UTC-adjusted), TIMESTAMP_NTZ — and asserts batch (`Tables.loadEvents`)
  * and streaming (`EventStream.readEvents`) normalize every one of them to
  * identical TimestampType instants, so the next corpus re-encode is a
  * no-op instead of a silent outage.
  */
class TsEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val instants: Seq[Instant] = Seq(
    Instant.parse("2024-01-05T00:00:00Z"),
    Instant.parse("2024-01-05T12:34:56.789Z"),
    Instant.parse("2024-02-29T23:59:59.999Z"))

  private def schemaWith(ts: DataType) = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", ts),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Write the fixture rows with `ts` rendered by `mk` under `tsType`;
    * returns the sfDir-shaped parent (events live at `<dir>/events.parquet`).
    */
  private def write(tsType: DataType, mk: Instant => Any): String = {
    val dir = Files.createTempDirectory("graft_ts_enc").toString
    val rows = instants.zipWithIndex.map { case (i, n) =>
      Row(n.toLong, mk(i), n.toLong, "click", 1.0, "{}")
    }
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    try {
      // pin the zoned-timestamp physical encoding to MICROS(UTC-adjusted)
      // (INT96 would also read back as TimestampType, but the corpus drift
      // we're pinning is about the annotated int64 forms)
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schemaWith(tsType))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    } finally prev.fold(spark.conf.unset("spark.sql.parquet.outputTimestampType"))(
      spark.conf.set("spark.sql.parquet.outputTimestampType", _))
    dir
  }

  // nanos-long: what TIMESTAMP(NANOS) data looks like to Spark under
  // spark.sql.legacy.parquet.nanosAsLong=true (the read schema is LongType
  // either way, which is the branch point Tables.normalizeTs keys off)
  private lazy val nanosDir = write(LongType,
    i => i.getEpochSecond * 1000000000L + i.getNano)
  // TIMESTAMP_MICROS, isAdjustedToUTC=true: reads straight to TimestampType
  private lazy val microsDir = write(TimestampType, java.sql.Timestamp.from)
  // TIMESTAMP_MICROS, isAdjustedToUTC=false → TIMESTAMP_NTZ (the current
  // corpus encoding); wall-clock == UTC instant since sessions pin UTC
  private lazy val ntzDir = write(TimestampNTZType,
    i => LocalDateTime.ofInstant(i, ZoneOffset.UTC))

  private def batchInstants(sfDir: String): Seq[Instant] = {
    val df = Tables.loadEvents(spark, sfDir)
    assert(df.schema("ts").dataType === TimestampType)
    df.orderBy("event_id").collect().map(_.getTimestamp(1).toInstant).toSeq
  }

  test("batch loadEvents normalizes all three ts encodings to identical TimestampType rows") {
    assert(batchInstants(nanosDir) === instants)
    assert(batchInstants(microsDir) === instants)
    assert(batchInstants(ntzDir) === instants)
  }

  private def streamInstants(sfDir: String, name: String): Seq[Instant] = {
    val ckpt = Files.createTempDirectory("graft_ts_enc_ckpt").toString
    val df = EventStream.readEvents(spark, s"$sfDir/events.parquet")
    assert(df.schema("ts").dataType === TimestampType)
    EventStream.runToMemory(df, name, ckpt, outputMode = "append")
    spark.table(name).orderBy("event_id").collect()
      .map(_.getTimestamp(1).toInstant).toSeq
  }

  test("streaming readEvents normalizes all three ts encodings to identical TimestampType rows") {
    assert(streamInstants(nanosDir, "enc_nanos") === instants)
    assert(streamInstants(microsDir, "enc_micros") === instants)
    assert(streamInstants(ntzDir, "enc_ntz") === instants)
  }
}
