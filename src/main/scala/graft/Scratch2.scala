package graft

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-wise profile of simhashPairs. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $tag%-20s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("tokens-explode")(
      graft.sources.Tables.spread(docs)
        .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
        .count())
    time("signatures")(Dedup.simhashSignatures(docs, "doc_id", "text").count())
    time("pairs-full")(Dedup.simhashPairs(docs, "doc_id", "text", 3).count())
  }
}
