package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Positive-case coverage for x_mojibake: the driver corpus is entirely
  * ASCII, so its battery legitimately reports zeros — this spec stages
  * crafted damaged documents and pins that each damage axis actually
  * fires (and doesn't cross-fire).
  */
class MojibakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("each damage axis fires on crafted text and stays zero elsewhere") {
    val dir = Files.createTempDirectory("graft_moji").toString
    val docs = Seq(
      (1L, "plain ascii text"),                 // all zeros
      (2L, "café touché"),            // nonascii only
      (3L, "bad � byte"),                  // replacement char
      (4L, "ct\u0001l\u007fand"),        // C0 + DEL controls
      (5L, "FranÃ§ais encodÃ©") // UTF-8-as-Latin-1 mojibake
    )
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map(d => Row(d._1, d._2)), 1), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x_mojibake")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    // (n_nonascii, n_repl, n_ctrl, n_moji)
    assert(rows(1L) === ((0, 0, 0, 0)))
    assert(rows(2L)._1 === 2 && rows(2L)._2 === 0 && rows(2L)._3 === 0 && rows(2L)._4 === 0)
    assert(rows(3L)._2 === 1)
    assert(rows(4L)._3 === 2)
    assert(rows(5L)._4 === 2, "Ã§ and Ã© must both register as mojibake bigrams")
    assert(rows(3L)._4 === 0 && rows(4L)._4 === 0)
  }
}
