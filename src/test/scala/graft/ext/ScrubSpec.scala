package graft.ext

import graft.TestSpark
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScrubSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("redactPii counts and masks emails, IPs and phones in one pass") {
    val df = Seq(
      (1L, "write to alice.smith+x@mail.example.org or bob@corp.io today"),
      (2L, "host 192.168.0.1 and 10.0.3.44 are up"),
      (3L, "call 555-123-4567 maybe"),
      (4L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = Scrub.redactPii(df, "text").orderBy("doc_id")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "text")
      .as[(Long, Int, Int, Int, String)].collect()
    assert(out(0) === ((1L, 2, 0, 0, "write to <EMAIL> or <EMAIL> today")))
    assert(out(1) === ((2L, 0, 2, 0, "host <IP> and <IP> are up")))
    assert(out(2) === ((3L, 0, 0, 1, "call <PHONE> maybe")))
    assert(out(3) === ((4L, 0, 0, 0, "nothing sensitive here")))
  }

  test("segments chunks tokens non-overlapping with a truncated tail") {
    val segs = Seq("a b c d e f g h i j")
      .toDF("text").select(Scrub.segments($"text", 4)).head().getSeq[String](0)
    assert(segs === Seq("a b c d", "e f g h", "i j"))
  }

  test("removeBoilerplate drops exactly the segments shared by >= minDf docs") {
    // 'x x x x' appears in 3 docs (hot at minDf=3); 'y y y y' in only 2
    val df = Seq(
      (1L, "x x x x a b c d"),
      (2L, "x x x x e f g h"),
      (3L, "x x x x y y y y"),
      (4L, "y y y y i j k l"),
      (5L, "m n o p q r s t")
    ).toDF("doc_id", "text")
    val out = Scrub.removeBoilerplate(df, "doc_id", "text", m = 4, minDf = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_removed", "text")
      .as[(Long, Int, Int, String)].collect()
    assert(out(0) === ((1L, 2, 1, "a b c d")))
    assert(out(1) === ((2L, 2, 1, "e f g h")))
    assert(out(2) === ((3L, 2, 1, "y y y y"))) // y-segment survives (df=2)
    assert(out(3) === ((4L, 2, 0, "y y y y i j k l")))
    assert(out(4) === ((5L, 2, 0, "m n o p q r s t")))
  }

  test("removeBoilerplate counts repeated hot SLOTS within one document") {
    val df = Seq(
      (1L, "x x x x x x x x"), // the hot segment twice in one doc
      (2L, "x x x x a b c d"),
      (3L, "x x x x e f g h")
    ).toDF("doc_id", "text")
    val out = Scrub.removeBoilerplate(df, "doc_id", "text", m = 4, minDf = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_removed", "text")
      .as[(Long, Int, String)].collect()
    assert(out(0) === ((1L, 2, ""))) // both slots removed, empty doc remains
    assert(out(1) === ((2L, 1, "a b c d")))
  }

  test("winnowing guarantees a shared fingerprint for a shared long run") {
    // Schleimer et al. guarantee: any common run of w+k-1 = 6 tokens
    // yields at least one common fingerprint.
    val df = Seq(
      (1L, "p q r s t u v one two three four five six alpha beta"),
      (2L, "x y z one two three four five six gamma delta epsilon")
    ).toDF("doc_id", "text")
    val fps = df.select($"doc_id", TextFunctions.winnowFingerprints($"text", 3, 4).as("f"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "docs sharing a 6-token run must share a fingerprint")
    // fingerprints are a subset of the full k-gram hash set, deduped + sorted
    assert(fps(1L) === fps(1L).distinct.sorted)
  }

  test("charEntropy: 0 for a single repeated char, ln(k) for uniform chars") {
    val out = Seq(
      (1L, "aaaa aaaa"),   // one symbol -> H = 0
      (2L, "ab ab ab ab"), // two symbols, equal counts -> H = ln 2
      (3L, "abcd")         // four symbols uniform -> H = ln 4
    ).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.charEntropy($"text"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) === 0.0)
    assert(math.abs(out(2L) - math.log(2)) < 5e-5)
    assert(math.abs(out(3L) - math.log(4)) < 5e-5)
  }

  test("sqrtTemperatureReport keeps the smallest source whole and downsamples big ones") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .withColumn("domain",
        when(col("doc_id") % 7 === 0, lit("rare"))
          .when(col("doc_id") % 7 <= 2, lit("mid"))
          .otherwise(lit("common")))
    val rep = Mixture.sqrtTemperatureReport(docs, "domain", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(rep("rare")._2 === 1.0) // smallest source: rate 1, kept whole
    assert(rep("rare")._1 === rep("rare")._3)
    // bigger sources get sqrt-shrunk rates, realized within hash noise
    for (d <- Seq("mid", "common")) {
      val (n, rate, kept) = rep(d)
      assert(rate < 1.0)
      assert(math.abs(kept.toDouble / n - rate) < 0.15, s"$d kept $kept/$n vs rate $rate")
    }
  }
}
