package graft.ext

import graft.TestSpark
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = Tables.load(spark, TestSpark.sfDir, "documents")

  test("packSequences: spans tile the token stream exactly, in id order") {
    val packed = Packing
      .packSequences(docs, "doc_id", TextFunctions.tokenCount(col("text")), budget = 100)
      .collect()
      .sortBy(r => (r.getLong(0), r.getLong(3)))

    // every document's per-pack contributions sum to its token count
    packed.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(4)).sum === rows.head.getLong(1))
    }
    // consecutive documents have contiguous spans: start = prev start + prev n
    val docRows = packed.groupBy(_.getLong(0)).toSeq
      .map { case (id, rows) => (id, rows.head.getLong(2), rows.head.getLong(1)) }
      .sortBy(_._1)
    docRows.sliding(2).foreach {
      case Seq((_, s0, n0), (_, s1, _)) => assert(s1 === s0 + n0)
      case _ =>
    }
    // first span starts at zero
    assert(docRows.head._2 === 0L)
  }

  test("packSequences: every pack but the last holds exactly `budget` tokens") {
    val budget = 73
    val stats = Packing.packStats(
      Packing.packSequences(docs, "doc_id", TextFunctions.tokenCount(col("text")), budget))
      .collect()
    val lastPack = stats.map(_.getLong(0)).max
    stats.filter(_.getLong(0) < lastPack).foreach { r =>
      assert(r.getLong(2) === budget.toLong, s"pack ${r.getLong(0)} not full")
    }
    assert(stats.map(_.getLong(0)).toSeq === (0L to lastPack)) // no gaps
  }

  test("packSequences matches the single-task window form (executable spec)") {
    val budget = 50
    val slice = docs.filter(col("doc_id") < 60)
    val got = Packing
      .packSequences(slice, "doc_id", TextFunctions.tokenCount(col("text")), budget)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet

    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("doc_id")
    val ref = slice
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("s", sum(col("n")).over(w) - col("n"))
      .withColumn("p", explode(sequence(
        expr(s"s DIV $budget"), expr(s"(s + n - 1) DIV $budget"))))
      .select(col("doc_id"), col("p"),
        least(col("s") + col("n"), (col("p") + 1) * budget) -
          greatest(col("s"), col("p") * budget))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === ref)
  }

  test("packSequences drops zero-token docs and rejects non-positive budgets") {
    import spark.implicits._
    val tiny = Seq((1L, 3L), (2L, 0L), (3L, 4L)).toDF("id", "ntok")
    val got = Packing.packSequences(tiny, "id", col("ntok"), budget = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSet
    // doc1 [0,3) -> pack 0 (3 toks); doc3 [3,7) -> pack 0 (2) + pack 1 (2)
    assert(got === Set((1L, 0L, 3L), (3L, 0L, 2L), (3L, 1L, 2L)))
    intercept[IllegalArgumentException] {
      Packing.packSequences(tiny, "id", col("ntok"), budget = 0)
    }
  }

  test("lengthBucketStats: buckets partition the corpus, bucketed waste below corpus waste") {
    import spark.implicits._
    val df = Seq(5L, 10L, 31L, 32L, 40L, 47L, 48L, 90L, 200L).toDF("n")
    val got = Packing.lengthBucketStats(df, col("n"), Seq(32, 48, 64, 80))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // boundary values land in the half-open upper bucket
    assert(got("b00_lt032") === ((3L, 46L, 31L, 47L)))   // 5,10,31: 3*31-46
    assert(got("b01_032_048") === ((3L, 119L, 47L, 22L)))// 32,40,47
    assert(got("b02_048_064") === ((1L, 48L, 48L, 0L)))  // 48
    assert(!got.contains("b03_064_080"))                 // empty bucket absent
    assert(got("b04_ge080") === ((2L, 290L, 200L, 110L)))// 90,200
    val all = got("zz_all")
    assert(all._1 === 9L && all._3 === 200L)
    // the operator's reason to exist: per-bucket padding strictly cheaper
    val buckets = got - "zz_all"
    assert(buckets.values.map(_._4).sum < all._4)
    // counts partition the corpus
    assert(buckets.values.map(_._1).sum === all._1)
    intercept[IllegalArgumentException] {
      Packing.lengthBucketStats(df, col("n"), Seq(48, 32))
    }
  }
}
