package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DenoiseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corrupt(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id") +: Denoise.spanCorrupt(col("doc_id"), split(col("text"), " ")): _*)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3), r.getString(4)))).toMap

  test("sentinels substitute for targets: splicing them back rebuilds the original") {
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val out = corrupt(Seq((7L, text)))
    val (n, k, corrupted, targets) = out(7L)
    assert(n === 100 && k === 5) // floor(100*0.15/3)
    // parse targets into sentinel -> span text
    val spanOf = "<extra_id_(\\d+)> ((?:\\S+ ?){3})".r.findAllMatchIn(targets)
      .map(m => s"<extra_id_${m.group(1)}>" -> m.group(2).trim).toMap
    assert(spanOf.size === k)
    val rebuilt = corrupted.split(" ").map(t => spanOf.getOrElse(t, t)).mkString(" ")
    assert(rebuilt === text)
    // masked fraction == k*3 tokens exactly
    assert(corrupted.split(" ").count(_.startsWith("<extra_id_")) === k)
    assert(corrupted.split(" ").length === 100 - k * 3 + k)
  }

  test("short docs (k = 0) pass through unmasked with empty targets") {
    val out = corrupt(Seq((1L, "a b c d e"))) // 5 tokens -> k = 0
    assert(out(1L) === ((5, 0, "a b c d e", "")))
  }

  test("corruption is a function of (doc_id, text) alone — stable across runs") {
    val text = (1 to 60).map(i => s"t$i").mkString(" ")
    val a = corrupt(Seq((3L, text)))(3L)
    val b = corrupt(Seq((3L, text)))(3L)
    assert(a === b)
    // a different doc_id draws different span offsets
    val c = corrupt(Seq((4L, text)))(4L)
    assert(c._3 !== a._3)
  }

  test("span corruption is a pure projection: no Exchange in the plan") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(col("doc_id") +: Denoise.spanCorrupt(col("doc_id"), split(col("text"), " ")): _*)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must be shuffle-free:\n$plan")
  }
}
