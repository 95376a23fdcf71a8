package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("importance weights separate target-vocabulary docs from background-vocabulary docs") {
    // target slice speaks {alpha beta gamma}; background speaks
    // {zog quux blarg}; two UNLABELED probes, one per vocabulary —
    // DSIR must rank the target-vocab probe positive and the other negative
    val docs = (
      (1 to 20).map(i => (i.toLong, "alpha beta gamma alpha beta", "t")) ++
      (21 to 40).map(i => (i.toLong, "zog quux blarg zog quux", "b")) ++
      Seq((41L, "alpha beta alpha beta gamma", "?"),
          (42L, "zog quux zog blarg quux", "?"))
    ).toDF("doc_id", "text", "grp")
    val w = Dsir.importanceWeights(docs, "doc_id", "text", col("grp") === "t")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(w(41L)._2, "target-vocab doc must be more-target-like")
    assert(!w(42L)._2, "background-vocab doc must not be target-like")
    assert(w(41L)._1 > 0 && w(42L)._1 < 0)
    // every labeled target doc outranks every background doc
    val tMin = (1 to 20).map(i => w(i.toLong)._1).min
    val bMax = (21 to 40).map(i => w(i.toLong)._1).max
    assert(tMin > bMax)
  }

  test("bucket hash is deterministic and in range") {
    val row = spark.range(1)
      .select(Dsir.bucketOf(lit("hello"), 1024).as("b1"),
              Dsir.bucketOf(lit("hello"), 1024).as("b2")).head()
    assert(row.getLong(0) === row.getLong(1))
    assert(row.getLong(0) >= 0 && row.getLong(0) < 1024)
  }
}
