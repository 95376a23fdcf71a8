package graft

import graft.ops.Coerce
import graft.sinks.Upsert
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.2): idempotency and
  * never-throwing coercion over scalacheck-generated inputs. Generators
  * are sampled with fixed seeds (no scalatest-scalacheck bridge in the
  * offline cache) — deterministic, still adversarial.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val rowsGen = Gen.nonEmptyListOf(for {
    id <- Gen.choose(0, 20)
    v <- Gen.choose(-1000, 1000)
    version <- Gen.choose(0, 5)
  } yield (id.toString, v, version))

  test("lastWriteWins is idempotent and keeps the max version per id") {
    samples(rowsGen, 6).foreach { rows =>
      val df = rows.toDF("id", "v", "version")
      val once = Upsert.lastWriteWins(df, "id", "version")
      val twice = Upsert.lastWriteWins(once, "id", "version")
      val a = once.collect().map(r => (r.getString(0), r.getInt(2))).sortBy(_._1).toSeq
      val b = twice.collect().map(r => (r.getString(0), r.getInt(2))).sortBy(_._1).toSeq
      assert(a === b)
      val maxVersions = rows.groupBy(_._1).map { case (id, rs) => id -> rs.map(_._3).max }
      assert(a.toMap === maxVersions)
    }
  }

  test("lenient coercion never throws and never yields nulls, for any string input") {
    val junkGen = Gen.listOfN(20, Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.const(null: String),
      Gen.const(""), Gen.const("∞"), Gen.const("1e309"), Gen.const("-42"),
      Gen.const("3.14"), Gen.const(" 7 ")))
    samples(junkGen, 6).foreach { values =>
      val df = values.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "raw")
      val out = Coerce.lenient(df, Seq(
        Coerce.FieldSpec("i", "int", -1),
        Coerce.FieldSpec("raw", "double", 0.0),
        Coerce.FieldSpec("missing", "string", "dflt")))
      val rows = out.collect()
      assert(rows.length === values.length)
      assert(rows.forall(r => !r.isNullAt(0) && !r.isNullAt(1) && r.getString(2) === "dflt"))
    }
  }

  test("exact dedup then dedup again is a fixpoint") {
    val textsGen = Gen.nonEmptyListOf(Gen.oneOf("a b c", "a  b c", "x y", "z"))
    samples(textsGen, 6).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val d1 = graft.ext.Dedup.exact(docs, "doc_id", "text")
      val keepers = d1.select(col("keep_id").as("doc_id")).join(docs, "doc_id")
      val d2 = graft.ext.Dedup.exact(keepers, "doc_id", "text")
      assert(d2.count() === d1.count())
    }
  }
}
