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

  test("saltedAggregate equals the plain groupBy for any salt count") {
    samples(rowsGen, 4).foreach { rows =>
      val df = rows.toDF("id", "v", "version")
      val plain = df.groupBy("id").agg(count(lit(1)).as("cnt"), sum("v").as("sv"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      Seq(1, 3, 8).foreach { salts =>
        val salted = graft.ops.Skew.saltedAggregate(df, "id", salts,
          partialAggs = Seq(count(lit(1)).as("pc"), sum("v").as("pv")),
          mergeAggs = Seq(sum("pc").as("cnt"), sum("pv").as("sv")))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
        assert(salted === plain, s"salts=$salts")
      }
    }
  }

  test("saltedJoin equals the plain join for any salt count") {
    samples(rowsGen, 4).foreach { rows =>
      val big = rows.toDF("id", "v", "version")
      val dim = rows.map(_._1).distinct.map(id => (id, s"dim_$id")).toDF("id", "label")
      val plain = big.join(dim, "id").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(3))).sorted.toSeq
      Seq(1, 4).foreach { salts =>
        val salted = graft.ops.Skew.saltedJoin(big, dim, "id", salts).collect()
          .map(r => (r.getString(0), r.getInt(1), r.getString(3))).sorted.toSeq
        assert(salted === plain, s"salts=$salts")
      }
    }
  }

  test("minhash estimated jaccard is 1.0 for identical docs, in [0,1] always") {
    val textsGen = Gen.nonEmptyListOf(Gen.oneOf(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely different text with other words entirely",
      "a b"))
    samples(textsGen, 3).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = graft.ext.Dedup.minhashLsh(docs, "doc_id", "text", n = 2,
        bands = 8, rowsPerBand = 4, threshold = 0.0).collect()
      val byId = texts.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap
      pairs.foreach { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        assert(j >= 0.0 && j <= 1.0)
        if (byId(a) == byId(b)) assert(j === 1.0, s"identical docs $a,$b must estimate 1.0")
      }
    }
  }

  test("connectedComponents matches a union-find reference on random graphs") {
    val edgesGen = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 25L)
      b <- Gen.choose(0L, 25L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    samples(edgesGen, 4).foreach { edges =>
      // reference: plain union-find with min-id roots
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      edges.foreach { case (a, b) => union(a, b) }
      val expected = parent.keys.map(k => k -> find(k)).toMap

      val got = graft.ext.Dedup.connectedComponents(
          edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === expected)
    }
  }

  test("connectedComponents handles adversarial long chains within the round budget") {
    // a chain is the worst case for per-hop propagation: diameter = n.
    // Star contraction must label a 300-hop chain in <= maxIter(=20) rounds.
    val chainGen = for {
      n <- Gen.choose(50, 300)
      shift <- Gen.choose(0L, 1000L)
    } yield (0L until n.toLong).map(i => (i + shift, i + shift + 1))
    samples(chainGen, 3).foreach { chain =>
      val lo = chain.head._1
      val got = graft.ext.Dedup.connectedComponents(
          chain.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === chain.length + 1)
      assert(got.forall(_._2 == lo), s"every chain node must label to $lo")
    }
  }

  test("packSequences tiles any token distribution exactly") {
    val docsGen = Gen.nonEmptyListOf(Gen.choose(0L, 40L)).map(_.zipWithIndex.map {
      case (n, i) => (i.toLong, n)
    })
    samples(docsGen, 5).zipWithIndex.foreach { case (docs, gi) =>
      val budget = 1 + gi * 7 // vary the budget too: 1, 8, 15, 22, 29
      val df = docs.toDF("id", "ntok")
      val packed = graft.ext.Packing.packSequences(df, "id", col("ntok"), budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val totalToks = docs.map(_._2).filter(_ > 0).sum
      // conservation: every token lands in exactly one (doc, pack) slice
      assert(packed.map(_._5).sum === totalToks)
      // every contribution is within (0, budget]
      assert(packed.forall(p => p._5 > 0 && p._5 <= budget))
      // pack fill: every pack except the highest holds exactly `budget`
      if (packed.nonEmpty) {
        val byPack = packed.groupBy(_._4).view.mapValues(_.map(_._5).sum)
        val last = byPack.keys.max
        byPack.filter(_._1 < last).foreach { case (p, tot) =>
          assert(tot === budget.toLong, s"pack $p under/overfilled: $tot of $budget")
        }
        assert(byPack.keys.toSeq.sorted === (0L to last)) // contiguous ids
      }
    }
  }

  test("applyChangeSet(a, changeSet(a, b)) reproduces b exactly on random snapshots") {
    val snapGen = Gen.listOf(for {
      id <- Gen.choose(0, 15)
      v <- Gen.option(Gen.choose(-50, 50))
    } yield (id, v))
    samples(snapGen.flatMap(a => snapGen.map(b => (a, b))), 12).foreach { case (ra, rb) =>
      // dedupe ids (snapshots are keyed)
      val a = ra.toMap.toSeq
      val b = rb.toMap.toSeq
      val dfa = a.map { case (k, v) => (k.toLong, v.map(_.toLong)) }.toDF("id", "v")
      val dfb = b.map { case (k, v) => (k.toLong, v.map(_.toLong)) }.toDF("id", "v")
      val cs = graft.ops.Diff.changeSet(dfa, dfb, "id", Seq("v"))
      val applied = graft.ops.Diff.applyChangeSet(dfa, cs, "id", Seq("v"))
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      val want = b.map { case (k, v) => (k.toLong, v.map(_.toLong)) }.toSet
      assert(applied === want)
    }
  }

  test("contentReconcile flags exactly the partitions where content differs") {
    val rowsGen = Gen.nonEmptyListOf(for {
      part <- Gen.oneOf("p1", "p2", "p3")
      id <- Gen.choose(0, 30)
      v <- Gen.choose(-50, 50)
    } yield (s"$part-$id", part, v.toString)).map(_.distinctBy(_._1))
    samples(rowsGen, 5).foreach { rows =>
      val src = rows.toDF("id", "part", "v")
      // drift every p2 value; p1/p3 untouched
      val sink = rows.map { case (id, p, v) =>
        (id, p, if (p == "p2") (v.toInt + 1).toString else v)
      }.toDF("id", "part", "v")
      val flagged = graft.ops.Diff.contentReconcile(src, sink, "part", Seq("id", "v"))
        .collect().map(_.getString(0)).toSet
      val expected = if (rows.exists(_._2 == "p2")) Set("p2") else Set.empty[String]
      assert(flagged === expected)
    }
  }

  test("decodeHeader round-trips any PNG/GIF/BMP dimensions encoded into real header bytes") {
    import graft.ext.Multimodal
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    val dims = for {
      w <- Gen.choose(1, 65535)
      h <- Gen.choose(1, 65535)
      colorType <- Gen.oneOf(0, 2, 3, 4, 6)
      topDown <- Gen.oneOf(true, false)
    } yield (w, h, colorType, topDown)
    samples(dims, 60).foreach { case (w, h, colorType, topDown) =>
      val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
        0, 0, 0, 13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0, 1, 2, 3, 4)
      val chans = Map(0 -> 1, 2 -> 3, 3 -> 1, 4 -> 2, 6 -> 4)(colorType)
      assert(Multimodal.decodeHeader(png) === Some(("png", w, h, chans)))
      val gif = "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0)
      assert(Multimodal.decodeHeader(gif) === Some(("gif", w, h, 3)))
      val bmp = "BM".getBytes("US-ASCII") ++ Array.fill[Byte](8)(0) ++
        le32(54) ++ le32(40) ++ le32(w) ++ le32(if (topDown) -h else h) ++
        Array[Byte](1, 0, 24, 0)
      assert(Multimodal.decodeHeader(bmp) === Some(("bmp", w, h, 3)))
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
