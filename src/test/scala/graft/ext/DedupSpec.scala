package graft.ext

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the  quick brown fox jumps over the lazy dog"), // ws-normalized dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (4L, "completely different words entirely here now today"),
    (5L, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG")   // case dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups ws/case-normalized duplicates, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out === Array((1L, 3L), (3L, 1L), (4L, 1L))) // {1,2,5} collapse to keep_id 1
  }

  test("shingles produce n-grams; short docs yield the whole text") {
    val sh = docs.filter($"doc_id" === 1).select(Dedup.shingles($"text", 3)).as[Seq[String]].head()
    assert(sh.contains("the quick brown") && sh.contains("over the lazy"))
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
      .select(Dedup.shingles($"text", 3)).as[Seq[String]].head()
    assert(short === Seq("two words"))
  }

  test("ngramJaccardPairs: exact jaccard for dup and near-dup pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs(((1L, 2L))) === 1.0)       // identical after normalization
    assert(pairs(((1L, 3L))) > 0.5)          // one token differs at the end
    assert(!pairs.contains((1L, 4L)))        // unrelated
  }

  test("ngramContainmentPairs: embedded doc scores C=1 where jaccard stays low; asymmetric") {
    val embedded = Seq(
      (1L, "the quick brown fox"), // 2 shingles, both inside doc 2
      (2L, "the quick brown fox jumps over the lazy dog extra tail words here") // 11 shingles
    ).toDF("doc_id", "text")
    val out = Dedup.ngramContainmentPairs(embedded, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    // 1 ⊆ 2: containment 2/2 = 1.0 but jaccard only 2/11 — the pair Jaccard misses
    assert(out(((1L, 2L))) === ((1.0, 0.1818)))
    // reverse direction 2 → 1 is 2/11 < 0.5: filtered — the score is asymmetric
    assert(!out.contains((2L, 1L)))
  }

  test("minhashLsh finds the exact-dup and near-dup pairs with high estimated jaccard") {
    val got = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, bands = 16, rowsPerBand = 4,
      threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got(((1L, 2L))) === 1.0)
    assert(got.contains((1L, 3L)) && got(((1L, 3L))) > 0.5)
    assert(!got.contains((1L, 4L)))
  }

  test("minhashLshIncrementalReport: delta-vs-index pairs equal the rebuild's delta-touching pairs") {
    // base docs 1-5; delta 6 = dup of 1 (pairs with 1, 2, 3, 5), delta 7
    // unrelated (pairs with nothing) — incremental must find exactly the
    // rebuild's delta-touching pairs and nothing else
    val delta = Seq(
      (6L, "the quick brown fox jumps over the lazy dog"),
      (7L, "nothing shared with any of the base corpus rows at all")
    ).toDF("doc_id", "text")
    val r = Dedup.minhashLshIncrementalReport(docs, delta, "doc_id", "text",
      n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5).head()
    assert(r.getLong(0) === 2L) // n_delta
    assert(r.getBoolean(1), "expected delta near-dup pairs") // has_pairs
    assert(r.getBoolean(2), "incremental pair set diverged from rebuild") // match_full
  }

  test("native MinHashSig equals the HOF minhashSignature per doc") {
    val hof = docs.select($"doc_id", Dedup.minhashSignature($"text", 3, 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val native = docs.select($"doc_id",
      graft.functions.MinHashSig.minhashSig(Dedup.shingles($"text", 3), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native === hof)
  }

  test("simhash: identical normalized text hashes equal; near-dup within small hamming") {
    val hs = docs.select($"doc_id", Dedup.simhash(lower($"text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) === hs(2L) && hs(1L) === hs(5L))
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(3L)) < 16) // one-word change: few bits
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(4L)) > 10) // unrelated: many bits
  }

  test("native simhash64 signatures equal the HOF simhash per doc") {
    val hof = docs.select($"doc_id", Dedup.simhash($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === hof)
  }

  test("simhashPairs buckets by 16-bit chunks and filters by hamming") {
    val pairs = Dedup.simhashPairs(docs.withColumn("text", lower($"text")), "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 5L)) && pairs.contains((2L, 5L)))
    assert(!pairs.contains((1L, 4L)))
  }

  test("connectedComponents resolves transitive clusters to the min id") {
    // chain 1-2-3-4 (one cluster, never directly paired end-to-end),
    // pair 10-11, singleton edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("doc_a", "doc_b")
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(comp === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("exactIncremental drops known fingerprints and within-batch dups, keeps novel docs") {
    val existing = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "ALPHA   beta"),  // dup of corpus doc 1 (fingerprint is case/ws-invariant)
      (11L, "epsilon zeta"),  // novel
      (12L, "epsilon zeta"),  // within-batch dup of 11 -> min id survives
      (13L, "eta theta")      // novel
    ).toDF("doc_id", "text")
    val known = existing.select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val got = Dedup.exactIncremental(batch, "doc_id", "text", known)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(11L, 13L))
  }

  test("embeddingNearDup finds parallel vectors, skips orthogonal ones") {
    val embs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(2.0f, 0.0f, 0.0f)),  // parallel to 1
      (3L, Seq(0.0f, 1.0f, 0.0f))   // orthogonal
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(embs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("embeddingNearDupLsh: subset of exact, recovers all duplicate-grade pairs, no cross join") {
    import graft.sources.Tables
    val base = Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
      .filter(col("vec_id") % 10 === 0).select("vec_id", "embedding")
    val corpus = base.unionByName(
      base.select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
    val exact = Dedup.embeddingNearDup(corpus, "vec_id", "embedding", 0.18)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lshDf = Dedup.embeddingNearDupLsh(corpus, "vec_id", "embedding", 0.18)
    // candidates come from the bucket equi-join, never a cross product
    val plan = lshDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"scale path must not plan an all-pairs join:\n$plan")
    val lsh = lshDf.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // subset with identical scores
    lsh.foreach { case (k, cos) => assert(exact.get(k).contains(cos), s"pair $k not in exact set") }
    // every duplicate-grade pair (the planted copies) is structurally found
    val planted = exact.keys.filter { case (a, b) => b == a + 1000000 }
    assert(planted.nonEmpty)
    planted.foreach(p => assert(lsh.contains(p), s"planted duplicate $p missed"))
  }

  test("maskRepeatedSpans masks exactly the tokens covered by cross-doc repeated spans") {
    // docs 11/12 share the same 6-token run embedded in different contexts;
    // doc 13 is unrelated. n=6 → only that run is hot; the unique prefix /
    // suffix tokens survive.
    val d = Seq(
      (11L, "alpha beta one two three four five six tail11 end11"),
      (12L, "head12 one two three four five six omega gamma"),
      (13L, "nothing here repeats across documents at all ever")
    ).toDF("doc_id", "text")
    val out = Dedup.maskRepeatedSpans(d, "doc_id", "text", n = 6, minDocs = 2)
      .select("doc_id", "n_tokens", "n_masked", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(11L) === ((10, 6, "alpha beta tail11 end11")))
    assert(out(12L) === ((9, 6, "head12 omega gamma")))
    assert(out(13L) === ((8, 0, "nothing here repeats across documents at all ever")))
  }

  test("maskRepeatedSpans: overlapping hot spans merge their coverage; short docs untouched") {
    // 21/22 are full duplicates of an 8-token text; with n=6 every one of
    // the three span starts is hot, covering all 8 tokens in both docs
    val d = Seq(
      (21L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (22L, "a1 a2 a3 a4 a5 a6 a7 a8"),
      (23L, "tiny doc") // < n tokens: no spans, never masked
    ).toDF("doc_id", "text")
    val out = Dedup.maskRepeatedSpans(d, "doc_id", "text", n = 6, minDocs = 2)
      .select("doc_id", "n_masked", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(out(21L) === ((8, "")))
    assert(out(22L) === ((8, "")))
    assert(out(23L) === ((0, "tiny doc")))
  }

  test("lineDedup keeps each line at its first (doc, pos) only and reassembles in order") {
    import org.apache.spark.sql.functions.{col, split}
    val d = Seq(
      (1L, "aa|bb|cc"),
      (2L, "bb|dd"),   // bb already seen in doc 1
      (3L, "cc|aa"),   // everything seen — survives empty
      (4L, "ee|aa|ff") // middle line dropped, order of survivors kept
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(d, "doc_id", split(col("text"), "\\|"), joiner = "|")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) === (("aa|bb|cc", 3L, 3)))
    assert(out(2L) === (("dd", 1L, 2)))
    assert(out(3L) === (("", 0L, 2)))
    assert(out(4L) === (("ee|ff", 2L, 3)))
  }

  test("lineDedup's ranking window is partitioned by line, never global") {
    import org.apache.spark.sql.functions.{col, split}
    val d = Seq((1L, "aa|bb")).toDF("doc_id", "text")
    val plan = Dedup.lineDedup(d, "doc_id", split(col("text"), "\\|"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window [") || plan.contains("windowspecdefinition(line"),
      s"window must partition by line:\n$plan")
    assert(plan.contains("hashpartitioning(line"), s"expected a line-hash exchange:\n$plan")
  }

  test("semanticGridPairs equals the naive neighborhood-restricted pair set, each pair once") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val embs = graft.sources.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
      .filter(col("vec_id") < 120)
    val signs2 = graft.functions.RpProject.signMatrix(2, 64)
    val got = Dedup.semanticGridPairs(embs, "vec_id", "embedding", signs2, 8.0, 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "pairs must be emitted exactly once")
    // naive mirror: project, grid, neighborhood + cosine filter
    val proj = embs.select(col("vec_id").as("id"), col("embedding").as("v"),
      graft.functions.RpProject.rpProject(col("embedding"), signs2, 2).as("y"))
      .withColumn("cx", org.apache.spark.sql.functions.floor(col("y")(0) / 8.0))
      .withColumn("cy", org.apache.spark.sql.functions.floor(col("y")(1) / 8.0))
    val a = proj.select(col("id").as("id_a"), col("v").as("v_a"), col("cx").as("ax"), col("cy").as("ay"))
    val b = proj.select(col("id").as("id_b"), col("v").as("v_b"), col("cx").as("bx"), col("cy").as("by"))
    val naive = a.crossJoin(b)
      .filter(col("id_a") < col("id_b") &&
        org.apache.spark.sql.functions.abs(col("ax") - col("bx")) <= 1 &&
        org.apache.spark.sql.functions.abs(col("ay") - col("by")) <= 1)
      .withColumn("cos", org.apache.spark.sql.functions.round(
        graft.functions.VectorFunctions.cosine(col("v_a"), col("v_b")), 4))
      .filter(col("cos") >= 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet === naive)
  }

  test("semanticGridPairs is an equi-join on grid cells, never a nested loop") {
    val embs = graft.sources.Tables.load(spark, graft.TestSpark.sfDir, "embeddings")
    val signs2 = graft.functions.RpProject.signMatrix(2, 64)
    val plan = Dedup.semanticGridPairs(embs, "vec_id", "embedding", signs2, 8.0, 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"grid pairs must stay an equi-join:\n$plan")
  }

  test("editDistanceVerify scores candidate pairs without shuffling the corpus") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val outDf = Dedup.editDistanceVerify(docs, "doc_id", "text", pairs)
    val plan = outDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"pair lookups must broadcast:\n$plan")
    val out = outDf.select("doc_a", "doc_b", "lev")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out((1L, 2L)) === 0) // ws-normalized duplicate
    assert(out((1L, 3L)) === 3) // dog -> cat
    assert(out((1L, 4L)) > 20)  // unrelated
  }

  // ------------------------------------------ prefix-filtered exact join

  /** Corpus with planted J >= 0.5 pairs: real docs plus 90%-truncated
    * copies (the x_split_leakage construction).
    */
  private def truncCorpus = {
    val base = graft.sources.Tables.load(spark, graft.TestSpark.sfDir, "documents")
      .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
    base.unionByName(base.select(
      (col("doc_id") + lit(1000000L)).as("doc_id"),
      expr("substr(text, 1, CAST(floor(length(text)*0.9) AS INT))").as("text")))
  }

  test("native JaccardShingles is bit-identical to the array_intersect Column spec") {
    // the fused kernel replaced round(size(array_intersect)/(...), 4) in
    // prefixJaccardPairs' verify step — pin bit-parity on real shingle
    // arrays plus the edges: identical, disjoint, subset, and both-empty
    // (0/0 -> NaN under Spark's Round pass-through)
    import graft.functions.JaccardShingles.jaccardShingles
    val sh = docs.select(Dedup.shingles($"text", 3).as("a"))
    val pairs = sh.crossJoin(sh.select(col("a").as("b")))
      .unionByName(Seq((Seq("x y z", "y z w"), Seq.empty[String])).toDF("a", "b"))
    val spec = round(
      size(array_intersect(col("a"), col("b"))).cast("double") /
        (size(col("a")) + size(col("b")) - size(array_intersect(col("a"), col("b")))).cast("double"), 4)
    val got = pairs.select(jaccardShingles(col("a"), col("b")).as("native"), spec.as("spec")).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, s) = (r.getDouble(0), r.getDouble(1))
      assert(n === s || (n.isNaN && s.isNaN), s"kernel $n != spec $s")
    }
    // both-empty is IMPOSSIBLE in the verify path (a candidate pair shares
    // >=1 shingle, so the union is never empty); the Column spec would
    // raise ANSI DIVIDE_BY_ZERO there, the kernel returns a defensive NaN
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("a", "b")
      .select(jaccardShingles(col("a"), col("b"))).head().getDouble(0)
    assert(empty.isNaN)
  }

  test("prefixJaccardPairs equals the brute inverted-index join exactly") {
    val corp = truncCorpus
    val got = Dedup.prefixJaccardPairs(corp, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = Dedup.ngramJaccardPairs(corp, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === brute)
    assert(got.nonEmpty, "planted truncated copies must produce J >= 0.5 pairs")
  }

  test("prefix filter generates strictly fewer candidate pairs than the full inverted index") {
    val corp = truncCorpus
    val withSh = corp.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val exploded = withSh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    // full inverted index: every pair sharing ANY shingle
    val fullCands = exploded.select(col("shingle"), col("doc_id").as("a"))
      .join(exploded.select(col("shingle"), col("doc_id").as("b")), "shingle")
      .filter(col("a") < col("b")).select("a", "b").distinct().count()
    // prefix index at tGen = 0.5 - 5e-5 (mirror of prefixJaccardPairs)
    val tGen = 0.5 - 5e-5
    val dfreq = exploded.groupBy("shingle").agg(count(lit(1)).as("df"))
    val ranked = exploded.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df"), col("shingle"))))
      .join(withSh.select(col("doc_id"), size(col("sh")).as("nsh")), "doc_id")
      .filter(col("rk") <= col("nsh") - ceil(lit(tGen) * col("nsh")) + 1)
    val prefixCands = ranked.select(col("shingle"), col("doc_id").as("a"))
      .join(ranked.select(col("shingle"), col("doc_id").as("b")), "shingle")
      .filter(col("a") < col("b")).select("a", "b").distinct().count()
    assert(prefixCands < fullCands / 4,
      s"prefix filtering should cut candidates hard: $prefixCands vs $fullCands full")
  }
}
