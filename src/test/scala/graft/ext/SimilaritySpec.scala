package graft.ext

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def embs = Tables.load(spark, TestSpark.sfDir, "embeddings")

  test("bruteTopK: k neighbors per query, rank 1 is the best score, no self-matches") {
    val queries = embs.filter(col("vec_id") < 5)
    val got = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 3).collect()
    assert(got.length === 15) // 5 queries × k=3
    val byQuery = got.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
      assert(sorted.map(_.getDouble(3)).toSeq === sorted.map(_.getDouble(3)).sortBy(-(_: Double)))
      assert(!rows.exists(_.getLong(2) === q)) // self excluded
    }
  }

  test("hardNegativesTopK: every neighbor's label differs; equals bruteTopK filtered by label") {
    val queries = embs.filter(col("vec_id") < 5)
    val got = Similarity.hardNegativesTopK(embs, queries, "vec_id", "embedding", "label", k = 3)
    val labels = embs.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = got.collect()
    assert(rows.length === 15)
    rows.foreach { r =>
      assert(r.getInt(3) === labels(r.getLong(2)), "neg_label must be the neighbor's label")
      assert(r.getInt(3) !== labels(r.getLong(0)), "neighbor label must differ from query label")
    }
    // agreement with the unrestricted ranking: restricting bruteTopK(k=all)
    // to differing labels and re-ranking gives the same neighbor sets
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 500)
      .collect().filter(r => labels(r.getLong(2)) != labels(r.getLong(0)))
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getInt(1)).take(3).map(_.getLong(2)).toSeq
      }
    val gotSets = rows.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    }
    assert(gotSets === brute)
  }

  test("hardNegativesTopK broadcasts the query set — the corpus never shuffles to score") {
    val plan = Similarity.hardNegativesTopK(
      embs, embs.filter(col("vec_id") < 5), "vec_id", "embedding", "label", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query set must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle to score:\n$plan")
  }

  test("lshTopK achieves reasonable recall of the brute-force top-3") {
    val queries = embs.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Similarity.lshTopK(embs, queries, "vec_id", "embedding", k = 3,
      nBits = 5, tables = 8, probes = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall > 0.5, s"LSH recall $recall too low")
  }

  test("ivfTopK achieves reasonable recall and exact scores vs brute force") {
    val queries = embs.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val ivf = Similarity.ivfTopK(embs, queries, "vec_id", "embedding", k = 3,
      nLists = 16, nProbe = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val recall = (brute.keySet & ivf.keySet).size.toDouble / brute.size
    assert(recall > 0.4, s"IVF recall $recall too low")
    (brute.keySet & ivf.keySet).foreach(k => assert(brute(k) === ivf(k)))
  }

  test("recallByDecile gates both ANN paths at >=90% in every decile (SparkEntry params)") {
    for (name <- Seq("x_ann_lsh_recall", "x_ann_ivf_recall")) {
      val rows = graft.SparkEntry.queries(name)(spark, TestSpark.sfDir).collect()
      assert(rows.length === 10, s"$name: expected 10 deciles")
      rows.foreach { r =>
        assert(r.getLong(1) === 10L, s"$name decile ${r.getLong(0)}: expected 10 queries")
        assert(r.getLong(2) === 100L, s"$name decile ${r.getLong(0)}: expected 100 truth rows")
        assert(r.getBoolean(3), s"$name decile ${r.getLong(0)}: recall below gate")
      }
    }
  }

  test("recallByDecile reports a failing decile when the ANN result misses neighbors") {
    val queries = embs.filter(col("vec_id") < 20)
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 5)
    // an 'ANN' result that returns only rank 1 has recall 20% — every gate must trip
    val bad = brute.filter(col("rank") === 1)
    val rows = Similarity.recallByDecile(brute, bad, minRecallPct = 90).collect()
    assert(rows.nonEmpty && rows.forall(r => !r.getBoolean(3)))
  }

  test("ivfTopK cell assignment is a per-row map: no corpus shuffle, one Window total") {
    val df = graft.SparkEntry.queries("x_ann_ivf")(spark, TestSpark.sfDir)
    import org.apache.spark.sql.catalyst.plans.logical
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.size === 1, "expected only the final per-query top-k window")
    val p = df.queryExecution.executedPlan.toString
    // the r3 plan ranked cells with a per-corpus-id window, shuffling
    // |corpus|·nLists rows by neighbor_id — pin its absence
    assert(!p.contains("hashpartitioning(neighbor_id"),
      s"corpus must not shuffle by id before the candidate join:\n$p")
  }

  test("kmeansCentroids: objective non-decreasing, deterministic init, empty-safe") {
    val (cents, objs) = Similarity.kmeansCentroids(embs, "vec_id", "embedding", k = 8, iters = 3, dim = 64)
    assert(cents.length === 8 && cents.forall(_.length === 64))
    assert(objs.length === 3)
    // spherical k-means ascent: mean best-cosine must not decrease
    // (tolerance for the 6-dp centroid quantization between iterations)
    objs.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a - 1e-4, s"objective regressed: $objs")
      case _ =>
    }
    val (cents2, _) = Similarity.kmeansCentroids(embs, "vec_id", "embedding", k = 8, iters = 0, dim = 64)
    assert(cents2.length === 8) // iters=0 returns the raw deterministic init
  }

  test("ivfTopKWith (trained centroids) keeps assignment shuffle-free and scores exact") {
    val (cents, _) = Similarity.kmeansCentroids(embs, "vec_id", "embedding", k = 8, iters = 2, dim = 64)
    val queries = embs.filter(col("vec_id") < 10)
    val df = Similarity.ivfTopKWith(embs, queries, "vec_id", "embedding", k = 3, cents, nProbe = 7)
    import org.apache.spark.sql.catalyst.plans.logical
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.size === 1, "expected only the final per-query top-k window")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning(neighbor_id"),
      s"corpus must not shuffle by id before the candidate join:\n$p")
    // scores of found neighbors are the exact cosine, same as brute force
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    df.collect().foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach(exp => assert(r.getDouble(3) === exp))
    }
  }

  test("lshTopK scores match brute-force scores for overlapping results") {
    val queries = embs.filter(col("vec_id") === 0)
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    val approx = Similarity.lshTopK(embs, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    (brute.keySet & approx.keySet).foreach { n => assert(brute(n) === approx(n)) }
  }

  test("sqTopK: scores are exact-rerank cosines; SQ8 bounds cover the corpus within a half-step") {
    val queries = embs.filter(col("vec_id") < 5)
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val sq = Similarity.sqTopK(embs, queries, "vec_id", "embedding", k = 5, dim = 64, shortlist = 30)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // overlapping (query, neighbor) pairs carry IDENTICAL scores: the
    // final score is the exact cosine of the true vectors, quantization
    // only shapes the shortlist
    val overlap = brute.keySet & sq.keySet
    assert(overlap.size >= 20, s"SQ8 shortlist missed most of the brute top-5: ${overlap.size}/25")
    overlap.foreach { k => assert(brute(k) === sq(k)) }

    // bounds cover every component (6-dp rounding can only widen by 5e-7)
    val (lo, hi) = Similarity.sqBounds(embs, "embedding", 64)
    val mm = embs.select(
      min(array_min(col("embedding"))).cast("double"),
      max(array_max(col("embedding"))).cast("double")).head()
    assert(lo.min <= mm.getDouble(0) + 1e-6 && hi.max >= mm.getDouble(1) - 1e-6)
    assert(lo.zip(hi).forall { case (l, h) => l <= h })
  }

  test("knnClassify: majority vote wins, vote ties break to the smallest class") {
    import spark.implicits._
    // query [1,0]: neighbors by cosine are the three x-axis vectors
    // (classes 1,1,2) -> majority class 1 with 2 votes.
    val corpus = Seq(
      (10L, 1L, Array(1.0f, 0.0f)),
      (11L, 1L, Array(0.9f, 0.1f)),
      (12L, 2L, Array(0.8f, 0.2f)),
      (13L, 3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "cls", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.knnClassify(corpus, queries, "vec_id", "embedding", "cls", k = 3)
      .as[(Long, Long, Long)].collect()
    assert(out === Array((1L, 1L, 2L)))
    // 2-vs-2 tie at k=4 (classes 1,1,2,3 -> 1:2, 2:1, 3:1; at k=4 with
    // the y vector included class 1 still wins) — force a genuine tie:
    val tied = Seq(
      (10L, 2L, Array(1.0f, 0.0f)),
      (11L, 1L, Array(0.9f, 0.1f)),
      (12L, 2L, Array(0.8f, 0.2f)),
      (13L, 1L, Array(0.7f, 0.3f))
    ).toDF("vec_id", "cls", "embedding")
    val tiedOut = Similarity.knnClassify(tied, queries, "vec_id", "embedding", "cls", k = 4)
      .as[(Long, Long, Long)].collect()
    assert(tiedOut === Array((1L, 1L, 2L)), "2-2 tie must resolve to the smaller class")
  }

  test("knnClassifyIvf at nProbe = nLists equals knnClassify exactly") {
    // probing every cell makes the IVF candidate set the whole corpus
    // (minus self), so the vote must be IDENTICAL to the exact form —
    // the invariant that makes the nProbe < nLists recall trade a tuning
    // knob rather than a correctness question
    val corpus = embs.filter(col("vec_id") < 200)
    val queries = embs.filter(col("vec_id") < 30)
    val exact = Similarity.knnClassify(corpus, queries, "vec_id", "embedding", "label", k = 10)
    val ivf = Similarity.knnClassifyIvf(corpus, queries, "vec_id", "embedding", "label", k = 10,
      nLists = 8, nProbe = 8)
    assert(exact.exceptAll(ivf).isEmpty && ivf.exceptAll(exact).isEmpty)
    // gate shape sanity: one row per decile, truth counts complete. The
    // per-decile >= 90% recall bar itself is enforced by the sf0.01
    // CORRECTNESS oracle (x_label_noise_ivf: recall_ok must be TRUE) —
    // at this sf0.001 slice the cells are too sparse for the production
    // bar to be a stable unit-test invariant.
    val gate = Similarity.recallByDecile(
      Similarity.knnNeighbors(embs, queries, "vec_id", "embedding", "label", k = 10),
      Similarity.knnNeighborsIvf(embs, queries, "vec_id", "embedding", "label", k = 10,
        nLists = 16, nProbe = 14),
      minRecallPct = 90).collect()
    assert(gate.length === 10)
    assert(gate.map(_.getLong(2)).sum === 300L, "10 true neighbors per query reach the gate")
  }

  test("bqTopK: exact-rerank scores match brute force; planted duplicate is rank 1") {
    val queries = embs.filter(col("vec_id") < 5)
    val brute = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val bq = Similarity.bqTopK(embs, queries, "vec_id", "embedding", k = 3, dim = 64, shortlist = 100)
      .collect()
    // rerank is exact cosine: any overlapping (query, neighbor) has the
    // identical score
    bq.foreach { r =>
      brute.get((r.getLong(0), r.getLong(2))).foreach(s => assert(s === r.getDouble(3)))
    }
    // a planted exact copy shares the full bit pattern AND reranks to 1.0
    val planted = embs.filter(col("vec_id") === 7)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"), col("label"))
    val out = Similarity.bqTopK(embs.unionByName(planted), embs.filter(col("vec_id") === 7),
      "vec_id", "embedding", k = 1, dim = 64, shortlist = 100).head()
    assert(out.getLong(2) === 1000007L && out.getDouble(3) === 1.0)
  }

  test("ivfIncrementalReport: delta-only assignment matches the full rebuild") {
    val e = embs
    val rep = Similarity.ivfIncrementalReport(
      e.filter(col("vec_id") % 4 =!= 0), e.filter(col("vec_id") % 4 === 0),
      "vec_id", "embedding", nLists = 16).head()
    assert(rep.getBoolean(3), "incremental index must equal the rebuild")
    assert(rep.getLong(0) === 16L, "every centroid must own its non-empty cell")
    assert(rep.getLong(1) === e.count())
  }

  // the stored embeddings are unit-normalized, so MIPS tests scale them by
  // 2^(vec_id % 8) (exact multiplication) to give the norm bound teeth —
  // same construction as the x_maxip_topk query
  private def scaledEmbs = embs.select(col("vec_id"),
    transform(col("embedding"),
      x => x.cast("double") * pow(lit(2.0), (col("vec_id") % 8).cast("double"))).as("embedding"))

  test("maxInnerProductTopK equals the brute inner-product ranking exactly") {
    import graft.functions.VectorFunctions.dot
    import org.apache.spark.sql.expressions.Window
    val sc = scaledEmbs
    val queries = sc.filter(col("vec_id") < 8)
    val got = Similarity.maxInnerProductTopK(sc, queries, "vec_id", "embedding", k = 7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val w = Window.partitionBy("query_id").orderBy(col("ip").desc, col("neighbor_id").asc)
    val brute = sc.select(col("vec_id").as("neighbor_id"), col("embedding").as("v_c"))
      .join(broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("v_q"))),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("ip", dot(col("v_q"), col("v_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (floor(col("ip") * lit(1e4) + lit(0.5)) / lit(1e4)).as("ip"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.sorted.toSeq === brute.sorted.toSeq)
    assert(got.length === 8 * 7)
  }

  test("maxInnerProductTopK's norm bound actually prunes — survivors are a strict subset") {
    import graft.functions.VectorFunctions.{dot, l2Norm}
    import org.apache.spark.sql.expressions.Window
    val k = 7; val normBand = 64
    val sc = scaledEmbs
    val queries = sc.filter(col("vec_id") < 8)
    // replay phase 1 to get each query's bound, then count norm-qualified docs
    val c = sc.select(col("vec_id").as("neighbor_id"), col("embedding").as("v_c"),
      l2Norm(col("embedding")).as("n_c"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("v_q"),
      l2Norm(col("embedding")).as("n_q"))
    val band = c.orderBy(col("n_c").desc, col("neighbor_id")).limit(normBand)
    val w = Window.partitionBy("query_id").orderBy(col("ip").desc, col("neighbor_id").asc)
    val bounds = band.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("ip", dot(col("v_q"), col("v_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === k)
      .select(col("query_id"), col("ip").as("bound"))
    val nSurvivors = c.join(broadcast(q.join(bounds, "query_id")),
      col("query_id") =!= col("neighbor_id") &&
        col("n_c") * col("n_q") >= col("bound") - abs(col("bound")) * lit(1e-9) - lit(1e-12))
      .count()
    val nAll = sc.count() * queries.count()
    assert(nSurvivors < nAll / 2,
      s"norm pruning should skip most of the corpus: $nSurvivors of $nAll scored")
    assert(nSurvivors >= 8L * k, "every query must keep at least k candidates")
  }

  test("lloydKMeans: separated blobs recover exactly, centroids are blob means, no exchange in assignment") {
    import spark.implicits._
    // two tight blobs far apart in 4-d; ids chosen so the k=2 lowest-id
    // init starts with one seed per blob
    val pts = Seq(
      (0L, Seq(10.0f, 10f, 10f, 10f)), (2L, Seq(10.5f, 10f, 10f, 10f)),
      (4L, Seq(10f, 10.5f, 10f, 10f)),
      (1L, Seq(-10f, -10f, -10f, -10f)), (3L, Seq(-10.5f, -10f, -10f, -10f)),
      (5L, Seq(-10f, -10f, -10.5f, -10f))).toDF("vec_id", "embedding")
    val (asg, cents) = Similarity.lloydKMeans(pts, "vec_id", "embedding", k = 2, iters = 2)
    val got = asg.select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(0L) === got(2L) && got(0L) === got(4L), "positive blob stays together")
    assert(got(1L) === got(3L) && got(1L) === got(5L), "negative blob stays together")
    assert(got(0L) !== got(1L), "blobs are separated")
    // converged centroid = the blob's per-dim mean (12-dp rounded)
    val posCent = cents.find(_._1 === got(0L)).get._2
    assert(math.abs(posCent.head - (10.0 + 10.5 + 10.0) / 3) < 1e-9)
    // the zero-shuffle claim: assignment is a pure projection — no
    // Exchange anywhere in its plan
    val plan = asg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment must not shuffle:\n$plan")
  }
}
