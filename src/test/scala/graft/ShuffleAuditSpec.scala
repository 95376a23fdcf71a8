package graft

import java.util.concurrent.atomic.AtomicLong

import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-VOLUME audit: the scale claims in the operator scaladocs
  * ("one hash shuffle of fingerprints, not documents", "map-side combine
  * means the exchange carries group cardinality, not row count") held as
  * MEASURED invariants, not prose. A SparkListener sums shuffle-write
  * bytes across the job's stages; the asserts bound them against the
  * input volume the naive plan would have moved.
  */
class ShuffleAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Total shuffle bytes written while `df` builds AND runs (count()
    * action). BY-NAME on purpose: iterative operators (pageRank, HITS,
    * CC) execute eagerly at construction via localCheckpoint, so the
    * listener must be attached before the expression is evaluated or the
    * loop's shuffles happen unobserved.
    */
  private def shuffleBytes(df: => DataFrame): (Long, Long) = {
    val written = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        written.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = df.count()
      // stage-completed events are delivered asynchronously; poll briefly
      // for quiescence instead of reaching into the private listener bus
      var last = -1L
      var spins = 0
      while (written.get() != last && spins < 50) {
        last = written.get(); spins += 1; Thread.sleep(100)
      }
      (written.get(), n)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def docs = Tables.load(spark, TestSpark.sfDir, "documents")

  test("exact dedup's shuffle volume is document-length-INDEPENDENT; the naive text plan's grows") {
    // Compression makes absolute byte comparisons corpus-dependent (this
    // synthetic text LZ4-compresses below incompressible md5 hex!), so the
    // pinned invariant is the SCALING LAW: quadruple every document and
    // the fingerprint exchange stays flat while grouping on raw text
    // grows with the corpus. At 100 TB that flat line is the plan.
    val longDocs = docs.withColumn("text",
      concat_ws(" #", col("text"), col("text"), col("text"), col("text")))
    val (fpShort, _) = shuffleBytes(Dedup.exact(docs, "doc_id", "text"))
    val (fpLong, _) = shuffleBytes(Dedup.exact(longDocs, "doc_id", "text"))
    def naive(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("text")).agg(min(col("doc_id")), count(lit(1)))
    val (txtShort, _) = shuffleBytes(naive(docs))
    val (txtLong, _) = shuffleBytes(naive(longDocs))
    assert(fpShort > 0 && fpLong > 0 && txtShort > 0 && txtLong > 0)
    assert(fpLong < fpShort * 1.2,
      s"fingerprint shuffle grew with doc length: $fpShort -> $fpLong bytes")
    // the naive plan's volume strictly grows with doc length even under
    // LZ4 (this corpus compresses so well that the GROWTH, not a raw
    // ratio, is the only corpus-independent signal)
    assert(txtLong > txtShort,
      s"expected the raw-text shuffle to grow with doc length: $txtShort -> $txtLong bytes")
  }

  test("DSIR shuffle volume is document-length-independent (bucket LM + per-doc partials only)") {
    // Stage both corpora as MULTI-FILE parquet so Tables.spread's
    // small-input repartition self-disables (files >= parallelism — the
    // production case) and the only exchanges left are the B-bucket LM
    // partials and the per-doc score partials, neither of which carries
    // text. Quadruple every document: the shuffle must stay flat.
    val par = spark.sparkContext.defaultParallelism
    def stage(d: DataFrame, tag: String): DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_dsir_$tag").toString
      d.repartition(par).write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val short = stage(docs, "s")
    val long4 = stage(docs.withColumn("text",
      concat_ws(" ", col("text"), col("text"), col("text"), col("text"))), "l")
    def dsir(d: DataFrame) =
      graft.ext.Dsir.importanceWeights(d, "doc_id", "text", col("lang") === "en")
    val (bShort, _) = shuffleBytes(dsir(short))
    val (bLong, _) = shuffleBytes(dsir(long4))
    assert(bShort > 0 && bLong > 0)
    assert(bLong < bShort * 1.2,
      s"DSIR shuffle grew with doc length: $bShort -> $bLong bytes — text is riding an exchange")
  }

  test("MinHash/LSH banded join shuffles signatures, not documents: volume is text-length-independent") {
    // the banded exchange carries (band, bandhash, doc_id, sig) — fixed
    // bands × fixed-width signature per document, NO text. Quadruple every
    // document: shingle sets change but the signature width doesn't, so
    // the candidate-join shuffle must stay flat. This is the highest-
    // volume candidate generator in the dedup family; at 100 TB the flat
    // line (docs × bands × sig bytes) IS the plan.
    val longDocs = docs.withColumn("text",
      concat_ws(" #", col("text"), col("text"), col("text"), col("text")))
    val (short, _) = shuffleBytes(Dedup.minhashLsh(docs, "doc_id", "text"))
    val (long4, _) = shuffleBytes(Dedup.minhashLsh(longDocs, "doc_id", "text"))
    assert(short > 0 && long4 > 0)
    assert(long4 < short * 1.2,
      s"LSH banded-join shuffle grew with doc length: $short -> $long4 bytes — text is riding the exchange")
  }

  test("BPE encode's corpus side joins a broadcast vocab: shuffle volume is text-length-independent") {
    // below the vocabJoinSide size gate the vocab broadcasts, so the only
    // exchange in the encode is the per-doc partial-agg rollup — bounded
    // by docs × partitions, independent of how much text each doc
    // carries. Quadruple with a ' ' separator: the WORD SET (and thus the
    // learned vocab) is identical, only the token stream quadruples.
    import graft.functions.{TextFunctions => TF}
    def words(d: DataFrame) = d
      .select(explode(TF.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val longDocs = docs.withColumn("text",
      concat_ws(" ", col("text"), col("text"), col("text"), col("text")))
    val lS = graft.ext.Bpe.learn(words(docs), "word", "freq", nMerges = 4)
    val lL = graft.ext.Bpe.learn(words(longDocs), "word", "freq", nMerges = 4)
    val (bShort, _) = shuffleBytes(
      graft.ext.Bpe.encodeTokenCounts(docs, "doc_id", TF.tokens(col("text")), lS))
    val (bLong, _) = shuffleBytes(
      graft.ext.Bpe.encodeTokenCounts(longDocs, "doc_id", TF.tokens(col("text")), lL))
    assert(bShort > 0 && bLong > 0)
    assert(bLong < bShort * 1.2,
      s"BPE encode shuffle grew with doc length: $bShort -> $bLong bytes — the corpus side is shuffling")
  }

  test("PCA second-moment exchange carries partition×group partials, not corpus×d² pair rows") {
    // the per-vector d² pair explode happens MAPPER-side and partial
    // decimal aggregation collapses it before the exchange, so doubling
    // the corpus must leave the shuffle volume flat (the group count —
    // d(d+1)/2 — and the partition count are what ride the wire). At
    // 100 TB this flat exchange is what makes exact covariance viable.
    // stage both corpora as equal-partition parquet so the partial count
    // (partitions × groups) is held fixed and corpus size is the only
    // variable
    val par = spark.sparkContext.defaultParallelism
    def stage(d: DataFrame, tag: String): DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_pca_$tag").toString
      d.repartition(par).write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val base1 = stage(emb, "base")
    val doubled = stage(
      emb.union(emb.withColumn("vec_id", col("vec_id") + lit(1000000L))), "twice")
    val (base, _) = shuffleBytes(graft.ext.Pca.secondMoments(base1))
    val (twice, _) = shuffleBytes(graft.ext.Pca.secondMoments(doubled))
    assert(base > 0 && twice > 0)
    assert(twice < base * 1.3,
      s"PCA stats shuffle grew with corpus size: $base -> $twice bytes — pair rows are riding the exchange")
    // absolute sanity: the un-combined pair volume (vecs × d(d+1)/2 rows)
    // would weigh megabytes even at a few bytes per row
    val pairRows = emb.count() * (64 * 65 / 2)
    assert(base < pairRows,
      s"$base bytes for $pairRows pair rows — partial aggregation is not engaging")
  }

  test("single-pass funnel plans at most three exchanges (group pass, day rollup, final sort)") {
    val plan = SparkEntry.queries("x_event_funnel")(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    val shuffles = "(?m)\\bExchange (hash|range)partitioning".r.findAllIn(plan).size
    assert(shuffles <= 3,
      s"expected one (day,user) exchange + day rollup + sort, got $shuffles:\n$plan")
  }

  test("pageRank/HITS per-iteration exchanges carry score vectors, not edges: double edge multiplicity, per-iteration shuffle stays flat") {
    // the edge table is shuffled ONCE (repartition by src at build);
    // after that each iteration exchanges only (node, partial) rows —
    // map-side combine collapses the per-edge contributions before the
    // wire. Pin it by DIFFERENCING: total(k iters) − total(j iters) ≈
    // (k−j)·perIter, measured at 1× and 2× edge multiplicity (same node
    // set, same partition count). Multiplicity rides only the one-time
    // build shuffle, which the difference cancels; a per-edge exchange
    // in the loop would double perIter.
    val n = 400L
    val nodes = spark.range(n).toDF("node")
    val edges = spark.range(n).toDF("src")
      .select(col("src"), explode(array(
        (col("src") * 7 + 1) % n, (col("src") * 11 + 3) % n, (col("src") * 13 + 5) % n)).as("dst"))
    val edges2 = edges.unionAll(edges) // 2× multiplicity, same nodes/partitions
    def prBytes(e: DataFrame, iters: Int): Long =
      shuffleBytes(graft.ext.LinkRank.pageRank(nodes, "node", e, "src", "dst", iters))._1
    def hitsBytes(e: DataFrame, iters: Int): Long =
      shuffleBytes(graft.ext.LinkRank.hits(nodes, "node", e, "src", "dst", iters))._1
    val prPerIter1 = (prBytes(edges, 6) - prBytes(edges, 2)) / 4.0
    val prPerIter2 = (prBytes(edges2, 6) - prBytes(edges2, 2)) / 4.0
    assert(prPerIter1 > 0)
    assert(prPerIter2 < prPerIter1 * 1.3,
      s"pageRank per-iteration shuffle grew with edge multiplicity: $prPerIter1 -> $prPerIter2 bytes/iter — edges are riding the loop exchange")
    // difference from it=2, not it=1: the first iteration's plan differs
    // (AQE sizes the first joins off fresh stats) and would skew the
    // slope; it=2..6 is the steady state, measured slope 15075 bytes/iter
    // at BOTH multiplicities on this graph
    val hPerIter1 = (hitsBytes(edges, 6) - hitsBytes(edges, 2)) / 4.0
    val hPerIter2 = (hitsBytes(edges2, 6) - hitsBytes(edges2, 2)) / 4.0
    assert(hPerIter1 > 0)
    assert(hPerIter2 < hPerIter1 * 1.3,
      s"HITS per-iteration shuffle grew with edge multiplicity: $hPerIter1 -> $hPerIter2 bytes/iter — edges are riding the loop exchange")
  }

  test("daily counts shuffle group-cardinality partials, not events") {
    val events = Tables.withDay(Tables.loadEvents(spark, TestSpark.sfDir))
    val rowBytes = 30L * events.rdd.getNumPartitions * 64 // days × partitions × row estimate
    val (shuffled, n) = shuffleBytes(
      events.groupBy("day").agg(count(lit(1)).as("cnt")))
    assert(n > 0 && shuffled > 0)
    assert(shuffled < math.max(rowBytes * 4, 64 * 1024),
      s"daily counts shuffled $shuffled bytes — partial aggregation is not engaging")
  }

  test("lloydKMeans: assignment shuffles nothing; the update exchange carries k·d partials, corpus-size-independent") {
    import graft.ext.Similarity
    val embs = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val cents = Similarity.lloydKMeans(embs, "vec_id", "embedding", k = 8, iters = 1)._2
    // assignment: a pure projection — zero exchange
    val (asgBytes, nAsg) = shuffleBytes(
      Similarity.lloydAssign(embs, "vec_id", "embedding", cents))
    assert(nAsg > 0)
    // count() itself exchanges one partial-count row per partition (~59
    // bytes); the assignment contributes nothing beyond that
    assert(asgBytes < 1024L, s"assignment shuffled $asgBytes bytes — must be projection-only")
    // update: double the corpus, the (cid, dim) exchange stays flat
    // (partial combine reduces it to k·d·partitions rows)
    def update(d: DataFrame) = Similarity.lloydAssign(d, "vec_id", "embedding", cents)
      .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cid", "dim").agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
    // the exchange is partitions × k·d partial rows, so stage BOTH
    // corpora at the same multi-file partition count (the DSIR staging
    // trick) — otherwise union's concatenated partitioning doubles the
    // partial count (and a 1-partition input plans no exchange at all)
    val par = spark.sparkContext.defaultParallelism
    def stage(d: DataFrame, tag: String): DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_km_$tag").toString
      d.repartition(par).write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val base = stage(embs, "b")
    val doubled = stage(
      embs.union(embs.withColumn("vec_id", col("vec_id") + lit(1000000L))), "d")
    val (updBytes, _) = shuffleBytes(update(base))
    val (updBytes2, _) = shuffleBytes(update(doubled))
    assert(updBytes > 0 && updBytes2 > 0)
    assert(updBytes2 < updBytes * 1.5,
      s"k-means update shuffle grew with the corpus: $updBytes -> $updBytes2 bytes")
  }

  test("DBSCAN eps-pair generation shuffles LINEARLY in corpus size (9x grid probes, never all-pairs)") {
    // Triple the corpus (shifted-id copies): the candidate join's
    // exchange carries 9 probe rows + 1 home row per vector, so shuffle
    // volume must scale ~3x (allow 4.5x for partial-combine overheads).
    // An all-pairs plan would scale 9x — the assert separates the two.
    val signs = graft.functions.RpProject.signMatrix(2, 64)
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val par = spark.sparkContext.defaultParallelism
    def stage(d: DataFrame, tag: String): DataFrame = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_db_$tag").toString
      d.repartition(par).write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    }
    val base = stage(e, "b")
    val tripled = stage(
      e.unionAll(e.withColumn("vec_id", col("vec_id") + lit(100000L)))
        .unionAll(e.withColumn("vec_id", col("vec_id") + lit(200000L))), "t")
    def pairs(d: DataFrame) =
      graft.ext.Dbscan.epsPairs(d, "vec_id", "v", signs, cellWidth = 1.2, eps = 0.2)
    val (b1, n1) = shuffleBytes(pairs(base))
    val (b3, n3) = shuffleBytes(pairs(tripled))
    assert(b1 > 0 && b3 > 0)
    assert(n3 > n1, "tripled corpus (exact duplicates) must yield more eps-pairs")
    assert(b3 < b1 * 4.5,
      s"eps-pair shuffle scaled super-linearly: $b1 -> $b3 bytes for 3x corpus")
  }

  test("IRLS Newton stages shuffle sufficient statistics, not points: extra iterations add ~zero bytes") {
    // The corpus pays ONE shuffle (building the joint histogram); every
    // Newton stage exchanges five decimal numbers per partition. So the
    // 9-iteration fit must shuffle essentially the same bytes as the
    // 1-iteration fit — a plan that re-shuffled points (or the
    // histogram) per stage would scale with iteration count.
    val pts = Tables.load(spark, TestSpark.sfDir, "documents")
      .select((col("n_chars") % 50).as("x"), (col("doc_id") % 2).cast("int").as("y"))
    def fit(iters: Int) = {
      val (_, coef) = graft.ext.Stats.logisticIrls(pts, col("x"), col("y"), iters)
      coef
    }
    val (b1, _) = shuffleBytes(fit(1))
    val (b9, _) = shuffleBytes(fit(9))
    assert(b1 > 0 && b9 > 0)
    assert(b9 < b1 * 1.5 + 8192,
      s"IRLS shuffle grew with iteration count: $b1 -> $b9 bytes for 1 -> 9 iterations")
  }

  test("pixel decode is a map over the scan: shuffle is pixel-volume-INDEPENDENT and tiny") {
    // encode → decodePixels → per-image sums runs entirely inside
    // mapPartitions; the only exchange left is the count()'s one-row
    // partial-aggregate. Quadrupling the pixel area must not move it,
    // and the absolute volume must stay metadata-sized.
    import spark.implicits._
    def stats(scale: Int) = {
      val media = docs.select(col("doc_id").cast("long")).as[Long].map { id =>
        graft.ext.Multimodal.MediaRow(id, graft.ext.Multimodal.encodePng(
          6 * scale, 5 * scale, 3,
          (x, y, c) => ((id + x * 3 + y * 5 + c) % 256).toInt), "png")
      }
      graft.ext.Multimodal.pixelStats(media).toDF()
    }
    val (b1, n1) = shuffleBytes(stats(1))
    val (b4, n4) = shuffleBytes(stats(2)) // 4x the pixels
    assert(n1 > 0 && n1 === n4)
    assert(b1 < 16384, s"decode shuffled $b1 bytes — pixels are riding an exchange")
    assert(b4 < b1 * 1.2 + 4096,
      s"decode shuffle grew with pixel volume: $b1 -> $b4 bytes at 4x the pixels")
  }
}
