package graft.ext

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search") — the memory-side scale path for embedding search
  * (north-star extension; SURVEY.md §2.10): split each `dim`-dimensional
  * vector into `m` subvectors, quantize each against its own `k`-entry
  * codebook, and represent the vector as `m` small codes (m=8, k=16 ⇒
  * 8 codes ≈ 4 bytes vs 256 bytes of float32 — a 64× compression).
  *
  * Search is asymmetric distance computation (ADC): each query
  * precomputes an m·k table of exact subvector distances to every
  * codeword — `m·k` numbers, computed ONCE per query — and scoring a
  * corpus row collapses to `m` array lookups + adds (no per-pair
  * floating-point vector math at all). The ADC pass over corpus×queries
  * is a broadcast of the (small) query set with zero corpus shuffle,
  * identical in shape to [[Similarity.bruteTopK]] but ~dim/m times
  * cheaper per pair and reading codes (4 B) instead of vectors (256 B) —
  * at 100 TB of embeddings THIS is the plan that fits the scan in
  * memory-bandwidth budget. An exact rerank of the per-query shortlist
  * restores true-cosine ordering, and the recall gate
  * (x_pq_recall, [[Similarity.recallByDecile]]) measures what the
  * compression cost.
  *
  * Training is driver-side Lloyd's on a deterministic hash-ranked sample
  * (bounded: `sampleN` vectors — model fitting on a metadata-scale
  * sample, the standard PQ recipe; the cluster never iterates). All
  * driver math is sequential and seed-free, so the model — and therefore
  * every code and every search result — is bit-reproducible.
  */
object PQ {

  /** Trained quantizer: `codebooks(s)(j)` is the j-th codeword of
    * subquantizer s, each of length `dsub = dim / m`.
    */
  case class Model(dim: Int, m: Int, k: Int, codebooks: IndexedSeq[IndexedSeq[Array[Double]]]) {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub: Int = dim / m

    /** Flat layout `[(s·k + j)·dsub + i]` for the codegen encoder. */
    def flatBooks: Array[Double] = {
      val out = new Array[Double](m * k * dsub)
      for (s <- 0 until m; j <- 0 until k; i <- 0 until dsub)
        out((s * k + j) * dsub + i) = codebooks(s)(j)(i)
      out
    }
  }

  /** Fit `m` independent k-means codebooks on a deterministic sample.
    * Sampling is the same hash-ranked order as the IVF centroid pick —
    * reproducible with no stored state.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      k: Int = 16,
      iters: Int = 5,
      sampleN: Int = 4096): Model = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol).as("cid"), VectorFunctions.l2Normalize(col(vecCol)).as("v"))
      .orderBy(xxhash64(col("cid")), col("cid"))
      .limit(sampleN)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    require(sample.nonEmpty, "empty training sample")
    val books = (0 until m).map { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloyd(sub, k, iters)
    }
    Model(dim, m, k, books)
  }

  /** Sequential (deterministic) Lloyd's with L2 assignment; empty cells
    * keep their previous centroid. Init = first k sample rows.
    */
  private def lloyd(xs: Array[Array[Double]], k: Int, iters: Int): IndexedSeq[Array[Double]] = {
    val d = xs.head.length
    var cents: Array[Array[Double]] = Array.tabulate(math.min(k, xs.length))(i => xs(i).clone)
    if (cents.length < k) cents = cents ++ Array.fill(k - cents.length)(cents.head.clone)
    for (_ <- 0 until iters) {
      val sums = Array.fill(k, d)(0.0)
      val cnts = Array.fill(k)(0L)
      xs.foreach { x =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0; var i = 0
          while (i < d) { val t = x(i) - cents(c)(i); dist += t * t; i += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        cnts(best) += 1
        var i = 0
        while (i < d) { sums(best)(i) += x(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (cnts(c) == 0) cents(c)
        else Array.tabulate(d)(i => sums(c)(i) / cnts(c)))
    }
    cents.toIndexedSeq
  }

  private def subvec(v: Column, model: Model, s: Int): Column =
    slice(v, s * model.dsub + 1, model.dsub)

  private def codewordLit(cw: Array[Double]): Column = array(cw.toIndexedSeq.map(lit): _*)

  /** Per-row code for subquantizer `s`: argmin L2 over the k literal
    * codewords (ties to the lower code — same array_min-over-structs shape
    * as the IVF assignment). Executable HOF spec for the native encoder;
    * no rounding needed: evaluation order is fixed per row, so the argmin
    * is deterministic as-is.
    */
  private def codeFor(v: Column, model: Model, s: Int): Column =
    array_min(array(model.codebooks(s).zipWithIndex.map { case (cw, j) =>
      struct(
        VectorFunctions.sqDist(subvec(v, model, s), codewordLit(cw)).as("d"),
        lit(j).as("code"))
    }: _*)).getField("code")

  /** Encode the corpus: id + `m` codes (array<int>). One scan, zero
    * shuffle; the output is the compressed index a production pipeline
    * would persist. Backed by the fused codegen
    * [[graft.functions.PqEncode]] (the HOF form measured ~8 s/run at
    * sf0.01 with m=16·k=32 — interpreted m·k sqDist towers per row).
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    graft.sources.Tables.spread(corpus).select(
      col(idCol).as("neighbor_id"),
      graft.functions.PqEncode.pqEncode(col(vecCol), model.flatBooks, model.m, model.k).as("codes"))

  /** Interpreted HOF encoder — the executable specification
    * [[graft.functions.PqEncode]] is pinned against in PQSpec.
    */
  def encodeHof(corpus: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    corpus
      // stage the normalized vector ONCE — inlining it into every one of
      // the m·k codeword distances would recompute the norm m·k times
      .select(col(idCol).as("neighbor_id"), VectorFunctions.l2Normalize(col(vecCol)).as("_nv"))
      .select(
        col("neighbor_id"),
        array((0 until model.m).map(s => codeFor(col("_nv"), model, s)): _*).as("codes"))

  /** The per-query ADC table: entry s·k + j = exact squared L2 between
    * query subvector s and codeword j. m·k doubles per query, computed
    * once in a projection over the (small) query set.
    */
  private def adcTable(v: Column, model: Model): Column =
    graft.functions.PqAdcTable.pqAdcTable(v, model.flatBooks, model.m, model.k)

  /** The Column-expression executable spec [[adcTable]] replaced (m·k
    * literal-codeword sqDist exprs — ~10k plan nodes at m=16,k=32, whose
    * analysis alone cost ~2 s of driver time per recall query). Kept as
    * the equivalence pin for PqAdcTable in PQSpec; not on any query path.
    */
  private[graft] def adcTableHof(v: Column, model: Model): Column =
    array((0 until model.m).flatMap(s =>
      model.codebooks(s).map(cw => VectorFunctions.sqDist(subvec(v, model, s), codewordLit(cw)))): _*)

  /** Approximate top-`kNN` by ADC shortlist + exact cosine rerank.
    *
    * Plan: encode corpus (scan 1, no shuffle) → broadcast queries with
    * their ADC tables → per-pair score = m lookups (codegen `element_at`)
    * → per-query `shortlist` by (rounded adc, id) → broadcast the
    * shortlist ids back over the corpus to fetch true vectors (scan 2,
    * broadcast semi-shape join, still no corpus shuffle) → exact cosine →
    * top-kNN. Determinism: adc scores round to 9 dp with id tie-breaks;
    * rerank uses the same rounded-cosine ordering as bruteTopK.
    */
  /** IVF-PQ — the production composition (FAISS IVFPQ shape): a coarse
    * quantizer routes every vector to one of `cents.length` cells (per-row
    * argmax over the broadcast centroid array, fused into the scan), PQ
    * codes compress the residual scan, and search touches only the
    * `nProbe` cells nearest each query — ADC-scored, then exactly
    * reranked. Versus [[adcTopK]]'s full-corpus ADC pass, the candidate
    * join is a (cell) equi-join scoring ~nProbe/nLists of the corpus;
    * versus [[Similarity.ivfTopKWith]]'s exact in-cell scoring, each
    * candidate costs m table lookups instead of a dim-wide cosine and the
    * scanned index is codes (4-16 B/row), not float vectors. Both
    * approximations compound, so the recall gate (x_ivfpq_recall) is the
    * contract that the composition still clears the bar.
    */
  def ivfAdcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNN: Int,
      cents: IndexedSeq[Array[Double]],
      nProbe: Int,
      model: Model,
      shortlist: Int): DataFrame = {
    // the persisted index shape: id, coarse cell, PQ codes — one projection
    val corpusIdx = graft.sources.Tables.spread(corpus).select(
      col(idCol).as("neighbor_id"),
      Similarity.bestCell(col(vecCol), cents).getField("cell").as("cell"),
      graft.functions.PqEncode.pqEncode(col(vecCol), model.flatBooks, model.m, model.k).as("codes"))
    // queries: nProbe nearest cells each, ADC table + true vector along
    val probed = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("v_q"),
        VectorFunctions.l2Normalize(col(vecCol)).as("_nq"))
      .select(col("query_id"), col("v_q"), adcTable(col("_nq"), model).as("adc"),
        explode(slice(array_sort(array(cents.zipWithIndex.map { case (c, i) =>
          struct(
            negate(round(VectorFunctions.cosine(col("v_q"), Similarity.centLit(c)), 6)).as("negsim"),
            lit(i).as("cell"))
        }: _*)), 1, nProbe)).as("sc"))
      .select(col("query_id"), col("v_q"), col("adc"), col("sc").getField("cell").as("cell"))
    val mK = model.k
    val adcScore = (0 until model.m)
      .map(s => element_at(col("adc"), lit(s * mK) + element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val wShort = Window.partitionBy(col("query_id")).orderBy(round(col("adc_d"), 9).asc, col("neighbor_id").asc)
    val short = corpusIdx
      .join(broadcast(probed.select("query_id", "adc", "cell")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_d", adcScore)
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortlist)
      .select("query_id", "neighbor_id")
    val fetched = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"))
      .join(broadcast(short), Seq("neighbor_id"))
    val rer = fetched
      .join(broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("v_q"))), Seq("query_id"))
      .withColumn("score", VectorFunctions.cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    rer
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNN)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }

  def adcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      kNN: Int,
      model: Model,
      shortlist: Int): DataFrame = {
    val codes = encode(corpus, idCol, vecCol, model)
    val q = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("v_q"),
        VectorFunctions.l2Normalize(col(vecCol)).as("_nq"))
      .select(col("query_id"), col("v_q"), adcTable(col("_nq"), model).as("adc"))
    val mK = model.k
    val adcScore = (0 until model.m)
      .map(s => element_at(col("adc"), lit(s * mK) + element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    val wShort = Window.partitionBy(col("query_id")).orderBy(round(col("adc_d"), 9).asc, col("neighbor_id").asc)
    val short = codes
      .join(broadcast(q.select("query_id", "adc")), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_d", adcScore)
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortlist)
      .select("query_id", "neighbor_id")
    // rerank: fetch true vectors for shortlist ids only (broadcast join —
    // the corpus is filtered, never shuffled), exact cosine, final top-k
    val fetched = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"))
      .join(broadcast(short), Seq("neighbor_id"))
    val rer = fetched
      .join(broadcast(q.select("query_id", "v_q")), Seq("query_id"))
      .withColumn("score", VectorFunctions.cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    rer
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNN)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }
}
