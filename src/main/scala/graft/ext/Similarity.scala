package graft.ext

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
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
    // coarse quantizer: nLists hash-ranked corpus vectors as centroids
    val centroids = corpus
      .select(col(idCol).as("centroid_id"), col(vecCol).as("cv"))
      .orderBy(xxhash64(col("centroid_id")), col("centroid_id"))
      .limit(nLists)
    def assign(df: DataFrame, outId: String, vOut: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col(outId)).orderBy(
        round(col("__sim"), 6).desc, col("centroid_id").asc)
      df.select(col(idCol).as(outId), col(vecCol).as(vOut))
        .join(broadcast(centroids), lit(true))
        .withColumn("__sim", cosine(col(vOut), col("cv")))
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= n)
        .select(col(outId), col(vOut), col("centroid_id").as("cell"))
    }
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
}
