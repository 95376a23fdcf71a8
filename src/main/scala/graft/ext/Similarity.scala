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

  /** LSH-bucketed approximate top-k: only corpus vectors in the same
    * sign-random-projection bucket as the query are scored. Multi-probe via
    * `probes` extra buckets (flipping one bit) recovers recall lost to
    * boundary effects.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nBits: Int = 8,
      probes: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v_c"),
      srpBucket(col(vecCol), nBits).as("bucket"))
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("v_q"),
      srpBucket(col(vecCol), nBits).as("b0"))
    // multi-probe: the bucket itself plus `probes` single-bit flips
    val probeBuckets = array(
      (col("b0") +: (0 until probes).map(i => col("b0").bitwiseXOR(shiftleft(lit(1L), i)))): _*)
    val q = qb.select(col("query_id"), col("v_q"), explode(probeBuckets).as("bucket"))
    val scored = c
      .join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", cosine(col("v_q"), col("v_c")))
    val w = Window.partitionBy(col("query_id")).orderBy(round(col("score"), 6).desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("score"), 4).as("score"))
  }
}
