package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** T5/UL2-style span-corruption planning — the denoising-objective prep
  * step of an LLM data pipeline: choose ~15% of each document's tokens as
  * fixed-length spans, collapse each chosen span to a sentinel in the
  * input, and emit the removed spans as the target sequence.
  *
  * Everything is a PURE PROJECTION over the token array (no shuffle, no
  * UDF): span starts come from a per-(doc, span) LCG hash — the same
  * engine-portable determinism trick as the stratified sampler — so the
  * corruption is reproducible across runs, engines, and partitionings,
  * which is what makes distributed training-data generation auditable.
  *
  * Span layout: the first k·S positions (S = n div k strata of one span
  * each, k = floor(n·rate/L) spans of length L) each contribute one span
  * at offset h(doc, j) mod (S − L + 1) inside stratum j; the tail stays
  * clean. k = 0 (short docs) means no corruption — emitted verbatim.
  */
object Denoise {

  private val A = 1103515245L
  private val C = 12345L
  private val M = 1000000007L

  /** Span-corruption columns for a doc id column and token-array column:
    * (n_tokens, n_spans, corrupted, targets). `rate` defaults to T5's
    * 0.15, `spanLen` to 3.
    */
  def spanCorrupt(docId: Column, toks: Column, rate: Double = 0.15, spanLen: Int = 3)
      : Seq[Column] = {
    val n = size(toks)
    val k = floor(n * lit(rate) / lit(spanLen)).cast("int")
    // `/` on Columns is DOUBLE division; floor+cast recovers the integer
    // quotient (exact: all values well under 2^53)
    val s = when(k > 0, floor(n / k).cast("long")).otherwise(lit(Long.MaxValue))
    // stratum j's span start (0-based token position)
    def start(j: Column): Column =
      j * s + pmod(docId * lit(A) + (j + 1) * lit(C), lit(M)) % (s - lit(spanLen) + 1)
    // position p's stratum, and whether p falls inside its stratum's span
    def masked(p: Column): Column = {
      val j = floor(p / s).cast("int")
      j < k && p >= start(j) && p < start(j) + lit(spanLen)
    }
    val positions = when(n > 0, sequence(lit(0L), n.cast("long") - 1))
      .otherwise(array().cast("array<bigint>"))
    val corrupted = array_join(
      filter(
        transform(positions, p =>
          when(!masked(p), element_at(toks, p.cast("int") + 1))
            .when(p === start(floor(p / s).cast("int")),
              concat(lit("<extra_id_"), floor(p / s).cast("int"), lit(">")))
            .otherwise(lit(""))),
        x => x =!= ""),
      " ")
    val targets = when(k > 0, array_join(
      transform(sequence(lit(0), k - 1),
        j => concat(lit("<extra_id_"), j, lit("> "),
          array_join(slice(toks, (start(j) + 1).cast("int"), lit(spanLen)), " "))),
      " ")).otherwise(lit(""))
    Seq(n.as("n_tokens"), k.as("n_spans"), corrupted.as("corrupted"), targets.as("targets"))
  }
}
