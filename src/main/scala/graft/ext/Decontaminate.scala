package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for LLM training-data pipelines (north-star
  * extension; SURVEY.md §2.10): remove from the training corpus every
  * document that shares at least one word n-gram with a held-out
  * benchmark/eval set — the standard guard against test-set leakage
  * (GPT-3-style n-gram overlap filtering).
  *
  * Scale design: the benchmark set is small by definition (eval suites are
  * thousands of documents, not billions), so its distinct n-gram set is
  * broadcast and the training corpus NEVER shuffles for candidate
  * generation: each training document's shingles are built per-row
  * ([[Dedup.shingles]] — `transform(sequence(...))`, no explode until the
  * probe), and the probe is a broadcast semi/inner join. The only exchange
  * in the whole pipeline is the final per-doc (or per-benchmark-doc)
  * count aggregation, which is hit rows only — a tiny fraction of the
  * corpus when contamination is rare, which is the operating point.
  *
  * If the benchmark set ever outgrows broadcast range, the same plan
  * degrades gracefully to a shuffled n-gram equi-join — semantics
  * unchanged, so no code change, just AQE picking sort-merge.
  */
object Decontaminate {

  /** Distinct word n-grams per document: doc_id, gram (exploded). */
  private def grams(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(Dedup.shingles(col(textCol), n)).as("gram"))

  /** Training documents sharing >=1 n-gram with the benchmark set.
    * Output: doc_id, n_hit_grams (count of DISTINCT offending n-grams in
    * that document).
    */
  def contaminatedDocs(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val bg = broadcast(grams(bench, idCol, textCol, n).select("gram").distinct())
    grams(graft.sources.Tables.spread(train), idCol, textCol, n)
      .join(bg, "gram") // broadcast hash join: corpus side never shuffles
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_grams")) // grams are distinct per doc already
  }

  /** The clean training set: `train` minus [[contaminatedDocs]]. */
  def decontaminate(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    train.join(
      contaminatedDocs(train, bench, idCol, textCol, n).select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Per-benchmark-document leakage audit: for each benchmark doc, how many
    * training docs share an n-gram with it and how many distinct
    * (train_doc, gram) hits those are. Benchmark docs with zero leakage
    * appear with zeros — the report row set is the benchmark set.
    * Output: bench_doc_id, n_contam_docs, n_hits.
    */
  def contaminationReport(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val bg = broadcast(
      grams(bench, idCol, textCol, n).select(col("doc_id").as("bench_doc_id"), col("gram")))
    val hits = grams(graft.sources.Tables.spread(train), idCol, textCol, n)
      .join(bg, "gram")
      .groupBy("bench_doc_id")
      .agg(count_distinct(col("doc_id")).as("n_contam_docs"),
        count_distinct(col("doc_id"), col("gram")).as("n_hits"))
    bench.select(col(idCol).as("bench_doc_id"))
      .join(hits, Seq("bench_doc_id"), "left")
      .select(col("bench_doc_id"),
        coalesce(col("n_contam_docs"), lit(0L)).as("n_contam_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }
}
