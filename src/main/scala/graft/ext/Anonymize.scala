package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity audit for training-data compliance (north-star extension):
  * before a corpus with quasi-identifier columns ships, every row must be
  * hidden in an equivalence class of at least k rows, or have its
  * identifying columns generalized until it is.
  *
  * The reference pipeline has no privacy stage (its documents are opaque
  * payloads, data-s3-elastic-transfer.py treats rows whole); this extends
  * the scrubbing family (PII redaction in [[Scrub]]) from free text to the
  * STRUCTURED side of a dataset.
  */
object Anonymize {

  /** Full-domain generalization ladder: level 0 keeps all of `qi`, each
    * next level suppresses the LAST remaining column (most-identifying
    * last), level `qi.length` suppresses everything. Each row gets the
    * smallest level whose full-domain equivalence class — the class of
    * rows agreeing on the KEPT prefix — reaches size >= k, plus the
    * generalized column values (`gen_<col>`, suppressed cells as "*").
    *
    * Full-domain semantics (class sizes computed over the whole table at
    * each level, not after removing rows that settled earlier) make every
    * row's level independent of every other row's OUTCOME — each level is
    * one aggregate, no iteration, no ordering sensitivity.
    *
    * Scale: one `groupBy` per ladder level, each bounded by the QI domain
    * cardinality (not the row count), broadcast-joined back onto the scan —
    * the data itself never shuffles, so the plan is |qi| bounded-size
    * aggregates + one map over the corpus regardless of table size.
    */
  def fullDomainLadder(df: DataFrame, qi: Seq[String], k: Int): DataFrame = {
    require(qi.nonEmpty && k > 0)
    val withCnts = qi.indices.foldLeft(df) { (acc, i) =>
      val kept = qi.take(qi.length - i)
      val cnt = df.groupBy(kept.map(col): _*).agg(count(lit(1)).as(s"_k_cnt$i"))
      acc.join(broadcast(cnt), kept, "left")
    }
    val level = qi.indices.reverse.foldLeft(lit(qi.length): Column) { (els, i) =>
      when(col(s"_k_cnt$i") >= k, lit(i)).otherwise(els)
    }
    val genCols = qi.zipWithIndex.map { case (c, j) =>
      // column j survives at level L iff it is inside the kept prefix:
      // j < qi.length - L
      when(col("anon_level") <= qi.length - 1 - j, col(c).cast("string"))
        .otherwise(lit("*")).as(s"gen_$c")
    }
    withCnts
      .withColumn("anon_level", level)
      .select(df.columns.map(col).toIndexedSeq ++ (col("anon_level") +: genCols): _*)
  }
}
