package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus scrubbing for LLM training-data pipelines (north-star extension;
  * SURVEY.md §2.10): PII redaction and cross-document boilerplate removal —
  * the two cleanup passes every web-scale corpus gets before training
  * (C4/RefinedWeb-style line dedup, plus regex PII masking).
  *
  * Scale design:
  *  - [[redactPii]] is a pure per-row projection (codegen'd regexp builtins,
  *    no UDFs) — redacting a 100 TB corpus is one map over the scan, zero
  *    shuffles, zero state.
  *  - [[removeBoilerplate]] follows the [[Decontaminate]] shape: the only
  *    corpus-wide exchange is the segment doc-frequency aggregation
  *    (map-side combined; segment space is bounded by corpus vocabulary).
  *    The hot-segment set — actual boilerplate, small by construction since
  *    each entry must repeat across `minDf`+ documents — joins back
  *    broadcast, and the text rebuild is a per-row array filter, never a
  *    corpus regroup.
  *
  * All patterns/formulas are RE2/Java-portable (no lookaround, no
  * backreferences) so the DuckDB oracle runs the exact same semantics.
  */
object Scrub {

  /** Email pattern — local@domain.tld, ASCII. */
  val emailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded; no octet-range check — redaction
    * prefers false positives over leaks).
    */
  val ipv4Re: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style phone: 555-123-4567 (word-bounded). */
  val phoneRe: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Count and mask PII in one scan-fused projection. Counts are taken on
    * the ORIGINAL text (audit trail), then masks apply email → IP → phone.
    * Output: input columns with `textCol` replaced by its redacted form,
    * plus n_emails / n_ips / n_phones.
    */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(re: String) = size(regexp_extract_all(t, lit(re), lit(0)))
    df.withColumn("n_emails", n(emailRe))
      .withColumn("n_ips", n(ipv4Re))
      .withColumn("n_phones", n(phoneRe))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, emailRe, "<EMAIL>"),
            ipv4Re, "<IP>"),
          phoneRe, "<PHONE>"))
  }

  /** Consecutive non-overlapping `m`-token segments of the text (last one
    * truncated) — the "lines" of a newline-free corpus. Per-row
    * `transform(sequence(...))`, no explode, no shuffle.
    */
  def segments(text: Column, m: Int): Column = {
    require(m > 0, s"segment length must be positive, got $m")
    val toks = TextFunctions.tokens(text)
    transform(
      sequence(lit(0), ceil(size(toks).cast("double") / lit(m)).cast("int") - 1),
      i => concat_ws(" ", slice(toks, i * m + 1, lit(m))))
  }

  /** Segments appearing in >= `minDf` distinct documents — the boilerplate
    * vocabulary. One map-side-combined aggregation over per-doc DISTINCT
    * segments. Output: seg, df.
    */
  def hotSegments(docs: DataFrame, idCol: String, textCol: String, m: Int, minDf: Int): DataFrame =
    graft.sources.Tables.spread(docs)
      .select(col(idCol).as("doc_id"), explode(array_distinct(segments(col(textCol), m))).as("seg"))
      .groupBy("seg")
      .agg(count(lit(1)).as("df")) // segments are distinct per doc already
      .filter(col("df") >= minDf)

  /** Drop every hot segment from every document (RefinedWeb/C4-style
    * repeated-line removal, adapted to token segments). The hot set is
    * broadcast into the membership probe; only HIT (doc, seg) pairs are
    * aggregated; the rebuild is a per-row array filter against that doc's
    * own bad-segment list. The corpus text never shuffles.
    * Output: input columns + n_segs, n_removed, with `textCol` rebuilt from
    * the surviving segments in order.
    */
  def removeBoilerplate(
      docs: DataFrame, idCol: String, textCol: String, m: Int, minDf: Int): DataFrame = {
    val hot = hotSegments(docs, idCol, textCol, m, minDf).select("seg")
    val contam = graft.sources.Tables.spread(docs)
      .select(col(idCol).as("doc_id"), explode(array_distinct(segments(col(textCol), m))).as("seg"))
      .join(broadcast(hot), "seg") // broadcast hash join: corpus side never shuffles
      .groupBy("doc_id")
      .agg(collect_set(col("seg")).as("__bad")) // hit rows only — tiny at the operating point
    val rebuilt = docs
      .join(contam.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .withColumn("__bad", coalesce(col("__bad"), array().cast("array<string>")))
      .withColumn("__segs", segments(col(textCol), m))
      .withColumn("n_segs", size(col("__segs")))
      .withColumn("__kept", filter(col("__segs"), s => !array_contains(col("__bad"), s)))
      .withColumn("n_removed", col("n_segs") - size(col("__kept")))
      .withColumn(textCol, concat_ws(" ", col("__kept")))
    rebuilt.drop("__bad", "__segs", "__kept")
  }
}
