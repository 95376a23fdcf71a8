package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (north-star extension, SURVEY.md §2.10): tokenization, fingerprinting,
  * quality scoring, language-ID.
  *
  * Everything here is built from `org.apache.spark.sql.functions` — 100%
  * whole-stage-codegen, no UDFs — so each is a per-row map over the scan
  * with zero shuffles; at 100 TB these run at parquet-read speed.
  *
  * Every function mirrors an ANSI-SQL formulation exactly (see
  * SparkEntry.oracleSql) so results are oracle-checkable bit-for-bit.
  */
object TextFunctions {

  /** Collapse runs of whitespace to single spaces and trim. */
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Whitespace tokens of the normalized text. "" tokenizes to [""] (size 1)
    * — matches DuckDB string_split; callers guard if they need 0.
    */
  def tokens(text: Column): Column = split(normalizeWs(text), " ")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: count of alphanumeric runs + count of
    * non-space punctuation marks (each punctuation mark is its own token,
    * as byte-pair encoders typically do).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(normalizeWs(text), lit("[A-Za-z0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  /** Document fingerprint: md5 of the case-folded, whitespace-normalized
    * text. Exact-dup detection key.
    */
  def fingerprint(text: Column): Column = md5(lower(normalizeWs(text)))

  /** Ratio of punctuation characters to total characters (0 when empty). */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / len.cast("double"))
  }

  /** English-ish stopword list shared with the oracle SQL. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(stops.cast("double") / size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: half stopword naturalness, half
    * length adequacy (saturating at 200 tokens). Deterministic, documented,
    * oracle-checkable — a stand-in for model-based quality classifiers.
    */
  def qualityScore(text: Column): Column =
    round(stopwordRatio(text) * lit(0.5) + least(tokenCount(text), lit(200)).cast("double") / lit(400.0), 4)

  /** Per-language marker-word profiles for the n-gram-heuristic language ID.
    * Real stopword markers; scored by occurrence count. CJK is detected by
    * script range first.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "fr" -> Seq(" le ", " la ", " et ", " les "),
    "es" -> Seq(" el ", " los ", " que ", " y "),
    "de" -> Seq(" der ", " und ", " die ", " das ")
  )

  /** Non-overlapping occurrence count of each marker, summed — computed as
    * length-difference arithmetic so the SQL oracle can use the exact same
    * formula (`(len(p) - len(replace(p, m, ''))) / len(m)`).
    */
  private def markerHits(padded: Column, markers: Seq[String]): Column =
    markers
      .map(m => (length(padded) - length(replace(padded, lit(m), lit("")))) / lit(m.length))
      .reduce(_ + _)

  /** Heuristic language ID: CJK script ⇒ zh; else argmax of marker-word
    * hits with deterministic tie order (en > fr > es > de); no hits ⇒ 'und'.
    *
    * Implementation note: the padded text and per-language hit counts are
    * bound ONCE via `with_fields`-style struct locals — naive inlining
    * duplicates the normalize+replace chain ~50× and blows the 64 KB
    * whole-stage-codegen method limit (observed), falling back to the
    * interpreted path. Binding through a struct keeps each subexpression
    * evaluated once and the final CASE tiny.
    */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(normalizeWs(text)), lit(" "))
    val hits = langMarkers.map { case (lang, ms) => lang -> markerHits(padded, ms) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best && h > 0, lit(lang)).otherwise(acc)
    }
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh")).otherwise(pick)
  }

  /** Dataframe-level language ID: like [[langId]] but staged through
    * intermediate projections so the padded text and the four hit counts
    * are each computed ONCE per row. The fully-inlined [[langId]] column
    * duplicates the normalize chain ~50× and exceeds the 64 KB
    * whole-stage-codegen method limit (observed at sf0.001); the staged
    * form stays inside codegen. Output: input columns + `lang_pred`.
    */
  def withLangId(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    val orig = df.columns.map(col).toSeq
    val staged = df
      .withColumn("__lid_p", concat(lit(" "), lower(normalizeWs(col(textCol))), lit(" ")))
      .withColumn("__lid_cjk", col(textCol).rlike("[\\u4e00-\\u9fff]"))
    val withHits = langMarkers.foldLeft(staged) { case (d, (lang, ms)) =>
      d.withColumn(s"__lid_$lang", markerHits(col("__lid_p"), ms))
    }
    val h = (l: String) => col(s"__lid_$l")
    val best = langMarkers.map { case (l, _) => h(l) }.reduce((a, b) => greatest(a, b))
    val pick = langMarkers.foldRight(lit("und")) { case ((lang, _), acc) =>
      when(h(lang) === best && h(lang) > 0, lit(lang)).otherwise(acc)
    }
    withHits
      .withColumn("lang_pred", when(col("__lid_cjk"), lit("zh")).otherwise(pick))
      .select((orig :+ col("lang_pred")): _*)
  }

  /** Rolling (chained) hash over tokens — an order-sensitive document
    * fingerprint: acc' = xxhash64(acc, token). Unlike a polynomial *31
    * rolling hash, the chained form can't overflow (ANSI mode turns long
    * overflow into an error), and stays a single left-to-right pass.
    */
  def rollingHash(text: Column): Column =
    aggregate(
      tokens(text),
      lit(0L),
      (acc, t) => xxhash64(acc, t)
    )

  /** All word n-grams of the text IN ORDER (duplicates kept — the
    * distinct form is `Dedup.shingles`); whole text as one gram when
    * shorter than n tokens. Native codegen kernel ([[WordNgrams]]) — a
    * pure per-row projection, no explode, no shuffle.
    */
  def ngramsAll(text: Column, n: Int): Column =
    WordNgrams.wordNgrams(tokens(text), n)

  /** Overlapping token-window chunks (RAG/embedding prep): windows of
    * `chunkSize` tokens advancing by `stride` (< chunkSize ⇒ overlap of
    * chunkSize−stride tokens), the last window truncated; a document
    * shorter than one window yields one chunk. Pure per-row
    * `transform(sequence(...))` — chunking a 100 TB corpus is a map over
    * the scan, no explode until the caller flattens.
    */
  def chunkTokens(text: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks = tokens(text)
    val n = size(toks)
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise(floor((n - lit(chunkSize) + lit(stride - 1)).cast("double") / lit(stride)).cast("int") + 1)
    transform(sequence(lit(0), nChunks - 1),
      i => concat_ws(" ", slice(toks, i * stride + 1, lit(chunkSize))))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03): hash every word `k`-gram, slide a window of `w`
    * consecutive hashes, keep each window's minimum — guaranteeing any
    * shared run of `w + k - 1` tokens between two documents shares at
    * least one fingerprint, at ~2/(w+1) the density of full k-gram
    * hashing. The hash is the 24-bit md5 prefix ([[graft.ext.Mixture]]
    * uniformizer) so the oracle reproduces it bit-for-bit.
    *
    * Pure per-row HOF projection — fingerprinting a 100 TB corpus is a
    * map over the scan; matching is then an equi-join on (fp) at
    * fingerprint density, not gram density. Output: sorted distinct
    * fingerprints.
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 1, s"need k > 0 and w > 1, got k=$k w=$w")
    // hot path: the hash + sliding-min + sort-distinct loops run in ONE
    // codegen kernel over the (native) gram array — the HOF tower below
    // is interpreted and was x_winnow_pairs' dominant task time; see
    // WinnowMins for the equivalence contract (pinned in
    // TextFunctionsSpec against [[winnowFingerprintsHof]])
    WinnowMins.winnowMins(ngramsAll(text, k), w)
  }

  /** The interpreted HOF executable spec [[winnowFingerprints]] replaced —
    * kept as the equivalence pin for [[WinnowMins]]; not on a query path.
    */
  private[graft] def winnowFingerprintsHof(text: Column, k: Int, w: Int): Column = {
    require(k > 0 && w > 1, s"need k > 0 and w > 1, got k=$k w=$w")
    val hashes = transform(ngramsAll(text, k),
      g => conv(substring(md5(g), 1, 6), 16, 10).cast("long"))
    val nh = size(hashes)
    val mins = when(nh <= w, array(array_min(hashes)))
      .otherwise(transform(sequence(lit(1), nh - lit(w - 1)),
        i => array_min(slice(hashes, i, lit(w)))))
    array_sort(array_distinct(mins))
  }

  /** Character-level Shannon entropy (nats) of the case-folded non-space
    * text — a gibberish/degeneracy quality signal: natural prose sits in a
    * band, while single-char spam (H→0) and uniform-random noise (H→ln
    * alphabet) fall outside it. Computed per-row with HOFs — distinct
    * chars, per-char counts via filter+size, and the Σc·ln(c) fold over
    * the SORTED distinct list so both engines sum in the same order —
    * H = ln(n) − Σc·ln(c)/n, rounded to 4. Zero shuffle; quality-scoring
    * a 100 TB corpus is a map over the scan.
    */
  def charEntropy(text: Column): Column = {
    val chars = regexp_extract_all(lower(normalizeWs(text)), lit("[^ ]"), lit(0))
    val n = size(chars)
    val sumClogc = aggregate(
      array_sort(array_distinct(chars)),
      lit(0.0),
      (acc, c) => {
        val cnt = size(filter(chars, x => x === c)).cast("double")
        acc + cnt * log(cnt)
      })
    when(n === 0, lit(0.0))
      .otherwise(round(log(n.cast("double")) - sumClogc / n.cast("double"), 4))
  }

  /** Gopher rule battery (Rae et al. 2021, §A1.1 quality heuristics) —
    * the canonical pre-training document filter, as per-row metrics plus
    * per-rule flags so a pipeline can audit WHY a document fell:
    *
    *  - n_words in [50, 100000]           (ok_words)
    *  - mean word length in [3, 10]       (ok_mean_len)
    *  - symbol-to-word ratio ('#', '...') < 0.1   (ok_symbols)
    *  - fraction of words with an alphabetic char > 0.8  (ok_alpha)
    *  - >= 2 stopword occurrences          (ok_stops)
    *
    * (The line-level bullet/ellipsis rules need line structure this
    * newline-free corpus lacks; [[repetitionRatio]] covers the repetition
    * section.) Everything is a per-row codegen'd projection — filtering a
    * 100 TB corpus is a map over the scan, zero shuffle. Occurrence counts
    * use the length-difference form so the SQL oracle is bit-identical.
    * Output: input columns + n_words, mean_word_len, symbol_ratio,
    * alpha_frac, n_stop, the five flags, and `pass` (AND of all five).
    */
  def withGopherRules(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = tokens(col(textCol))
    val nHash = length(col(textCol)) - length(replace(col(textCol), lit("#"), lit("")))
    val nEll = (length(col(textCol)) - length(replace(col(textCol), lit("..."), lit("")))) / lit(3)
    df.withColumn("n_words", size(toks))
      .withColumn("mean_word_len",
        round(aggregate(toks, lit(0), (a, t) => a + length(t)).cast("double") /
          col("n_words").cast("double"), 4))
      .withColumn("symbol_ratio",
        round((nHash + nEll).cast("double") / col("n_words").cast("double"), 4))
      .withColumn("alpha_frac",
        round(size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double") /
          col("n_words").cast("double"), 4))
      .withColumn("n_stop", size(filter(toks, t => t.isin(stopwords.map(lit): _*))))
      .withColumn("ok_words", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("ok_mean_len", col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("ok_symbols", col("symbol_ratio") < 0.1)
      .withColumn("ok_alpha", col("alpha_frac") > 0.8)
      .withColumn("ok_stops", col("n_stop") >= 2)
      .withColumn("pass",
        col("ok_words") && col("ok_mean_len") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stops"))
  }

  /** Gopher-style intra-document repetition signal: the fraction of word
    * n-gram SLOTS occupied by a repeat of an earlier n-gram —
    * `1 - distinct/total`. 0.0 = no internal repetition, →1.0 = the
    * document is one phrase looped. Boilerplate, scraped nav menus and
    * degenerate generations all light this up; training pipelines filter
    * on it (Rae et al., Gopher §A1.1 "repetition" rules). Single rounded
    * division — IEEE-identical in any engine.
    */
  def repetitionRatio(text: Column, n: Int): Column = {
    val grams = ngramsAll(text, n)
    round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"), 4)
  }
}
