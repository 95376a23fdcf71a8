package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization as a pure Column composition — the crawl-pipeline
  * normalization pass (RFC 3986 §6) that makes URL-keyed dedup and
  * frontier joins work: the same resource fetched as
  * `HTTP://ExAmPle.COM:80/a/./b#frag` and `http://example.com/a/b` must
  * hash to one key. Every rule is built from codegen'd native functions
  * (lower/substring_index/regexp_replace/array_sort) so the pass fuses
  * into the scan — no UDF, no shuffle, no driver round-trip at any
  * corpus size.
  *
  * Rules applied (the standard normalizations that preserve semantics):
  *   - scheme and host lowercased (§6.2.2.1)
  *   - default port stripped (`:80` for http, `:443` for https)
  *   - dot-segments resolved: `/./` removed, `/seg/../` collapsed (§6.2.2.3)
  *   - fragment dropped (never sent to the server)
  *   - query parameters sorted byte-lexicographically (the conventional
  *     extra step crawl dedup uses; parameter ORDER is almost never
  *     semantic, and sorting makes equal parameter SETS compare equal)
  */
object UrlFunctions {

  /** Scheme of `url`, lowercased. */
  def scheme(url: Column): Column = lower(substring_index(url, "://", 1))

  /** authority (host[:port]) — the text between "://" and the first "/". */
  private def hostPort(noFrag: Column): Column =
    substring_index(substring_index(noFrag, "://", -1), "/", 1)

  /** path + optional query — everything after the authority. */
  private def pathQuery(noFrag: Column): Column = {
    val rest = substring_index(noFrag, "://", -1)
    rest.substr(length(hostPort(noFrag)) + 1, length(rest))
  }

  private def explicitPort(noFrag: Column): Column = {
    val hp = hostPort(noFrag)
    when(instr(hp, ":") > 0, substring_index(hp, ":", -1)).otherwise(lit(""))
  }

  private def isDefaultPort(sch: Column, port: Column): Column =
    (sch === "http" && port === "80") || (sch === "https" && port === "443")

  /** The canonical form of `url` (see object doc for the rule set).
    * Expects scheme://host[:port]/path[?query][#fragment] shapes.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val sch = scheme(noFrag)
    val host = lower(substring_index(hostPort(noFrag), ":", 1))
    val port = explicitPort(noFrag)
    val portPart = when(port === "" || isDefaultPort(sch, port), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathQ = pathQuery(noFrag)
    val path = substring_index(pathQ, "?", 1)
    val q = when(instr(pathQ, "?") > 0, substring_index(pathQ, "?", -1)).otherwise(lit(""))
    // FULL RFC 3986 §5.2.4 remove_dot_segments as a native HOF fold —
    // exact at ANY nesting depth (a fixed regex pass caps out; a crawl
    // URL can stack arbitrarily) and therefore idempotent, which the
    // property battery pins. Segment walk: "." drops; ".." pops (a
    // no-op at root, per the RFC); anything else — including empty
    // segments from "//" — pushes. A trailing "." or ".." resolves to
    // the DIRECTORY: appending "/" first makes it an inner segment and
    // the empty tail segment carries the trailing slash through.
    val resolved = {
      val p2 = when(path.rlike("/\\.\\.?$"), concat(path, lit("/"))).otherwise(path)
      val segs = split(p2, "/")
      val folded = aggregate(
        slice(segs, lit(2), greatest(size(segs) - 1, lit(0))), // drop the pre-root ""
        array().cast("array<string>"),
        (acc, seg) =>
          when(seg === ".", acc)
            .when(seg === "..", slice(acc, lit(1), greatest(size(acc) - 1, lit(0))))
            .otherwise(concat(acc, array(seg))))
      when(path === "", lit("")) // host-only URL: no path to normalize
        .otherwise(concat(lit("/"), array_join(folded, "/")))
    }
    val sortedQ = when(q === "", lit(""))
      .otherwise(concat(lit("?"), array_join(array_sort(split(q, "&")), "&")))
    concat(sch, lit("://"), host, portPart, resolved, sortedQ)
  }

  /** True when `url` carries a fragment. */
  def hasFragment(url: Column): Column = instr(url, "#") > 0

  /** True when `url` names its scheme's default port explicitly. */
  def hasDefaultPort(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    isDefaultPort(scheme(noFrag), explicitPort(noFrag))
  }

  /** Registrable domain (eTLD+1) of `host` under a public-suffix rule
    * set — the crawl primitive that groups `a.cdn.site.co.uk` and
    * `www.site.co.uk` into ONE site for politeness budgets, dedup keys
    * and per-site quotas. Implements the published publicsuffix.org
    * algorithm over a caller-supplied bounded rule sample: `exact`
    * suffix rules, `wildcard` PARENTS (a rule `*.ck` is passed as
    * "ck": any single label + ".ck" is a public suffix), and
    * `exception` rules (passed as the full rule host, e.g. "www.ck" —
    * its public suffix is the rule minus the leftmost label, beating
    * every other match). Longest (most-label) match wins; no match
    * falls back to the implicit `*` rule (the bare TLD). A host that
    * IS a public suffix has no registrable domain → null.
    *
    * Pure Column composition: `split`/`slice`/`array_join` build the
    * candidate label-suffixes per row (≤ label count, tiny),
    * `filter`/`transform`/`array_max` run the match — native HOF
    * expressions against BROADCAST-LITERAL rule arrays, zero UDF, zero
    * join, zero shuffle at any corpus size.
    */
  def registrableDomain(host: Column, exact: Seq[String],
      wildcard: Seq[String], exception: Seq[String]): Column = {
    val labels = split(host, "\\.")
    val nL = size(labels)
    val ps = psLabels(labels, nL, exact, wildcard, exception)
    when(nL > ps, array_join(slice(labels, nL - ps, ps + 1), "."))
      .otherwise(lit(null).cast("string"))
  }

  /** Public-suffix label count under the same rule set — the `ps`
    * [[registrableDomain]] derives, exposed for auditing.
    */
  def publicSuffixLabels(host: Column, exact: Seq[String],
      wildcard: Seq[String], exception: Seq[String]): Column = {
    val labels = split(host, "\\.")
    psLabels(labels, size(labels), exact, wildcard, exception)
  }

  /** The public-suffix label count of a split host — the single rule
    * evaluation both [[registrableDomain]] and [[publicSuffixLabels]]
    * build on, so a rule-semantics change can never drift the two.
    */
  private def psLabels(labels: Column, nL: Column, exact: Seq[String],
      wildcard: Seq[String], exception: Seq[String]): Column = {
    def suffixAt(i: Column): Column = array_join(slice(labels, i, nL - i + 1), ".")
    def litArr(xs: Seq[String]): Column =
      if (xs.isEmpty) array().cast("array<string>") else array(xs.map(lit): _*)
    val exArr = litArr(exact)
    val wcArr = litArr(wildcard)
    val xcArr = litArr(exception)
    val idxs = sequence(lit(1), nL)
    // exception rule: public suffix = the rule minus its leftmost label
    val excPs = array_max(transform(
      filter(idxs, i => array_contains(xcArr, suffixAt(i))), i => nL - i))
    val exactPs = array_max(transform(
      filter(idxs, i => array_contains(exArr, suffixAt(i))), i => nL - i + 1))
    // a wildcard parent one position to the right makes labels[i..] public
    // guard i < nL explicitly: sequence(1, nL - 1) DESCENDS for nL = 1
    val wcPs = array_max(transform(
      filter(idxs, i => i < nL && array_contains(wcArr, suffixAt(i + 1))),
      i => nL - i + 1))
    coalesce(excPs, greatest(coalesce(exactPs, lit(1)), coalesce(wcPs, lit(1))))
  }

  /** [[registrableDomain]] + [[publicSuffixLabels]] at PRODUCTION rule
    * scale — the real publicsuffix.org list is ~9,500 rules, where the
    * literal-array HOF form pays O(|rules|) per candidate label per row
    * (measured: see NOTES). This form is the broadcast-join shape that
    * holds at any rule count: each host explodes into its ≤ nLabels
    * candidate suffixes (tiny), ONE broadcast equi-join against the
    * rule table covers all three rule kinds (for a match at label
    * position i: exact → ps = nL-i+1, exception → ps = nL-i, wildcard →
    * the rule is the PARENT, so ps = nL-i+2 guarded by i ≥ 2), and a
    * partial-agg groupBy on the row key reduces candidates — the only
    * shuffle, carrying ints. Same semantics as the HOF form (the spec
    * pins agreement on the full rule-class battery).
    *
    * `rules` columns: `rule` (suffix text, no `*.`/`!` markers), `kind`
    * in exact|wildcard|exception. `df` must carry a unique `keyCol`.
    * Output: `(keyCol, hostCol, site, ps_labels)` — `site` null when
    * the host IS a public suffix. The rules join is LEFT so hosts with
    * no matching rule keep their candidate rows (implicit `*` rule),
    * which lets the host ride THROUGH the one groupBy instead of
    * re-joining `df` afterwards — the whole pass is broadcast-join +
    * one int-only shuffle, no sort-merge join anywhere (PlanSpec pins
    * it).
    */
  def registrableDomainJoined(df: DataFrame, keyCol: String, hostCol: String,
      rules: DataFrame): DataFrame = {
    val labels = split(col(hostCol), "\\.")
    val nL = size(labels)
    val cands = df.select(col(keyCol), col(hostCol), nL.as("n_l"),
        posexplode(transform(sequence(lit(1), nL),
          i => array_join(slice(labels, i, nL - i + 1), "."))))
      .withColumnRenamed("col", "suffix")
      .withColumn("i", col("pos") + 1).drop("pos")
    cands.join(broadcast(rules), col("suffix") === col("rule"), "left")
      .groupBy(col(keyCol), col(hostCol), col("n_l"))
      .agg(
        max(when(col("kind") === "exception", col("n_l") - col("i"))).as("exc_ps"),
        max(when(col("kind") === "exact", col("n_l") - col("i") + 1)
          .when(col("kind") === "wildcard" && col("i") >= 2, col("n_l") - col("i") + 2))
          .as("match_ps"))
      .withColumn("ps_labels",
        coalesce(col("exc_ps"), greatest(coalesce(col("match_ps"), lit(1)), lit(1))))
      .withColumn("site",
        when(col("n_l") > col("ps_labels"),
          array_join(slice(split(col(hostCol), "\\."),
            col("n_l") - col("ps_labels"), col("ps_labels") + 1), "."))
          .otherwise(lit(null).cast("string")))
      .drop("exc_ps", "match_ps", "n_l")
  }

  /** SURT key (Sort-friendly URI Reordering Transform — the published
    * key format of OpenWayback / CommonCrawl CDX indexes) of `url`:
    * canonicalize (see [[canonicalizeUrl]]), drop the scheme, reverse
    * the host labels comma-joined, keep a non-default port, then `)`,
    * then the path+query LOWERCASED (CDX keys compare
    * case-insensitively on the path):
    * `HTTP://News.Example.COM:80/World/X?b=2&a=1` →
    * `com,example,news)/world/x?a=1&b=2`. Host-reversal makes one
    * site's captures — and one registrable domain's subdomains — a
    * CONTIGUOUS key range, which is what turns a URL predicate into a
    * byte-range prune over a sorted index. Pure Column composition on
    * top of the canonicalizer: zero UDF, zero shuffle.
    */
  def surtKey(url: Column): Column = {
    val canon = canonicalizeUrl(url)
    val rest = substring_index(canon, "://", -1)
    val hp = substring_index(rest, "/", 1)
    val host = substring_index(hp, ":", 1)
    val port = when(instr(hp, ":") > 0,
      concat(lit(":"), substring_index(hp, ":", -1))).otherwise(lit(""))
    // Host-only URLs key as `host)/` — published SURT keys
    // (OpenWayback/CommonCrawl) always carry the path, so a root-page
    // capture must match the real index's `com,example)/` form.
    val rawPathQ = lower(rest.substr(length(hp) + 1, length(rest)))
    val pathQ = when(rawPathQ === "", lit("/")).otherwise(rawPathQ)
    concat(array_join(reverse(split(host, "\\.")), ","), port, lit(")"), pathQ)
  }

  /** Query-parameter count of `url` (0 when no query, INCLUDING the
    * bare-`?` empty query real crawl URLs carry).
    */
  def numParams(url: Column): Column = {
    val pathQ = pathQuery(substring_index(url, "#", 1))
    val q = substring_index(pathQ, "?", -1)
    when(instr(pathQ, "?") > 0 && q =!= "", size(split(q, "&")))
      .otherwise(lit(0))
  }
}
