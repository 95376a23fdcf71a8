package graft.functions

import org.apache.spark.sql.Column
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
    // dot-segment resolution: drop /./ then collapse one /seg/../ level;
    // applied twice so two stacked levels still resolve (crawl URLs
    // beyond that depth are pathological — canonicalize what's real).
    // TRAILING dot-segments (".../." and ".../seg/..", no slash after)
    // resolve to the directory per RFC 3986 §5.2.4 remove_dot_segments.
    def resolveOnce(p: Column): Column =
      regexp_replace(regexp_replace(p, "/\\./", "/"), "/[^/.][^/]*/\\.\\./", "/")
    def resolveTrailing(p: Column): Column =
      regexp_replace(regexp_replace(p, "/[^/.][^/]*/\\.\\.$", "/"), "/\\.$", "/")
    val resolved = resolveTrailing(resolveOnce(resolveOnce(path)))
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
