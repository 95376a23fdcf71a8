package graft.sources

/** robots.txt (RFC 9309 Robots Exclusion Protocol) — the crawl-politeness
  * gate a frontier applies between URL canonicalization and fetch. The
  * REAL grammar and the REAL precedence model: `#` comments stripped,
  * directives matched case-insensitively, consecutive `User-agent` lines
  * accumulate into one group, `Allow`/`Disallow` rules bind to the group
  * they follow, unknown directives (Crawl-delay, Sitemap…) are skipped,
  * and an empty rule value means "no rule" per the spec.
  *
  * Matching (RFC 9309 §2.2.2–2.2.3): a rule pattern is a path prefix in
  * which `*` matches any run of characters and `$` (final only) anchors
  * the end of the path. When several rules match a path, the MOST
  * SPECIFIC wins — the one with the longest pattern (octet count); an
  * Allow/Disallow tie at the same length resolves to Allow. No matching
  * rule → allowed. This is the precedence real sites depend on
  * (`Disallow: /` + `Allow: /public/` must crawl /public/), which a
  * Disallow-prefix-only reading over-blocks.
  */
object Robots {

  /** `(allows, disallows)` rule patterns binding to the wildcard agent
    * `*` in `text`, in file order. Groups addressed to named agents only
    * are ignored (their rules do NOT apply to a generic crawler); empty
    * rule values are "no rule" and dropped.
    */
  def ruleGroups(text: String): (Seq[String], Seq[String]) = {
    val allows = scala.collection.mutable.ArrayBuffer[String]()
    val disallows = scala.collection.mutable.ArrayBuffer[String]()
    var agents = Set.empty[String]
    var inAgentRun = false // consecutive User-agent lines extend ONE group
    text.split("\n", -1).foreach { raw =>
      val line = {
        val hash = raw.indexOf('#')
        (if (hash >= 0) raw.substring(0, hash) else raw).trim
      }
      if (line.nonEmpty) {
        val sep = line.indexOf(':')
        if (sep > 0) {
          val directive = line.substring(0, sep).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(sep + 1).trim
          directive match {
            case "user-agent" =>
              // a UA line after rules starts a NEW group; one inside an
              // unbroken UA run extends the current group
              agents = (if (inAgentRun) agents else Set.empty[String]) +
                value.toLowerCase(java.util.Locale.ROOT)
              inAgentRun = true
            case "disallow" =>
              inAgentRun = false
              if (value.nonEmpty && agents.contains("*")) disallows += value
            case "allow" =>
              inAgentRun = false
              if (value.nonEmpty && agents.contains("*")) allows += value
            case _ =>
              inAgentRun = false // any other directive ends the UA run
          }
        }
      }
    }
    (allows.toSeq, disallows.toSeq)
  }

  /** Disallow patterns for `User-agent: *` groups of `text`, in file
    * order — the rule LIST view ([[isAllowed]] is the decision view).
    */
  def disallowPrefixes(text: String): Seq[String] = ruleGroups(text)._2

  /** `Sitemap:` URLs declared in `text`, file order — the crawl
    * DISCOVERY hook (sitemaps.org / RFC 9309 §2.3 treats it as an
    * "other record": key case-insensitive, value an ABSOLUTE URL, and
    * the line binds to no group — it applies wherever it appears, even
    * inside a named agent's group). Comments strip like every other
    * line; values that aren't absolute http(s) URLs are dropped (the
    * protocol requires absolute; a relative value is noise, not a map).
    */
  def sitemapUrls(text: String): Seq[String] =
    text.split("\n", -1).iterator.flatMap { raw =>
      val line = {
        val hash = raw.indexOf('#')
        (if (hash >= 0) raw.substring(0, hash) else raw).trim
      }
      val sep = line.indexOf(':')
      if (sep > 0 &&
          line.substring(0, sep).trim.toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val value = line.substring(sep + 1).trim
        val lower = value.toLowerCase(java.util.Locale.ROOT)
        if (lower.startsWith("http://") || lower.startsWith("https://")) Some(value)
        else None
      } else None
    }.toSeq

  /** `Crawl-delay` (seconds) binding to the wildcard group — the
    * de-facto politeness extension (not in RFC 9309, honored by most
    * crawlers; Google ignores it, Bing/Yandex apply it). First valid
    * wildcard-group value wins; absent/garbled → None. Same group
    * grammar as [[ruleGroups]].
    */
  def crawlDelay(text: String): Option[Long] = {
    var agents = Set.empty[String]
    var inAgentRun = false
    var found: Option[Long] = None
    text.split("\n", -1).foreach { raw =>
      val line = {
        val hash = raw.indexOf('#')
        (if (hash >= 0) raw.substring(0, hash) else raw).trim
      }
      if (line.nonEmpty) {
        val sep = line.indexOf(':')
        if (sep > 0) {
          val directive = line.substring(0, sep).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(sep + 1).trim
          directive match {
            case "user-agent" =>
              agents = (if (inAgentRun) agents else Set.empty[String]) +
                value.toLowerCase(java.util.Locale.ROOT)
              inAgentRun = true
            case "crawl-delay" =>
              inAgentRun = false
              if (found.isEmpty && agents.contains("*"))
                found = value.toLongOption.filter(_ >= 0)
            case _ => inAgentRun = false
          }
        }
      }
    }
    found
  }

  /** RFC 9309 §2.2.3 pattern match: does `pattern` match `path`?
    * `*` matches any (possibly empty) run of characters; a FINAL `$`
    * anchors the match to the end of the path; everything else matches
    * literally from the start of the path. Iterative greedy wildcard
    * walk with single-character backtrack — O(|path|·segments), no
    * regex compilation in the per-URL hot path.
    */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    var pi = 0; var si = 0
    var starPi = -1; var starSi = -1
    while (si < path.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (pi >= pat.length && !anchored) {
        return true // pattern exhausted mid-path: prefix match
      } else if (starPi >= 0) {
        pi = starPi + 1; starSi += 1; si = starSi
      } else return false
    }
    // path exhausted: remaining pattern must be all '*'
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** RFC 9309 §2.2.2 precedence decision for `path` under the wildcard
    * group's rules: the longest matching pattern wins; an equal-length
    * Allow/Disallow tie is Allow; no match is allowed.
    */
  def isAllowed(allows: Seq[String], disallows: Seq[String], path: String): Boolean = {
    var bestAllow = -1
    allows.foreach(p => if (p.length > bestAllow && matches(p, path)) bestAllow = p.length)
    var bestDisallow = -1
    disallows.foreach(p => if (p.length > bestDisallow && matches(p, path)) bestDisallow = p.length)
    bestAllow >= bestDisallow
  }
}
