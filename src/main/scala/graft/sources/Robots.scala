package graft.sources

/** robots.txt (RFC 9309 Robots Exclusion Protocol) — the crawl-politeness
  * gate a frontier applies between URL canonicalization and fetch. This
  * is the minimal REAL grammar: `#` comments stripped, directives matched
  * case-insensitively, consecutive `User-agent` lines accumulate into one
  * group, `Disallow` rules bind to the group they follow, unknown
  * directives (Crawl-delay, Sitemap, Allow…) are skipped, and an empty
  * `Disallow:` value means "no rule" per the spec. [[disallowPrefixes]]
  * returns the path prefixes that bind to the wildcard agent `*` — the
  * rule set a generic crawler must honor.
  */
object Robots {

  /** Disallow path-prefixes for `User-agent: *` groups of `text`, in file
    * order. Groups addressed to named agents only are ignored (their
    * rules do NOT apply to a generic crawler).
    */
  def disallowPrefixes(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
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
              if (value.nonEmpty && agents.contains("*")) out += value
            case _ =>
              inAgentRun = false // any other directive ends the UA run
          }
        }
      }
    }
    out.toSeq
  }
}
