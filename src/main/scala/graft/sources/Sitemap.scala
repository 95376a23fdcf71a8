package graft.sources

/** XML sitemap parsing (sitemaps.org protocol) — the crawl DISCOVERY
  * step that feeds the frontier the robots gate then filters: an
  * `<urlset>` of `<url>` entries, each with a required `<loc>` and an
  * optional `<lastmod>`. The walker is a real tag scan (no regex, no DOM
  * load): whitespace-tolerant, order-independent within an entry,
  * unknown child tags (`<priority>`, `<changefreq>`) skipped, and any
  * `<url>` without a `<loc>` rejects the whole document as `None` — a
  * sitemap that breaks the protocol cannot be trusted entry-by-entry.
  */
object Sitemap {

  final case class Entry(loc: String, lastmod: String)

  /** Text content of the first `<tag>…</tag>` inside `xml[from, to)`,
    * trimmed; None when the tag is absent in that window.
    */
  private def tagText(xml: String, tag: String, from: Int, to: Int): Option[String] = {
    val open = xml.indexOf(s"<$tag>", from)
    if (open < 0 || open >= to) return None
    val start = open + tag.length + 2
    val close = xml.indexOf(s"</$tag>", start)
    if (close < 0 || close > to) return None
    Some(xml.substring(start, close).trim)
  }

  /** Parse a sitemap document into its entries (file order). None when
    * the root is not an urlset or any entry lacks its `<loc>`.
    */
  def parse(xml: String): Option[Seq[Entry]] = {
    if (!xml.contains("<urlset")) return None
    val out = scala.collection.mutable.ArrayBuffer[Entry]()
    var i = xml.indexOf("<url>")
    while (i >= 0) {
      val end = xml.indexOf("</url>", i)
      if (end < 0) return None
      val loc = tagText(xml, "loc", i, end).getOrElse(return None)
      val lastmod = tagText(xml, "lastmod", i, end).getOrElse("")
      out += Entry(loc, lastmod)
      i = xml.indexOf("<url>", end)
    }
    Some(out.toSeq)
  }

  /** Parse a `<sitemapindex>` document (sitemaps.org: how large sites
    * actually ship sitemaps — an index of child sitemap files, each
    * capped at 50k URLs) into the child `<loc>`s, file order. Same
    * strictness as [[parse]]: unknown children (`<lastmod>`…) are
    * skipped, a `<sitemap>` entry without `<loc>` rejects the document.
    */
  def parseIndex(xml: String): Option[Seq[String]] = {
    if (!xml.contains("<sitemapindex")) return None
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = xml.indexOf("<sitemap>")
    while (i >= 0) {
      val end = xml.indexOf("</sitemap>", i)
      if (end < 0) return None
      out += tagText(xml, "loc", i, end).getOrElse(return None)
      i = xml.indexOf("<sitemap>", end)
    }
    Some(out.toSeq)
  }

  /** Crawl-discovery resolution from either root: an `<urlset>` yields
    * its entries directly; a `<sitemapindex>` resolves ONE level — each
    * child loc is fetched through `fetch` and must parse as an urlset
    * (the protocol forbids index-of-index nesting). Every entry is
    * tagged with the child sitemap loc it came from ("" for a direct
    * urlset). None bubbles from any malformed document or failed fetch —
    * a discovery tree that breaks the protocol cannot be trusted
    * branch-by-branch.
    */
  def resolve(xml: String, fetch: String => Option[String]): Option[Seq[(String, Entry)]] =
    if (xml.contains("<sitemapindex")) {
      parseIndex(xml).flatMap { locs =>
        val out = scala.collection.mutable.ArrayBuffer[(String, Entry)]()
        locs.foreach { loc =>
          val child = fetch(loc).getOrElse(return None)
          if (child.contains("<sitemapindex")) return None // no index-of-index
          parse(child).getOrElse(return None).foreach(e => out += ((loc, e)))
        }
        Some(out.toSeq)
      }
    } else parse(xml).map(_.map(("", _)))
}
