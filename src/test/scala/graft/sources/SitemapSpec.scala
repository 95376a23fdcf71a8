package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the sitemap tag walker: whitespace tolerance, decoy children,
  * tag order independence, optional lastmod, and whole-document
  * rejection on protocol violations.
  */
class SitemapSpec extends AnyFunSuite {

  test("parses entries with decoy children, whitespace and reordered tags") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>  http://a/1  </loc>
        |    <priority>0.8</priority>
        |    <lastmod>2026-08-01</lastmod>
        |  </url>
        |  <url><lastmod>2026-08-02</lastmod><loc>http://a/2</loc></url>
        |  <url><loc>http://a/3</loc></url>
        |</urlset>
        |""".stripMargin
    val Some(es) = Sitemap.parse(xml)
    assert(es === Seq(
      Sitemap.Entry("http://a/1", "2026-08-01"),
      Sitemap.Entry("http://a/2", "2026-08-02"),
      Sitemap.Entry("http://a/3", "")))
  }

  test("rejects non-urlset roots, loc-less entries and unterminated entries") {
    assert(Sitemap.parse("<rss><url><loc>x</loc></url></rss>") === None)
    assert(Sitemap.parse("<urlset><url><lastmod>2026-08-01</lastmod></url></urlset>") === None)
    assert(Sitemap.parse("<urlset><url><loc>x</loc>") === None)
    // empty urlset is legal: zero entries
    assert(Sitemap.parse("<urlset></urlset>") === Some(Seq()))
  }

  test("sitemapindex parses child locs; decoy children skipped; loc-less entry rejects") {
    val xml =
      """<?xml version="1.0"?>
        |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc> http://a/s1.xml </loc><lastmod>2026-08-01</lastmod></sitemap>
        |  <sitemap><loc>http://a/s2.xml</loc></sitemap>
        |</sitemapindex>
        |""".stripMargin
    assert(Sitemap.parseIndex(xml) === Some(Seq("http://a/s1.xml", "http://a/s2.xml")))
    assert(Sitemap.parseIndex("<urlset></urlset>") === None)
    assert(Sitemap.parseIndex("<sitemapindex><sitemap><lastmod>x</lastmod></sitemap></sitemapindex>") === None)
  }

  test("resolve: index fetches one level into urlsets; urlset resolves directly; failures bubble") {
    val children = Map(
      "http://a/s1.xml" -> "<urlset><url><loc>http://a/1</loc></url></urlset>",
      "http://a/s2.xml" ->
        "<urlset><url><loc>http://a/2</loc><lastmod>2026-08-02</lastmod></url></urlset>")
    val index = "<sitemapindex><sitemap><loc>http://a/s1.xml</loc></sitemap>" +
      "<sitemap><loc>http://a/s2.xml</loc></sitemap></sitemapindex>"
    assert(Sitemap.resolve(index, children.get) === Some(Seq(
      ("http://a/s1.xml", Sitemap.Entry("http://a/1", "")),
      ("http://a/s2.xml", Sitemap.Entry("http://a/2", "2026-08-02")))))
    // a direct urlset resolves with an empty source tag
    assert(Sitemap.resolve(children("http://a/s1.xml"), _ => None)
      === Some(Seq(("", Sitemap.Entry("http://a/1", "")))))
    // failed fetch, malformed child, or index-of-index → None
    assert(Sitemap.resolve(index, _ => None) === None)
    assert(Sitemap.resolve(index, _ => Some("<rss/>")) === None)
    assert(Sitemap.resolve(index, _ => Some(index)) === None)
  }
}
