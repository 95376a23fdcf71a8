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
}
