package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Pins the RFC 9309 grammar corners: group selection by agent, the
  * consecutive-User-agent rule, comment stripping, empty Disallow, and
  * case-insensitive directives.
  */
class RobotsSpec extends AnyFunSuite {

  test("only wildcard-group rules apply; named-agent groups are ignored") {
    val txt =
      """User-agent: specialbot
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /private/
        |""".stripMargin
    assert(Robots.disallowPrefixes(txt) === Seq("/private/"))
  }

  test("consecutive User-agent lines form ONE group; a UA line after rules starts a new one") {
    val shared =
      """User-agent: botA
        |User-agent: *
        |Disallow: /x/
        |User-agent: botB
        |Disallow: /y/
        |""".stripMargin
    assert(Robots.disallowPrefixes(shared) === Seq("/x/"))
  }

  test("comments strip, empty Disallow means no rule, unknown directives are skipped") {
    val txt =
      """# global rules
        |User-agent: * # everyone
        |Crawl-delay: 5
        |Disallow:    # empty = allow all
        |DISALLOW: /a/3/ # case-insensitive directive
        |Sitemap: http://x/sitemap.xml
        |Disallow: /b/
        |""".stripMargin
    assert(Robots.disallowPrefixes(txt) === Seq("/a/3/", "/b/"))
  }

  test("multiple wildcard groups accumulate in file order; garbage lines are ignored") {
    val txt = "User-agent: *\nDisallow: /one/\n\nnot a directive line\n" +
      "User-agent: *\nDisallow: /two/\n"
    assert(Robots.disallowPrefixes(txt) === Seq("/one/", "/two/"))
  }

  test("Allow rules collect alongside Disallow; empty Allow is no rule") {
    val txt =
      """User-agent: *
        |Disallow: /
        |Allow: /public/
        |Allow:    # empty = no rule
        |allow: /also/ # case-insensitive
        |""".stripMargin
    assert(Robots.ruleGroups(txt) === ((Seq("/public/", "/also/"), Seq("/"))))
  }

  test("RFC 9309 §2.2.3 pattern match: prefixes, *, and the $ anchor") {
    assert(Robots.matches("/a/", "/a/page"))
    assert(!Robots.matches("/a/", "/b/a/")) // match is FROM THE START
    assert(Robots.matches("/*/x", "/any/thing/x/tail")) // * spans segments
    assert(Robots.matches("/a*page$", "/a/3/page"))
    assert(!Robots.matches("/a*page$", "/a/3/pages")) // $ anchors the end
    assert(Robots.matches("/fish*.php$", "/fish/file.php"))
    assert(!Robots.matches("/fish*.php$", "/fish/file.php?q=1"))
    // star backtrack: the anchored tail must bind to the LAST viable spot
    assert(Robots.matches("/a*b$", "/axbxb"))
    assert(Robots.matches("/*", "/anything"))
    assert(Robots.matches("/", "/"))
    assert(!Robots.matches("/long", "/lo"))
  }

  test("crawlDelay: wildcard group only, decoy named-agent delay skipped, garbage → None") {
    val txt =
      """User-agent: specialbot
        |Crawl-delay: 99
        |
        |User-agent: *
        |Disallow: /private/
        |Crawl-delay: 3 # seconds
        |Crawl-delay: 7
        |""".stripMargin
    assert(Robots.crawlDelay(txt) === Some(3L)) // first wildcard value wins
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: nope\n") === None)
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: -2\n") === None)
    assert(Robots.crawlDelay("User-agent: botA\nCrawl-delay: 5\n") === None)
  }

  test("RFC 9309 §2.2.2 precedence: longest match wins, Allow wins ties, no match allows") {
    // the canonical real-site shape: blanket Disallow + carve-out
    assert(Robots.isAllowed(Seq("/public/"), Seq("/"), "/public/page"))
    assert(!Robots.isAllowed(Seq("/public/"), Seq("/"), "/private/page"))
    // longer Disallow beats shorter Allow
    assert(!Robots.isAllowed(Seq("/a/"), Seq("/a/secret/"), "/a/secret/x"))
    // equal length → Allow wins
    assert(Robots.isAllowed(Seq("/page"), Seq("/page"), "/page"))
    // no matching rule → allowed
    assert(Robots.isAllowed(Seq.empty, Seq("/x/"), "/y/page"))
    // wildcard pattern participates in longest-match by PATTERN length
    assert(!Robots.isAllowed(Seq("/a/"), Seq("/*/5/"), "/a/5/page"))
  }

  test("sitemapUrls: group-independent, case-insensitive key, absolute http(s) only") {
    val txt =
      """User-agent: special
        |Disallow: /x/
        |SiTeMaP: http://a.com/s1.xml   # inside a named group still binds
        |User-agent: *
        |Allow: /
        |sitemap: https://a.com/s2.xml
        |Sitemap: ftp://a.com/nope.xml
        |Sitemap: relative/path.xml
        |Sitemap:
        |# Sitemap: http://a.com/commented-out.xml
        |SITEMAP: http://a.com/s3.xml
        |""".stripMargin
    assert(Robots.sitemapUrls(txt) ===
      Seq("http://a.com/s1.xml", "https://a.com/s2.xml", "http://a.com/s3.xml"))
    assert(Robots.sitemapUrls("User-agent: *\nDisallow: /") === Seq.empty)
    // the Sitemap lines must not leak into the rule groups
    val (allows, disallows) = Robots.ruleGroups(txt)
    assert(allows === Seq("/") && disallows === Seq.empty)
  }
}
