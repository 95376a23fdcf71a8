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
}
