package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Column-only URL canonicalizer on the tricky shapes: case
  * folding stops at the path, default ports strip while real ports stay,
  * stacked dot-segments resolve, fragments drop, query params sort.
  */
class UrlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlFunctions.canonicalizeUrl(col("u"))).as[String].collect().toSeq

  test("canonicalizes scheme/host case, default port, dot segments, fragment and param order") {
    assert(canon("HTTP://ExAmPle.COM:80/a/./b/../c?z=1&a=2#frag")
      === Seq("http://example.com/a/c?a=2&z=1"))
    // path case is SEMANTIC and must survive; only scheme+host fold
    assert(canon("HTTPS://WWW.Site.ORG/Path/File.HTML")
      === Seq("https://www.site.org/Path/File.HTML"))
  }

  test("non-default ports survive; each scheme strips only its own default") {
    assert(canon("https://host.org:8443/x") === Seq("https://host.org:8443/x"))
    assert(canon("https://host.org:443/x") === Seq("https://host.org/x"))
    assert(canon("http://host.org:443/x") === Seq("http://host.org:443/x"))
    assert(canon("http://host.org:80/x") === Seq("http://host.org/x"))
  }

  test("two stacked ../ levels resolve; a lone query param keeps its value intact") {
    assert(canon("http://h/a/b/../../c") === Seq("http://h/c"))
    assert(canon("http://h/p?only=a&b") === Seq("http://h/p?b&only=a"))
  }

  test("trailing dot-segments and the bare-? empty query (real crawl shapes)") {
    // RFC 3986 §5.2.4: trailing '.' and 'seg/..' resolve to the directory
    assert(canon("http://h/a/b/.") === Seq("http://h/a/b/"))
    assert(canon("http://h/a/b/..") === Seq("http://h/a/"))
    assert(canon("http://h/a/./b/x/..") === Seq("http://h/a/b/"))
    // a bare '?' is an EMPTY query: zero params, and it canonicalizes away
    assert(canon("http://h/p?") === Seq("http://h/p"))
    val n = Seq("http://h/p?", "http://h/p?a=1").toDF("u")
      .select(UrlFunctions.numParams(col("u"))).as[Int].collect().toSeq
    assert(n === Seq(0, 1))
  }

  test("registrableDomain: publicsuffix.org semantics over a sample rule set") {
    val exact = Seq("com", "uk", "co.uk", "github.io", "io")
    val wc = Seq("ck")
    val exc = Seq("www.ck")
    def reg(hosts: String*): Seq[(String, Int)] =
      hosts.toDF("h").select(
        UrlFunctions.registrableDomain(col("h"), exact, wc, exc),
        UrlFunctions.publicSuffixLabels(col("h"), exact, wc, exc))
        .as[(String, Int)].collect().toSeq
    assert(reg("a.b.site.com") === Seq(("site.com", 1)))
    // multi-label rule beats its one-label prefix rule
    assert(reg("www.site.co.uk") === Seq(("site.co.uk", 2)))
    // private-registry rule (github.io) beats io
    assert(reg("me.github.io") === Seq(("me.github.io", 2)))
    // wildcard *.ck: any single label under ck is itself a suffix
    assert(reg("deep.site.w.ck") === Seq(("site.w.ck", 2)))
    assert(reg("site.ck") === Seq((null, 2))) // host IS a public suffix
    // exception !www.ck beats the wildcard
    assert(reg("www.ck") === Seq(("www.ck", 1)))
    assert(reg("sub.www.ck") === Seq(("www.ck", 1)))
    // no matching rule → the implicit * (bare TLD) rule
    assert(reg("site.example") === Seq(("site.example", 1)))
    assert(reg("example") === Seq((null, 1))) // single label, no registrable
  }

  test("registrableDomainJoined agrees with the HOF form on every rule class") {
    val exact = Seq("com", "uk", "co.uk", "github.io", "io")
    val wc = Seq("ck")
    val exc = Seq("www.ck")
    val rules = (exact.map((_, "exact")) ++ wc.map((_, "wildcard")) ++
      exc.map((_, "exception"))).toDF("rule", "kind")
    val hosts = Seq("a.b.site.com", "www.site.co.uk", "me.github.io",
      "deep.site.w.ck", "site.ck", "www.ck", "sub.www.ck", "site.example",
      "example", "w.ck", "ck").zipWithIndex.map(_.swap).toDF("id", "h")
    val viaJoin = UrlFunctions.registrableDomainJoined(hosts, "id", "h", rules)
      .orderBy("id").select("site", "ps_labels").as[(String, Int)].collect().toSeq
    val viaHof = hosts.orderBy("id").select(
      UrlFunctions.registrableDomain(col("h"), exact, wc, exc),
      UrlFunctions.publicSuffixLabels(col("h"), exact, wc, exc))
      .as[(String, Int)].collect().toSeq
    assert(viaJoin === viaHof)
    // and both give the documented outcomes
    assert(viaJoin.take(4) === Seq(("site.com", 1), ("site.co.uk", 2),
      ("me.github.io", 2), ("site.w.ck", 2)))
    assert(viaJoin.drop(4) === Seq((null, 2), ("www.ck", 1), ("www.ck", 1),
      ("site.example", 1), (null, 1), (null, 2), (null, 1)))
  }

  test("flag helpers: fragment, default port, param count") {
    val row = Seq("HTTP://H.com:80/p?b=2&a=1#s").toDF("u").select(
      UrlFunctions.hasFragment(col("u")),
      UrlFunctions.hasDefaultPort(col("u")),
      UrlFunctions.numParams(col("u"))).as[(Boolean, Boolean, Int)].head()
    assert(row === ((true, true, 2)))
    val bare = Seq("https://h/p").toDF("u").select(
      UrlFunctions.hasFragment(col("u")),
      UrlFunctions.hasDefaultPort(col("u")),
      UrlFunctions.numParams(col("u"))).as[(Boolean, Boolean, Int)].head()
    assert(bare === ((false, false, 0)))
  }
}
