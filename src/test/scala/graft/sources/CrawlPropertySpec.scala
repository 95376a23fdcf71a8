package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the crawl ingest stack, over
  * scalacheck-generated adversarial inputs (fixed seeds — the
  * PropertySpec discipline): gzip multi-member roundtrips cross-checked
  * against the JDK, charset detection agreeing with the JDK's strict
  * decoder in BOTH directions, the robots wildcard matcher against an
  * independent regex reference, and the two HTML extractors agreeing on
  * what text exists.
  */
class CrawlPropertySpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("gzipPerRecord roundtrips any record list; JDK agrees; tampering rejects") {
    val recGen = for {
      n <- Gen.choose(1, 6)
      bodies <- Gen.listOfN(n, Gen.listOf(Gen.choose(-128, 127)).map(_.map(_.toByte).toArray))
    } yield bodies.zipWithIndex.map { case (b, i) =>
      Warc.Record("response", s"<urn:uuid:$i>", s"http://h/$i", b)
    }
    val codec = new Warc.GzipCodec
    samples(recGen, 30).foreach { recs =>
      val cc = Warc.gzipPerRecord(recs, codec)
      // every record back, byte-exact, through the reused codec
      val Some(out) = Warc.parseRecords(cc, Some(codec))
      assert(out.map(_.content.toSeq) === recs.map(_.content.toSeq))
      // the JDK's concatenated-member reader sees the same bytes
      val jdk = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(cc)).readAllBytes()
      assert(jdk.toSeq === Warc.writeRecords(recs).toSeq)
      // appending garbage or flipping a trailer byte rejects, never throws
      assert(codec.gunzip(cc :+ 0x42.toByte) === None)
      val bad = cc.clone(); bad(cc.length - 3) = (bad(cc.length - 3) ^ 0x11).toByte
      assert(codec.gunzip(bad) === None)
    }
  }

  test("CharsetDetect agrees with the JDK strict decoder in both directions, for any bytes") {
    // mix of pure noise and mutated valid UTF-8 — the adversarial band
    val seqGen: Gen[Array[Byte]] = Gen.oneOf(
      Gen.choose(0x20, 0x7e).map(c => Array(c.toByte)),
      Gen.const(Array(0xc3.toByte, 0xa9.toByte)),
      Gen.const(Array(0xe2.toByte, 0x82.toByte, 0xac.toByte)),
      Gen.const(Array(0xf0.toByte, 0x9f.toByte, 0x98.toByte, 0x80.toByte)))
    val validUtf8 = Gen.listOf(seqGen).map(_.flatten.toArray)
    val mutated = for {
      base <- validUtf8
      if base.nonEmpty
      i <- Gen.choose(0, base.length - 1)
      b <- Gen.choose(0, 255)
    } yield { val a = base.clone(); a(i) = b.toByte; a }
    val noise = Gen.listOf(Gen.choose(0, 255).map(_.toByte)).map(_.toArray)
    val gen = Gen.oneOf(validUtf8, mutated, noise)
    samples(gen, 120).foreach { bytes =>
      val d = CharsetDetect.detect(bytes)
      val strict = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val decoded =
        try Some(strict.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
        catch { case _: java.nio.charset.CharacterCodingException => None }
      val hex = bytes.map(x => f"${x & 0xff}%02X").mkString(" ")
      val high = bytes.count(b => (b & 0xff) >= 0x80)
      if (high == 0) assert(d.charset === "ascii", hex)
      else assert((d.charset === "utf-8") === decoded.isDefined,
        s"detect=${d.charset} jdkAccepts=${decoded.isDefined} bytes=$hex")
      assert(d.nNonAscii === high, hex)
      d.charset match {
        case "utf-8" =>
          val t = decoded.get
          assert(d.decodedLen === t.codePointCount(0, t.length), hex)
        case _ => assert(d.decodedLen === bytes.length, hex)
      }
    }
  }

  test("Robots.matches agrees with an independent regex reference, for any pattern/path") {
    def refMatch(pattern: String, path: String): Boolean = {
      val anchored = pattern.nonEmpty && pattern.last == '$'
      val pat = if (anchored) pattern.dropRight(1) else pattern
      val rx = pat.split("\\*", -1)
        .map(p => if (p.isEmpty) "" else java.util.regex.Pattern.quote(p))
        .mkString("(?s:.*)")
      if (anchored) path.matches(rx) else path.matches(rx + "(?s:.*)")
    }
    val patGen = for {
      pieces <- Gen.listOf(Gen.oneOf("/", "a", "b", "ab", "*", "/a", "b*"))
      anchor <- Gen.oneOf("", "$")
    } yield pieces.mkString + anchor
    val pathGen = Gen.listOf(Gen.oneOf("/", "a", "b")).map(_.mkString)
    val gen = for { p <- patGen; s <- pathGen } yield (p, s)
    samples(gen, 400).foreach { case (pattern, path) =>
      assert(Robots.matches(pattern, path) === refMatch(pattern, path),
        s"pattern='$pattern' path='$path'")
    }
  }

  test("canonicalizeUrl is idempotent: a canonical URL is its own canonical form") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val urlGen = for {
      sch <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
      host <- Gen.oneOf("ExAmPle.CoM", "a.b.site.org", "H-7.net")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.listOf(Gen.oneOf("a", "b7", ".", "..", "x"))
      q <- Gen.oneOf("", "?", "?b=2&a=1", "?z&y=0")
      frag <- Gen.oneOf("", "#s", "#a/b?c")
    } yield s"$sch://$host$port/${segs.mkString("/")}$q$frag"
    val urls = samples(urlGen, 200).distinct
    val once = urls.toDF("u")
      .select(graft.functions.UrlFunctions.canonicalizeUrl(col("u")).as("c"))
    val twice = once
      .select(col("c"), graft.functions.UrlFunctions.canonicalizeUrl(col("c")).as("cc"))
      .collect()
    twice.foreach(r => assert(r.getString(0) === r.getString(1),
      s"not a fixed point: '${r.getString(0)}' -> '${r.getString(1)}'"))
  }

  test("Boilerplate and Html.extract agree on what text exists; link counts line up") {
    val piece = Gen.oneOf(
      Gen.oneOf("word", "a b", "x", "&amp;", "&#65;", "1 < 2", ""),
      Gen.oneOf("<p>", "</p>", "<div>", "</div>", "<li>", "</li>",
        "<nav>", "</nav>", "<footer>", "</footer>", "<b>", "</b>"),
      Gen.const("<a href=\"/l\">link text</a>"),
      Gen.const("<script>var x = '<p>leak</p>';</script>"),
      Gen.const("<!-- <a href='/gone'>c</a> -->"))
    val htmlGen = Gen.listOf(piece).map(_.mkString(" "))
    samples(htmlGen, 120).foreach { html =>
      val viaBlocks = Boilerplate.blocks(html).map(_.text).mkString(" ")
      val viaExtract = Html.extract(html).text
      assert(viaBlocks === viaExtract, s"html='$html'")
      // every generated anchor carries an href → the counts must agree
      assert(Html.linkHrefs(html).length === Html.extract(html).nLinks, s"html='$html'")
    }
  }
}
