package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the round-14 archive/extraction stack
  * (the CrawlPropertySpec discipline — fixed seeds, adversarial
  * generators): WARC segment chains reassembling byte-exact through the
  * wire grammar under cross-chain interleaving with every mutation
  * class rejecting; model-generated web tables extracting to exactly
  * the model; MimeSniff total and deterministic on arbitrary bytes; WAT
  * envelopes surviving escape fuzz as parseable JSON; sitemapUrls
  * agreeing with an independent line model.
  */
class ArchivePropertySpec extends AnyFunSuite {

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def roundRobin[T](chains: Seq[Seq[T]]): Seq[T] = {
    val its = chains.map(_.iterator)
    val out = Seq.newBuilder[T]
    var any = true
    while (any) {
      any = false
      its.foreach(it => if (it.hasNext) { out += it.next(); any = true })
    }
    out.result()
  }

  test("segment chains reassemble byte-exact under cross-chain interleaving; mutations reject") {
    val gen = for {
      nRec <- Gen.choose(1, 4)
      recs <- Gen.listOfN(nRec, for {
        body <- Gen.listOf(Gen.choose(-128, 127)).map(_.map(_.toByte).toArray)
        chunk <- Gen.choose(1, 50)
      } yield (body, chunk))
    } yield recs
    val codec = new Warc.GzipCodec
    samples(gen, 25).foreach { recs =>
      val chains = recs.zipWithIndex.map { case ((body, chunk), i) =>
        Warc.segmentRecord(
          Warc.Record("response", s"<urn:uuid:$i>", s"http://h/$i", body), chunk)
      }
      // §5.18 allows other records between a chain's segments — round-robin
      // interleave all chains, then round-trip the full wire grammar
      val interleaved = roundRobin(chains)
      val back = Warc.parseRecords(
        codec.gzip(Warc.writeRecords(interleaved)), Some(codec)).get
      val out = Warc.reassemble(back).get
      // one logical record per chain, bytes exact, first-segment order
      assert(out.map(_.content.toSeq) === recs.map(_._1.toSeq))
      assert(out.forall(r => r.segment == 0L && r.segmentTotalLength == -1L))
      // dropping ANY single continuation breaks its chain -> None
      val contIdx = interleaved.zipWithIndex
        .filter(_._1.warcType == "continuation").map(_._2)
      contIdx.foreach { i =>
        assert(Warc.reassemble(interleaved.patch(i, Nil, 1)) === None)
      }
      // swapping two continuations of one chain is a sequence gap -> None
      chains.find(_.length >= 3).foreach { ch =>
        val swapped = ch.take(1) ++ Seq(ch(2), ch(1)) ++ ch.drop(3)
        assert(Warc.reassemble(swapped) === None)
      }
    }
  }

  test("model-generated tables extract to exactly the model") {
    def norm(s: String): String = s.split("\\s+").filter(_.nonEmpty).mkString(" ")
    val cellText = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.const(' '))).map(_.mkString)
    val rowGen = for {
      nc <- Gen.choose(0, 4)
      cells <- Gen.listOfN(nc,
        for { t <- cellText; th <- Gen.oneOf(true, false) } yield (t, th))
    } yield cells
    val tableGen = for {
      nr <- Gen.choose(0, 4)
      rows <- Gen.listOfN(nr, rowGen)
    } yield rows
    def render(rows: List[List[(String, Boolean)]]): String =
      "<table>" + rows.map(r => "<tr>" + r.map { case (t, th) =>
        if (th) s"<th>$t</th>" else s"<td>$t</td>"
      }.mkString + "</tr>").mkString + "</table>"
    def model(rows: List[List[(String, Boolean)]]): Html.Table =
      Html.Table(
        rows.map(_.map(c => norm(c._1))).filter(_.nonEmpty).map(_.toSeq),
        rows.flatten.count(_._2))
    samples(Gen.listOfN(2, tableGen), 40).foreach { tbls =>
      val html = "<p>pre</p>" + tbls.map(render).mkString("<div>mid</div>") + "<span>end</span>"
      assert(Html.tables(html) === tbls.map(model))
    }
  }

  test("MimeSniff is total, deterministic and slash-typed on arbitrary bytes") {
    val gen = Gen.listOf(Gen.choose(0, 255).map(_.toByte)).map(_.toArray)
    samples(gen, 200).foreach { b =>
      val m = MimeSniff.sniff(b)
      assert(m.nonEmpty && m.contains("/"))
      assert(MimeSniff.sniff(b) === m) // pure function of the bytes
    }
  }

  test("WAT envelopes survive escape fuzz as real JSON carrying the exact title") {
    val strGen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('"', '\\', '\t', ' ', '/', ':', '.'))).map(_.mkString)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    samples(Gen.zip(strGen, Gen.listOfN(2, strGen)), 60).foreach { case (title, links) =>
      val html = s"<html><head><title>$title</title></head><body>" +
        links.map(u => "<a href=\"" + u.replace("\"", "") + "\">x</a>").mkString +
        "</body></html>"
      val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val wat = Wat.fromResponse(
        Warc.Record("response", "<urn:uuid:f>", "http://x/", http), None).get
      val tree = om.readTree(new String(wat.content, java.nio.charset.StandardCharsets.UTF_8))
      val got = tree.path("Envelope").path("Payload-Metadata")
        .path("HTTP-Response-Metadata").path("HTML-Metadata")
        .path("Head").path("Title").asText
      assert(got === Html.extract(html).title)
    }
  }

  test("sitemapUrls agrees with an independent line model on generated robots files") {
    val keyGen = Gen.oneOf("Sitemap", "SITEMAP", "sitemap", "SiTeMaP",
      "User-agent", "Disallow", "Site-map", "Sitemaps")
    val valGen = Gen.oneOf("http://a.com/s.xml", "https://b.org/x.xml",
      "ftp://c/n.xml", "rel/p.xml", "", "HTTP://up.example/s.xml")
    val lineGen = for {
      k <- keyGen; v <- valGen
      c <- Gen.oneOf("", " # trailing comment")
      sp <- Gen.oneOf("", "  ")
    } yield s"$sp$k: $v$c"
    samples(Gen.listOf(lineGen).map(_.mkString("\n")), 60).foreach { txt =>
      val model = txt.split("\n", -1).toSeq.flatMap { raw =>
        val line = {
          val h = raw.indexOf('#')
          (if (h >= 0) raw.substring(0, h) else raw).trim
        }
        val sep = line.indexOf(':')
        if (sep > 0 && line.substring(0, sep).trim.equalsIgnoreCase("sitemap")) {
          val v = line.substring(sep + 1).trim
          val l = v.toLowerCase(java.util.Locale.ROOT)
          if (l.startsWith("http://") || l.startsWith("https://")) Some(v) else None
        } else None
      }
      assert(Robots.sitemapUrls(txt) === model)
    }
  }
}
