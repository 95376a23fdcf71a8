package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("native WinnowMins fingerprints are bit-identical to the HOF spec on real docs") {
    val docs = graft.sources.Tables.load(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", $"text")
    val nat = docs.select($"doc_id", TextFunctions.winnowFingerprints($"text", 3, 4).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[java.lang.Long](1)).toMap
    val hof = docs.select($"doc_id", TextFunctions.winnowFingerprintsHof($"text", 3, 4).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[java.lang.Long](1)).toMap
    assert(nat.size === hof.size && nat.nonEmpty)
    nat.foreach { case (id, f) => assert(f === hof(id), s"winnow mismatch for doc $id") }
    // edge cases the corpus may not hit: empty text (0 grams -> [null]),
    // short text (<= w windows collapse to one global min)
    for (t <- Seq("", "one", "a b", "a b c d e f g")) {
      val df = one(t)
      val n = df.select(TextFunctions.winnowFingerprints($"text", 3, 4)).collect()(0).getSeq[java.lang.Long](0)
      val h = df.select(TextFunctions.winnowFingerprintsHof($"text", 3, 4)).collect()(0).getSeq[java.lang.Long](0)
      assert(n === h, s"winnow mismatch for text '$t'")
    }
  }

  test("tokenCount on normalized whitespace") {
    val df = one("  the   quick\tbrown\n fox ")
    assert(df.select(TextFunctions.tokenCount($"text")).as[Int].head() === 4)
  }

  test("subwordCount splits punctuation into its own tokens") {
    val df = one("don't stop, now!")
    // tokens: don | ' | t | stop | , | now | ! = 7
    assert(df.select(TextFunctions.subwordCount($"text")).as[Int].head() === 7)
  }

  test("fingerprint is invariant to case and whitespace runs") {
    val fps = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "hello worlds"))
      .toDF("doc_id", "text")
      .select(TextFunctions.fingerprint($"text")).as[String].collect()
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("punctRatio and stopwordRatio") {
    val df = one("the cat, the dog.")
    val (p, s) = df.select(
      TextFunctions.punctRatio($"text"),
      TextFunctions.stopwordRatio($"text")).as[(Double, Double)].head()
    assert(math.abs(p - 2.0 / 17) < 1e-12) // ',' and '.' of 17 chars
    assert(s === 0.5) // 'the' twice of 4 tokens
  }

  test("langId picks the language whose markers dominate") {
    val df = Seq(
      (1L, "the cat and the dog is of note"),
      (2L, "le chat et la mer et les vagues"),
      (3L, "el mar y los cielos que brillan"),
      (4L, "der Hund und die Katze und das Haus"),
      (5L, "你好 world"),
      (6L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val out = TextFunctions.withLangId(df, "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "en", 2L -> "fr", 3L -> "es", 4L -> "de", 5L -> "zh", 6L -> "und"))
  }

  test("rollingHash is order-sensitive") {
    val h = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
      .select(TextFunctions.rollingHash($"text")).as[Long].collect()
    assert(h(0) !== h(1))
  }

  test("chunkTokens: overlap, truncation, short-doc and validation") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val chunks = df.select(TextFunctions.chunkTokens($"text", 4, 2)).head().getSeq[String](0)
    // n=7, size=4, stride=2 -> nChunks = ceil(3/2)+1 = 3
    assert(chunks === Seq("a b c d", "c d e f", "e f g"))
    val short = Seq((1L, "x y")).toDF("doc_id", "text")
      .select(TextFunctions.chunkTokens($"text", 4, 2)).head().getSeq[String](0)
    assert(short === Seq("x y"))
    intercept[IllegalArgumentException] { TextFunctions.chunkTokens($"text", 4, 5) }
  }

  test("ngramsAll (native WordNgrams) matches the HOF form on every edge case") {
    val cases = Seq("the quick brown fox", "a b", "solo", "", "  x   y  z ", "a a a a")
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val toks = TextFunctions.tokens($"text")
      val hof = when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
      val rows = df.select($"doc_id", TextFunctions.ngramsAll($"text", n).as("native"), hof.as("hof"))
        .as[(Long, Seq[String], Seq[String])].collect()
      rows.foreach { case (id, nat, h) => assert(nat === h, s"doc $id n=$n") }
    }
    // direct pins: order kept, duplicates kept, short/empty fall back to whole text
    val g2 = df.filter($"doc_id" === 0).select(TextFunctions.ngramsAll($"text", 2)).as[Seq[String]].head()
    assert(g2 === Seq("the quick", "quick brown", "brown fox"))
    val dup = df.filter($"doc_id" === 5).select(TextFunctions.ngramsAll($"text", 2)).as[Seq[String]].head()
    assert(dup === Seq("a a", "a a", "a a"))
    val empty = df.filter($"doc_id" === 3).select(TextFunctions.ngramsAll($"text", 2)).as[Seq[String]].head()
    assert(empty === Seq(""))
  }

  test("repetitionRatio: 0 for novel text, rises with looped phrases") {
    val df = Seq(
      (1L, "a b c d e f"),       // 5 bigrams, all distinct -> 0.0
      (2L, "a b a b a b"),       // 5 bigrams: {a b, b a} -> 1 - 2/5 = 0.6
      (3L, "x y")                // single bigram -> 0.0
    ).toDF("doc_id", "text")
    val out = df.select($"doc_id", TextFunctions.repetitionRatio($"text", 2))
      .as[(Long, Double)].collect().toMap
    assert(out === Map(1L -> 0.0, 2L -> 0.6, 3L -> 0.0))
    // short-doc fallback: fewer tokens than n -> one whole-text gram, ratio 0
    val short = Seq((1L, "solo")).toDF("doc_id", "text")
      .select(TextFunctions.repetitionRatio($"text", 3)).as[Double].head()
    assert(short === 0.0)
  }

  test("withGopherRules: each rule trips on its own pathology") {
    val good = ("wow " * 30 + "the of and is " + "word " * 20).trim // 54 words, mean len >= 3
    val d = Seq(
      (1L, good),
      (2L, "the of too short"),                              // < 50 words
      (3L, ("the of " + "x " * 48 + "## ### ...".trim)),     // symbol-heavy tail
      (4L, ("the of " + "1 2 3 4 5 6 7 8 9 0 " * 5).trim)    // numeric: alpha_frac low
    ).toDF("doc_id", "text")
    val out = TextFunctions.withGopherRules(d, "text")
      .select("doc_id", "ok_words", "ok_symbols", "ok_alpha", "ok_stops", "pass")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(1L) === ((true, true, true, true, true)))
    assert(out(2L)._1 === false && out(2L)._5 === false)     // word count
    assert(out(3L)._2 === false)                             // symbols
    assert(out(4L)._3 === false)                             // alpha fraction
  }
}
