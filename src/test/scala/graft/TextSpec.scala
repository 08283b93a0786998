package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.Text

/** Tokenizer + hash primitives — the single source of truth shared by
  * Q1–Q7/Q26–Q34 must agree with a plain-Scala model (SURVEY.md §5.2 #1). */
class TextSpec extends SparkSpec {

  private def scalaTokens(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq

  test("wordsOf matches the reference letters-only rule on sample strings") {
    val samples = Seq(
      "Hello, World! 123 spark-scan", "", "   ", "a", "ALL CAPS",
      "tab\tand\nnewline", "trailing punct...", "..leading", "a1b2c3")
    import spark.implicits._
    val got = samples.toDF("text")
      .select(Text.wordsOf(col("text")).as("ws"))
      .as[Seq[String]].collect().toSeq
    assert(got == samples.map(scalaTokens))
  }

  test("wordsOf property: agrees with Scala model on random ASCII") {
    val asciiGen = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val cases = Gen.listOfN(60, asciiGen).sample.get
    import spark.implicits._
    val got = cases.toDF("text")
      .select(Text.wordsOf(col("text")).as("ws"))
      .as[Seq[String]].collect().toSeq
    assert(got == cases.map(scalaTokens))
  }

  test("wordsOf property: agrees with Scala model on random unicode") {
    // non-ASCII letters, combining marks, surrogate pairs (emoji), CJK:
    // all are non-[a-z] codepoints, i.e. separators — in BOTH engines'
    // regex semantics (one codepoint each, never a partial surrogate)
    val unicodeGen = Gen.listOf(Gen.frequency(
      5 -> Gen.choose(32.toChar, 126.toChar),
      2 -> Gen.oneOf('é', 'ß', 'İ', 'ñ', 'Ø', '中', '文', '́'),
      1 -> Gen.oneOf("😀", "🧪", "👍🏽").map(_.charAt(0)), // lone high surrogate stress
      1 -> Gen.oneOf("😀", "🧪").flatMap(s => Gen.oneOf(s.toSeq))))
      .map(_.mkString)
    val cases = Gen.listOfN(60, unicodeGen).sample.get
    import spark.implicits._
    val got = cases.toDF("text")
      .select(Text.wordsOf(col("text")).as("ws"))
      .as[Seq[String]].collect().toSeq
    assert(got == cases.map(scalaTokens))
  }

  test("polyHash matches a plain-Scala fold") {
    def model(s: String, seed: Long): Long =
      s.foldLeft(seed)((acc, c) => (acc * 31 + c.toLong) % Text.HashMod)
    val samples = Seq("", "a", "spark", "the quick brown fox")
    import spark.implicits._
    val got = samples.toDF("s")
      .select(Text.polyHash(col("s"), 7L).as("h")).as[Long].collect().toSeq
    assert(got == samples.map(model(_, 7L)))
  }

  test("wordsOfLetters matches the wc.go unicode letters-only rule") {
    import spark.implicits._
    // the Go model: FieldsFunc(s, r => !unicode.IsLetter(r)) on lowered text
    def goModel(s: String): Seq[String] =
      s.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq
    val samples = Seq(
      "Grüße aus Köln! 123",
      "日本語 and English, mixed.",
      "naïve café—déjà vu",
      "ALL-CAPS42WORDS")
    val got = samples.toDF("s")
      .select(Text.wordsOfLetters(col("s"))).collect()
      .map(_.getSeq[String](0).toSeq)
    samples.zip(got).foreach { case (s, words) =>
      assert(words == goModel(s), s"input: $s")
    }
  }

  test("scrubPii redacts email/phone/ip/card with typed tags") {
    import spark.implicits._
    val in = Seq(
      "mail me at jane.doe+x@example.co.uk today",
      "call (555) 123-4567 or 555-987-6543",
      "host 192.168.0.1 responded",
      "card 4111 1111 1111 1111 declined",
      "clean text stays untouched").toDF("s")
    val got = in.select(Text.scrubPii(col("s"))).as[String].collect().toSeq
    assert(got == Seq(
      "mail me at <EMAIL> today",
      "call <PHONE> or <PHONE>",
      "host <IP> responded",
      "card <CARD> declined",
      "clean text stays untouched"))
  }

  test("compressionRatio: repetitive text compresses far below random-ish text") {
    import spark.implicits._
    val rep = "spam ham " * 500
    val varied = (1 to 500).map(i => s"w${i * 7919 % 9973}").mkString(" ")
    val got = Seq(("rep", rep), ("var", varied), ("empty", ""))
      .toDF("k", "s")
      .select(col("k"), Text.compressionRatio(col("s")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("rep") < 0.1, s"repetitive ratio ${got("rep")}")
    assert(got("var") > 0.3, s"varied ratio ${got("var")}")
    assert(got("empty") == 1.0)
    // deterministic across runs (fixed Deflater level)
    val again = Seq(("rep", rep)).toDF("k", "s")
      .select(Text.compressionRatio(col("s"))).collect()(0).getDouble(0)
    assert(again == got("rep"))
  }

  test("piiCounts audits hits by kind; extractUrls keeps order") {
    import spark.implicits._
    val r = Seq("a@b.io and c@d.io via 10.0.0.7")
      .toDF("s").select(Text.piiCounts(col("s")).as("p"))
      .selectExpr("p.emails", "p.phones", "p.ips", "p.cards")
      .collect()(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == ((2, 0, 1, 0)))
    val urls = Seq("see https://a.io/x then http://b.io?q=1 end")
      .toDF("s").select(Text.extractUrls(col("s"))).collect()(0).getSeq[String](0)
    assert(urls == Seq("https://a.io/x", "http://b.io?q=1"))
  }
}
