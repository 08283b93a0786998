package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single source of truth for text primitives shared by Q1–Q7, Q26–Q27 and
  * the text-analysis extension operators (SURVEY.md §2.8, §2.9).
  *
  * Tokenizer spec (SURVEY.md §2.12 normalization protocol): split
  * `lower(text)` on `[^a-z]+` and drop empty tokens — the Spark-exact
  * equivalent of the reference's letters-only word rule
  * (`strings.FieldsFunc(contents, !unicode.IsLetter)` in the MIT 6.824
  * Lab 1 wc plugin; /root/reference is the empty-shell repo for that lab).
  *
  * Everything here is built-in-function based (codegen'd, no UDFs) so the
  * whole token pipeline stays inside WholeStageCodegen at 100 TB scale.
  */
object Text {
  /** The word boundary regex — identical string is used in the DuckDB
    * oracle SQL (`regexp_split_to_array(lower(text), '[^a-z]+')`). */
  val WordPattern = "[^a-z]+"

  /** Tokenize a column into an array of non-empty lowercase words. */
  def wordsOf(text: Column): Column =
    filter(split(lower(text), WordPattern), w => length(w) > 0)

  /** The reference's TRUE word rule — split on every non-letter rune
    * (`strings.FieldsFunc(contents, !unicode.IsLetter)` in wc.go),
    * Unicode-correct: `\p{L}` covers all letter categories, so accented
    * and non-Latin words survive intact. The declared-contract queries
    * use [[wordsOf]] (`[^a-z]+`) because the fixture vocab is ASCII and
    * DuckDB's regex engine must agree byte-for-byte; this variant is the
    * one to use on real-world corpora. */
  def wordsOfLetters(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}]+"), w => length(w) > 0)

  /** Explode documents(doc_id, text, ...) into (doc_id, word) rows,
    * carrying any extra columns requested. */
  def tokens(docs: DataFrame, extraCols: String*): DataFrame = {
    val keep = (Seq("doc_id") ++ extraCols).map(col)
    docs.select(keep :+ explode(wordsOf(col("text"))).as("word"): _*)
  }

  /** Deterministic polynomial rolling hash of a string, seeded — the
    * fingerprinting primitive for minhash/simhash/doc-fingerprint
    * operators. Native codegen expression
    * ([[org.apache.spark.sql.graftvec.PolyHash]]): one fused loop over
    * code points per row, no per-character array. The SAME fold is
    * expressed in the DuckDB oracle as
    *   list_reduce(list_prepend(seed, list_transform(
    *     regexp_split_to_array(s,''), x -> unicode(x))),
    *     (acc,x) -> (acc*31+x) % 1000000007)
    */
  val HashMod = org.apache.spark.sql.graftvec.PolyHash.Mod

  def polyHash(s: Column, seed: Long): Column = {
    import org.apache.spark.sql.graftvec.{PolyHash, VectorKernels}
    VectorKernels.column(PolyHash(VectorKernels.expression(s), seed))
  }

  /** One-scan MinHash signature (array<long>, `nHashes` entries) of a
    * text column — signature-identical to the batch min-aggregate family
    * in `TextPipeline.minHashBanded` (same polyHash seed 7, same
    * (2i+3, 7i+1) params, same modulus). Native codegen kernel
    * ([[org.apache.spark.sql.graftvec.MinHashSig]]); empty word set →
    * empty array. ASCII word semantics (the TextNgrams caveat): exotic
    * code points that LOWERCASE into a-z are separators here. */
  def minhashSig(text: Column, nHashes: Int): Column = {
    import org.apache.spark.sql.graftvec.{MinHashSig, VectorKernels}
    VectorKernels.column(MinHashSig(VectorKernels.expression(text), nHashes))
  }

  // ------------------------------------------------- PII / URL scrubbing
  // Training-data release hygiene. Chained regexp_replace stays inside
  // whole-stage codegen — scrubbing is scan-local, zero-shuffle at any
  // scale. The fixture corpus contains no PII/URLs by construction, so
  // these are spec-verified on synthetic strings (TextSpec), not
  // oracle-checked.

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe =
    "(?<![0-9])(?:\\+?1[-. ])?(?:\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}(?![0-9])"
  private val Ipv4Re =
    "(?<![0-9.])(?:[0-9]{1,3}\\.){3}[0-9]{1,3}(?![0-9.])"
  private val CardRe = "(?<![0-9])[0-9]{4}(?:[- ]?[0-9]{4}){3}(?![0-9])"

  /** Redact emails, phone numbers, IPv4 addresses and 16-digit card-like
    * runs with typed placeholder tags (longest/most-specific first so a
    * card number is not half-eaten by the phone pattern). */
  def scrubPii(text: Column): Column = {
    val tagged = Seq(
      CardRe -> "<CARD>", EmailRe -> "<EMAIL>",
      PhoneRe -> "<PHONE>", Ipv4Re -> "<IP>")
    tagged.foldLeft(text) { case (c, (re, tag)) => regexp_replace(c, re, tag) }
  }

  /** Count of PII hits by kind — the audit twin of [[scrubPii]]. */
  def piiCounts(text: Column): Column =
    struct(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).as("emails"),
      size(regexp_extract_all(text, lit(PhoneRe), lit(0))).as("phones"),
      size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).as("ips"),
      size(regexp_extract_all(text, lit(CardRe), lit(0))).as("cards"))

  /** All http(s) URLs in a text column, in order of appearance. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit("https?://[^\\s<>\"]+"), lit(0))

  /** Deflate-compression ratio (compressed/raw bytes) of a text column —
    * the classic repetition/boilerplate proxy of crawl-cleaning
    * pipelines: highly repetitive docs compress far below ~0.5. A JVM
    * `Deflater` at a FIXED level is bit-deterministic, so re-runs agree;
    * this is a genuine UDF-as-last-resort case (no built-in expression
    * can express deflate), kept off the hot path by design — run it
    * AFTER the cheap codegen filters have pruned. */
  def compressionRatio(text: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null || s.isEmpty) 1.0
      else {
        val raw = s.getBytes("UTF-8")
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(raw); d.finish()
        // deflate worst case ≈ raw + 5 B per 16 KB stored block + header;
        // undersizing would spin the loop forever on incompressible input
        val buf = new Array[Byte](raw.length + (raw.length >> 9) + 128)
        var n = 0
        while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
        d.end()
        math.round(n.toDouble / raw.length * 10000).toDouble / 10000
      }
    }
    f(text)
  }
}
