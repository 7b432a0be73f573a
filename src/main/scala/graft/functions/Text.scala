package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text operators: tokenization (reference cms_stream.py:95-97 does
  * `row['text'].split()` on the DRIVER — here it is a distributed
  * `split`+`explode`, SURVEY.md P13), entity extraction (port of the
  * producers' driver-side NER, fake_producer.py:49-51), and the
  * training-data-pipeline text analysis surface: quality scoring, token
  * counting, language-ID heuristics, document fingerprinting.
  *
  * All pure `Column` expressions (codegen'd) unless noted; designed so each
  * has a direct ANSI-SQL twin for the DuckDB oracle.
  */
object Text {

  /** Whitespace tokenization with empty tokens dropped — Python's
    * `str.split()` behavior (the reference tokenizer, cms_stream.py:95).
    * Filtering beats `trim` because Spark/DuckDB `trim` strips spaces only,
    * not tabs/newlines. */
  def tokenize(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Distinct token set (order-normalized for set ops like Jaccard). */
  def tokenSet(text: Column): Column = array_sort(array_distinct(tokenize(text)))

  /** Token count of a document. */
  def tokenCount(text: Column): Column = size(tokenize(text))

  /** BPE-ish subword count: maximal letter runs, digit runs, and single
    * punctuation marks — approximates a byte-pair tokenizer's granularity.
    * regexp_extract_all keeps it codegen'd and gives it a direct DuckDB
    * twin (the q_subword_stats oracle uses the same pattern). */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Unicode NFC normalization (composed form) — the canonicalization step
    * before fingerprinting/dedup on real-world corpora where "é" may arrive
    * either precomposed (U+00E9) or decomposed (e + U+0301). One JVM call
    * per document; null-propagating. */
  def nfcOf(s: String): String =
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  private val nfcUdf = udf((s: String) => nfcOf(s))
  def nfc(text: Column): Column = nfcUdf(text)

  /** Normalized text: lowercase, whitespace collapsed, trimmed — canonical
    * form for exact-dup detection. */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Deterministic 128-bit document fingerprint (md5 of normalized text). */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** Polynomial rolling-hash fingerprint over the *code point* stream:
    * h = (h*31 + codePoint) mod 1e9+7. One JVM call per document (a
    * char-level HOF fold would evaluate interpreted per character); folding
    * code points (not UTF-16 units) keeps the arithmetic exactly
    * reproducible in ANSI SQL (DuckDB splits strings into characters), so
    * it carries a DuckDB oracle. null → null, matching SQL. Mod 1e9+7
    * keeps every intermediate < 2^63. */
  def rollingHashOf(s: String): java.lang.Long = {
    if (s == null) return null
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }
  private val rollingHashUdf = udf((s: String) => rollingHashOf(s))
  def rollingHash(text: Column): Column = rollingHashUdf(text)

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS algorithm): polynomial hashes of all k-char k-grams, then the
    * minimum of every w-wide window of consecutive hashes. The selected
    * VALUE set is independent of the tie rule (any position tie contributes
    * the same value), which is what makes it exactly SQL-expressible.
    * Guarantees: any shared substring of length ≥ k+w-1 yields at least one
    * shared fingerprint. Code-point iteration for SQL parity; texts shorter
    * than k+w-1 (or null) yield no fingerprints. Returns the sorted set. */
  def winnowOf(text: String, k: Int = 5, w: Int = 4): Array[Long] = {
    if (text == null) return Array.empty
    val cps = text.codePoints().toArray
    if (cps.length < k + w - 1) return Array.empty
    val n = cps.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31 + cps(i + j)) % 1000000007L; j += 1 }
      hs(i) = h
      i += 1
    }
    val set = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= n - w) {
      var m = hs(i)
      var j = 1
      while (j < w) { if (hs(i + j) < m) m = hs(i + j); j += 1 }
      set.add(m)
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
  private val winnowUdf = udf((s: String) => winnowOf(s))
  def winnow(text: Column): Column = winnowUdf(text)

  /** All consecutive token n-grams of a document — frequency-preserving
    * (NOT deduplicated, unlike Similarity.shinglesOf which builds a set).
    * One JVM call per document; docs shorter than n tokens yield none. */
  def ngramsOf(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    Array.tabulate(toks.length - n + 1) { i =>
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      sb.toString
    }
  }
  private val ngramUdfs =
    scala.collection.concurrent.TrieMap.empty[Int, org.apache.spark.sql.expressions.UserDefinedFunction]
  def ngrams(text: Column, n: Int): Column =
    ngramUdfs.getOrElseUpdate(n, udf((s: String) => ngramsOf(s, n))).apply(text)

  /** Entity extraction port (SURVEY.md S4/F8): the producers run spaCy NER
    * filtered to PERSON/ORG; in-engine the deterministic, dictionary-free
    * stand-in keeps each wholly-alphabetic capitalized token (sentence-
    * initial tokens included; tokens with attached punctuation excluded by
    * the anchored match; multi-word entities emerge as adjacent tokens, not
    * joined spans). */
  def extractEntities(text: Column): Column =
    filter(
      transform(tokenize(text), t => regexp_extract(t, "^([A-Z][a-zA-Z]+)$", 1)),
      t => length(t) > 0)

  // ----- quality scoring (length / punctuation / stopword ratios) -----

  /** Tiny English stopword list — enough for ratio features; public-domain. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "for", "on", "with", "as", "at", "by", "be", "this", "that")

  /** Integer count of stopword tokens (exact — never reconstruct this from
    * stopwordRatio · n: the double round-trip can land at 1.999…). */
  def stopwordCount(text: Column): Column =
    size(filter(tokenize(text), t => lower(t).isin(Stopwords: _*)))

  /** Fraction of tokens that are stopwords ∈ [0,1]. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokenize(text)
    val stops = filter(toks, t => lower(t).isin(Stopwords: _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Fraction of non-whitespace characters that are punctuation/symbols. */
  def punctRatio(text: Column): Column = {
    val nonWs = length(regexp_replace(text, "\\s", ""))
    val punct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    when(nonWs > 0, punct.cast("double") / nonWs.cast("double")).otherwise(lit(0.0))
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokenize(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks).cast("double")).otherwise(lit(0.0))
  }

  /** Composite document quality score ∈ [0,1]: rewards mid-length docs with
    * low punctuation noise and a natural stopword rate. Deterministic,
    * SQL-expressible (each term has an ANSI twin). */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(length(text).cast("double") / lit(200.0), lit(1.0))
    val punctTerm = lit(1.0) - least(punctRatio(text) * lit(4.0), lit(1.0))
    val stopTerm = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    round((lenTerm + punctTerm + stopTerm) / lit(3.0), 6)
  }

  // ----- language ID (n-gram/stopword heuristic) -----

  /** Marker-word lists per language (tiny, deterministic heuristic). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "de", "et", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  /** Heuristic language guess: the language whose marker words hit the most
    * tokens; ties and zero hits → "und" (undetermined).
    *
    * One scalar UDF call per document — the equivalent Column formulation
    * (per-language `filter(toks, isin(...))` folds) evaluates its lambdas
    * interpreted per token per language and dominated q_lang_profile's
    * runtime. Argmax order (LangMarkers list order breaks ties, strict `>`
    * to replace) is unchanged. */
  def langGuessOf(text: String): String = {
    if (text == null) return "und"
    val counts = new java.util.HashMap[String, Int]()
    for (t <- text.split("\\s+")) {
      if (t.nonEmpty) {
        val lt = t.toLowerCase
        LangMarkers.foreach { case (lang, markers) =>
          if (markers.contains(lt)) counts.merge(lang, 1, Integer.sum)
        }
      }
    }
    var best = "und"; var bestScore = 0
    LangMarkers.foreach { case (lang, _) =>
      val s = counts.getOrDefault(lang, 0)
      if (s > bestScore) { best = lang; bestScore = s }
    }
    best
  }
  private val langGuessUdf = udf((s: String) => langGuessOf(s))
  def langGuess(text: Column): Column = langGuessUdf(text)
}
