package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, language id, quality scoring, fingerprinting.
  *
  * All pure column expressions (codegen'd; run inside the scan stage at
  * 100 TB — no shuffle, no UDF). Hash primitives deliberately use md5
  * (identical bytes in every engine) so results are verifiable against an
  * external SQL oracle; at production scale swap [[hash64]] for xxhash64.
  */
object TextFunctions {

  /** Normalize text: lowercase, strip non-alphanumerics to single spaces. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(coalesce(c, lit(""))), "[^a-z0-9]+", " "))

  /** Whitespace tokens of normalized text (empty text → empty array). */
  def tokens(c: Column): Column = {
    val n = normalizeText(c)
    when(n === "", array().cast("array<string>")).otherwise(split(n, " "))
  }

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: word pieces + standalone punctuation, the usual
    * pre-tokenizer regex shape (letters | digits | single non-space symbol). */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(coalesce(c, lit("")), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles of the normalized text, as an array of strings.
    * Documents shorter than n words shingle to the whole text. */
  def shingles(c: Column, n: Int): Column = {
    val toks = tokens(c)
    val k = size(toks)
    when(k <= n, array(concat_ws(" ", toks))).otherwise(
      transform(sequence(lit(0), k - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Deterministic 64-bit-ish hash of a string: first 16 hex chars of md5.
    * Portable across engines (string compare == unsigned numeric compare). */
  def md5_16(c: Column): Column = substring(md5(c), 1, 16)

  /** Production hash (xxhash64, codegen'd, not portable to other engines). */
  def hash64(c: Column): Column = xxhash64(c)

  /** Document fingerprint: md5 of the whitespace-normalized lowercase text —
    * the exact-dedup key that survives formatting noise. */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  // --- PII detection / redaction (training-data scrubbing) ---------------

  /** Portable PII patterns (same regex text runs in Java and RE2). */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PiiPhoneRe = "\\+?[0-9][0-9 -]{7,13}[0-9]"

  /** Count PII matches of one pattern (full-match counting). */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(coalesce(c, lit("")), lit(pattern), lit(0)))

  /** Redact PII in place: emails, then IPv4s, then phone-shaped digit
    * runs (order matters — emails/IPs contain digits a phone pattern
    * could otherwise split). Pure codegen'd regexp_replace chain: runs
    * inside the scan stage at any scale. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(coalesce(c, lit("")), PiiEmailRe, "<EMAIL>"),
        PiiIpRe, "<IP>"),
      PiiPhoneRe, "<PHONE>")

  // --- language id: stopword-hit heuristic -------------------------------

  val StopwordsEn = Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with")
  val StopwordsFr = Seq("le", "la", "les", "de", "des", "et", "un", "une", "est", "que")
  val StopwordsEs = Seq("el", "los", "las", "y", "en", "es", "por", "con", "para", "del")

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  /** Language guess by stopword-hit count; ties break en > fr > es > und. */
  def langId(c: Column): Column = {
    val t = tokens(c)
    val en = stopwordHits(t, StopwordsEn)
    val fr = stopwordHits(t, StopwordsFr)
    val es = stopwordHits(t, StopwordsEs)
    when(en === 0 && fr === 0 && es === 0, lit("und"))
      .when(en >= fr && en >= es, lit("en"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  // --- quality scoring ---------------------------------------------------

  /** Ratio of punctuation chars to total chars (0 for empty). */
  def punctRatio(c: Column): Column = {
    val s = coalesce(c, lit(""))
    val total = length(s)
    when(total === 0, lit(0.0))
      .otherwise(length(regexp_replace(s, "[^!-/:-@\\[-`{-~]", "")).cast("double") / total)
  }

  /** Ratio of uppercase letters to all letters (0 when no letters). */
  def upperRatio(c: Column): Column = {
    val s = coalesce(c, lit(""))
    val letters = length(regexp_replace(s, "[^A-Za-z]", ""))
    when(letters === 0, lit(0.0))
      .otherwise(length(regexp_replace(s, "[^A-Z]", "")).cast("double") / letters)
  }

  /** Stopword ratio over whitespace tokens (any of en/fr/es lists). */
  def stopwordRatio(c: Column): Column = {
    val t = tokens(c)
    val n = size(t)
    val hits = stopwordHits(t, StopwordsEn ++ StopwordsFr ++ StopwordsEs)
    when(n === 0, lit(0.0)).otherwise(hits.cast("double") / n)
  }

  /** Mean word length over whitespace tokens (0 for empty). */
  def meanWordLen(c: Column): Column = {
    val t = tokens(c)
    val n = size(t)
    when(n === 0, lit(0.0))
      .otherwise(aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / n)
  }

  /** Composite quality heuristic in [0,1]: long enough, not punctuation
    * soup, has stopwords (i.e. looks like natural language), sane word
    * length. Weights are the usual C4/Gopher-rule flavors. */
  def qualityScore(c: Column): Column = {
    val lenOk   = when(length(coalesce(c, lit(""))) >= 200, lit(1.0))
      .otherwise(length(coalesce(c, lit(""))).cast("double") / 200.0)
    val punctOk = when(punctRatio(c) <= 0.2, lit(1.0)).otherwise(lit(0.0))
    val stopOk  = when(stopwordRatio(c) >= 0.05, lit(1.0)).otherwise(lit(0.0))
    val wordOk  = when(meanWordLen(c).between(2.0, 12.0), lit(1.0)).otherwise(lit(0.0))
    round(lenOk * 0.4 + punctOk * 0.2 + stopOk * 0.2 + wordOk * 0.2, 4)
  }
}
