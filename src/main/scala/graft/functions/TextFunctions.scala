package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * tokenization, token counting, language-ID heuristic, quality scoring,
  * shingling and fingerprinting.
  *
  * All are composed from codegen'd Catalyst built-ins (no UDFs), so they
  * stay inside whole-stage codegen and scale linearly with executors.
  */
object TextFunctions {

  /** Whitespace tokenization (the reference's SPLIT, Methods/String.cs:182). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: word-piece regex split. A real BPE
    * vocab is external; this matches the common chars/4 + punct heuristic
    * deterministically.
    */
  def approxBpeCount(text: Column): Column =
    ceil(length(text).cast("double") / lit(4.0)).cast("long")

  /** Character n-gram shingles (positions 1..len-n+1). */
  def charShingles(text: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - (n - 1), lit(1))),
      i => text.substr(i, lit(n)))

  /** Word n-gram shingles from a token array. */
  def wordShingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  private val EnStopwords =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(toks: Column): Column =
    size(filter(toks, t => t.isin(EnStopwords: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** n-gram-heuristic language ID: stopword-ratio driven, deterministic.
    * (Real LID models are external; the reference has none — this is the
    * training-pipeline primitive with a pinned, testable heuristic.)
    */
  def langIdHeuristic(text: Column): Column = {
    val t = tokens(lower(text))
    when(stopwordRatio(t) >= lit(0.04), lit("en")).otherwise(lit("unknown"))
  }

  /** Ratio of non-alphanumeric, non-space chars to total length. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
      .cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Mean token length. */
  def meanTokenLen(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Composite document quality score in [0,1]:
    * rewards mid-length docs, low punctuation, healthy stopword ratio.
    * Deterministic arithmetic only (oracle-checkable).
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val lenScore =
      least(size(t).cast("double") / lit(100.0), lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5, lit(1.0))
    val stopScore = least(stopwordRatio(t) * 10, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3, 6)
  }

  /** Token windows for context-length chunking: starts at 0, stride
    * `stride`, each chunk `chunkLen` tokens (the tail chunk may be
    * shorter; a token-less doc yields one empty chunk). Emitted as an
    * array of (chunk_idx, toks) structs to explode — pure codegen, the
    * per-doc work is O(len · chunkLen / stride).
    */
  def tokenChunks(toks: Column, chunkLen: Int, stride: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
      s => struct((s / stride).cast("int").as("chunk_idx"),
        slice(toks, s + 1, lit(chunkLen)).as("toks")))

  /** Stable document fingerprint: md5 of normalized text. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** 48-bit integer hash of a string: the first 12 hex digits of md5.
    * Integer-exact, double-free, portable to any engine with md5.
    */
  def hash48(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long")

  /** Training-corpus text normalization: strip markup tags, collapse
    * whitespace, drop control characters, lowercase. Deterministic regex
    * pipeline (oracle-checkable).
    */
  def normalizeText(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val noCtl = regexp_replace(noTags, "[\\x00-\\x1f\\x7f]", " ")
    lower(trim(regexp_replace(noCtl, "\\s+", " ")))
  }

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?\\d[\\d\\s().-]{7,}\\d"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** PII redaction: replace emails, phone-number-shaped digit runs and
    * IPv4 addresses with typed placeholders (order matters: emails first
    * so their digits don't half-match the phone pattern).
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }
}
