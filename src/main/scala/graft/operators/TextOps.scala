package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table (`doc_id, text, lang, source, n_chars`): tokenization, quality
  * scoring, language-ID heuristics, fingerprinting.
  *
  * All pure `Column` expressions (codegen'd, no UDFs) so they fuse into
  * whole-stage codegen and scale embarrassingly — per-row work only.
  */
object TextOps {

  /** Whitespace tokenizer (documents are single-space normalized). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A small function-word list per language for the n-gram/stopword
    * language-ID heuristic. */
  val stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Count of tokens that are in `stop`. */
  def stopwordHits(text: Column, stop: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(stop)))

  /** Stopword ratio — integer/integer division, deterministic. */
  def stopwordRatio(text: Column, stop: Seq[String] = stopwordsEn): Column =
    stopwordHits(text, stop).cast("double") / tokenCount(text)

  /** Mean token length counted over non-space chars — pure int arithmetic
    * then one division: deterministic across engines. */
  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - (n - lit(1))).cast("double") / n
  }

  /** Punctuation density per char. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\.,;:!?]", ""))).cast("double") /
      length(text)

  /** Quality score in [0,1]: favors mid-length docs with low punctuation —
    * a deterministic toy of the usual heuristic-quality stage. */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lengthTerm = least(n / lit(100.0), lit(1.0))
    greatest(lit(0.0), lengthTerm * (lit(1.0) - punctRatio(text)))
  }

  /** Language-ID heuristic: stopword evidence for English vs a crude
    * "looks-ASCII" prior. Deterministic CASE cascade. */
  def langGuess(text: Column): Column =
    when(stopwordHits(text, stopwordsEn) >= 3, lit("en"))
      .when(length(regexp_replace(text, "[\\x00-\\x7F]", "")) > length(text) / 10, lit("other"))
      .otherwise(lit("und"))

  /** Canonical text normalization used by the dedup keys. */
  def normalized(text: Column): Column =
    trim(lower(regexp_replace(text, "\\s+", " ")))

  /** PII scrub: redact email addresses and long digit runs (phone/account
    * numbers) — the standard pre-training hygiene pass, pure regexp. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "[+]?[0-9][0-9 ()+.-]{6,}[0-9]", "<NUM>")

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks — the usual cheap proxy for subword token budgets (kept to a
    * regex subset both Java regex and RE2 agree on). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Deterministic train/test split on the content hash: md5 hex compares
    * bytewise identically everywhere, so `md5 < threshold` is a stable,
    * engine-independent assignment. "e6" ≈ 90% of the hex space. */
  def splitTag(text: Column, trainHexCeiling: String = "e6"): Column =
    when(md5(text) < trainHexCeiling, lit("train")).otherwise(lit("eval"))

  /** Bag-of-words fingerprint: md5 over the sorted distinct token set —
    * order-insensitive near-identity (word-permutation invariant). */
  def bowFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Word k-gram shingles of the document (k fixed at 3; for docs shorter
    * than k, one partial shingle). One custom-expression loop per row
    * ([[graft.functions.TextExpressions.WordShingles]]) — byte-identical
    * output to the nested-HOF formulation it replaced, without the
    * interpreted lambda frames (the HOF form was the hot path of every
    * shingle-consuming op: MinHash, Jaccard verify, fingerprints). */
  def shingles(text: Column): Column =
    graft.functions.TextExpressions.wordShingles(tokens(text), 3)

  /** Rolling-hash document fingerprint: the minimum md5 over the shingle set
    * (a 1-hash MinHash — the full signature lives in DedupOps). */
  def minShingleFingerprint(text: Column): Column =
    array_min(transform(shingles(text), s => md5(s)))
}
