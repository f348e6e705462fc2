package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All are
  * pure Catalyst column expressions (codegen'd, no UDFs in the hot path) so
  * they scan at parquet speed on 100 TB.
  */
object TextFunctions {

  /** Whitespace tokens; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** A BPE-ish subword proxy: alpha runs, digit runs, and single punctuation
    * marks each count as one token (the usual ~heuristic for budget estimates).
    */
  def subwordCountApprox(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality signals per document (length, punctuation density, stopword
    * ratio, mean word length), combined into a deterministic [0,1] score.
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
          length(text).cast("double"))

  private val stopwords =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "that", "it", "for", "on")

  def stopwordRatio(text: Column): Column = {
    val words = tokenCount(text)
    val pattern = "(?i)\\b(" + stopwords.mkString("|") + ")\\b"
    when(words === 0, lit(0.0))
      .otherwise(
        size(regexp_extract_all(text, lit(pattern), lit(0))).cast("double") /
          words.cast("double"))
  }

  def meanWordLength(text: Column): Column = {
    val words = tokenCount(text)
    when(words === 0, lit(0.0))
      .otherwise(
        length(regexp_replace(trim(text), "\\s+", "")).cast("double") / words.cast("double"))
  }

  /** Composite quality score in [0,1]: favors 50-2000 token docs, moderate
    * punctuation, non-trivial stopword presence, word lengths 3-10.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val lengthScore = least(toks / 50.0, lit(1.0)) * least(lit(2000.0) / greatest(toks, lit(1.0)), lit(1.0))
    val punct = punctRatio(text)
    val punctScore = when(punct.between(0.005, 0.2), 1.0).otherwise(0.5)
    val stop = stopwordRatio(text)
    val stopScore = when(stop.between(0.05, 0.6), 1.0).otherwise(0.5)
    val mwl = meanWordLength(text)
    val wordScore = when(mwl.between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lengthScore * 0.4 + punctScore * 0.2 + stopScore * 0.2 + wordScore * 0.2), 6)
  }

  /** n-gram-profile language ID. Profiles are distinctive function words per
    * language plus a CJK-codepoint test for zh; the winner is the profile with
    * the most hits (ties broken by profile order, deterministic).
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "für", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "avec", "pour", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "con", "para", "que"))

  def langId(text: Column): Column = {
    val lowered = lower(text)
    def hits(words: Seq[String]): Column =
      size(regexp_extract_all(lowered, lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val scored = langProfiles.map { case (lang, words) => (lang, hits(words)) }
    // argmax with deterministic first-wins tie-break
    val best = scored.foldLeft((lit("und"), lit(0))) { case ((bl, bs), (lang, s)) =>
      (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    when(cjk > 0, lit("zh")).otherwise(best._1)
  }

  /** Canonical-form document fingerprint: md5 of lowercased,
    * whitespace-collapsed text — the exact-dup key that survives
    * formatting-only edits. md5 is identical in Spark and DuckDB, so this is
    * oracle-checkable.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Word shingles (k-grams) for MinHash: `sentences`-free deterministic
    * construction via slide over the word array.
    */
  def shingles(text: Column, k: Int): Column =
    // native one-pass expression; identical contract to the composed
    // split/transform/slice formulation it replaces (text shorter than k
    // words -> the whole text as a single shingle), ~10x less per-row
    // overhead than the interpreted nested lambdas
    CatalystExprs.wordShingles(text, k)
}
