package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Everything here is pure `Column` composition (higher-order array
  * functions, regex, hashes) — no UDFs — so the whole pipeline stays inside
  * whole-stage codegen and scales linearly with executors: a 100 TB corpus
  * is a map-only job with zero shuffles for every function in this object.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Tokens split on single spaces (exact-parity variant for oracles). */
  def tokensSimple(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), " "))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword estimate: word-piece + punctuation regex matches.
    * A real BPE vocabulary isn't needed for budgeting token counts.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""\w+|[^\w\s]"""), lit(0)))

  def charCount(text: Column): Column = length(text)

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, """[^.,;:!?'"()\[\]{}-]""", "")).cast("double") /
        length(text))

  /** Fraction of tokens found in the given stopword list. */
  def stopwordRatio(text: Column, stop: Seq[String]): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, tok => array_contains(lit(stop.toArray), lower(tok))))
        .cast("double") / size(t))
  }

  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      aggregate(t, lit(0L), (acc, tok) => acc + length(tok)).cast("double") /
        size(t))
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, some stopwords, plausible word length. The weights are a
    * heuristic, not a model — deterministic and cheap at any scale.
    */
  def qualityScore(text: Column, stop: Seq[String] = enStopwords): Column = {
    val n = tokenCount(text).cast("double")
    val lengthScore = least(n / 64.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stop) * 4.0, lit(1.0))
    val mtl = meanTokenLength(text)
    val wordLenScore = when(mtl.between(3.0, 10.0), 1.0).otherwise(0.3)
    round((lengthScore * 0.25 + punctScore * 0.25 + stopScore * 0.25 +
      wordLenScore * 0.25), 6)
  }

  val enStopwords: Seq[String] = Seq("the", "and", "of", "to", "in", "is",
    "you", "that", "it", "for", "a", "on", "with", "as", "at", "this")

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> enStopwords,
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein",
      "ich", "auf", "sich", "den", "ein", "zu", "von"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est", "pour",
      "que", "dans", "qui", "au", "pas", "sur"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no",
      "con", "por", "las", "para", "es"),
    "it" -> Seq("il", "di", "che", "la", "e", "per", "un", "in", "non", "si",
      "una", "con", "del", "le", "sono"))

  /** n-gram-heuristic language ID: argmax of stopword hits per language;
    * "und" (undetermined) when no list scores a hit. Ties break
    * alphabetically-last via struct max — deterministic.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val scored = langStopwords.map { case (lang, stop) =>
      val hits = size(filter(t, tok => array_contains(lit(stop.toArray), lower(tok))))
      struct(hits.as("s"), lit(lang).as("l"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** Deterministic document fingerprint: position-weighted token hash,
    * `(Σ_i (ascii(tok_i)+len(tok_i))·i) mod 1e9+7` (1-based i). Order-
    * sensitive like a rolling hash but exactly reproducible in any engine
    * with 64-bit integers — no overflow, no modpow.
    */
  def fingerprint(text: Column): Column = {
    val toks = tokensSimple(text)
    when(size(toks) === 0, lit(0L)).otherwise(
      pmod(
        aggregate(
          zip_with(toks, sequence(lit(1), size(toks)),
            (t, i) => (ascii(t) + length(t)).cast("long") * i),
          lit(0L), (acc, x) => acc + x),
        lit(1000000007L)))
  }
}
