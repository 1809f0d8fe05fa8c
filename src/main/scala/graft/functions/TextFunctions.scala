package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, stopword/punctuation
  * ratios, and a marker-word language-ID heuristic.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs), and every formula is deliberately expressible 1:1 in ANSI
  * SQL so the DuckDB oracle can recompute it exactly (see
  * SparkEntry.oracleSql) — hence e.g. `least/greatest/round` arithmetic
  * rather than anything Spark-specific.
  */
object TextFunctions {

  /** Token = maximal [a-z0-9]+ run of the lowercased text — a BPE-ish
    * word/number segmentation that both Spark and DuckDB regex engines
    * agree on. */
  val TokenPattern = "[a-z0-9]+"

  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenPattern), lit(0))

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** Fraction of characters that are not alphanumeric/space. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))) /
      greatest(length(text), lit(1)).cast("double")

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => array_contains(
      array(EnStopwords.map(lit): _*), t))) /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite document-quality score in [0,1]:
    * 40% length signal (saturates at 50 tokens), 30% low punctuation,
    * 30% natural-language stopword presence (saturates at ratio 0.25).
    * Unrounded — quantize at the consumer (`floor(q * 10^k)` is engine-
    * portable; `round` half-boundary behavior is not). */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text) / lit(50.0)) * 0.4 +
      (lit(1.0) - least(lit(1.0), punctRatio(text) * 5.0)) * 0.3 +
      least(lit(1.0), stopwordRatio(text) * 4.0) * 0.3

  /** Marker words per language for the n-gram language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Language-ID: argmax of marker-word occurrence counts, ties resolved
    * in declaration order (en > de > fr > es); "und" when no marker hits.
    * A real pipeline would swap in a trained n-gram model; the *shape*
    * (pure column expressions, one pass, no UDF) is the deliverable. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val counts = LangMarkers.map { case (l, ws) => l -> markerCount(toks, ws) }
    val Seq(en, de, fr, es) = counts.map(_._2)
    when(en >= de && en >= fr && en >= es && en > 0, "en")
      .when(de >= fr && de >= es && de > 0, "de")
      .when(fr >= es && fr > 0, "fr")
      .when(es > 0, "es")
      .otherwise("und")
  }
}
