package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristic, fingerprinting.
  *
  * All are pure Catalyst expression compositions (`functions._` only — no
  * Scala UDFs), so they stay inside whole-stage codegen and distribute
  * trivially: each is a narrow map over the `text` column.
  */
object Text {

  /** Lowercased whitespace tokens. regexp-based so runs of spaces don't
    * produce empty tokens (split(" ") would). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct token set — the unit for Jaccard similarity. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Count of punctuation characters (quality signal). */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", ""))

  /** Count of digit characters. */
  def digitCount(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", ""))

  /** English-ish stopword hits — whole-word matches. */
  val stopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is")

  def stopwordHits(text: Column, words: Seq[String] = stopwordsEn): Column =
    size(regexp_extract_all(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Heuristic quality score in [0,1]: stopword density (signal of natural
    * language) damped by punctuation/digit noise. Mirrors the shape of
    * published quality filters (C4/Gopher rules) on features computable
    * inside codegen. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopR = stopwordHits(text).cast("double") / greatest(nTok, lit(1.0))
    val punctR = punctCount(text).cast("double") / greatest(length(text).cast("double"), lit(1.0))
    round(least(lit(1.0), stopR * lit(4.0)) * (lit(1.0) - least(lit(1.0), punctR * lit(10.0))), 4)
  }

  /** Per-language stopword inventories for the n-gram/stopword language-ID
    * heuristic (public langid practice: function-word hit counting). */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "que"),
    "es" -> Seq("el", "los", "las", "es", "una", "que", "para", "por"))

  /** Language-ID: argmax of per-language stopword hit counts; CJK-codepoint
    * presence short-circuits to zh. Ties resolve in `langStopwords` order;
    * zero hits everywhere → "und" (undetermined). */
  def langId(text: Column): Column = {
    val hits = langStopwords.map { case (lang, words) => lang -> stopwordHits(text, words) }
    val best = hits.tail.foldLeft(hits.head._2)((m, h) => greatest(m, h._2))
    val pick = hits.reverse.foldLeft(lit("und")) { case (acc, (lang, h)) =>
      when(h === best && best > 0, lang).otherwise(acc)
    }
    when(size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0))) > 0, "zh")
      .otherwise(pick)
  }

  /** Content fingerprint: md5 over whitespace-normalized lowercase text.
    * Stable across engines (md5 is standard), used for exact near-normalized
    * dedup at any scale — groupBy(fingerprint) shuffles only the 32-char
    * digest, not the document body. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))
}
