package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-training-data pipelines.
  *
  * Everything here is composed from native Spark SQL functions and
  * higher-order functions — per-row, no shuffle, stays inside
  * WholeStageCodegen. No UDFs: a Scala UDF breaks codegen and costs
  * ser/de per row, which at 100 TB of documents is the whole budget.
  */
object TextFunctions {

  /** Words = maximal ASCII-letter runs (cross-engine-stable pattern). */
  def words(text: Column): Column = regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))

  /** Whitespace tokens (what `wc -w` counts). */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish tokens: letter runs, digit runs, or single non-space
    * symbols — the pre-tokenization split most BPE vocabularies use. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))

  def upperCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[A-Z]", ""))

  def digitCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[0-9]", ""))

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** How many tokens are stopwords (array HOF, no explode/shuffle). */
  def stopwordCount(text: Column): Column =
    size(filter(words(lower(text)), w => w.isInCollection(stopwords)))

  /** Heuristic quality score in [0,1]: rewards a healthy word count,
    * normal word length, low punctuation density, and the presence of
    * stopwords (word-salad and boilerplate both fail different terms).
    * All terms are ratios of exact integers, so the double result is
    * bit-identical across engines and plans. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nWords = size(words(text)).cast("double")
    val wordTerm = least(nWords / lit(50.0), lit(1.0))
    val punctTerm = lit(1.0) - least(punctCount(text).cast("double") / greatest(nChars, lit(1.0)) * lit(5.0), lit(1.0))
    val stopTerm = least(stopwordCount(text).cast("double") / greatest(nWords, lit(1.0)) * lit(5.0), lit(1.0))
    val caseTerm = lit(1.0) - least(upperCount(text).cast("double") / greatest(nChars, lit(1.0)) * lit(3.0), lit(1.0))
    wordTerm * lit(0.4) + punctTerm * lit(0.2) + stopTerm * lit(0.2) + caseTerm * lit(0.2)
  }

  /** Polynomial rolling hash over the UTF-8 bytes of `text` (base-31
    * Horner fold modulo a ~2^50 prime — modular, ANSI-safe), as a
    * native codegen expression ([[graft.functions.expr.RollingHash]]). */
  def rollingHash(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    ofExpr(graft.functions.expr.RollingHash(toExpr(text),
      seed = 17L, p = 1125899906842597L))
  }

  /** Stable 64-bit content fingerprint (xxhash64 of normalized text):
    * the cheap exact-dedup key. */
  def fingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(text, "\\s+", " ")))

  /** Word n-grams as an array column (1-indexed element_at; empty when
    * fewer than `n` words). */
  def wordNgrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - lit(n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + lit(k))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Language-ID by stopword/character profile. The profiles are tiny
    * built-in heuristics (CJK ratio for zh; distinctive function words
    * for en/de/fr/es) — per-row, no shuffle, no UDF. */
  def langId(text: Column): Column = {
    val t = lower(text)
    def hits(ws: Seq[String]): Column =
      size(filter(split(t, "\\s+"), w => w.isInCollection(ws))).cast("double")
    val total = greatest(size(split(t, "\\s+")).cast("double"), lit(1.0))
    val en = hits(Seq("the", "and", "of", "to", "is", "that", "it", "with"))
    val de = hits(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"))
    val fr = hits(Seq("le", "la", "les", "et", "est", "une", "que", "dans"))
    val es = hits(Seq("el", "los", "las", "es", "una", "que", "por", "con"))
    val cjk = length(t) - length(regexp_replace(t, "[\\x{4e00}-\\x{9fff}]", ""))
    when(cjk > lit(0), lit("zh"))
      .when(de >= en && de >= fr && de >= es && de > lit(0), lit("de"))
      .when(fr >= en && fr >= es && fr > lit(0), lit("fr"))
      .when(es >= en && es > lit(0), lit("es"))
      .otherwise(lit("en"))
  }
}
