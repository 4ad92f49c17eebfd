package graft.queries

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis query surface over the `documents` table
  * (SURVEY.md §2.E) — token statistics, quality scoring, language ID,
  * fingerprints, n-gram counts. All per-row work is native column
  * expressions; the only shuffle in the whole section is the n-gram
  * count's groupBy. */
object TextQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  def textTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(wsTokens(col("text"))).as("n_ws_tokens"),
      size(words(col("text"))).as("n_words"),
      size(bpeTokens(col("text"))).as("n_bpe_tokens"),
      length(col("text")).as("n_chars"))

  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nWords = size(words(col("text"))).cast("double")
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(words(col("text"))).as("n_words"),
      (nChars / greatest(nWords, lit(1.0))).as("chars_per_word"),
      (punctCount(col("text")).cast("double") / greatest(nChars, lit(1.0))).as("punct_ratio"),
      (stopwordCount(col("text")).cast("double") / greatest(nWords, lit(1.0))).as("stopword_ratio"),
      qualityScore(col("text")).as("quality"))
  }

  def textLangid(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"), col("lang"), langId(col("text")).as("predicted_lang"))

  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp64"),
      rollingHash(col("text")).as("rolling_fp"))

  /** Corpus-wide top-20 bigrams: per-row n-gram expansion (native
    * WordShingles expression, non-distinct so counts are true), one
    * explode, one count shuffle, deterministic tiebreak. */
  def textNgrams(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    docs(spark, dir)
      .select(explode(ofExpr(graft.functions.expr.WordShingles(
        toExpr(col("text")), 2, distinct = false))).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    // gate form keeps the DuckDB-reproducible polynomial hash; fp64
    // (xxhash64, no DuckDB twin) is pinned by TextSpec instead
    "text_fingerprint" -> ((s: SparkSession, d: String) =>
      textFingerprint(s, d).select("doc_id", "rolling_fp")),
    "text_ngrams" -> (textNgrams _))

  private val stopwordsSql = stopwords.map(s => s"'$s'").mkString(", ")

  val oracles: Map[String, String] = Map(
    // mirrors graft.functions.expr.RollingHash exactly: Horner fold
    // (acc*31 + byte) mod P over UTF-8 bytes, seeded 17 (texts are
    // ASCII, so codepoints == bytes)
    "text_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce(list_prepend(17 % 1125899906842597,
        |                     list_transform(string_split_regex(text, ''), ch -> ord(ch))),
        |                   (a, b) -> (a * 31 + b) % 1125899906842597) AS rolling_fp
        |FROM documents""".stripMargin,
    // mirrors TextFunctions.langId token-for-token (word-set hit counts
    // over whitespace tokens of the lowercased text, CJK char count,
    // same tie-break order)
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang, lower(text) AS lt,
        |                  string_split_regex(lower(text), '\s+') AS ws FROM documents),
        |c AS (SELECT doc_id, lang,
        |  len(list_filter(ws, w -> w IN ('the','and','of','to','is','that','it','with'))) AS en,
        |  len(list_filter(ws, w -> w IN ('der','die','das','und','ist','nicht','ein','mit'))) AS de,
        |  len(list_filter(ws, w -> w IN ('le','la','les','et','est','une','que','dans'))) AS fr,
        |  len(list_filter(ws, w -> w IN ('el','los','las','es','una','que','por','con'))) AS es,
        |  length(lt) - length(regexp_replace(lt, '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
        | FROM t)
        |SELECT doc_id, lang,
        | CASE WHEN cjk > 0 THEN 'zh'
        |      WHEN de >= en AND de >= fr AND de >= es AND de > 0 THEN 'de'
        |      WHEN fr >= en AND fr >= es AND fr > 0 THEN 'fr'
        |      WHEN es >= en AND es > 0 THEN 'es'
        |      ELSE 'en' END AS predicted_lang
        |FROM c""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(trim(text), '\S+')) AS n_ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
        |       length(text) AS n_chars
        |FROM documents""".stripMargin,
    "text_quality" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |         length(text) AS n_chars,
         |         len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
         |         length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
         |         length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
         |         len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
         |                         w -> w IN ($stopwordsSql))) AS n_stop
         |  FROM documents)
         |SELECT doc_id, n_chars, n_words,
         |       CAST(n_chars AS DOUBLE) / greatest(CAST(n_words AS DOUBLE), 1.0) AS chars_per_word,
         |       CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) AS punct_ratio,
         |       CAST(n_stop AS DOUBLE) / greatest(CAST(n_words AS DOUBLE), 1.0) AS stopword_ratio,
         |       least(CAST(n_words AS DOUBLE) / 50.0, 1.0) * 0.4
         |        + (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) * 5.0, 1.0)) * 0.2
         |        + least(CAST(n_stop AS DOUBLE) / greatest(CAST(n_words AS DOUBLE), 1.0) * 5.0, 1.0) * 0.2
         |        + (1.0 - least(CAST(n_upper AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) * 3.0, 1.0)) * 0.2
         |         AS quality
         |FROM base""".stripMargin,
    "text_ngrams" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT unnest(CASE WHEN len(ws) >= 2
        |                     THEN list_transform(generate_series(1, len(ws) - 1),
        |                                         i -> ws[i] || ' ' || ws[i + 1])
        |                     ELSE [] END) AS bigram
        |       FROM w)
        |SELECT bigram, count(*) AS n FROM bg
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin)
}
