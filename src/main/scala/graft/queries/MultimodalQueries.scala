package graft.queries

import graft.multimodal.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing query surface (SURVEY.md §2.F). The testdata
  * ships no binary media column, so the opaque payload is derived
  * deterministically from `documents.text` (UTF-8 bytes) — the point
  * is the binary-column plumbing, not the codec. */
object MultimodalQueries {

  /** documents with an opaque binary `payload` column. */
  def binaryDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.withMeta(binaryDocs(spark, dir))

  /** Gate form of the feature extraction: the float32 histogram is
    * un-normalized back to exact integer bin counts (count = round(
    * hist·n) recovers the count exactly — float32 relative error is
    * ≪ 0.5 absolute for counts < 2^23), serialized as compact JSON.
    * `batch_size` is partition-dependent and excluded (asserted in
    * MultimodalSpec instead). */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(binaryDocs(spark, dir))
      .select(
        col("doc_id"), col("n_bytes"), col("width"), col("height"),
        to_json(transform(col("features"),
          x => round(x * col("n_bytes")).cast("int"))).as("feature_counts"))

  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(binaryDocs(spark, dir), frameEvery = 32)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mmMeta _),
    "mm_features" -> (mmFeatures _),
    "mm_frame_sample" -> (mmFrameSample _))

  val oracles: Map[String, String] = Map(
    // texts are pure ASCII (verified: octet_length == length for every
    // row), so VARCHAR substring/sha256 are byte-exact equivalents of
    // the Spark binary ops.
    "mm_meta" ->
      """SELECT doc_id,
        |       octet_length(encode(text)) AS n_bytes,
        |       lower(sha256(text)) AS sha256,
        |       hex(encode(substring(text, 1, 4))) AS magic_hex
        |FROM documents""".stripMargin,
    // byte-histogram counts recomputed from codepoints (texts are pure
    // ASCII, so ord(char) == byte value); width/height are the stub
    // decoder's first-two-bytes + 1.
    "mm_features" ->
      """SELECT doc_id,
        |       CAST(length(text) AS INTEGER) AS n_bytes,
        |       CAST(CASE WHEN length(text) > 0 THEN ord(text[1]) + 1 ELSE 0 END AS INTEGER) AS width,
        |       CAST(CASE WHEN length(text) > 1 THEN ord(text[2]) + 1 ELSE 0 END AS INTEGER) AS height,
        |       CAST(to_json(list_transform(generate_series(0, 15), k ->
        |              CAST(len(list_filter(codes, c -> c % 16 = k)) AS INTEGER))) AS VARCHAR)
        |         AS feature_counts
        |FROM (SELECT doc_id, text,
        |             list_transform(string_split_regex(text, ''), ch -> ord(ch)) AS codes
        |      FROM documents)""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id,
        |       CAST(i - 1 AS INTEGER) AS frame_idx,
        |       CAST((i - 1) * 32 + 1 AS INTEGER) AS offset,
        |       hex(encode(substring(text, CAST((i - 1) * 32 + 1 AS INTEGER), 1))) AS frame_hex
        |FROM documents,
        |     LATERAL (SELECT unnest(generate_series(1,
        |                CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT))) AS i)""".stripMargin)
}
