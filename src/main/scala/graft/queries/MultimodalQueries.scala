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

  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(binaryDocs(spark, dir))

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
    "mm_frame_sample" ->
      """SELECT doc_id,
        |       CAST(i - 1 AS INTEGER) AS frame_idx,
        |       CAST((i - 1) * 32 + 1 AS INTEGER) AS offset,
        |       hex(encode(substring(text, CAST((i - 1) * 32 + 1 AS INTEGER), 1))) AS frame_hex
        |FROM documents,
        |     LATERAL (SELECT unnest(generate_series(1,
        |                CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT))) AS i)""".stripMargin)
}
