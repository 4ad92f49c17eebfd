package graft.queries

import graft.SparkSpec

/** CDC-incremental corpus_clean: each batch is cleaned against the
  * accumulated SIGNATURE index — prior batches participate as
  * ~1 KB/doc signature rows, never as text, so nothing is re-shingled
  * or re-read. */
class PipelineIncrementalSpec extends SparkSpec {

  // quality-passing prose: lowercase, stopword-rich, ~56 words, no
  // punct — every 3rd word derives from the topic so two topics share
  // almost no 3-shingles
  private def prose(topic: String): String =
    (1 to 56).map { i =>
      if (i % 3 == 0) s"$topic$i"
      else Seq("the", "and", "of", "to", "in", "is", "it", "that")(i % 8)
    }.mkString(" ")

  test("multimodal clean: subset of the text clean; extra drops traced to embedding pairs") {
    val dir = sf("any")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val textOnly = ids(PipelineQueries.corpusClean(spark, dir))
    val multi = ids(PipelineQueries.corpusCleanMultimodal(spark, dir))
    assert(multi.subsetOf(textOnly),
      "adding a modality can only drop more docs, never resurrect one")
    val extraDropped = textOnly -- multi
    assert(extraDropped.nonEmpty,
      "the corpus has embedding near-dup pairs; the multimodal clean must act on them")
    // every extra drop lies in the UNION pair graph (a doc can lose
    // canonicalship transitively, through a text pair, once an
    // embedding pair merges its component — so membership in the
    // embedding pairs alone is NOT implied), and the embedding
    // modality itself accounts for at least one drop
    val embPairIds = DedupQueries.dedupEmbeddingLsh(spark, dir).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val textPairIds = DedupQueries.dedupNgramJaccard(spark, dir).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(extraDropped.subsetOf(embPairIds ++ textPairIds),
      s"drops outside the union pair graph: ${extraDropped -- embPairIds -- textPairIds}")
    assert((extraDropped & embPairIds).nonEmpty,
      "at least one drop must be directly embedding-witnessed")
  }

  test("batch N+1 dedups against batch N via signatures only; quality floor applies") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val index = new graft.streaming.SigIndex(spark, s"$base/index", idCol = "doc_id")

    val batch1 = Seq(
      (1L, "en", prose("heron")),
      (2L, "en", prose("otter"))).toDF("doc_id", "lang", "text")
    val kept1 = PipelineQueries.corpusCleanIncremental(batch1, index, batchId = 0L)
    assert(kept1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(kept1.columns.toSeq ==
      Seq("doc_id", "lang", "quality", "n_words", "n_bpe_tokens"))

    // the state batch 2 will join against holds signatures, not text —
    // the structural guarantee that history is never re-shingled
    assert(!index.read().get.columns.contains("text"),
      "the dedup index must hold signatures only")

    val batch2 = Seq(
      (3L, "en", prose("heron") + " extra"), // near-dup of doc 1 (history)
      (4L, "en", prose("falcon")),           // genuinely new
      (5L, "en", "ZZZZ!!! @@@@ 9999 ####")   // unique but junk: floor drops it
    ).toDF("doc_id", "lang", "text")
    val kept2 = PipelineQueries.corpusCleanIncremental(batch2, index, batchId = 1L)
    val got = kept2.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(4L),
      s"history near-dup 3 and junk 5 must be dropped, got ${got.keySet}")
    assert(got(4L) >= PipelineQueries.QualityFloor)

    // replay of batch 2 (crash-after-upsert) emits the same delta
    val replay = PipelineQueries.corpusCleanIncremental(batch2, index, batchId = 1L)
    assert(replay.select("doc_id").collect().map(_.getLong(0)).toSet == Set(4L))
  }
}
