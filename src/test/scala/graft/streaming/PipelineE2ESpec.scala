package graft.streaming

import graft.SparkSpec
import graft.queries.PipelineQueries
import graft.similarity.PqIndex
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The full training-data loop, composed end-to-end as it would run in
  * production: a stream of raw documents flows through CDC-incremental
  * corpus hygiene (TEXT near-dup + quality drop against the
  * accumulated signature index), the survivors' embeddings flow
  * through the EMBEDDING near-dup stream (the paraphrase catcher:
  * text-unique, embedding-near documents), what survives both
  * maintains the persistent ANN index, and a query stream is served
  * against the continuously maintained index. Every stage exists and
  * is specced on its own; this pins that they actually COMPOSE — ids
  * dropped by either dedup stage never reach the index, survivors
  * become retrievable, and the streamed serve equals the batch
  * search. */
class PipelineE2ESpec extends SparkSpec {
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val Dim = 64

  // quality-passing prose (see PipelineIncrementalSpec): stopword-rich
  // lowercase words, topic-derived every 3rd word so distinct topics
  // share almost no 3-shingles
  private def prose(topic: String): String =
    (1 to 56).map { i =>
      if (i % 3 == 0) s"$topic$i"
      else Seq("the", "and", "of", "to", "in", "is", "it", "that")(i % 8)
    }.mkString(" ")

  private def mkVec(seed: Long): Array[Float] = graft.VecFixtures.unit(Dim, seed)

  test("clean -> embedding dedup -> index maintenance -> serve: one flowing pipeline") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val survivorsDir = s"$base/survivors"
    val embSurvivorsDir = s"$base/emb_survivors"
    new java.io.File(survivorsDir).mkdirs()
    new java.io.File(embSurvivorsDir).mkdirs()

    // embeddings for every raw doc: near-dup doc 3 carries (almost)
    // doc 1's vector, as a real embedding model would produce; doc 7
    // is the PARAPHRASE case — unique text, but its embedding is a
    // near-dup of doc 2's (cosine ≈ 0.97), so only the embedding
    // stage can catch it
    import graft.VecFixtures.nearDup
    val vecOf = Map[Long, Array[Float]](
      1L -> mkVec(1), 2L -> mkVec(2),
      3L -> mkVec(1).map(x => x + 1e-4f), 4L -> mkVec(4), 5L -> mkVec(5),
      7L -> nearDup(mkVec(2), 77L))
    val vecsDf = vecOf.toSeq.map { case (id, v) => (id, v) }.toDF("doc_id", "vec")

    // the serving index: quantizers bootstrapped on a pre-existing
    // corpus (ids 9000+), then maintained only through the stream;
    // nProbe = nCells makes the tiny-corpus search exhaustive so the
    // assertions are about composition, not recall. opq = true runs
    // the FULL composed chain (learned rotation + cells + residual
    // codes) through every stage of the flowing loop.
    val pqIndex = new PqIndex(spark, s"$base/idx", dim = Dim, nCells = 4, nProbe = 4,
      opq = true)
    pqIndex.build((9000L until 9020L).map(i => (i, mkVec(i))).toDF("id", "vec"))

    val sigIndex = new SigIndex(spark, s"$base/sig", idCol = "doc_id")

    // stage 1 — raw docs stream through the incremental clean; each
    // micro-batch's survivors land (id, vec) in the survivor feed
    val docsIn = MemoryStream[(Long, String, String)]
    val cleanQ = docsIn.toDF().toDF("doc_id", "lang", "text").writeStream
      .option("checkpointLocation", s"$base/ckpt_clean")
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        if (!batch.isEmpty)
          PipelineQueries.corpusCleanIncremental(batch.toDF(), sigIndex, bid)
            .join(vecsDf, Seq("doc_id"))
            .select(col("doc_id").as("id"), col("vec"))
            .write.mode("append").parquet(survivorsDir)
      }
      .start()

    val survivorSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("vec", ArrayType(FloatType))))

    // stage 2 — text-survivors flow through the EMBEDDING near-dup
    // stream; its survivors land in the feed the index maintains
    val embIndex = new SigIndex(spark, s"$base/embsig", idCol = "id")
    val embQ = Streaming.dedupNearEmbeddingStream(
      spark.readStream.schema(survivorSchema).parquet(survivorsDir), embIndex,
      df => df.write.mode("append").parquet(embSurvivorsDir),
      s"$base/ckpt_emb")

    // stage 3 — the twice-deduped feed maintains the ANN index
    val maintainQ = pqIndex.maintainStream(
      spark.readStream.schema(survivorSchema).parquet(embSurvivorsDir),
      s"$base/ckpt_maintain", compactEvery = 2)

    def drain(): Unit = {
      cleanQ.processAllAvailable()
      embQ.processAllAvailable()
      maintainQ.processAllAvailable()
    }

    // batch 0: two clean docs — both survive
    docsIn.addData((1L, "en", prose("heron")), (2L, "en", prose("otter")))
    drain()
    // batch 1: a near-dup of historical doc 1 (text stage drops it), a
    // genuinely new doc, a junk doc below the quality floor, and the
    // paraphrase (7: unique text, embedding ≈ doc 2 — only the
    // embedding stage drops it)
    docsIn.addData(
      (3L, "en", prose("heron") + " extra"),
      (4L, "en", prose("falcon")),
      (5L, "en", "ZZZZ!!! @@@@ 9999 ####"),
      (7L, "en", prose("osprey")))
    drain()
    cleanQ.stop(); embQ.stop(); maintainQ.stop()

    // composition invariant: the index holds bootstrap + what survived
    // BOTH dedup stages — not 3 (text dup), not 5 (junk), not 7
    // (embedding paraphrase)
    val indexed = new graft.sources.SnapshotStore(spark, s"$base/idx/codes", key = "neighbor_id")
      .read().get.select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(indexed.filter(_ < 9000L) == Set(1L, 2L, 4L),
      s"index must hold exactly the two-stage survivors, got ${indexed.filter(_ < 9000L)}")

    // stage 3 — a query stream served against the maintained index:
    // the dup's vector resolves to its SURVIVOR, the new doc to itself
    val got = scala.collection.mutable.Set.empty[(Long, Long, Int)]
    val queriesIn = MemoryStream[(Long, Array[Float])]
    val serveQ = pqIndex.serveStream(
      queriesIn.toDF().toDF("id", "vec"), 3,
      df => got ++= df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))), s"$base/ckpt_serve")
    queriesIn.addData((901L, vecOf(3L)), (902L, vecOf(4L)))
    serveQ.processAllAvailable()
    serveQ.stop()

    val top = got.filter(_._3 == 1).map(t => t._1 -> t._2).toMap
    assert(top == Map(901L -> 1L, 902L -> 4L),
      s"dup query must hit the survivor, new query itself; got $top")
    // and the streamed serve equals the batch search over the same index
    val batchTop = pqIndex.topK(Seq((901L, vecOf(3L)), (902L, vecOf(4L))).toDF("id", "vec"), 3)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.toSet == batchTop, "streamed serve must equal the batch topK")
  }
}
