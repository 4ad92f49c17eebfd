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

  test("clean -> decontaminate -> embedding dedup -> index maintenance -> serve: one flowing pipeline") {
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
      7L -> nearDup(mkVec(2), 77L), 8L -> mkVec(8))
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

    // the fixed eval suite for the decontamination stage: derived once
    // and persisted — Streaming.decontaminateStream's frozen-gram
    // contract, applied per batch inside the clean stage's sink
    val evalGrams = PipelineQueries.decontaminateGrams(
      Seq((9999L, "benchmark answer key held out secret evaluation item"))
        .toDF("doc_id", "text"), 5)
      .select("sh").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // stage 1 — raw docs stream through the incremental clean, then
    // eval decontamination; each micro-batch's survivors land
    // (id, vec) in the survivor feed
    val docsIn = MemoryStream[(Long, String, String)]
    val cleanQ = docsIn.toDF().toDF("doc_id", "lang", "text").writeStream
      .option("checkpointLocation", s"$base/ckpt_clean")
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        if (!batch.isEmpty)
          Streaming.decontaminateBatch(
              PipelineQueries.corpusCleanIncremental(batch.toDF(), sigIndex, bid,
                keepText = true), evalGrams, 5)
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
    // genuinely new doc, a junk doc below the quality floor, the
    // paraphrase (7: unique text, embedding ≈ doc 2 — only the
    // embedding stage drops it), and an eval-contaminated doc (8:
    // quality-passing unique text + unique embedding, but it quotes a
    // verbatim 5-gram of the held-out suite — only the decontamination
    // stage drops it)
    docsIn.addData(
      (3L, "en", prose("heron") + " extra"),
      (4L, "en", prose("falcon")),
      (5L, "en", "ZZZZ!!! @@@@ 9999 ####"),
      (7L, "en", prose("osprey")),
      (8L, "en", prose("kestrel") + " benchmark answer key held out secret"))
    drain()
    cleanQ.stop(); embQ.stop(); maintainQ.stop()

    // composition invariant: the index holds bootstrap + what survived
    // ALL THREE hygiene stages — not 3 (text dup), not 5 (junk), not 7
    // (embedding paraphrase), not 8 (eval contamination)
    val indexed = new graft.sources.SnapshotStore(spark, s"$base/idx/codes", key = "neighbor_id")
      .read().get.select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(indexed.filter(_ < 9000L) == Set(1L, 2L, 4L),
      s"index must hold exactly the three-stage survivors, got ${indexed.filter(_ < 9000L)}")

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

  test("scrub -> dsir-select -> temperature mix -> shard: the output path composes, ids trace end-to-end") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_e2e_out").toString

    // two-domain candidate pool: 15 on-topic docs share the targets'
    // vocabulary, 15 off-topic docs don't; every on-topic doc opens
    // with the same 8-word template footer (two full 4-word chunks —
    // exactly the cross-document boilerplate scrub exists to remove),
    // followed by a unique on-topic body. Languages: 12 en + 3 zz
    // among the on-topic docs, so the mix stage has a head language
    // to downsample and a tail language to keep whole.
    val footer = "subscribe to our newsletter for daily updates now"
    val onVocab = Seq("model", "training", "corpus", "token", "gradient",
      "layer", "attention", "embedding", "loss", "batch", "epoch", "weight")
    val offVocab = Seq("recipe", "butter", "flour", "oven", "bake",
      "sugar", "dough", "pan", "mix", "cream", "salt", "yeast")
    // three 4-word chunks per body, each carrying a doc-unique marker
    // word so no BODY chunk repeats across docs (only the footer is
    // cross-document boilerplate); the other 9 words are shared-vocab
    // rotations, which is what DSIR scores on
    def body(vocab: Seq[String], id: Long): String = {
      val tag = ('a' + (id % 26).toInt).toChar
      (0 until 3).map(c =>
        (0 until 3).map(j => vocab((3 * c + j + id.toInt) % 12)).mkString(" ") +
          s" uniq$tag$c").mkString(" ")
    }
    val targets = (100L until 110L).map(i =>
      (i, body(onVocab, i))).toDF("doc_id", "text")
    val onIds = (0L until 15L)
    val candidates = (onIds.map(i =>
        (i, if (i < 12) "en" else "zz", footer + " " + body(onVocab, i))) ++
      (20L until 35L).map(i => (i, "en", body(offVocab, i))))
      .toDF("doc_id", "lang", "text")

    // stage 1 — scrub the whole pool FIRST (boilerplate removal
    // precedes importance weighting, or the template footer's grams
    // drown the domain signal — the RefinedWeb ordering): the shared
    // footer is hot (df = 15 >= 3), every unique body survives
    val scrubbed = PipelineQueries.scrubDocs(
      candidates.select("doc_id", "text"), chunkWords = 4, minDocs = 3)
    val scrubRows = scrubbed.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(3))).sortBy(_._1)
    assert(scrubRows.map(_._1).toSet == onIds.toSet ++ (20L until 35L))
    scrubRows.foreach { case (id, text, nScrubbed) =>
      assert(nScrubbed == (if (id < 15L) 2L else 0L),
        s"doc $id: exactly the footer chunks scrub, got $nScrubbed")
      assert(!text.contains("newsletter") && !text.contains("subscribe"),
        s"doc $id still carries footer text: $text")
      assert(text.contains(s"uniq${('a' + (id % 26).toInt).toChar}0"),
        s"doc $id lost its unique body: $text")
    }
    val scrubbedDocs = scrubbed
      .select(col("doc_id"), col("text_scrubbed").as("text"))
      .join(candidates.select("doc_id", "lang"), Seq("doc_id"))

    // stage 2 — DSIR selection at keepFrac 0.5 over the scrubbed text
    // must pick exactly the on-topic half: shared-vocab grams carry
    // the high milli-log ratios, off-topic grams the low ones
    val selected = PipelineQueries.corpusDsirSelectDocs(
      scrubbedDocs.select("doc_id", "text"), targets, 0.5)
    val selIds = selected.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(selIds == onIds.toSet,
      s"DSIR must select the on-topic half, got $selIds")

    // stage 3 — temperature mix over the selected scrubbed docs
    // (drops propagate: off-topic ids never reach this scan); budget
    // set at zz's exact keep-all threshold, below en's, so the tail
    // language rides whole and the head downsamples
    val mixIn = scrubbedDocs.join(selected.select("doc_id"), Seq("doc_id"))
    val toked = PipelineQueries.tokenizeDocs(mixIn)
    val supply = toked.groupBy("lang").agg(sum("n_tokens")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (tEn, tZz) = (supply("en"), supply("zz"))
    val sumW = math.sqrt(tEn.toDouble) + math.sqrt(tZz.toDouble)
    val budget = math.ceil(tZz * sumW / math.sqrt(tZz.toDouble)).toLong + 1L
    assert(budget < tEn * sumW / math.sqrt(tEn.toDouble),
      s"fixture premise: budget $budget must downsample en (supply $supply)")
    val mixed = PipelineQueries.corpusMixTemperatureDocs(mixIn, budget, 0.5)
    val mixedIds = mixed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(mixedIds.subsetOf(onIds.toSet), "mix keeps only selected docs")
    assert(Set(12L, 13L, 14L).subsetOf(mixedIds),
      s"tail language zz must ride whole through the mix: $mixedIds")
    val enKept = mixedIds.count(_ < 12L)
    assert(enKept > 0 && enKept < 12,
      s"head language en must downsample to a proper subset, kept $enKept of 12")

    // stage 4 — physical shard write of the mixed survivors; the
    // sharded corpus on disk is exactly the mix output, scrubbed text
    // and all, in shard_pos order
    val outDocs = mixIn.join(mixed.select("doc_id"), Seq("doc_id"))
    PipelineQueries.writeShards(outDocs, shards = 4, s"$base/shards")
    val shardRows = spark.read.parquet(s"$base/shards")
      .select(col("doc_id"), col("shard").cast("long"), col("shard_pos"), col("text"))
      .collect()
    assert(shardRows.map(_.getLong(0)).toSet == mixedIds,
      "sharded corpus must hold exactly the mixed survivors")
    assert(shardRows.forall(r => !r.getString(3).contains("newsletter")),
      "scrubbed text must be what ships")
    // written layout agrees with the assignment operator
    val assigned = PipelineQueries.shardDocs(outDocs, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    shardRows.foreach { r =>
      assert(assigned(r.getLong(0)) == (r.getLong(1), r.getLong(2)),
        s"doc ${r.getLong(0)}: written (${r.getLong(1)}, ${r.getLong(2)}) vs assigned ${assigned(r.getLong(0))}")
    }

    // stage 5 — tokenizer end: train BPE on the mixed survivors, pack
    // their ids; every surviving doc's ids land in exactly one pack
    // and every id resolves in the trained vocab (no OOV: the vocab's
    // alphabet came from this same corpus)
    import graft.functions.Bpe
    val merges = Bpe.train(outDocs, nMerges = 30)
    val vocab = Bpe.vocab(merges, Bpe.alphabet(outDocs))
    val packs = PipelineQueries.packTokens(outDocs, merges, vocab,
      budget = 64, buckets = 2).collect()
    val packedDocIds = packs.flatMap(_.getSeq[Long](1)).sorted.toSeq
    assert(packedDocIds == mixedIds.toSeq.sorted,
      s"every mixed survivor packs exactly once: $packedDocIds vs $mixedIds")
    assert(packs.forall(p => !p.getSeq[Int](2).contains(-1)),
      "self-trained vocab must cover its own corpus (no OOV ids)")
    assert(packs.forall(p => p.getSeq[Int](2).nonEmpty))
  }
}
