package graft.similarity

import graft.SparkSpec
import graft.queries.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Persistent inverted index: parity with the ad-hoc BM25 path after
  * every lifecycle step, term-pruned serving, and the streaming loop. */
class TextIndexSpec extends SparkSpec {
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def corpus: DataFrame =
    graft.sources.Tables.load(spark, sf("any"), "documents")
      .select("doc_id", "text")

  private val qs = TextQueries.Bm25QuerySet

  private def rows(df: DataFrame): Set[(Int, Int, Long, Long)] =
    df.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

  test("built index serves exactly the ad-hoc BM25 results; adds/replacements keep parity") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex").toString
    val index = new TextIndex(spark, s"$base/idx", termParts = 16)
    index.build(corpus)
    assert(rows(index.search(qs, 10)) == rows(TextQueries.bm25Search(corpus, qs, 10)),
      "index-served BM25 must equal the ad-hoc path on the same corpus")

    // CDC add: new docs + a replacement; parity vs ad-hoc over the
    // UPDATED corpus proves stats (N, avgdl) and postings both moved
    val delta = Seq(
      (900001L, "hash join table hash join table"),
      (0L, "window stream window stream"))
      .toDF("doc_id", "text")
    index.add(delta)
    val updated = corpus.filter(col("doc_id") =!= 0L).unionByName(delta)
    assert(rows(index.search(qs, 10)) == rows(TextQueries.bm25Search(updated, qs, 10)),
      "after a delta add + replacement the index must equal ad-hoc BM25 on the updated corpus")
    // the replaced doc's old terms are gone: doc 0 no longer matches a
    // query it can only reach through its old text
    val hits = index.search(Seq(9 -> "customer"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!hits.contains(0L))
  }

  test("filtered search: allow-list bounds candidates, scores stay corpus-level, runner-up surfaces") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_filt").toString
    val index = new TextIndex(spark, s"$base/idx", termParts = 8)
    index.build(corpus)
    val unfiltered = index.search(qs, 10).collect()
      .map(r => (r.getInt(0), r.getLong(2)) -> r.getInt(1)).toMap
    val top1 = unfiltered.collect { case ((q, d), 1) => q -> d }
    assert(top1.nonEmpty, "fixture: queries must have results")
    // allow everything EXCEPT each query's rank-1 doc: results must
    // exclude it and the former rank-2 doc must take rank 1
    val banned = top1.values.toSet
    val allowed = corpus.select("doc_id").filter(!col("doc_id").isInCollection(banned.toSeq))
    val filtered = index.search(qs.toDF("query_id", "qtext"), 10,
        allowed = Some(allowed)).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(filtered.forall(t => !banned.contains(t._3)),
      s"banned docs must never appear: ${filtered.filter(t => banned.contains(t._3))}")
    val former2 = unfiltered.collect { case ((q, d), 2) => q -> d }
    former2.foreach { case (q, d) =>
      // only when q's former rank-2 wasn't itself banned for q
      if (!banned.contains(d))
        assert(filtered.contains((q, 1, d)),
          s"query $q: former rank-2 doc $d must be the filtered rank-1")
    }
    // corpus-level stats contract: scores don't move, so the filtered
    // ranking is EXACTLY the unfiltered one with banned docs struck
    // out (bm25Rank's (score desc, doc_id) order is total, so the
    // survivors' relative order is preserved and rank-11+ docs can
    // only append, never interleave)
    qs.map(_._1).foreach { q =>
      val struck = unfiltered.toSeq.collect { case ((`q`, d), r) => (r, d) }
        .sorted.map(_._2).filterNot(banned.contains)
      val filteredQ = filtered.filter(_._1 == q).sortBy(_._2).map(_._3)
      assert(filteredQ.take(struck.size) == struck,
        s"query $q: filtered prefix must be the struck-out unfiltered ranking " +
          s"(got ${filteredQ.take(struck.size)}, want $struck)")
    }
  }

  test("empty-text replacement retracts a document's postings (tombstone row)") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_tomb").toString
    val index = new TextIndex(spark, s"$base/idx", termParts = 8)
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha delta"),
      (3L, "beta gamma")).toDF("doc_id", "text")
    index.build(docs)
    assert(index.search(Seq(1 -> "alpha"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    index.add(Seq((1L, "")).toDF("doc_id", "text"))
    assert(index.search(Seq(1 -> "alpha"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L),
      "a doc replaced with empty text must stop matching")
    // and the retraction holds parity with ad-hoc on the updated corpus
    val updated = docs.filter(col("doc_id") =!= 1L)
      .unionByName(Seq((1L, "")).toDF("doc_id", "text"))
    assert(rows(index.search(qs, 10)) == rows(TextQueries.bm25Search(updated, qs, 10)))
  }

  test("delete() un-counts documents: bitwise parity with a fresh build on the remaining corpus") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_del").toString
    val index = new TextIndex(spark, s"$base/idx", termParts = 16)
    index.build(corpus)
    // take down a handful of docs that actually match queries
    val doomed = index.search(qs, 3).select("doc_id").distinct()
      .limit(4).collect().map(_.getLong(0)).toSeq
    val removed = index.delete(doomed.toDF("doc_id"))
    assert(removed > 0, "deleting matching docs must remove posting rows")
    val remaining = corpus.filter(!col("doc_id").isin(doomed: _*))
    // the true-takedown contract, stronger than the empty-text
    // retraction: N and avgdl shrink too, so scores bitwise-match an
    // index that never saw the docs
    assert(rows(index.search(qs, 10)) == rows(TextQueries.bm25Search(remaining, qs, 10)),
      "post-delete serving must equal ad-hoc BM25 on the remaining corpus")
    val fresh = new TextIndex(spark, s"$base/idx2", termParts = 16)
    fresh.build(remaining)
    assert(rows(index.search(qs, 10)) == rows(fresh.search(qs, 10)),
      "post-delete index must equal a fresh build on the remaining corpus")
    // deleted ids never match; replayed takedown is a no-op
    val hits = index.search(qs, 50).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(doomed.forall(d => !hits.contains(d)))
    assert(index.delete(doomed.toDF("doc_id")) == 0L)
  }

  test("warm search: token-keyed cache matches cold bitwise; rebuild, CDC add and delete all invalidate") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_warm").toString
    val cold = new TextIndex(spark, s"$base/idx", termParts = 16)
    val warm = new TextIndex(spark, s"$base/idx", termParts = 16, warmSearch = true)
    val corpusA = corpus.filter(col("doc_id") < 40L)
    cold.build(corpusA)
    // parity on both prune regimes: the full query set (probe likely
    // covers >= half of 16 parts — the bare-cache branch) and one
    // single-term query (1 of 16 — the InSet-pruned branch)
    assert(rows(warm.search(qs, 10)) == rows(cold.search(qs, 10)),
      "warm ranks must equal cold ranks after build")
    val oneTerm = Seq(1 -> "customer")
    assert(rows(warm.search(oneTerm, 10)) == rows(cold.search(oneTerm, 10)))
    // second warm call is a cache HIT — still identical
    assert(rows(warm.search(qs, 10)) == rows(cold.search(qs, 10)))
    // and provably served FROM the cache: the physical plan reads the
    // in-memory relation (a dropped persist would only show as slow)
    val warmPlan = warm.search(oneTerm.toDF("query_id", "qtext"), 10)
      .queryExecution.executedPlan.toString
    assert(warmPlan.contains("InMemoryTableScan"),
      s"warm search must scan the cached postings:\n$warmPlan")
    assert(!cold.search(oneTerm.toDF("query_id", "qtext"), 10)
      .queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "cold search must not depend on any cached relation")

    // out-of-band rm + rebuild on a DIFFERENT corpus: the manifest
    // history RESTARTS, so a cache keyed on the bare version number
    // would silently keep serving corpusA's postings — the generation
    // token (version + live-file-list hash) must not (the r13 warm-SQ8
    // hole, pinned here for the lexical twin)
    val fs0 = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.delete(new org.apache.hadoop.fs.Path(s"$base/idx"), true)
    cold.build(corpus) // the full corpus: docs >= 40 exist only here
    assert(rows(warm.search(qs, 10)) == rows(cold.search(qs, 10)),
      "after an out-of-band rebuild the warm cache must serve the NEW corpus")
    assert(rows(warm.search(qs, 10))
      == rows(TextQueries.bm25Search(corpus, qs, 10)))

    // CDC add invalidates: the new doc surfaces through the WARM path
    val delta = Seq((900001L, "hash join table hash join table"))
      .toDF("doc_id", "text")
    cold.add(delta)
    val updated = corpus.unionByName(delta)
    assert(rows(warm.search(qs, 10)) == rows(TextQueries.bm25Search(updated, qs, 10)),
      "a CDC add must invalidate the warm cache")
    // CDC delete invalidates: the doc vanishes from the WARM path
    cold.delete(Seq(900001L).toDF("doc_id"))
    assert(rows(warm.search(qs, 10)) == rows(TextQueries.bm25Search(corpus, qs, 10)),
      "a CDC delete must invalidate the warm cache")
    warm.releaseWarmCache()
  }

  test("warm cache is file-grained: fresh-keyed adds layer the delta; a replace or delete rebuilds; results stay bitwise-cold") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_layers").toString
    val cold = new TextIndex(spark, s"$base/idx", termParts = 16)
    val warm = new TextIndex(spark, s"$base/idx", termParts = 16, warmSearch = true)
    val corpusA = corpus.filter(col("doc_id") < 40L)
    cold.build(corpusA)
    assert(rows(warm.search(qs, 10)) == rows(cold.search(qs, 10)))
    assert(warm.warmLayerCount == 1, "one base layer after the first warm search")
    // a FRESH-KEYED add rides the store's insert fast path (files
    // append, nothing rewrites) — the cache must layer ONLY the delta
    // instead of rebuilding, and stay bitwise-identical to cold
    val d1 = Seq((900001L, "hash join table hash join table")).toDF("doc_id", "text")
    cold.add(d1)
    var truth = corpusA.unionByName(d1)
    assert(rows(warm.search(qs, 10)) == rows(TextQueries.bm25Search(truth, qs, 10)),
      "warm must serve the delta through the layered cache")
    assert(warm.warmLayerCount == 2, "the fresh-keyed add must layer, not rebuild")
    val d2 = Seq((900002L, "customer order priority segment")).toDF("doc_id", "text")
    cold.add(d2)
    truth = truth.unionByName(d2)
    assert(rows(warm.search(qs, 10)) == rows(TextQueries.bm25Search(truth, qs, 10)))
    assert(warm.warmLayerCount == 3)
    // and the layered plan still serves from memory
    val warmPlan = warm.search(Seq(1 -> "customer").toDF("query_id", "qtext"), 10)
      .queryExecution.executedPlan.toString
    assert(warmPlan.contains("InMemoryTableScan"), s"layered warm plan:\n$warmPlan")
    // REPLACING an existing doc takes the merge path (its bucket's
    // files retire) — stale cached rows would score a ghost, so the
    // cache must detect the removed file and rebuild from scratch
    val replaced = Seq((900001L, "entirely different replacement text"))
      .toDF("doc_id", "text")
    cold.add(replaced)
    truth = corpusA.unionByName(replaced).unionByName(d2)
    assert(rows(warm.search(qs, 10)) == rows(TextQueries.bm25Search(truth, qs, 10)),
      "a replace must not serve stale cached postings")
    assert(warm.warmLayerCount == 1, "a retired file must force a full rebuild")
    // delete: same rebuild discipline
    cold.delete(Seq(900002L).toDF("doc_id"))
    truth = corpusA.unionByName(replaced)
    assert(rows(warm.search(qs, 10)) == rows(TextQueries.bm25Search(truth, qs, 10)))
    assert(warm.warmLayerCount == 1)
    // the layer cap merges LSM-style: enough fresh adds in a row must
    // fold the two smallest layers (delta-sized) instead of unioning
    // forever OR paying a whole-store rebuild — the base layer is
    // never re-read under pure appends, so the count holds at exactly
    // the cap (1 base + 8 adds = 9 → one merge → 8), never snapping
    // back to 1 the way the old full consolidation did
    (0 until 8).foreach { i =>
      cold.add(Seq((910000L + i, s"fresh layering doc number$i hash join"))
        .toDF("doc_id", "text"))
      warm.search(qs, 10).collect()
    }
    assert(warm.warmLayerCount == 8,
      s"LSM cap: expected exactly 8 layers, got ${warm.warmLayerCount}")
    assert(rows(warm.search(qs, 10)) == rows(cold.search(qs, 10)),
      "post-merge parity")
    // several more adds keep oscillating at the cap with parity intact
    (8 until 11).foreach { i =>
      cold.add(Seq((910000L + i, s"fresh layering doc number$i hash join"))
        .toDF("doc_id", "text"))
      warm.search(qs, 10).collect()
    }
    assert(warm.warmLayerCount == 8, s"${warm.warmLayerCount}")
    assert(rows(warm.search(qs, 10)) == rows(cold.search(qs, 10)),
      "parity after repeated cap merges")
    warm.releaseWarmCache()
  }

  test("serving reads only the query terms' partitions") {
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_prune").toString
    val index = new TextIndex(spark, s"$base/idx", termParts = 16)
    index.build(corpus)
    index.compact() // cluster into the partitioned layout
    val parts = index.probeParts("hash join table")
    val (opened, live) = index.scanFootprint(parts)
    assert(opened > 0, "probe must open the matched partitions")
    assert(parts.length <= 3 && opened <= live * parts.length * 2 / 16,
      s"files opened ($opened of $live) must scale with probed partitions (${parts.length} of 16)")
  }

  test("streaming maintenance and serving compose against the same store") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_stream").toString
    val index = new TextIndex(spark, s"$base/idx", termParts = 8)
    index.build(corpus.limit(50))

    val docsIn = MemoryStream[(Long, String)]
    val maintain = index.maintainStream(
      docsIn.toDF().toDF("doc_id", "text"), s"$base/cp_m", compactEvery = 2)
    docsIn.addData((910001L, "hash join table hash join"))
    maintain.processAllAvailable()
    docsIn.addData((910002L, "window agg stream window"))
    maintain.processAllAvailable()
    maintain.stop()

    var got = Set.empty[Long]
    val queriesIn = MemoryStream[(Int, String)]
    val serve = index.serveStream(
      queriesIn.toDF().toDF("query_id", "qtext"), 10,
      b => got = got ++ b.select("doc_id").collect().map(_.getLong(0)), s"$base/cp_s")
    queriesIn.addData((1, "hash join table"), (2, "window agg stream"))
    serve.processAllAvailable()
    serve.stop()
    assert(got.contains(910001L) && got.contains(910002L),
      "stream-maintained docs must be retrievable by the serving stream")

    // filtered streamed serve (allow-list as a per-batch thunk, the
    // PqIndex.serveStream contract) equals the batch filtered search
    val allowedIds = Seq(910002L).toDF("doc_id")
    var fgot = Set.empty[Long]
    val qIn2 = MemoryStream[(Int, String)]
    val serveF = index.serveStream(
      qIn2.toDF().toDF("query_id", "qtext"), 10,
      b => fgot = fgot ++ b.select("doc_id").collect().map(_.getLong(0)),
      s"$base/cp_sf", allowed = Some(() => allowedIds))
    qIn2.addData((1, "hash join table"), (2, "window agg stream"))
    serveF.processAllAvailable()
    serveF.stop()
    val batchF = index.search(Seq(1 -> "hash join table", 2 -> "window agg stream")
        .toDF("query_id", "qtext"), 10, allowed = Some(allowedIds))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fgot == batchF && fgot == Set(910002L),
      s"streamed filtered serve must equal batch filtered search: $fgot vs $batchF")
  }

  test("auto build sizes termParts from token mass; explicit termParts wins") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_auto").toString
    val index = new TextIndex(spark, s"$base/idx") // termParts = 0 ⇒ auto
    index.build(corpus)
    val tokens = corpus.select(
      sum(size(graft.functions.TextFunctions.words(lower(col("text"))))
        .cast("long"))).head().getLong(0)
    assert(index.frozenTermParts == TextIndex.suggestTermParts(tokens),
      s"auto build must freeze suggestTermParts($tokens), got ${index.frozenTermParts}")
    // bucket layout is corpus-sized too, and the manifest records it
    val store = new graft.sources.SnapshotStore(spark, s"$base/idx/postings",
      key = "doc_id")
    assert(store.bucketCount.contains(graft.sources.SnapshotStore.suggestBuckets(
      TextIndex.PostingBytes * tokens, index.frozenTermParts)),
      s"auto build must record the suggested bucket layout, got ${store.bucketCount}")
    // the frozen layout survives the lifecycle: parity after an add
    index.add(Seq((900007L, "hash join table")).toDF("doc_id", "text"))
    val updated = corpus.unionByName(
      Seq((900007L, "hash join table")).toDF("doc_id", "text"))
    assert(rows(index.search(qs, 10)) == rows(TextQueries.bm25Search(updated, qs, 10)))
    val pinned = new TextIndex(spark, s"$base/idx2", termParts = 8)
    pinned.build(corpus)
    assert(pinned.frozenTermParts == 8)
  }

  test("suggestTermParts: ~1M tokens per partition, floored and capped") {
    import TextIndex.suggestTermParts
    assert(suggestTermParts(1000) == 8)                 // tiny corpus: floor
    assert(suggestTermParts(35000000L) == 35)           // sf10-scale: ≈ the hand-picked 64
    assert(suggestTermParts(6000000000000L) == 4096)    // 100 TB-scale: capped
    val pts = Seq(1L, 1000000L, 100000000L, 10000000000L)
    val got = pts.map(suggestTermParts(_))
    assert(got == got.sorted, s"must be monotone in token mass, got $got")
  }

  test("Zipf skew: the stopword partition is heavy, but a rare-term probe never opens it") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_skew").toString
    // every doc repeats the stopword; each doc has one unique rare term
    // (letters only — the tokenizer drops digits)
    def rareWord(d: Long): String =
      s"w${('a' + d / 26).toChar}${('a' + d % 26).toChar}"
    val docs = (0L until 400L).map(d =>
      (d, ("the " * 20) + rareWord(d))).toDF("doc_id", "text")
    val index = new TextIndex(spark, s"$base/idx", termParts = 16)
    index.build(docs)
    // the hazard is real: the hot term's partition dominates postings
    // mass (hash-partitioning cannot split one term)...
    val mass = index.partitionMass()
    val hotPart = index.probeParts("the").head
    assert(mass(hotPart) > 2L * (mass - hotPart).values.max,
      s"expected a dominant stopword partition, got $mass")
    // ...but query cost is skew-immune: a rare-term search opens only
    // its own term partition's files, not the stopword's
    val rare = index.probeParts(rareWord(7))
    assert(!rare.contains(hotPart), "distinct terms should hash apart here")
    val (opened, live) = index.scanFootprint(rare)
    assert(opened > 0 && opened < live,
      s"rare-term probe must prune the postings scan: $opened of $live files")
    // and results on the skewed corpus are still exactly the ad-hoc path
    val skewQs = Seq(1 -> rareWord(7), 2 -> s"the ${rareWord(3)}")
    assert(rows(index.search(skewQs, 10)) == rows(TextQueries.bm25Search(docs, skewQs, 10)))
  }

  test("stoplist caps a stopword query's SCAN; maxDfFrac caps its SCORING; others unchanged") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_stop").toString
    def rareWord(d: Long): String =
      s"w${('a' + d / 26).toChar}${('a' + d % 26).toChar}"
    // every doc repeats the stopword; one unique rare term per doc
    val docs = (0L until 400L).map(d =>
      (d, ("the " * 20) + rareWord(d))).toDF("doc_id", "text")
    val index = new TextIndex(spark, s"$base/idx", termParts = 16)
    index.build(docs)
    val stopQs = (1 to 40).map(i => i -> s"the ${rareWord(i.toLong)}").toDF("query_id", "qtext")

    // SCAN level: with the stopword stoplisted, its (dominant)
    // partition is never opened — the scanned-posting footprint drops
    // to the rare terms' partitions only
    val hotPart = index.probeParts("the").head
    val allParts = (1 to 40).flatMap(i => index.probeParts(s"the ${rareWord(i.toLong)}"))
      .distinct
    val stopParts = allParts.filterNot(_ == hotPart)
    val (openedAll, live) = index.scanFootprint(allParts)
    val (openedStop, _) = index.scanFootprint(stopParts)
    assert(openedStop < openedAll,
      s"stoplisting the hot term must shrink the probe: $openedStop vs $openedAll of $live")
    // the avoided partition is the single heaviest one — the scan that
    // no longer happens is the dominant one (row mass; tf-weighted the
    // gap is 20× wider, since "the" repeats 20× per doc)
    val mass = index.partitionMass()
    assert(stopParts.map(mass).max < mass(hotPart),
      s"the stoplisted term's partition must be the heavy one: $mass")

    // results with the stoplist == results of queries WITHOUT the term
    val bare = (1 to 40).map(i => i -> rareWord(i.toLong)).toDF("query_id", "qtext")
    assert(rows(index.search(stopQs, 10, stoplist = Set("the"))) ==
      rows(index.search(bare, 10)),
      "a stoplisted term must behave as if the query never contained it")

    // SCORING level: df("the") = 400 = all docs; any fraction below 1
    // excludes it, and the ranks equal the stoplist path (same terms
    // scored) even though its postings were read
    assert(rows(index.search(stopQs, 10, maxDfFrac = 0.5)) ==
      rows(index.search(bare, 10)),
      "a df-capped term must not contribute to scores")

    // queries with NO stopword are bit-identical under both knobs
    val rareQs = Seq(1 -> rareWord(5), 2 -> rareWord(9)).toDF("query_id", "qtext")
    assert(rows(index.search(rareQs, 10, stoplist = Set("the"), maxDfFrac = 0.5)) ==
      rows(index.search(rareQs, 10)),
      "the knobs must not disturb queries they don't apply to")

    // an all-stoplisted query vanishes from the output, like a query
    // of unknown terms
    val gone = index.search(Seq(7 -> "the the").toDF("query_id", "qtext"),
      10, stoplist = Set("the"))
    assert(gone.count() == 0)

    // PLAN pin (the property behind the 5M-doc wall collapse,
    // PLANS.md r11): the df cap references only posting-side columns
    // + the 1-row stats frame, so Catalyst pushes it BELOW the join
    // with the query terms — the hot term is dropped BEFORE it can
    // row-multiply against every query carrying it (measured 420 s →
    // 5 s at scale). A bm25Rank refactor that makes the cap depend on
    // a query-side column would silently reintroduce the blowup; this
    // catches it at 400 docs.
    val lp = index.search(stopQs, 10, maxDfFrac = 0.5)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val pushed = lp.collect { case j: Join =>
      Seq(j.left, j.right).exists(_.collectFirst {
        case f: Filter if f.condition.references.exists(_.name == "df") => f
      }.nonEmpty)
    }
    assert(pushed.exists(identity),
      s"the df cap must sit below a join in the optimized plan:\n$lp")
  }

  test("df guard: a hot query term warns naming both knobs; rare terms stay silent; results unchanged") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_textindex_guard").toString
    def rareWord(d: Long): String =
      s"w${('a' + d / 26).toChar}${('a' + d % 26).toChar}"
    val docs = (0L until 400L).map(d =>
      (d, ("the " * 20) + rareWord(d))).toDF("doc_id", "text")
    val index = new TextIndex(spark, s"$base/idx", termParts = 16)
    index.build(docs)
    def stderrOf(body: => Unit): String = {
      val buf = new java.io.ByteArrayOutputStream()
      val old = System.err
      System.setErr(new java.io.PrintStream(buf, true))
      try body finally System.setErr(old)
      buf.toString
    }
    val hotQ = Seq(1 -> s"the ${rareWord(5)}").toDF("query_id", "qtext")
    val rareQ = Seq(1 -> rareWord(5), 2 -> rareWord(9)).toDF("query_id", "qtext")
    // the hot term (df = 400/400 > 0.5) warns, naming BOTH remedies
    // and the silence knob — the operator-facing escape hatch r11's
    // 420 s wall showed a caller one unremarkable query away from
    val warned = stderrOf(index.search(hotQ, 10).count())
    assert(warned.contains("'the'") && warned.contains("stoplist=") &&
      warned.contains("maxDfFrac=") && warned.contains("warnDfFrac=0"), warned)
    // rare terms never trip it
    assert(!stderrOf(index.search(rareQ, 10).count()).contains("WARNING"))
    // the guard NEVER changes results — warn-only by contract
    assert(rows(index.search(hotQ, 10)) ==
      rows(index.search(hotQ, 10, warnDfFrac = 0.0)),
      "the guard must be advisory: identical rows with it on and off")
    // and it stands down when a remedy knob is already driving
    assert(!stderrOf(index.search(hotQ, 10, stoplist = Set("the")).count())
      .contains("WARNING"))
    assert(!stderrOf(index.search(hotQ, 10, maxDfFrac = 0.5).count())
      .contains("WARNING"))
  }
}
