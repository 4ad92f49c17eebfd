package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** topKRerank's candMult rule, pinned at spec scale on the same
  * planted-mode shape the r11 sf100 measurement used (PLANS.md): the
  * 8 B/vec PQ code separates gaussian modes well but barely orders
  * WITHIN a mode, so rerank recall saturates exactly when the
  * shortlist covers the query's mode population — candMult ≈
  * modeSize/topK — and below that it is shortlist-starved. A
  * regression that broke stage-1 widening (shortlist not growing
  * with candMult) or stage-2 exactness (re-scoring not repairing
  * within-shortlist order) fails here at 1600 vectors, not at 2M. */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val nModes = 16
  private val perMode = 100

  /** 16 gaussian modes × 100 members: center coords N(0,1) so
    * ‖c‖² ≈ dim, member noise 0.5/coord so intra-mode cosine ≈
    * 1/(1+0.25) = 0.8 vs inter-mode 0 ± 1/√dim — ScaleGen's
    * `clustered` construction at spec scale. */
  private lazy val corpus = {
    def center(m: Int): Array[Float] = {
      val rnd = new scala.util.Random(m * 2862933555777941757L + 3037000499L)
      Array.fill(dim)(rnd.nextGaussian().toFloat)
    }
    val rows = for (m <- 0 until nModes; i <- 0 until perMode) yield {
      val rnd = new scala.util.Random(m * 100000L + i * 7L + 1)
      ((m * perMode + i).toLong, center(m).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
    rows.toDF("id", "vec")
  }

  test("rerank recall saturates at candMult ~ modeSize/topK; starved below; monotone in candMult") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rerank").toString
    val idx = new PqIndex(spark, dir, nCells = nModes)
    idx.build(corpus)
    val queries = corpus.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
      .orderBy("h").limit(20).drop("h").cache()
    queries.count()
    val bf = Similarity.bruteForceTopK(queries, corpus, 10).cache()
    bf.count()
    def r(candMult: Int): Double =
      Similarity.recall(idx.topKRerank(queries, corpus, 10, candMult = candMult), bf)
    val starved = r(1)
    val covering = r(perMode / 10) // shortlist = 100 = the mode population
    assert(covering >= 0.9,
      f"a mode-covering shortlist must saturate recall: $covering%.3f")
    assert(covering - starved >= 0.2,
      f"the dial must matter: starved $starved%.3f vs covering $covering%.3f " +
        "— if these match, stage-1 widening no longer widens")
    // recall can only improve as the shortlist grows (stage 2 is an
    // exact re-score of a superset)
    assert(r(4) >= starved - 1e-9 && covering >= r(4) - 1e-9,
      "recall must be monotone in candMult")
  }

  test("SQ8 tier: in-index rerank tracks exact rerank within epsilon and beats the plain search; CDC keeps the sidecar in lockstep") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rerank_sq8").toString
    val idx = new PqIndex(spark, dir, nCells = nModes, sq8 = true)
    idx.build(corpus)
    assert(idx.hasRerankTier, "sq8=true build must commit the sidecar")
    val queries = corpus.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
      .orderBy("h").limit(20).drop("h").cache()
    queries.count()
    val bf = Similarity.bruteForceTopK(queries, corpus, 10).cache()
    bf.count()
    val cover = perMode / 10
    val exact = Similarity.recall(idx.topKRerank(queries, corpus, 10, cover), bf)
    val viaSq8 = Similarity.recall(idx.topKRerankIndexed(queries, 10, cover), bf)
    val plain = Similarity.recall(idx.topK(queries, 10), bf)
    // the byte grid's per-coord error (~max|x|/254) sits far below the
    // PQ distortion the re-rank repairs: epsilon-close to exact rerank
    assert(math.abs(viaSq8 - exact) <= 0.02,
      f"SQ8 rerank $viaSq8%.3f must track exact rerank $exact%.3f within epsilon")
    // and strictly an upgrade over serving codes alone
    assert(viaSq8 >= plain + 0.2,
      f"the in-index dial must matter: plain $plain%.3f vs SQ8 rerank $viaSq8%.3f")
    // recallAt(inIndex = true) measures this exact path
    assert(idx.recallAt(queries, corpus, 10, cover, inIndex = true) >= plain + 0.2)

    // CDC lockstep: an added duplicate of a corpus vector must surface
    // through the SQ8-re-ranked search at cosine ~1 (its sidecar row
    // exists), and a takedown must remove it from re-ranked results
    val probe = corpus.filter(col("id") === 0L).cache()
    val dupId = 999999L
    idx.add(probe.select(lit(dupId).as("id"), col("vec")))
    def hitIds(): Set[Long] = idx.topKRerankIndexed(probe, 10, cover)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(hitIds().contains(dupId),
      "a CDC-added vector must be re-rankable (sidecar row written with its codes)")
    assert(idx.remove(probe.select(lit(dupId).as("id"))) == 1L)
    assert(!hitIds().contains(dupId), "a removed vector must leave both tiers")

    // empty-shortlist contract: an allow-list that excludes everything
    // is an empty RESULT, never a crash (the key×cell prune touches no
    // files — the codesTable rule applies to the sidecar read too)
    val noneAllowed = corpus.filter(col("id") < 0L).select("id")
    assert(idx.topKRerankIndexed(queries, 10, 4, Some(noneAllowed)).count() == 0L)

    // observability + the refusal contract
    val d = idx.describe().toMap
    assert(d("rerank_tier") == "true" && d("rerank_vectors") == corpus.count().toString)
    val bare = new PqIndex(spark,
      java.nio.file.Files.createTempDirectory("graft_rerank_bare").toString,
      nCells = nModes)
    bare.build(corpus)
    assert(!bare.hasRerankTier)
    val e = intercept[RuntimeException](bare.topKRerankIndexed(queries, 10, 4).count())
    assert(e.getMessage.contains("no SQ8 re-rank tier"), e.getMessage)
    // a rebuild WITHOUT the flag retires a stale tier (never serves
    // old vectors against new codes)
    val idx2 = new PqIndex(spark, dir, nCells = nModes)
    idx2.build(corpus)
    assert(!idx2.hasRerankTier, "a tier-less rebuild must retire the sidecar")
  }

  test("shareEncodePass=false (scratch-bounded build) produces stores identical to the checkpointed build") {
    val d1 = java.nio.file.Files.createTempDirectory("graft_rerank_enc1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_rerank_enc2").toString
    val a = new PqIndex(spark, d1, nCells = nModes, sq8 = true)
    a.build(corpus)
    val b = new PqIndex(spark, d2, nCells = nModes, sq8 = true)
    b.build(corpus, shareEncodePass = false)
    assert(b.isBuilt && b.hasRerankTier)
    // the encode is deterministic under the frozen models (same seed →
    // same models in both dirs), so every tier must agree row for row:
    // plain PQ search AND the SQ8 in-index rerank
    val queries = corpus.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
      .orderBy("h").limit(10).drop("h").cache()
    queries.count()
    def plain(i: PqIndex) = i.topK(queries, 10)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def rr(i: PqIndex) = i.topKRerankIndexed(queries, 10, perMode / 10)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(plain(a) == plain(b),
      "recomputed-encode codes must match the checkpointed build's")
    assert(rr(a) == rr(b),
      "recomputed-encode SQ8 tier must match the checkpointed build's")
  }

  test("warm SQ8 serving: the cached sidecar serves identical rows; a CDC add/remove invalidates the cache") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rerank_warm").toString
    val idx = new PqIndex(spark, dir, nCells = nModes, sq8 = true)
    idx.build(corpus)
    // a SEPARATE warm handle: the cache must key on the STORE's
    // committed version, not on which handle wrote
    val warm = new PqIndex(spark, dir, nCells = nModes, sq8 = true, warmRerank = true)
    val queries = corpus.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
      .orderBy("h").limit(10).drop("h").cache()
    queries.count()
    val cover = perMode / 10
    def rows(i: PqIndex) = i.topKRerankIndexed(queries, 10, cover)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val cold = rows(idx)
    assert(rows(warm) == cold, "warm serving must change the read path, not the rows")
    // second call: a cache HIT (same version) — still identical
    assert(rows(warm) == cold)
    assert(warm.warmLayerCount == 1, "one base layer after the first warm call")
    // CDC add commits a new sidecar version: the warm handle must
    // re-validate and serve the added vector (the freshness rule) —
    // and, since a fresh-keyed add rides the store's insert fast path
    // (files append, nothing rewrites), the file-grained cache must
    // LAYER the delta instead of rebuilding the whole sidecar
    val probe = corpus.filter(col("id") === 0L).cache()
    val dupId = 888888L
    idx.add(probe.select(lit(dupId).as("id"), col("vec")))
    def warmHits(): Set[Long] = warm.topKRerankIndexed(probe, 10, cover)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(warmHits().contains(dupId),
      "a CDC add must re-validate the warm cache — served rows reflect the add")
    assert(warm.warmLayerCount == 2, "a fresh-keyed add must layer, not rebuild")
    // a remove RETIRES the key's bucket file — stale cached bytes
    // would serve a ghost, so the cache must rebuild from scratch
    assert(idx.remove(probe.select(lit(dupId).as("id"))) == 1L)
    assert(!warmHits().contains(dupId),
      "a takedown must invalidate the warm cache — removed rows stop serving")
    assert(warm.warmLayerCount == 1, "a retired file must force a full rebuild")
    warm.releaseWarmCache()
  }

  test("warm serving mirrors the cold cell-eligibility (a displaced artifact falls back under warm too); a manifest-history restart invalidates the cache") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rerank_warmcell").toString
    val idx = new PqIndex(spark, dir, nCells = nModes, nProbe = 2, sq8 = true)
    idx.build(corpus)
    val warm = new PqIndex(spark, dir, nCells = nModes, nProbe = 2, sq8 = true,
      warmRerank = true)
    // 8 exemplars from 8 modes at nProbe=2: the probed-cell union
    // (~9 of 16 on this seeded geometry) crosses the pre-filter bound,
    // so the warm path reads the BARE cached frame — the branch where
    // the r13 review found a displaced row would join by id alone and
    // score stale bytes the cold path's file prune never reads — while
    // cells still remain UNPROBED to displace a row into
    val queries = corpus.filter(col("id") % 100 === 0 && col("id") < 800)
      .select(col("id"), col("vec")).cache()
    queries.count()
    // k covers whole probed cells: every shortlisted candidate
    // SURFACES, so the displaced id's row (wherever it ranks) is
    // directly visible in the output
    val k = 4 * perMode
    def rows(i: PqIndex) = i.topKRerankIndexed(queries, k, candMult = 1)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(warm) == rows(idx), "healthy warm must equal cold row for row")
    // displace a MODE-MATE of query 0 (id 5 — the search self-excludes
    // the query id, so the artifact must be a real candidate): its
    // sidecar row re-keyed under an UNPROBED cell, carrying a FAR
    // vector's bytes (inter-mode cosine ~0 vs the mode-mate's ~0.8) —
    // the crash-artifact shape the cold file prune drops
    val (model0, coarse0) = idx.models()
    val probedCells = Pq.probeCells(queries, model0, coarse0, 2, None).toSet
    assert(probedCells.size * 2 >= nModes && probedCells.size < nModes,
      s"fixture must hit the no-prefilter branch AND leave an unprobed cell: $probedCells")
    val cellOut = (0 until nModes).find(c => !probedCells.contains(c)).get
    val sqDirect = new graft.sources.SnapshotStore(spark, s"$dir/sq8",
      key = "neighbor_id", buckets = 32, partitionCol = Some("cell"))
    val farBytes = sqDirect.read().get.filter(col("neighbor_id") === 1500L)
      .select("sq").head().getAs[Array[Byte]](0) // a far-mode member
    import spark.implicits._
    sqDirect.upsert(Seq((5L, cellOut, farBytes)).toDF("neighbor_id", "cell", "sq"))
    val cold = rows(idx)
    assert(rows(warm) == cold,
      "warm must mirror the cold prune: the displaced row's stale bytes never score")
    // and the fallback is the PLAIN pq score, not the stale bytes: id
    // 5's cosine for query 0 equals its stage-1 cosine exactly
    val plain5 = idx.topK(queries.filter(col("id") === 0L), k)
      .filter(col("neighbor_id") === 5L).select("cosine").head().getDouble(0)
    val fb = cold.collect { case (0L, 5L, c) => c }
    assert(fb == Set(plain5),
      s"the displaced candidate must keep its exact stage-1 score: $fb vs $plain5")
    // manifest-history RESTART: rm + rebuild starts the sidecar store
    // at version 1 again — a version-only cache key would serve the
    // OLD corpus's bytes; the file-list token must invalidate
    val fsDir = new java.io.File(dir)
    def rmAll(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmAll)); f.delete()
    }
    rmAll(fsDir)
    val dupId = 999999L
    val probe0 = corpus.filter(col("id") === 0L).select("vec").head()
      .getSeq[Float](0).toArray
    val corpus2 = corpus.unionByName(Seq((dupId, probe0)).toDF("id", "vec"))
    new PqIndex(spark, dir, nCells = nModes, nProbe = 1, sq8 = true).build(corpus2)
    val after = warm.topKRerankIndexed(
        queries.filter(col("id") === 0L), 10, candMult = 4)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(after.contains(dupId),
      "a rebuilt-from-scratch store must invalidate the warm cache " +
        s"(version restarts at 1; the file-list token must differ): $after")
  }

  test("SQ8 fallback: a candidate whose sidecar row is a crash artifact keeps its stage-1 PQ score, never vanishes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rerank_fb").toString
    val idx = new PqIndex(spark, dir, nCells = nModes, sq8 = true)
    idx.build(corpus)
    val queries = corpus.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
      .orderBy("h").limit(10).drop("h").cache()
    queries.count()
    val plain = idx.topK(queries, 10).cache()
    plain.count()
    // simulate the worst crash artifact: EVERY sidecar row missing
    // (delete through the store's own keyed path — manifest survives,
    // hasRerankTier stays true). The left-join fallback must degrade
    // the re-rank to EXACTLY the plain probed search: every candidate
    // keeps its stage-1 PQ cosine, so the top-10 of the widened
    // shortlist IS the plain top-10 — an inner join would instead
    // return zero rows
    val sqDirect = new graft.sources.SnapshotStore(spark, s"$dir/sq8",
      key = "neighbor_id", buckets = 32, partitionCol = Some("cell"))
    sqDirect.delete(corpus.select(col("id").as("neighbor_id")))
    assert(idx.hasRerankTier, "the emptied sidecar still exists on disk")
    val degraded = idx.topKRerankIndexed(queries, 10, candMult = 4)
    assert(degraded.count() == plain.count() && degraded.count() > 0,
      "the fallback must not lose candidates")
    assert(degraded.exceptAll(plain).isEmpty && plain.exceptAll(degraded).isEmpty,
      "with no sidecar rows the re-rank must equal the plain search row for row")
  }
}
