package graft.dedup

import graft.SparkSpec
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  private def dir = sf("any")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash LSH recovers the high-Jaccard pairs the exact join finds") {
    val exact = pairSet(DedupQueries.dedupNgramJaccard(spark, dir)
      .filter(col("jaccard") >= 0.9))
    val lsh = pairSet(DedupQueries.dedupMinhashLsh(spark, dir))
    val missed = exact -- lsh
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
    // and LSH never reports below-threshold pairs (verification step works)
    val sub = DedupQueries.dedupMinhashLsh(spark, dir).filter(col("jaccard") < 0.8).count()
    assert(sub == 0)
  }

  test("simhash flags constructed near-identical docs and not unrelated ones") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (3L, "one completely different document about other things entirely here now")
    ).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
      Dedup.simhash(graft.functions.TextFunctions.words(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) < ham(sigs(1L), sigs(3L)),
      s"near-dup pair should be closer: ${ham(sigs(1L), sigs(2L))} vs ${ham(sigs(1L), sigs(3L))}")
  }

  test("simhash block join is exhaustive for hamming <= 3 (vs brute force)") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val sigs = docs.select(col("doc_id"),
      Dedup.simhash(graft.functions.TextFunctions.words(col("text"))).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    val joined = pairSet(DedupQueries.dedupSimhash(spark, dir))
    assert(joined == brute, s"block join must equal brute force; diff=${(brute -- joined) ++ (joined -- brute)}")
  }

  test("exact dedup groups normalized variants") {
    import spark.implicits._
    val df = Seq(
      (10L, "Hello   World"), (11L, "hello world"), (12L, "different")
    ).toDF("doc_id", "text")
    val exact = Dedup.exactGroups(df, col("text"), "doc_id").count()
    assert(exact == 3) // raw texts all distinct
    val norm = Dedup.exactGroups(df, Dedup.normalizedText(col("text")), "doc_id")
      .orderBy("keep_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(norm.toSeq == Seq((10L, 2L), (12L, 1L)))
  }

  test("jaccard maxDocFreq prunes hot shingles without affecting planted pairs") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val unpruned = pairSet(Dedup.jaccardPairs(docs, col("text"), "doc_id", 0.95))
    val pruned = pairSet(Dedup.jaccardPairs(docs, col("text"), "doc_id", 0.95, maxDocFreq = 50L))
    assert(unpruned.nonEmpty && pruned == unpruned,
      "planted ~0.99 pairs share rare shingles; a 50-doc DF cap must not lose them")
  }

  test("resolveClusters: chains collapse to the minimum id (transitive)") {
    import spark.implicits._
    // 1-2, 2-3 (chain) and 7-9; 3 never pairs with 1 directly
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val got = Dedup.resolveClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("resolveClusters: driver union-find equals distributed min-label") {
    import spark.implicits._
    // cycle, chain, singleton pair — all shapes in one graph
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 9L), (9L, 7L),
      (20L, 21L), (30L, 31L), (31L, 32L), (32L, 33L)).toDF("doc_a", "doc_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = asMap(Dedup.resolveClusters(pairs))
    val dist = asMap(Dedup.resolveClusters(pairs, driverMaxPairs = 0L))
    assert(driver == dist, "the two execution paths must agree exactly")
    assert(driver(3L) == 1L && driver(7L) == 5L && driver(33L) == 30L)
  }

  test("cluster-size histogram is consistent with the resolution it rolls up") {
    val resolved = Dedup.resolveClusters(DedupQueries.dedupNgramJaccard(spark, dir))
    val hist = DedupQueries.dedupClusterStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.nonEmpty, "corpus should contain planted near-dup clusters")
    // every cluster in a pair graph has >= 2 members by construction
    assert(hist.keys.min >= 2L, s"impossible singleton bucket in $hist")
    // mass check: sum(size * count) == docs in the resolution,
    // sum(count) == distinct canonicals
    assert(hist.map { case (sz, n) => sz * n }.sum == resolved.count())
    assert(hist.values.sum == resolved.select("canonical_id").distinct().count())
  }

  test("embedding pairs: cosine is symmetric-safe and bounded") {
    val out = DedupQueries.dedupEmbedding(spark, dir)
    val rows = out.collect()
    assert(rows.forall { r =>
      val c = r.getDouble(2); c >= 0.4 && c <= 1.0 + 1e-9 && r.getLong(0) < r.getLong(1)
    })
  }

  test("simhash maxBucket guard drops only hot-bucket pairs (degenerate-corpus bound)") {
    val s = spark
    import s.implicits._
    val spamText = "copy paste boilerplate navigation footer menu login register search home " * 8
    val pairText = "one singular rather particular document about unusual botanical specimens " * 8
    val noise = (200L until 215L).map(i =>
      (i, s"distinct${i}a words${i}b about${i}c topic${i}d number${i}e " * 12))
    val df = ((1L to 40L).map(i => (i, spamText)) ++
      Seq((100L, pairText), (101L, pairText)) ++ noise).toDF("doc_id", "text")
    def pairs(maxBucket: Long) =
      Dedup.simhashPairs(df, col("text"), "doc_id", maxHamming = 3, maxBucket = maxBucket)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unguarded = pairs(0)
    assert(unguarded.contains((100L, 101L)) && unguarded.size >= 40 * 39 / 2 + 1,
      s"expected the full spam clique + the small pair, got ${unguarded.size}")
    // cap at 10: the 40-doc spam cluster's buckets are dropped; the
    // 2-doc cluster's buckets survive — bounded join, targeted recall cost
    val guarded = pairs(10)
    assert(guarded == Set((100L, 101L)),
      s"guard must drop exactly the hot-bucket pairs, got $guarded")
  }

  test("doc-freq guard is inert on the gate corpus: guarded == exact jaccard pairs") {
    // corpus_clean runs jaccardPairs with maxDocFreq=100 while its
    // DuckDB oracle computes exact all-shingle Jaccard — sound only
    // while no shingle in the gate corpus exceeds doc-freq 100. This
    // pins that data-dependent assumption so a corpus change (a hotter
    // boilerplate shingle) fails HERE, loudly, instead of silently
    // diverging from the documented exact semantics.
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    val exact = keyed(Dedup.jaccardPairs(docs, col("text"), "doc_id", 0.8))
    val guarded = keyed(Dedup.jaccardPairs(docs, col("text"), "doc_id", 0.8, maxDocFreq = 100))
    assert(guarded == exact,
      "a shingle now exceeds doc-freq 100 on the gate corpus: corpus_clean's " +
        "oracle SQL must mirror the prune (or the guard must be re-tuned)")
  }

  test("embedding LSH: candidate set is complete at tau=0.9 on a planted near-dup corpus") {
    // planted near-dup regime: 120 seeded gaussian base vectors, 25 of
    // them duplicated with small noise (cosine ≈ 0.97) — the regime a
    // training-corpus embedding dedup actually operates in. Wide-band
    // params (15 bands × 4 bits, 60-bit signature): per-pair miss at
    // cosine 0.95 is (1 - p^4)^15 ≈ 1e-7, and with this fixed seed the
    // run is deterministic — LSH-then-verify must equal the exact join.
    val s = spark
    import s.implicits._
    val dim = 64
    val rnd = new scala.util.Random(7L)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = (0 until 120).map(i => (i.toLong, unit()))
    val dups = (0 until 25).map { i =>
      val (id, v) = base(i)
      val noisy = v.map(x => x + 0.03f * rnd.nextGaussian().toFloat)
      (1000L + id, noisy)
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    def keyed(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    val exact = keyed(Dedup.embeddingPairs(df, col("embedding"), "vec_id", 0.9))
    val lsh = keyed(Dedup.embeddingLshPairs(df, col("embedding"), "vec_id", 0.9,
      dim, bands = 15, bitsPerBand = 4))
    assert(exact.size >= 25, s"corpus should contain the planted near-dups, got ${exact.size}")
    assert(lsh == exact, s"LSH must find every exact pair at tau=0.9; missed ${exact.keySet -- lsh.keySet}")
    // the plan must be banded equi-joins — no cartesian anywhere
    val plan = Dedup.embeddingLshPairs(df, col("embedding"), "vec_id", 0.9,
      dim, bands = 15, bitsPerBand = 4).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"LSH dedup plan must be equi-join only:\n$plan")
  }

  test("embedding LSH gate entry: subset of the exact join with identical cosines") {
    val exact = DedupQueries.dedupEmbeddingBruteforce(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    val lsh = DedupQueries.dedupEmbeddingLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    assert(lsh.nonEmpty, "gate entry must be non-trivial on the gate corpus")
    assert(lsh.keySet.subsetOf(exact.keySet), "verification must admit only true pairs")
    assert(lsh.forall { case (k, v) => exact(k) == v }, "cosines must match the exact join bit-for-bit")
  }

  test("tight-band LSH (the 100x operating point): complete at tau=0.8 on near-verbatim dups") {
    // the sf10 envelope (PLANS.md finding 2): high threshold + LONG
    // bands (4×15 bits — random collision 4·2⁻¹⁵ vs the gate params'
    // 6·2⁻⁸). The regime is near-verbatim embedding copies (cosine
    // ≈ 0.9999, θ ≈ 1°): per-band hit (1-θ/π)^15 ≈ 0.92, per-pair
    // miss ≈ 3e-5, deterministic with the fixed seed — LSH-then-verify
    // must EQUAL the exact join at τ=0.8, not just subset it
    val s = spark
    import s.implicits._
    val dim = 64
    val rnd = new scala.util.Random(11L)
    def unit(): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val base = (0 until 150).map(i => (i.toLong, unit()))
    val dups = (0 until 30).map { i =>
      val (id, v) = base(i)
      (2000L + id, v.map(x => x + 0.002f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    def keyed(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap
    val exact = keyed(Dedup.embeddingPairs(df, col("embedding"), "vec_id", 0.8))
    val tight = keyed(DedupQueries.dedupEmbeddingLshTight(df, "vec_id", "embedding"))
    assert(exact.size >= 30, s"corpus must contain the planted copies, got ${exact.size}")
    assert(tight == exact,
      s"tight bands must find every tau=0.8 pair; missed ${exact.keySet -- tight.keySet}")
  }

  test("pair-grid embedding dedup equals brute force and has no cartesian join") {
    val grid = DedupQueries.dedupEmbedding(spark, dir)
    val brute = DedupQueries.dedupEmbeddingBruteforce(spark, dir)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(keyed(grid) == keyed(brute), "grid tiling must not lose or duplicate pairs")
    val plan = grid.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"grid plan must be equi-join only:\n$plan")
  }

  test("substring windows: planted passage copy found, disjoint docs not") {
    import spark.implicits._
    // doc 1 and 2 share a verbatim 12-word passage inside different
    // surrounding text; doc 3 shares vocabulary but no 10-word window
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, s"intro words here $passage and a unique tail one"),
      (2L, s"different opening text $passage with another ending two"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota other words entirely"))
      .toDF("doc_id", "text")
    val out = Dedup.substringPairs(docs, col("text"), "doc_id", windowTokens = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.keySet == Set((1L, 2L)), s"got $out")
    // 12-word shared passage => 3 distinct shared 10-word windows
    assert(out((1L, 2L)) == 3, s"got $out")
  }

  test("substring windows on testdata: symmetric-free, positive counts, hash-join plan") {
    val df = DedupQueries.dedupSubstring(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty, "gate corpus contains near-verbatim planted dups")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1) && r.getLong(2) > 0)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"substring pairing must stay an equi-join:\n$plan")
  }

  test("bipartite minhash: near-dups of the REFERENCE side pair, train-train dups don't") {
    import spark.implicits._
    val w = (1 to 30).map(i => s"word$i")
    val evalDoc = w.mkString(" ")
    val train = Seq(
      1L -> (w ++ Seq("tail", "extra")).mkString(" "), // reworded eval: j = 28/30
      2L -> evalDoc,                                   // verbatim copy: j = 1.0
      3L -> (1 to 30).map(i => s"other$i").mkString(" "), // unrelated
      4L -> "too short",                               // < k words: no shingles
      5L -> ((1 to 30).map(i => s"other$i").mkString(" ") + " x")) // near-dup of 3, NOT of evals
      .toDF("doc_id", "text")
    val evals = Seq(100L -> evalDoc,
      101L -> (1 to 30).map(i => s"unrelatedeval$i").mkString(" ")).toDF("doc_id", "text")
    val got = Dedup.minhashLshPairsBipartite(train, evals, col("text"), "doc_id", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(byPair.keySet == Set(1L -> 100L, 2L -> 100L),
      s"exactly the two eval near-dups pair (train-train dup 3~5 must NOT): ${got.toSeq}")
    assert(byPair(2L -> 100L) == 1.0)
    assert(math.abs(byPair(1L -> 100L) - 28.0 / 30.0) < 1e-12,
      s"jaccard must be the exact shingle ratio: ${byPair(1L -> 100L)}")
    // the corpus-side plan has no corpus shuffle: band join and set
    // joins all broadcast the eval-sized side
    val plan = Dedup.minhashLshPairsBipartite(train, evals, col("text"), "doc_id", 0.8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"bipartite banding must stay an equi-join:\n$plan")
  }
}
