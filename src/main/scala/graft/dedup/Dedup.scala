package graft.dedup

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for LLM-training-data pipelines: exact,
  * normalized-exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup detection.
  *
  * Scale design (the point of each algorithm):
  *  - exact: one hash-groupBy — the map-side partial agg collapses
  *    duplicates before the shuffle, so shuffle volume ≈ distinct docs.
  *  - n-gram Jaccard: shingle-explode + equi-join on shingle turns the
  *    O(n²) all-pairs problem into Σ_shingle (df²); `maxDocFreq` drops
  *    stop-shingles so one viral shingle can't produce a quadratic
  *    blowup (the standard guard at corpus scale).
  *  - MinHash+LSH: per-row signature (pure codegen, no shuffle), then
  *    banding turns near-dup search into an equi-join on
  *    (band, band_hash) — candidates ∝ true near-dups, not n².
  *  - SimHash: 64-bit per-row signature; Hamming ≤ k pairs found by
  *    pigeonhole over 4×16-bit blocks → equi-join on block value.
  *  - embedding: brute-force pair join is the correctness baseline;
  *    the LSH-bucketed variant in graft.similarity is the scale path.
  *
  * Everything per-row is native HOF expressions; no UDFs anywhere.
  */
object Dedup {

  /** Distinct word k-shingles of `text` (native codegen expression —
    * see [[graft.functions.expr.WordShingles]]). */
  def shingles(text: Column, k: Int = 3): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    ofExpr(graft.functions.expr.WordShingles(toExpr(text), k, distinct = true))
  }

  // ---- exact ----

  /** One row per distinct key: the surviving (minimum) id and the
    * duplicate count. `keep_id` is the canonical representative. */
  def exactGroups(df: DataFrame, key: Column, id: String): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** Whitespace/case-normalized exact dedup key. */
  def normalizedText(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  // ---- n-gram Jaccard ----

  /** All pairs `(id_a < id_b)` with shingle-Jaccard ≥ `minJaccard`.
    * `maxDocFreq` (0 = off) drops shingles shared by more than that
    * many docs before pairing — at web scale a handful of boilerplate
    * shingles would otherwise dominate the join. With the guard on,
    * Jaccard is computed over the SURVIVING shingle universe (set
    * sizes recounted after pruning, so intersection and sizes agree) —
    * the standard stop-shingle-removal semantics; when no shingle
    * exceeds the cap the result is identical to the exact join. */
  def jaccardPairs(df: DataFrame, text: Column, id: String,
                   minJaccard: Double, k: Int = 3, maxDocFreq: Long = 0L): DataFrame = {
    val sh = df.select(col(id).as("doc_id"), shingles(text, k).as("s"))
      .withColumn("n_sh", size(col("s")))
    // join on the 64-bit shingle hash, not the (long) shingle string —
    // an 8-byte shuffle key instead of ~60 chars. The repartition is an
    // exchange-reuse barrier: both join branches read ONE materialized
    // explode instead of recomputing the shingling per side.
    val ex = sh.select(col("doc_id"), col("n_sh"),
        explode(transform(col("s"), x => xxhash64(x))).as("sh"))
      .repartition(col("sh"))
    val pruned =
      if (maxDocFreq > 0) {
        val hot = ex.groupBy("sh").count().filter(col("count") > maxDocFreq).select("sh")
        val surviving = ex.join(broadcast(hot), Seq("sh"), "left_anti")
        // recount set sizes over the pruned universe so the Jaccard
        // below stays internally consistent (inter ≤ n_a, n_b)
        val nSurviving = surviving.groupBy("doc_id")
          .agg(count(lit(1)).as("n_surviving"))
        surviving.drop("n_sh")
          .join(nSurviving, Seq("doc_id"))
          .withColumnRenamed("n_surviving", "n_sh")
      } else ex
    val a = pruned.select(col("sh"), col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
    val b = pruned.select(col("sh"), col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
    a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      // exact size-ratio prune (jaccard ≤ min(|A|,|B|)/max(|A|,|B|)):
      // pairs that cannot reach the threshold never enter the
      // per-pair aggregation shuffle
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(minJaccard) * greatest(col("n_a"), col("n_b")).cast("double"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---- exact substring windows ----

  /** Exact substring-window dedup (the distributed counterpart of
    * suffix-array substring dedup à la Lee et al., "Deduplicating
    * Training Data Makes Language Models Better"): all pairs
    * `(id_a < id_b)` sharing at least one verbatim `windowTokens`-word
    * window, with the count of distinct shared windows. Catches
    * copied PASSAGES between otherwise-different documents — a regime
    * Jaccard misses (a 50-word quote inside two long documents is
    * invisible at set-similarity level).
    *
    * Plan shape: one codegen shingling pass, explode to (doc, window
    * hash), equi-join on the 8-byte hash (same width argument as
    * [[jaccardPairs]] — the exchange never carries window text), pair
    * aggregation with map-side partials. Windows are deduped per doc
    * inside the row, so `shared_windows` counts distinct windows. */
  def substringPairs(df: DataFrame, text: Column, id: String,
                     windowTokens: Int = 10): DataFrame = {
    // r15: same scan fanout as jaccardPairs — the window shingling is
    // the expensive per-row stage and must not run inside a serial
    // single-row-group scan task (guide §2.5); no-op on parallel inputs
    val g = graft.sources.PlanUtils.fanoutBy(
        df.select(col(id).as("doc_id"), text.as("t")), col("doc_id"))
      .select(col("doc_id"), shingles(col("t"), windowTokens).as("s"))
      .select(col("doc_id"), explode(transform(col("s"), x => xxhash64(x))).as("gh"))
      .repartition(col("gh")) // exchange-reuse barrier for the self-join
    val a = g.select(col("gh"), col("doc_id").as("doc_a"))
    val b = g.select(col("gh"), col("doc_id").as("doc_b"))
    a.join(b, Seq("gh")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_windows"))
  }

  // ---- MinHash + LSH ----

  /** Signature prime: minhash values live in [0, P). */
  val MinHashP = 2147483647L // 2^31 - 1 (Mersenne prime)

  /** Deterministic (a, b) coefficients for the universal hash family
    * h_i(x) = (aᵢ·x + bᵢ) mod P. */
  private[graft] def coeffs(numPerm: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPerm)((1L + rnd.nextInt((MinHashP - 1).toInt).toLong,
                       rnd.nextInt(MinHashP.toInt).toLong))
  }

  /** MinHash signature (`numPerm` longs) of a string-array column.
    * Base-hashes each element once, then a single codegen'd loop takes
    * every per-permutation minimum ([[graft.functions.expr.MinHashSignature]])
    * — one projection, zero shuffles, operands stay < 2^31 so products
    * fit a long. */
  def minhashSignature(elems: Column, numPerm: Int = 128, seed: Long = 42L): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val base = transform(elems, e => pmod(xxhash64(e), lit(MinHashP)))
    val cs = coeffs(numPerm, seed)
    ofExpr(graft.functions.expr.MinHashSignature(
      toExpr(base), cs.map(_._1).toArray, cs.map(_._2).toArray, MinHashP))
  }

  /** LSH band keys: hash of each `rowsPerBand`-slice of the signature.
    * Pairs agreeing on ANY band become candidates. */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      hash(slice(sig, j * rowsPerBand + 1, rowsPerBand), lit(j))
    }: _*)

  /** MinHash/LSH near-dup pairs, verified by true Jaccard ≥ `minJaccard`.
    * Candidate generation is an equi-join on (band, hash); verification
    * re-joins the (distinct) shingle sets and computes exact Jaccard
    * with `array_intersect` — only over candidates, never all pairs. */
  def minhashLshPairs(df: DataFrame, text: Column, id: String, minJaccard: Double,
                      numPerm: Int = 128, bands: Int = 16, k: Int = 3,
                      seed: Long = 42L): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val r = numPerm / bands
    // r15: fanoutBy before shingling (guide §2.5 — the serial single-
    // row-group scan trap; see jaccardPairs). `sh` has THREE consumers
    // (the signature pass + both verification join sides), each of
    // which re-executes the shingling — the fanout makes each of those
    // passes parallel; at scale it is a no-op and the 3-scan shape is
    // unchanged.
    val sh = graft.sources.PlanUtils.fanoutBy(
        df.select(col(id).as("doc_id"), text.as("t")), col("doc_id"))
      .select(col("doc_id"), shingles(col("t"), k).as("s"))
      .filter(size(col("s")) > 0)
    // barrier (see simhashPairs): materialize the signature once
    // instead of letting CollapseProject recompute it per band hash.
    // r15: barrierBy, not the conditional fanout — with the scan
    // fanout below, `fanout` would be a no-op and the barrier (and
    // its exchange reuse across both band-join sides) would silently
    // vanish
    val sig = graft.sources.PlanUtils.barrierBy(
        sh.select(col("doc_id"), minhashSignature(col("s"), numPerm, seed).as("sig")),
        col("doc_id"))
      .withColumn("bh", bandHashes(col("sig"), bands, r))
    val bandsEx = sig.select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "h")))
    val cand = bandsEx.select(col("band"), col("h"), col("doc_id").as("doc_a"))
      .join(bandsEx.select(col("band"), col("h"), col("doc_id").as("doc_b")), Seq("band", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sets = sh.select(col("doc_id"), col("s"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("s_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("s_b")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("s_a"), col("s_b"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("s_a")) + size(col("s_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** BIPARTITE [[minhashLshPairs]]: near-dup pairs between a large
    * corpus and a SMALL reference set (near-duplicate benchmark
    * decontamination — the GPT-4-report shape, where exact-gram
    * matching misses reworded eval items). Same signatures, same band
    * keys, same exact-Jaccard verification; the asymmetry is the
    * plan: the reference side's band table and shingle sets are
    * eval-sized, so the band equi-join broadcasts them and the corpus
    * is SCANNED, never shuffled — candidates (true near-dups + band
    * collisions, both ∝ the small side) are the only moving rows.
    * Output `(doc_id, eval_id, jaccard)`, one row per surviving pair. */
  def minhashLshPairsBipartite(big: DataFrame, small: DataFrame, text: Column,
                               id: String, minJaccard: Double,
                               numPerm: Int = 128, bands: Int = 16, k: Int = 3,
                               seed: Long = 42L): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val r = numPerm / bands
    // r15: scan fanout before shingling + unconditional signature
    // barrier, for the same two reasons as [[minhashLshPairs]] (serial
    // single-row-group scans; a conditional barrier disappears once
    // the input is parallel). Applied to BOTH sides: the eval side is
    // tiny so its extra exchange is noise, and one `sh` definition
    // keeps the two tokenizations structurally identical.
    def sh(df: DataFrame) = graft.sources.PlanUtils.fanoutBy(
        df.select(col(id).as("doc_id"), text.as("t")), col("doc_id"))
      .select(col("doc_id"), shingles(col("t"), k).as("s"))
      .filter(size(col("s")) > 0)
    def banded(shDf: DataFrame) = graft.sources.PlanUtils.barrierBy(
        shDf.select(col("doc_id"), minhashSignature(col("s"), numPerm, seed).as("sig")),
        col("doc_id"))
      .withColumn("bh", bandHashes(col("sig"), bands, r))
      .select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "h")))
    val bigSh = sh(big)
    val smallSh = sh(small)
    val cand = banded(bigSh)
      .join(broadcast(banded(smallSh)
        .select(col("doc_id").as("eval_id"), col("band"), col("h"))), Seq("band", "h"))
      .select(col("doc_id"), col("eval_id")).distinct()
    cand
      .join(bigSh, Seq("doc_id")) // candidate-sized: AQE broadcasts cand
      .join(broadcast(smallSh.select(col("doc_id").as("eval_id"), col("s").as("s_e"))),
        Seq("eval_id"))
      .withColumn("inter", size(array_intersect(col("s"), col("s_e"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("s")) + size(col("s_e")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id"), col("eval_id"), col("jaccard"))
  }

  // ---- SimHash ----

  /** Per-element 62-bit base hash for SimHash: two independent
    * polynomial rolling hashes (base-31 Horner fold mod the Mersenne
    * prime 2^31−1, seeds 17/131), each REMIXED through a universal
    * hash `(h·A + B) mod p`, packed as `h1'·2^31 + h2'`. Chosen over
    * xxhash64 because every step is exactly reproducible in plain SQL
    * (`list_reduce` Horner fold + modular affine map), which makes the
    * whole simhash pipeline oracle-checkable.
    *
    * The remix is load-bearing: a word of ≤ 6 bytes never wraps the
    * fold (31⁶·255 < p), so the RAW fold's high bits encode word
    * length/prefix — on short-word corpora all signatures then share
    * those bits and the block join degenerates toward n² (measured:
    * 38 M spurious Hamming ≤ 3 pairs on a 50k-doc synthetic corpus).
    * Multiplying by a large odd constant mod p scatters small values
    * across the full range. Bits 62–63 remain structurally 0 —
    * constant for every doc, so Hamming distances are unaffected. */
  def simhashBaseHash(e: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val p = 2147483647L
    def poly(seed: Long, a: Long, b: Long) = {
      val h = ofExpr(graft.functions.expr.RollingHash(toExpr(e), seed, p))
      pmod(h * lit(a) + lit(b), lit(p))
    }
    poly(17L, 1103515245L, 12345L) * lit(2147483648L) +
      poly(131L, 1140671485L, 12820163L)
  }

  /** 64-bit SimHash of a string-array column: per-bit ±1 votes from
    * each element's [[simhashBaseHash]], packed into a long — one
    * codegen'd pass ([[graft.functions.expr.SimHash64]]). */
  def simhash(elems: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    ofExpr(graft.functions.expr.SimHash64(toExpr(transform(elems, e => simhashBaseHash(e)))))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with Hamming ≤ `maxHamming` (< 16).
    * Pigeonhole: split the 64 bits into 4 blocks of 16 — any pair
    * within Hamming ≤ 15 agrees exactly on ≥ 0 blocks only if
    * maxHamming ≥ 4·16… for maxHamming ≤ 3, two of the 4 blocks can
    * differ at most 3 bits total, so at least ONE block matches
    * exactly → equi-join on (block_idx, block_value) finds all pairs.
    *
    * `maxBucket` (0 = off, the exact default) drops (block, value)
    * buckets holding more than that many docs before pairing — the
    * degenerate-corpus guard. A corpus whose vocabulary is dominated
    * by a handful of tokens collapses most signatures onto a few
    * values (measured: an 8-word stopword-spam corpus put ~all of 50k
    * docs in the same buckets → ~n²/2 candidates); capping hot
    * buckets bounds the join at the cost of recall ONLY among docs
    * inside those over-full buckets — the same trade `jaccardPairs`
    * makes with `maxDocFreq`. */
  def simhashPairs(df: DataFrame, text: Column, id: String, maxHamming: Int = 3,
                   maxBucket: Long = 0L): DataFrame = {
    require(maxHamming < 4, "4-block pigeonhole is only complete for hamming <= 3")
    // repartition = materialization barrier: without it CollapseProject
    // inlines the signature expression into all 4 block computations
    // and both join sides (recomputing tokenization + hashing each
    // time); with it the shuffle carries 16 bytes/doc and fans the
    // downstream join out across the cluster. The partition count is
    // PINNED (repartition(n, col), which AQE must respect): signatures
    // are 16 bytes/doc, so AQE's size-based coalescing would collapse
    // the exchange to one partition and serialize the (potentially
    // quadratic) block join onto one core — observed 22 min single-task
    // on a degenerate 50k-doc corpus.
    // r15: fanoutBy before the signature projection — tokenization +
    // the two rolling hashes per word otherwise run inside the serial
    // single-row-group scan task (guide §2.5); no-op on parallel inputs
    val sigs = graft.sources.PlanUtils.fanoutBy(
        df.select(col(id).as("doc_id"), text.as("t")), col("doc_id"))
      .select(col("doc_id"), simhash(TextFunctions.words(col("t"))).as("sig"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
    val blocksAll = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(j =>
        shiftrightunsigned(col("sig"), j * 16).bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("blk", "v")))
    val blocks =
      if (maxBucket > 0) {
        val hot = blocksAll.groupBy("blk", "v").count()
          .filter(col("count") > maxBucket).select("blk", "v")
        blocksAll.join(broadcast(hot), Seq("blk", "v"), "left_anti")
      } else blocksAll
    val cand = blocks.select(col("blk"), col("v"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
      .join(blocks.select(col("blk"), col("v"), col("doc_id").as("doc_b"), col("sig").as("sig_b")),
        Seq("blk", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
    cand.filter(col("hamming") <= maxHamming)
  }

  // ---- cluster resolution (dedup EXECUTION, not just detection) ----

  /** Resolve near-dup pairs into clusters: every doc that appears in a
    * pair is assigned the minimum doc id reachable through the pair
    * graph (its "canonical" survivor).
    *
    * Hybrid execution — the pair set is ∝ near-duplicates, not corpus
    * size, so even a 100 TB corpus usually yields a pair set that fits
    * one bounded collect. Up to `driverMaxPairs` (default 2M ≈ 32 MB)
    * the resolution is a driver-side union-find: ONE job instead of
    * O(log n) shuffle rounds, each of which costs a driver round-trip
    * that dominates when the graph is small. Above the bound, the
    * standard distributed min-label propagation runs (id-only joins,
    * `localCheckpoint` per round to cut lineage, convergence checks
    * batched two rounds per action).
    *
    * Returns `(doc_id, canonical_id)` for every doc in a pair;
    * `doc_id == canonical_id` marks the survivor. Docs in no pair are
    * implicitly their own canonical (callers left-anti join to drop
    * losers). */
  def resolveClusters(pairs: DataFrame, driverMaxPairs: Long = 2000000L): DataFrame = {
    val und = pairs.select(col("doc_a"), col("doc_b")).distinct().localCheckpoint()
    if (und.count() <= driverMaxPairs) resolveOnDriver(und)
    else resolveDistributed(und)
  }

  /** Bounded union-find with path compression + min-id canonicals. */
  private def resolveOnDriver(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    for (row <- und.collect()) {
      val (a, b) = (row.getLong(0), row.getLong(1))
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val minOfRoot = scala.collection.mutable.HashMap.empty[Long, Long]
    for (x <- parent.keys) {
      val r = find(x)
      minOfRoot(r) = math.min(minOfRoot.getOrElse(r, Long.MaxValue), x)
    }
    parent.keys.toSeq.sorted
      .map(x => (x, minOfRoot(find(x))))
      .toDF("doc_id", "canonical_id")
  }

  private def resolveDistributed(und: DataFrame): DataFrame = {
    val edges = und.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .unionByName(und.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("a").as("doc_id"))
      .distinct()
      .withColumn("lbl", col("doc_id"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // two propagation rounds per driver round-trip: the convergence
      // count is the only action, so batching it halves driver stalls
      // (worst case one extra no-op round after the fixed point)
      var next = labels
      for (_ <- 1 to 2) {
        val viaNeighbor = edges
          .join(next.withColumnRenamed("doc_id", "b_doc"), col("b") === col("b_doc"))
          .select(col("a").as("doc_id"), col("lbl"))
        next = next.unionByName(viaNeighbor)
          .groupBy("doc_id").agg(min(col("lbl")).as("lbl"))
          .localCheckpoint()
      }
      changed = next.join(labels.withColumnRenamed("lbl", "old"), Seq("doc_id"))
        .filter(col("lbl") =!= col("old")).count()
      labels = next
    }
    labels.select(col("doc_id"), col("lbl").as("canonical_id"))
  }

  /** Brute-force cosine near-dup pairs (correctness baseline; see
    * graft.similarity for the LSH-bucketed scale path). Norms are
    * computed once per vector BEFORE the pair join. */
  def embeddingPairs(df: DataFrame, vec: Column, id: String, minCosine: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val v = df.select(col(id).as("vec_id"), vec.as("v")).withColumn("nrm", norm(col("v")))
    val a = v.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = graft.sources.PlanUtils.fanout(
      v.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")))
    a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosinePrenormed(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Banded random-hyperplane LSH near-dup pairs over an embedding
    * column, verified by exact cosine ≥ `minCosine` — the SCALE path
    * for embedding dedup (the grid/brute-force entries below are the
    * exact-at-any-threshold baselines). Same banding idea as
    * [[minhashLshPairs]], in cosine space: `bands` keys of
    * `bitsPerBand` hyperplane sign bits each ([[graft.functions.expr.RhpBandKeys]],
    * one codegen pass per row); vectors agreeing on ANY band become
    * candidates; only candidates are exact-scored. Candidate volume is
    * ∝ bucket collisions — in the near-dup regime (τ ≥ 0.9, where a
    * training-corpus dedup actually operates) that is ∝ true dups, not
    * n², so the shape survives a 100× corpus where the all-pairs
    * baselines cannot.
    *
    * Plan shape: the band exchange carries (band, key, id) — 20 bytes
    * per row per band, never a vector; candidate id pairs are
    * distinct-ed and ONLY then re-joined to vectors (each corpus
    * vector crosses an exchange a constant number of times,
    * independent of `bands`). Deterministic: planes derive from the
    * seed ([[graft.functions.VectorFunctions.rhpPlanes]]), so an
    * oracle can replay the exact candidate set as plane literals in
    * SQL — see DedupQueries.
    *
    * Output contract matches [[embeddingPairs]]: `(vec_a < vec_b,
    * cosine)`, restricted to LSH candidates. Recall vs the exact join
    * is the band-collision curve `1-(1-p^bits)^bands`, `p = 1-θ/π` —
    * at τ=0.9 pick wide bands (e.g. 15×4; bands·bits ≤ 63 so the
    * signature fits a long) for recall ≈ 1; DedupSpec pins candidate
    * completeness on a planted near-dup corpus. */
  def embeddingLshPairs(df: DataFrame, vec: Column, id: String, minCosine: Double,
                        dim: Int, bands: Int = 6, bitsPerBand: Int = 8,
                        seed: Long = 42L): DataFrame = {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val planes = rhpPlanes(bands * bitsPerBand, dim, seed).toArray
    val v = graft.sources.PlanUtils.fanout(
      df.select(col(id).as("vec_id"), vec.as("v"))
        .withColumn("nrm", norm(col("v")))
        .withColumn("bh", ofExpr(graft.functions.expr.RhpBandKeys(
          toExpr(col("v")), planes, bands, bitsPerBand))))
    embeddingLshPairsKeyed(v, minCosine)
  }

  /** Near-dup pairs from an already-banded `(vec_id, v, nrm, bh)`
    * frame — callers that need the band keys for their own purposes
    * (the streaming dedup keeps them as index state) compute them
    * exactly once and share the frame. */
  private[graft] def embeddingLshPairsKeyed(v: DataFrame, minCosine: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val keyed = v.select(col("vec_id"), posexplode(col("bh")).as(Seq("band", "bkey")))
    val cand = keyed.select(col("band"), col("bkey"), col("vec_id").as("vec_a"))
      .join(keyed.select(col("band"), col("bkey"), col("vec_id").as("vec_b")), Seq("band", "bkey"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    cand
      .join(v.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na")), Seq("vec_a"))
      .join(v.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cosine", cosinePrenormed(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Exact cosine near-dup pairs via the distributed pair-grid: hash
    * every vector into one of `blocks` buckets; the B(B+1)/2 unordered
    * bucket pairs become equi-join cells, each holding one grid tile of
    * the comparison matrix. Identical output to [[embeddingPairs]], but
    * the plan is two broadcast joins + one shuffle equi-join on the
    * cell id — no CartesianProduct, and the O(n²) comparison work (which
    * is unavoidable for EXACT search at a threshold inside the noise
    * floor — measured on the test corpus: recall-1.0 SRP-LSH admits 98%
    * of all pairs as candidates, multi-probe IVF 80%) is spread evenly
    * over the cluster with each side shuffled ~B× instead of one node
    * holding a cartesian. Pick blocks ≈ √parallelism at scale; for
    * genuinely near-duplicate corpora (cosine ≥ 0.9) use the banded
    * [[graft.similarity.Similarity]] LSH path instead, where banding
    * prunes candidates to ∝ true matches. */
  def embeddingPairsBlocked(df: DataFrame, vec: Column, id: String, minCosine: Double,
                            blocks: Int = 16): DataFrame = {
    import graft.functions.VectorFunctions._
    val spark = df.sparkSession
    import spark.implicits._
    val cells = (0 until blocks).flatMap(i => (i until blocks).map(j => (i, j)))
      .toDF("ba", "bb").withColumn("cell", col("ba") * blocks + col("bb"))
    val v = df.select(col(id).as("v_id"), vec.as("v"))
      .withColumn("nrm", norm(col("v")))
      .withColumn("bkt", pmod(hash(col("v_id")), lit(blocks)))
    val left = v.join(broadcast(cells), col("bkt") === col("ba"))
      .select(col("cell"), col("v_id").as("l_id"), col("v").as("lv"), col("nrm").as("ln"))
    val right = v.join(broadcast(cells), col("bkt") === col("bb"))
      .select(col("cell"), (col("bb") =!= col("ba")).as("off_diag"),
        col("v_id").as("r_id"), col("v").as("rv"), col("nrm").as("rn"))
    left.join(right, Seq("cell"))
      // diagonal cells pair each unordered {l,r} twice — keep one; a
      // pair never spans two cells, so no global distinct is needed
      .filter(col("off_diag") || col("l_id") < col("r_id"))
      .withColumn("cosine", cosinePrenormed(dot(col("lv"), col("rv")), col("ln"), col("rn")))
      .filter(col("cosine") >= minCosine)
      .select(
        least(col("l_id"), col("r_id")).as("vec_a"),
        greatest(col("l_id"), col("r_id")).as("vec_b"),
        col("cosine"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540 — public): k-means-cluster the embedding space
    * with the IVF coarse quantizer, then exact-cosine ALL PAIRS within
    * each cluster. The data-adaptive counterpart to
    * [[embeddingLshPairs]]: random hyperplanes prune by chance
    * collisions, k-means cells prune by the corpus's own density
    * structure — on clustered corpora (the regime SemDeDup targets:
    * semantically redundant web text) the cells are tight and the
    * within-cell quadratic is spent exactly where the duplicates are.
    *
    * Plan: one bounded sample fit (reused via `prefit` in production —
    * same contract as ivfTopK), one codegen'd argmin assignment per
    * side, one equi-join on cell id. Cost is Σ|cell|²: at
    * `Similarity.suggestNCells` (~4√n cells, mean cell √n/4) that is
    * ~n^1.5/16 comparisons — subquadratic, spread evenly unless one
    * cell hoards the corpus, which is a FIT problem (raise nClusters)
    * surfaced by `groupBy(cell).count` before committing to the join.
    * The exchange carries (cell, id, vec): vectors must co-locate to
    * be compared — unlike the banding path there is no ids-only trick,
    * because the candidate set IS the cell.
    *
    * By-construction exactness WITHIN the partition: emitted pairs are
    * exact cosines ≥ `minCosine`, a strict subset of
    * [[embeddingPairs]] at the same threshold. What clustering trades
    * away is CROSS-cell pairs — near-dups split by a cell boundary
    * (the paper accepts this; DedupSpec pins planted-corpus recall at
    * the operating point). Resolution (keep one per group) composes
    * exactly as for every other pair op: [[resolveClusters]]. */
  def semdedupPairs(df: DataFrame, vec: Column, id: String, nClusters: Int = 0,
                    minCosine: Double, seed: Long = 42L,
                    prefit: Option[graft.similarity.Similarity.IvfModel] = None): DataFrame = {
    import graft.functions.VectorFunctions._
    import graft.similarity.Similarity
    val base = df.select(col(id).as("id"), vec.as("vec"))
    // nClusters = 0 ⇒ corpus-sized cells (~4√n, suggestNCells): a FIXED
    // cell count makes Σ|cell|² = n²/k — quadratic with a constant
    // divisor — where sized cells give ~n^1.5/16. The count() is one
    // bounded metadata-cheap action paid once per fit (a prefit skips
    // it entirely, which is the production path). Same self-sizing
    // contract as PqIndex.build(nCells = 0).
    val model = prefit.getOrElse {
      // max(2, …): Spark ML KMeans rejects k < 2, and suggestNCells
      // floors at 1 for a near-empty corpus
      val k = if (nClusters > 0) nClusters
              else math.max(2, Similarity.suggestNCells(base.count()))
      Similarity.ivfFit(base, k, seed)
    }
    // fanout barrier: assignment + norm feed both join sides — without
    // it the argmin (nClusters dot products per row) re-executes per
    // consumer, same lesson as embeddingPairs
    // r15: barrierBy, not the conditional round-robin fanout — the
    // assignment feeds BOTH join sides, so the exchange must always
    // materialize (a conditional barrier vanishes on parallel inputs
    // and the argmin re-executes per side), and a keyed exchange skips
    // round-robin's sortBeforeRepartition pass
    val v = graft.sources.PlanUtils.barrierBy(
      base.select(col("id"), col("vec"),
          Similarity.ivfAssign(col("vec"), model).as("cell"))
        .withColumn("nrm", norm(col("vec"))),
      col("id"))
    val a = v.select(col("cell"), col("id").as("vec_a"),
      col("vec").as("va"), col("nrm").as("na"))
    val b = v.select(col("cell"), col("id").as("vec_b"),
      col("vec").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("cell"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", cosinePrenormed(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= minCosine)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }
}
