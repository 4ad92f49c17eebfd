package graft.similarity

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Shapes:
  *  - [[bruteForceTopK]] — exact top-k: broadcast the (small) query
  *    set against the streamed corpus, score pairs, window top-k.
  *    The correctness baseline and the right answer whenever
  *    |queries| is small.
  *  - [[lshTopK]] — random-hyperplane LSH: per-row signatures (pure
  *    codegen), banded equi-join for candidates, exact re-scoring of
  *    candidates only. The scale path: candidate volume ∝ bucket
  *    collisions, not |Q|·|C|.
  *  - [[knnLabelVote]] — k-NN majority-vote classification on top of
  *    either search.
  *
  * Norms are always computed once per row before any join.
  */
object Similarity {

  /** Bounded top-k aggregation: `topk_by_score` keeps k rows per group
    * per partition map-side, so the shuffle carries ≤ partitions·|Q|·k
    * rows — the window formulation would shuffle every scored pair. */
  private[similarity] def topkAgg(scored: DataFrame, k: Int,
                                  dedupIds: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val topk = ofExpr(graft.functions.expr.TopKByScore(
      toExpr(col("cosine")), toExpr(col("neighbor_id")), k, dedupIds).toAggregateExpression())
    scored.groupBy(col("query_id")).agg(topk.as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "entry")))
      .select(
        col("query_id"),
        col("entry.id").as("neighbor_id"),
        col("entry.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** `(query_id, neighbor_id, cosine, rank)` — exact top-k by cosine,
    * ties broken by neighbor id (deterministic). `queries`/`corpus`
    * need `(id, vec)` columns. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .withColumn("qn", norm(col("qv")))
    // r15: keyed fanout BELOW the norm projection (no round-robin
    // sort, and the norm runs post-exchange in parallel instead of
    // inside the serial single-row-group scan — guide §2.5); single
    // consumer, no-op on parallel scans
    val c = graft.sources.PlanUtils.fanoutBy(corpus, col("id"))
      .select(col("id").as("neighbor_id"), col("vec").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosinePrenormed(dot(col("qv"), col("cv")), col("qn"), col("cn")))
    topkAgg(scored, k)
  }

  /** Banded random-hyperplane signatures: `bands` keys of `bitsPerBand`
    * sign bits each. Two vectors are candidates if ANY band matches. */
  def bandedSignatures(vec: Column, bands: Int, bitsPerBand: Int, dim: Int,
                       seed: Long = 42L): Column = {
    val sig = rhpSignature(vec, bands * bitsPerBand, dim, seed)
    array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        call_function("shiftrightunsigned", sig, lit(j * bitsPerBand))
          .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("key"))
    }: _*)
  }

  /** LSH-bucketed approximate top-k: equi-join on (band, key), exact
    * cosine on candidates only, window top-k. Recall/cost is tuned by
    * (bands, bitsPerBand): more bands → higher recall, bigger buckets
    * → more candidates. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
              bands: Int = 4, bitsPerBand: Int = 6, seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val planes = rhpPlanes(bands * bitsPerBand, dim, seed).toArray
    // one compiled pass per row for all band keys (posexplode's pos IS
    // the band index) — see RhpBandKeys for why the composed signature
    // expression is a codegen hazard
    def withBands(df: DataFrame, idc: String, vc: String, nc: String): DataFrame =
      df.select(col("id").as(idc), col("vec").as(vc))
        .withColumn(nc, norm(col(vc)))
        .select(col(idc), col(vc), col(nc),
          posexplode(ofExpr(graft.functions.expr.RhpBandKeys(
            toExpr(col(vc)), planes, bands, bitsPerBand))).as(Seq("band", "key")))
    val q = withBands(queries, "query_id", "qv", "qn")
    // r15: keyed, not round-robin — skips sortBeforeRepartition
    val c = withBands(graft.sources.PlanUtils.fanoutBy(corpus, col("id")),
      "neighbor_id", "cv", "cn")
    // Score DURING the band join — both vectors are already co-located
    // (q is broadcast, cv comes straight off the scan), so no exchange
    // ever carries a vector. A pair matching several bands is scored
    // more than once (≤ `bands` cheap codegen'd dots — duplicates have
    // bit-identical cosines), and the id-deduping top-k aggregate
    // collapses them map-side: ONE bounded aggregation, shuffle ≤
    // partitions·|Q|·k rows. The round-2 version shuffled the 512-byte
    // vectors through a distinct() (slower than brute force); a
    // pair-level dedup aggregate would still shuffle every candidate.
    val scored = broadcast(q).join(c, Seq("band", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosinePrenormed(dot(col("qv"), col("cv")), col("qn"), col("cn")))
    topkAgg(scored, k, dedupIds = true)
  }

  /** A fitted IVF coarse quantizer: just the centroids, as plain float
    * arrays — small enough to live on the driver and be baked into
    * codegen'd expressions as literals. A production index fits this
    * ONCE (offline, on a bounded sample) and reuses it for every query
    * batch; [[graft.queries.SimilarityQueries]] caches fits per
    * (dataset, params) for exactly that reason. */
  final case class IvfModel(centroids: Array[Array[Float]]) {
    def nCells: Int = centroids.length
  }

  /** Deterministic, layout-independent sample of `(id, vec)` rows: the
    * `sampleN` smallest by hash(id) — a hash order is a pseudo-random
    * permutation, so this is an unbiased sample that does NOT depend on
    * file order (a time- or cluster-sorted corpus layout would make a
    * `limit()` prefix cover one region of embedding space and collapse
    * the quantizer), needs no corpus `count()`, and plans as
    * TakeOrdered (per-partition partial top-N, no full sort shuffle). */
  private[similarity] def hashSample(corpus: DataFrame, sampleN: Int): DataFrame =
    corpus.select(col("vec"), xxhash64(col("id")).as("__h"))
      .orderBy("__h").limit(sampleN).select("vec")

  /** Cell-count guideline for IVF-family indexes — a TWO-REGIME rule,
    * and deliberately so:
    *
    *  - growth regime (n ≲ 16k): ~4√n cells (the FAISS rule of
    *    thumb). The sf10 scaling run (PLANS.md) is why: a FIXED
    *    nCells makes probe-bounded search degrade as the corpus
    *    grows past it.
    *  - bounded-cell-size regime (beyond): the fit-sample bound
    *    (≥ ~40 points per trainable centroid) freezes cells at
    *    sampleN/40 — 500 under the 20k default — so cell SIZE grows
    *    with n. The r10 sf100 experiment (PLANS.md, 2M vectors)
    *    VINDICATES this: explicit 1k/2k/4k-cell layouts at the same
    *    probe fraction left recall flat (0.023-0.040, the noise band)
    *    while build cost grew ~20× (Spark ML KMeans' k-means|| init
    *    has a driver-local refinement quadratic-ish in k) and serve
    *    walls ~2.7× (probe fan-out overhead at constant candidate
    *    volume). More cells at a fixed probe FRACTION buy nothing:
    *    per-query candidates are nProbe·n/nCells = n/32 either way.
    *
    * At frontier scale the operator bounds cell size explicitly —
    * fitsample= (cells ≈ n/4096 wants sampleN ≈ n/100) and probe= to
    * pin a constant candidate budget against a recall target — both
    * plumbed through index-build and the DAG's index step. Since r6
    * this IS the default: PqIndex.build with nCells = 0 resolves
    * through it. Changing the cell count remains a rebuild decision:
    * it is part of the frozen model set. */
  def suggestNCells(n: Long, sampleN: Int = 20000): Int =
    math.max(1, math.min(4.0 * math.sqrt(n.toDouble), sampleN / 40.0).toInt)

  /** Probe-count guideline PAIRED with [[suggestNCells]]: the probed
    * FRACTION of cells, not a fixed cell count, is what recall tracks —
    * a constant nProbe over corpus-sized cells silently degrades recall
    * exactly as a constant nCells degraded cost (4/16 cells = 25% at
    * spec scale shrank to 4/500 = 0.8% at sf10 before this existed).
    * Floor 4 (the pinned spec-scale operating point: 4 of 16 cells),
    * then ~1/32 of the cells — per-query candidates stay nProbe/nCells
    * · n ≈ n/32 of the PQ codes, which is the scan-vs-recall trade the
    * sf10 recall measurement in PLANS.md validates. Clamped to nCells
    * (a tiny index probes everything). Since r7 this is PqIndex's
    * default: nProbe = 0 resolves through it at query time from the
    * FROZEN cell count, so the probe budget tracks the layout without
    * being baked into the model sidecar — an operator can still pin
    * nProbe explicitly to trade recall for latency. */
  def suggestNProbe(nCells: Int): Int =
    math.min(math.max(1, nCells), math.max(4, math.ceil(nCells / 32.0).toInt))

  /** Recall of `approx` against `exact` ground truth: the fraction of
    * exact `(query_id, neighbor_id)` top-k pairs the approximate
    * result recovered. Validation/monitoring surface (two bounded
    * actions), used by the build-time recall check and the PLANS.md
    * scale runs — NOT a serving-path operator. */
  def recall(approx: DataFrame, exact: DataFrame): Double = {
    val total = exact.count()
    if (total == 0L) 1.0
    else approx.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .count().toDouble / total
  }

  /** Fit the coarse quantizer on a bounded, count-free [[hashSample]].
    * Quantizer quality needs stability, not optimality: at 100 TB the
    * fit reads one pass for a ~20k-row sample; production callers fit
    * once and reuse via `prefit`. */
  def ivfFit(corpus: DataFrame, nCells: Int, seed: Long = 42L,
             sampleN: Int = 20000): IvfModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val fitSample = hashSample(corpus, sampleN)
      .withColumn("fv", array_to_vector(col("vec")))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(fitSample)
    IvfModel(model.clusterCenters.map(c => c.toArray.map(_.toFloat)))
  }

  /** Nearest-centroid id, as a pure codegen'd expression (argmin of
    * `nCells` l2sq dots against literal centroids; ties → lower id).
    * Used for BOTH corpus assignment and query probing, so the two
    * sides always agree on cell geometry. */
  def ivfAssign(vec: Column, model: IvfModel): Column =
    // r15: array_min, not probeCells(…, 1) — assignment needs only the
    // argmin, and array_min is one O(nCells) pass with no sorted-copy
    // allocation where array_sort pays O(nCells·log nCells) per ROW
    // (semdedup assigns every corpus row against ~4√n centroids — at
    // 178 cells this was ~40% of the assignment stage). Identical
    // result: struct ordering compares `d` then `cell`, exactly the
    // (distance, lower-id-wins) rule the sorted form's head obeys,
    // NaN ordered last by both.
    array_min(array(cellDists(vec, model): _*)).getField("cell")

  /** The `nProbe` closest cell ids for `vec`, closest first. The
    * ranking key is `‖c‖² − 2·v·c`, NOT the full `‖v−c‖²`: the
    * dropped `‖v‖²` term is constant per row, so the cell ORDER is
    * identical — and it matters that it's gone, because CollapseProject
    * inlines this whole array into every consumer, so each centroid's
    * `dot(vec, vec)` would re-evaluate the vec expression twice more
    * per cell (measured 3× on the OPQ-rotated encode, where `vec` is a
    * 4096-FLOP MatVecFloat). */
  def probeCells(vec: Column, model: IvfModel, nProbe: Int): Column =
    slice(array_sort(array(cellDists(vec, model): _*)), 1, nProbe)("cell")

  /** The per-cell `(distance-rank, cell)` structs [[probeCells]] sorts
    * and [[ivfAssign]] takes the min of — one definition so the two
    * consumers cannot disagree on the ranking key. */
  private def cellDists(vec: Column, model: IvfModel): IndexedSeq[Column] = {
    import graft.functions.VectorFunctions.dot
    model.centroids.zipWithIndex.map { case (ctr, idx) =>
      val cNormSq = ctr.map(x => x.toDouble * x.toDouble).sum
      struct((lit(cNormSq) - lit(2.0) * dot(vec, lit(ctr))).as("d"), lit(idx).as("cell"))
    }.toIndexedSeq
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer splits the
    * corpus into `nCells` cells; each query probes its `nProbe`
    * closest cells and exact-scores only those members. Classic
    * FAISS-style IVF-Flat, Spark-first: assignment is one codegen'd
    * projection, search is an equi-join on cell id + bounded top-k
    * aggregate. Pass `prefit` to reuse a fitted quantizer (the
    * production shape — fitting per query batch is wasted corpus
    * passes); otherwise a bounded sample fit runs once per call.
    *
    * Compared to RHP-LSH: data-adaptive cells give much better
    * recall/cost on clustered corpora; cost is the one-off fit. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L,
              prefit: Option[IvfModel] = None): DataFrame = {
    val model = prefit.getOrElse(ivfFit(corpus, nCells, seed))
    // corpus side: one cell per vector — same argmin expression as the
    // query probe, so both sides share the float centroid geometry
    val c = corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
      .withColumn("cell", ivfAssign(col("cv"), model))
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .select(col("query_id"), col("qv"),
        explode(probeCells(col("qv"), model, nProbe)).as("cell"))
    // no distinct needed: each corpus vector lives in exactly one cell
    // and probe cells are distinct, so a (query, neighbor) pair occurs
    // at most once — the aggregate IS the dedup
    val scored = broadcast(q).join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    topkAgg(scored, k)
  }

  /** Majority label among the k nearest neighbors; ties broken by
    * smaller label (deterministic). `corpus` needs `(id, vec, label)`. */
  def knnLabelVote(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val nn = bruteForceTopK(queries, corpus.select("id", "vec"), k)
    val labels = corpus.select(col("id").as("neighbor_id"), col("label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label"))
    nn.join(labels, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("query_id"), col("label").as("predicted_label"), col("votes"))
  }
}
