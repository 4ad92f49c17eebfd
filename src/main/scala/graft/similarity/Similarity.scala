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
  private[similarity] def topkAgg(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val topk = ofExpr(graft.functions.expr.TopKByScore(
      toExpr(col("cosine")), toExpr(col("neighbor_id")), k).toAggregateExpression())
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
    val c = graft.sources.PlanUtils.fanout(
      corpus.select(col("id").as("neighbor_id"), col("vec").as("cv"))
        .withColumn("cn", norm(col("cv"))))
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
    def withBands(df: DataFrame, idc: String, vc: String): DataFrame =
      df.select(col("id").as(idc), col("vec").as(vc),
          posexplode(bandedSignatures(col("vec"), bands, bitsPerBand, dim, seed)).as(Seq("p", "bk")))
        .select(col(idc), col(vc), col("bk.band").as("band"), col("bk.key").as("key"))
    val q = withBands(queries, "query_id", "qv")
    val c = withBands(graft.sources.PlanUtils.fanout(corpus), "neighbor_id", "cv")
    val cand = broadcast(q).join(c, Seq("band", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv").distinct()
    topkAgg(cand.withColumn("cosine", cosine(col("qv"), col("cv"))), k)
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer splits the
    * corpus into `nCells` cells; each query probes its `nProbe`
    * closest cells and exact-scores only those members. Classic
    * FAISS-style IVF-Flat, Spark-first: the quantizer is MLlib KMeans
    * (fit on a sample at real scale), assignment is one projection,
    * search is an equi-join on cell id + bounded top-k aggregate.
    *
    * Compared to RHP-LSH: data-adaptive cells give much better
    * recall/cost on clustered corpora; cost is the one-off fit. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val corpusVec = corpus.select(col("id"), col("vec"))
      .withColumn("fv", array_to_vector(col("vec")))
    // quantizer quality needs only a representative sample and a few
    // iterations — centroids don't have to be optimal, just stable.
    // At 100 TB the fit reads a ~100k-row sample, never the corpus.
    val fitSample = {
      val n = corpusVec.count()
      val target = 20000L
      if (n > target) corpusVec.sample(withReplacement = false, target.toDouble / n, seed)
      else corpusVec
    }
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(8)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(fitSample)
    val cells = model.clusterCenters.map(c => c.toArray.map(_.toFloat))
    // corpus side: one cell per vector (the model's own assignment)
    val c = model.transform(corpusVec)
      .select(col("id").as("neighbor_id"), col("vec").as("cv"), col("cell"))
    // query side: nProbe closest centroids, computed with the native
    // dot/norm expressions against broadcast centroid literals
    val centroidDists = cells.zipWithIndex.map { case (ctr, idx) =>
      struct(l2sq(col("qv"), lit(ctr)).as("d"), lit(idx).as("cell"))
    }
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .withColumn("probe",
        slice(array_sort(array(centroidDists: _*)), 1, nProbe))
      .select(col("query_id"), col("qv"), explode(col("probe.cell")).as("cell"))
    val scored = broadcast(q).join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cosine").distinct()
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
