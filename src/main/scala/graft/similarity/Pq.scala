package graft.similarity

import graft.functions.VectorFunctions.norm
import graft.functions.expr.{PqEncode, PqLut, PqScore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}

/** Product quantization ANN (FAISS IVFADC's compression half, without
  * the cells): the corpus is stored as `m` centroid ids per vector —
  * here 8 ints for a 64-float embedding — and queries score every code
  * through a per-query lookup table (asymmetric distance computation:
  * exact query × quantized corpus). The sketch answers the 100 TB
  * memory question: the PQ codes of a corpus that cannot fit memory
  * can (8 B/vec at m=8×k=16 vs 256 B raw), at a measured-recall cost.
  *
  * The quantizer is fit driver-side on a bounded sample (Lloyd
  * iterations over ≤`sampleN` vectors — ~512 KB at 64 dims; centroids
  * need to be stable, not optimal, exactly like the IVF coarse
  * quantizer's sample fit). Codebooks then travel to executors baked
  * inside the codegen expressions.
  *
  * Compose with [[Similarity.ivfTopK]]'s cells for IVF-PQ when probing
  * should also prune candidates; plain PQ scans all codes cheaply.
  */
object Pq {

  final case class Model(codebooks: Array[Float], m: Int, k: Int, subDim: Int)

  /** Fit per-subspace codebooks on a bounded, count-free sample of
    * `corpus.vec` (`limit(sampleN)` is one action — no full-corpus
    * `count()`; codebooks need stability, not an unbiased sample). */
  def fit(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
          sampleN: Int = 2000, iters: Int = 10, seed: Long = 42L): Model = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val sample = corpus.select("vec").limit(sampleN).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty corpus")
    val cb = new Array[Float](m * k * subDim)
    for (j <- 0 until m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      val cents = lloyd(sub, k, iters, seed + j)
      for (c <- 0 until k; d <- 0 until subDim)
        cb((j * k + c) * subDim + d) = cents(c)(d)
    }
    Model(cb, m, k, subDim)
  }

  /** Plain Lloyd iterations, deterministic seed, empty clusters keep
    * their previous centroid. Runs on ≤sampleN points driver-side. */
  private def lloyd(points: Array[Array[Float]], k: Int, iters: Int, seed: Long): Array[Array[Float]] = {
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(points.indices.toVector).take(k)
    val cents = Array.tabulate(math.min(k, points.length))(i => points(init(i)).clone()) ++
      Array.fill(math.max(0, k - points.length))(points.head.clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      for (p <- points) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d2 = 0.0; var d = 0
          while (d < dim) { val diff = p(d) - cents(c)(d); d2 += diff * diff; d += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        counts(best) += 1
        var d = 0
        while (d < dim) { sums(best)(d) += p(d); d += 1 }
      }
      for (c <- 0 until k if counts(c) > 0; d <- 0 until dim)
        cents(c)(d) = (sums(c)(d) / counts(c)).toFloat
    }
    cents
  }

  /** `(query_id, neighbor_id, cosine, rank)` with PQ-approximated
    * cosine: ADC dot product over exact per-row norms. Same output
    * contract as the other ANN paths; recall measured in spec. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, topK: Int, dim: Int,
             m: Int = 8, k: Int = 16, seed: Long = 42L,
             prefit: Option[Model] = None): DataFrame = {
    val model = prefit.getOrElse(fit(corpus, dim, m, k, seed = seed))
    val codes = graft.sources.PlanUtils.fanout(
      corpus.select(col("id").as("neighbor_id"),
        ofExpr(PqEncode(toExpr(col("vec")), model.codebooks, model.m, model.k, model.subDim)).as("codes"),
        norm(col("vec")).as("cn")))
    val q = queries.select(col("id").as("query_id"),
      ofExpr(PqLut(toExpr(col("vec")), model.codebooks, model.m, model.k, model.subDim)).as("lut"),
      norm(col("vec")).as("qn"))
    val scored = broadcast(q).crossJoin(codes)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        ofExpr(PqScore(toExpr(col("codes")), toExpr(col("lut")), model.k)) /
          (col("qn") * col("cn")))
    Similarity.topkAgg(scored, topK)
  }

  /** IVF-PQ: the full FAISS IVFADC shape — a coarse quantizer prunes
    * each query's search to its `nProbe` closest cells (candidate
    * reduction) AND members are scored through PQ codes (memory +
    * compute reduction). At 100 TB this is the configuration that
    * actually runs: cells bound the scan, codes bound the bytes. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, topK: Int, dim: Int,
                m: Int = 8, k: Int = 16, nCells: Int = 16, nProbe: Int = 4,
                seed: Long = 42L, prefit: Option[Model] = None,
                prefitCoarse: Option[Similarity.IvfModel] = None): DataFrame = {
    val model = prefit.getOrElse(fit(corpus, dim, m, k, seed = seed))
    val coarse = prefitCoarse.getOrElse(Similarity.ivfFit(corpus, nCells, seed))
    // corpus side: coarse cell + PQ codes in ONE codegen'd projection
    // (the MLlib transform pass and its array_to_vector conversion are
    // gone — assignment is the same argmin-of-literals expression the
    // query probe uses)
    val codes = graft.sources.PlanUtils.fanout(
      corpus.select(col("id").as("neighbor_id"),
        Similarity.ivfAssign(col("vec"), coarse).as("cell"),
        ofExpr(PqEncode(toExpr(col("vec")), model.codebooks, model.m, model.k, model.subDim)).as("codes"),
        norm(col("vec")).as("cn")))
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .select(col("query_id"),
        ofExpr(PqLut(toExpr(col("qv")), model.codebooks, model.m, model.k, model.subDim)).as("lut"),
        norm(col("qv")).as("qn"),
        explode(Similarity.probeCells(col("qv"), coarse, nProbe)).as("cell"))
    // no distinct: one cell per corpus vector × distinct probe cells
    // means each (query, neighbor) pair is scored exactly once
    val scored = broadcast(q).join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        ofExpr(PqScore(toExpr(col("codes")), toExpr(col("lut")), model.k)) /
          (col("qn") * col("cn")))
    Similarity.topkAgg(scored, topK)
  }
}
