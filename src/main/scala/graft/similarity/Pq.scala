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

  /** Fit per-subspace codebooks on a bounded, count-free
    * [[Similarity.hashSample]] of `corpus` (`(id, vec)` columns):
    * deterministic and independent of file layout — a `limit()` prefix
    * of a clustered corpus would train codebooks on one region only. */
  def fit(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
          sampleN: Int = 2000, iters: Int = 10, seed: Long = 42L): Model =
    fitOn(sampleVecs(corpus, sampleN), dim, m, k, iters, seed)

  /** Fit codebooks on RESIDUALS `vec − nearest coarse centroid` (the
    * IVFADC refinement): residuals have far lower variance than raw
    * vectors, so the same m×k codebook budget quantizes them much more
    * tightly — measured as a recall jump in SimilaritySpec. Same
    * bounded sample as [[fit]]; assignment happens driver-side against
    * the (driver-held) coarse centroids. */
  def fitResidual(corpus: DataFrame, coarse: Similarity.IvfModel, dim: Int,
                  m: Int = 8, k: Int = 16, sampleN: Int = 2000,
                  iters: Int = 10, seed: Long = 42L): Model =
    fitOn(sampleVecs(corpus, sampleN).map { v =>
      val ctr = coarse.centroids(nearestCentroid(v, coarse))
      Array.tabulate(v.length)(d => v(d) - ctr(d))
    }, dim, m, k, iters, seed)

  private def sampleVecs(corpus: DataFrame, sampleN: Int): Array[Array[Float]] =
    Similarity.hashSample(corpus, sampleN).collect()
      .map(_.getSeq[Float](0).toArray)

  // ---- OPQ: learned orthogonal pre-rotation (non-parametric) ----

  /** A fitted OPQ model: the rotation (row-major d×d, orthogonal) and
    * the PQ codebooks trained in the rotated space. */
  final case class OpqModel(rotation: Array[Float], dim: Int, pq: Model)

  /** Rotate driver-side with the SAME arithmetic as the MatVecFloat
    * expression (float matrix, double accumulation, float result) so
    * fit-time and query-time geometry agree bit-for-bit. */
  private def rotF(r: Array[Float], dim: Int, v: Array[Float]): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += r(i * dim + j).toDouble * v(j).toDouble; j += 1 }
      out(i) = acc.toFloat
      i += 1
    }
    out
  }

  private def encodeOne(model: Model, v: Array[Float]): Array[Int] = {
    val out = new Array[Int](model.m)
    var j = 0
    while (j < model.m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < model.k) {
        var d2 = 0.0; var d = 0
        while (d < model.subDim) {
          val diff = v(j * model.subDim + d).toDouble -
            model.codebooks((j * model.k + c) * model.subDim + d)
          d2 += diff * diff; d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(j) = best; j += 1
    }
    out
  }

  private def decodeOne(model: Model, codes: Array[Int]): Array[Float] = {
    val out = new Array[Float](model.m * model.subDim)
    var j = 0
    while (j < model.m) {
      var d = 0
      while (d < model.subDim) {
        out(j * model.subDim + d) = model.codebooks((j * model.k + codes(j)) * model.subDim + d)
        d += 1
      }
      j += 1
    }
    out
  }

  /** OPQ-NP (Ge et al.): alternate (a) fit PQ codebooks in the rotated
    * space, (b) update the rotation by orthogonal Procrustes —
    * `R = U·Vᵀ` from the SVD of `Ŷ·Xᵀ` (decoded × original), which
    * minimizes ‖R·X − Ŷ‖ over orthogonal R. Balances variance across
    * subspaces so no codebook wastes its budget; the win appears on
    * ANISOTROPIC data (on isotropic gaussians R ≈ any rotation).
    * Driver-side on the bounded sample, like every other fit here. */
  def fitOpq(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
             sampleN: Int = 2000, opqIters: Int = 8, lloydIters: Int = 10,
             seed: Long = 42L): OpqModel = {
    import breeze.linalg.{svd, DenseMatrix}
    val x = sampleVecs(corpus, sampleN)
    require(x.nonEmpty, "empty corpus")
    val n = x.length
    var r = Array.tabulate(dim * dim)(i => if (i / dim == i % dim) 1.0f else 0.0f)
    var model: Model = null
    for (_ <- 1 to opqIters) {
      val rotated = x.map(v => rotF(r, dim, v))
      model = fitOn(rotated, dim, m, k, lloydIters, seed)
      val decoded = rotated.map(v => decodeOne(model, encodeOne(model, v)))
      // Procrustes: M = Ŷ·Xᵀ (d×d), R = U·Vᵀ
      val mAcc = DenseMatrix.zeros[Double](dim, dim)
      var s = 0
      while (s < n) {
        val xv = x(s); val yv = decoded(s)
        var i = 0
        while (i < dim) {
          var j = 0
          while (j < dim) { mAcc(i, j) += yv(i).toDouble * xv(j).toDouble; j += 1 }
          i += 1
        }
        s += 1
      }
      val dec = svd(mAcc)
      val rNew = dec.U * dec.Vt
      r = Array.tabulate(dim * dim)(idx => rNew(idx / dim, idx % dim).toFloat)
    }
    // final codebooks under the final rotation
    val rotated = x.map(v => rotF(r, dim, v))
    OpqModel(r, dim, fitOn(rotated, dim, m, k, lloydIters, seed))
  }

  /** PQ top-k in the OPQ-rotated space: both sides rotate through the
    * codegen'd MatVecFloat (orthogonal ⇒ dots and norms are preserved,
    * so the ADC cosine estimates the ORIGINAL cosine), then the plain
    * PQ search shape. */
  def opqTopK(queries: DataFrame, corpus: DataFrame, topK: Int, dim: Int,
              m: Int = 8, k: Int = 16, seed: Long = 42L,
              prefit: Option[OpqModel] = None): DataFrame = {
    val model = prefit.getOrElse(fitOpq(corpus, dim, m, k, seed = seed))
    def rotated(df: DataFrame) = df.select(col("id"),
      ofExpr(graft.functions.expr.MatVecFloat(
        toExpr(col("vec")), model.rotation, dim, dim)).as("vec"))
    // r15: fan the corpus BEFORE the rotation so the 4096-FLOP MatVec
    // runs post-exchange in parallel (pqTopK's own fanout then no-ops,
    // keeping encode in the same parallel stage); guide §2.5
    pqTopK(rotated(queries),
      rotated(graft.sources.PlanUtils.fanoutBy(corpus, col("id"))),
      topK, dim, m, k, seed, prefit = Some(model.pq))
  }

  // ---- OPQ + IVF-PQ composed (FAISS "OPQ,IVF,PQ" index chain) ----

  /** Composed model: OPQ rotation, then coarse quantizer AND residual
    * codebooks fit in the ROTATED space — rotation balances variance
    * across PQ subspaces, cells bound the scan, residual codes bound
    * the bytes. The full production chain for anisotropic corpora
    * (real embedding models emit strongly anisotropic vectors). */
  final case class OpqIvfPqModel(rotation: Array[Float], dim: Int,
                                 coarse: Similarity.IvfModel, pq: Model)

  private[similarity] def rotatedFrame(df: DataFrame, rotation: Array[Float], dim: Int): DataFrame =
    df.select(col("id"),
      ofExpr(graft.functions.expr.MatVecFloat(
        toExpr(col("vec")), rotation, dim, dim)).as("vec"))

  /** Rotation is learned by the OPQ-NP loop (plain-PQ reconstruction
    * proxy, [[fitOpq]]); the coarse cells and residual codebooks are
    * then fit in the rotated space so search geometry and training
    * geometry agree. One bounded-sample pass each, like every fit. */
  def fitOpqIvfPq(corpus: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
                  nCells: Int = 16, sampleN: Int = 2000,
                  seed: Long = 42L, coarseSampleN: Int = 20000): OpqIvfPqModel = {
    val rotation = fitOpq(corpus, dim, m, k, sampleN, seed = seed).rotation
    val rot = rotatedFrame(corpus, rotation, dim)
    val coarse = Similarity.ivfFit(rot, nCells, seed, coarseSampleN)
    OpqIvfPqModel(rotation, dim, coarse,
      fitResidual(rot, coarse, dim, m, k, sampleN, seed = seed))
  }

  /** IVF-PQ search in the OPQ-rotated space. The rotation is
    * orthogonal, so rotated dots/norms equal the originals and the ADC
    * cosine still estimates the ORIGINAL cosine. The corpus-side
    * rotation is FUSED into the one-pass encode expression
    * ([[graft.functions.expr.IvfPqEncode]]) — one rotation per row by
    * construction, no barrier, nothing materialized. */
  def opqIvfPqTopK(queries: DataFrame, corpus: DataFrame, topK: Int, dim: Int,
                   m: Int = 8, k: Int = 16, nCells: Int = 16, nProbe: Int = 4,
                   seed: Long = 42L,
                   prefit: Option[OpqIvfPqModel] = None): DataFrame = {
    val model = prefit.getOrElse(fitOpqIvfPq(corpus, dim, m, k, nCells, seed = seed))
    // rotation FUSED into the one-pass expressions on BOTH sides
    // (IvfPqEncode / IvfPqProbe) — no barrier, nothing materialized
    // r15: fanout below the fused rotate+encode (see pqTopK)
    val codes = encodeIvfPq(
      graft.sources.PlanUtils.fanoutBy(corpus, col("id")),
      model.pq, model.coarse, Some(model.rotation))
    searchCodes(queries, codes, topK, model.pq, model.coarse, nProbe,
      rotation = Some(model.rotation))
  }

  private def fitOn(sample: Array[Array[Float]], dim: Int, m: Int, k: Int,
                    iters: Int, seed: Long): Model = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(sample.nonEmpty, "empty corpus")
    val subDim = dim / m
    val cb = new Array[Float](m * k * subDim)
    for (j <- 0 until m) {
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * subDim, (j + 1) * subDim))
      val cents = lloyd(sub, k, iters, seed + j)
      for (c <- 0 until k; d <- 0 until subDim)
        cb((j * k + c) * subDim + d) = cents(c)(d)
    }
    Model(cb, m, k, subDim)
  }

  /** Argmin-L2 cell id, same float-centroid geometry as
    * Similarity.ivfAssign (ties → lower id). */
  private def nearestCentroid(v: Array[Float], coarse: Similarity.IvfModel): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < coarse.centroids.length) {
      val ctr = coarse.centroids(c)
      var d2 = 0.0
      var d = 0
      while (d < ctr.length) {
        val diff = v(d).toDouble - ctr(d).toDouble
        d2 += diff * diff
        d += 1
      }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
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
    // r15: fanout BELOW the encode projection (the old form exchanged
    // the finished codes, which materialized them but left the encode
    // itself inside the serial single-row-group scan task — guide
    // §2.5). `codes` has exactly one consumer, so no reuse barrier is
    // needed above the encode; keyed fanout, no-op on parallel scans.
    val codes = graft.sources.PlanUtils.fanoutBy(corpus, col("id"))
      .select(col("id").as("neighbor_id"),
        ofExpr(PqEncode(toExpr(col("vec")), model.codebooks, model.m, model.k, model.subDim)).as("codes"),
        norm(col("vec")).as("cn"))
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
  /** IVF-PQ with RESIDUAL encoding (full FAISS IVFADC): PQ codes
    * quantize `vec − c_cell`, and the ADC cosine reconstructs
    * `dot(q, x̂) = dot(q, c_cell) + dot(q, r̂)` — the first term exact
    * per (query, probed cell), the second through the LUT. Same
    * 8 B/vec; materially higher recall than raw-vector PQ because the
    * codebooks only have to cover the within-cell residual variance. */
  /** Corpus side of IVF-PQ: `(neighbor_id, cell, codes, cn)` — coarse
    * cell, then PQ codes of the RESIDUAL, with the optional OPQ
    * rotation fused in front: ONE codegen pass over one rotated
    * buffer ([[graft.functions.expr.IvfPqEncode]] — see its doc for
    * why the composed spelling re-ran the rotation ~19× per row).
    * This is the frame a persistent index stores ([[PqIndex]]) and
    * what a new corpus delta is encoded into under FROZEN models.
    * The explode-of-1-array is a Generate: field extraction reads the
    * generator's output column instead of collapsing three copies of
    * the encode expression into the projection. */
  def encodeIvfPq(corpus: DataFrame, model: Model, coarse: Similarity.IvfModel,
                  rotation: Option[Array[Float]] = None): DataFrame =
    corpus.select(col("id").as("neighbor_id"),
        explode(array(ofExpr(graft.functions.expr.IvfPqEncode(
          toExpr(col("vec")), rotation.getOrElse(Array.empty[Float]),
          coarse.centroids, model.codebooks, model.m, model.k, model.subDim)))).as("enc"))
      .select(col("neighbor_id"), col("enc.cell").as("cell"),
        col("enc.codes").as("codes"), col("enc.cn").as("cn"))

  /** [[encodeIvfPq]] plus the SQ8 re-rank tier in the SAME pass:
    * `(neighbor_id, cell, codes, cn, sq)` — the cell comes from the
    * one fused encode expression, so the codes row and its sidecar
    * row can NEVER disagree on cell (the property that makes the
    * re-rank's cell-pruned sidecar read sound: every shortlist
    * candidate's SQ8 bytes live in a probed cell's files). `sq`
    * quantizes the ORIGINAL vector, not the rotated one — cosine is
    * rotation-invariant, so the re-rank needs no rotation at query
    * time and the bytes stay meaningful if the index is ever rebuilt
    * under a different rotation. Callers writing both stores should
    * materialize this frame once (localCheckpoint) — the PQ encode is
    * the expensive column and must not run per consumer. */
  def encodeIvfPqSq8(corpus: DataFrame, model: Model, coarse: Similarity.IvfModel,
                     rotation: Option[Array[Float]] = None): DataFrame =
    corpus.select(col("id").as("neighbor_id"),
        explode(array(ofExpr(graft.functions.expr.IvfPqEncode(
          toExpr(col("vec")), rotation.getOrElse(Array.empty[Float]),
          coarse.centroids, model.codebooks, model.m, model.k, model.subDim)))).as("enc"),
        ofExpr(graft.functions.expr.Sq8Encode(toExpr(col("vec")))).as("sq"))
      .select(col("neighbor_id"), col("enc.cell").as("cell"),
        col("enc.codes").as("codes"), col("enc.cn").as("cn"), col("sq"))

  /** The distinct coarse cells a query batch will probe — the
    * partition-prune list for a cell-partitioned codes store
    * ([[PqIndex]]). One pass over the (small) query side through the
    * same fused [[graft.functions.expr.IvfPqProbe]] the search uses,
    * so the prune list and the search's probe list cannot disagree;
    * the codes side is never touched. Bounded driver collect: at most
    * nCells ints. */
  def probeCells(queries: DataFrame, model: Model, coarse: Similarity.IvfModel,
                 nProbe: Int, rotation: Option[Array[Float]] = None): Seq[Int] = {
    val np = math.min(nProbe, coarse.nCells)
    queries.select(explode(array(ofExpr(graft.functions.expr.IvfPqProbe(
        toExpr(col("vec")), rotation.getOrElse(Array.empty[Float]),
        coarse.centroids, model.codebooks, model.m, model.k, model.subDim, np)))).as("pb"))
      .select(explode(col("pb.probes.cell")).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq.sorted
  }

  /** Query side + search over an already-encoded `(neighbor_id, cell,
    * codes, cn)` frame: the LUT is the query's RAW subspace dots (it
    * scores the residual codebooks), the exact dot(q, c_cell) term
    * rides per probed cell. No distinct needed — one cell per corpus
    * vector × distinct probe cells means each pair scores once.
    * The whole query-side projection (optional rotation + LUT + norm +
    * probe cells + centroid dots) is ONE fused pass per query row
    * ([[graft.functions.expr.IvfPqProbe]] — the query twin of the
    * encode-side fusion; matters when the query batch is itself
    * large, e.g. corpus-vs-index joins or big serve micro-batches). */
  def searchCodes(queries: DataFrame, codes: DataFrame, topK: Int,
                  model: Model, coarse: Similarity.IvfModel,
                  nProbe: Int = 4, rotation: Option[Array[Float]] = None): DataFrame = {
    // clamp like the old probeCells/slice path: nProbe beyond the cell
    // count means "probe everything", not an error (a tiny index with
    // nCells < the caller's default nProbe must stay searchable)
    val np = math.min(nProbe, coarse.nCells)
    val q = queries.select(col("id").as("query_id"),
        explode(array(ofExpr(graft.functions.expr.IvfPqProbe(
          toExpr(col("vec")), rotation.getOrElse(Array.empty[Float]),
          coarse.centroids, model.codebooks, model.m, model.k, model.subDim,
          np)))).as("pb"))
      .select(col("query_id"), col("pb.lut").as("lut"), col("pb.qn").as("qn"),
        explode(col("pb.probes")).as("pr"))
      .select(col("query_id"), col("lut"), col("qn"),
        col("pr.cell").as("cell"), col("pr.cdot").as("cdot"))
    val scored = broadcast(q).join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        (col("cdot") + ofExpr(PqScore(toExpr(col("codes")), toExpr(col("lut")), model.k))) /
          (col("qn") * col("cn")))
    Similarity.topkAgg(scored, topK)
  }

  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, topK: Int, dim: Int,
                m: Int = 8, k: Int = 16, nCells: Int = 16, nProbe: Int = 4,
                seed: Long = 42L, prefit: Option[Model] = None,
                prefitCoarse: Option[Similarity.IvfModel] = None): DataFrame = {
    val coarse = prefitCoarse.getOrElse(Similarity.ivfFit(corpus, nCells, seed))
    val model = prefit.getOrElse(fitResidual(corpus, coarse, dim, m, k, seed = seed))
    // r15: fanout below the encode (see pqTopK) — the fused
    // IvfPqEncode runs post-exchange in parallel; single consumer
    val codes = encodeIvfPq(
      graft.sources.PlanUtils.fanoutBy(corpus, col("id")), model, coarse)
    searchCodes(queries, codes, topK, model, coarse, nProbe)
  }
}
