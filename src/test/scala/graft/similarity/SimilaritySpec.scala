package graft.similarity

import graft.SparkSpec
import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  private def dir = sf("any")

  test("LSH top-k achieves useful recall at a fraction of the comparisons") {
    val brute = SimilarityQueries.annBruteforceTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityQueries.annLshTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    info(f"LSH recall@10 = $recall%.3f (corpus is unclustered gaussian — recall is bounded by data geometry)")
    assert(recall > 0.05, f"recall collapsed: $recall%.3f")

    // efficiency claim: candidate pairs well under |Q| * |C|
    val q = SimilarityQueries.queriesDf(spark, dir)
    val c = graft.sources.Tables.load(spark, dir, "embeddings")
    val nQ = q.count(); val nC = c.count()
    val sigs = Similarity.bandedSignatures(col("vec"), 4, 6, 64)
    val qb = q.select(col("id"), explode(sigs).as("bk"))
    val cb = c.select(col("vec_id").as("id2"), col("embedding").as("vec"))
      .select(col("id2"), explode(Similarity.bandedSignatures(col("vec"), 4, 6, 64)).as("bk"))
    val candidates = qb.join(cb, qb("bk") === cb("bk")).count()
    info(s"candidates=$candidates vs brute=${nQ * nC}")
    assert(candidates < nQ * nC / 2, "LSH should prune at least half the comparisons")
  }

  test("IVF top-k: better recall than LSH at bounded candidate volume") {
    val brute = SimilarityQueries.annBruteforceTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.annIvfTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF recall@10 = $recall%.3f (nProbe=4 of 16 cells)")
    assert(recall > 0.15, f"IVF recall collapsed: $recall%.3f")
    // candidate volume bound: nProbe/nCells of the corpus per query (approx)
    assert(ivf.size <= brute.size)
  }

  test("PQ top-k: useful recall at 8 bytes per corpus vector") {
    val brute = SimilarityQueries.annBruteforceTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SimilarityQueries.annPqTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & pq).size.toDouble / brute.size
    info(f"PQ recall@10 = $recall%.3f (m=8 subspaces × 16 centroids = 8 B/vec vs 256 B raw)")
    assert(recall > 0.15, f"PQ recall collapsed: $recall%.3f")
    // determinism: fixed seed => identical output
    val again = SimilarityQueries.annPqTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq == again)
  }

  test("IVF-PQ: residual encoding beats raw-vector PQ at the same 8 B/vec") {
    val brute = SimilarityQueries.annBruteforceTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = SimilarityQueries.annIvfPqTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SimilarityQueries.annPqTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivfpq).size.toDouble / brute.size
    val pqRecall = (brute & pq).size.toDouble / brute.size
    info(f"IVF-PQ(residual) recall@10 = $recall%.3f vs plain PQ $pqRecall%.3f " +
      "(nProbe=4/16 cells, 8 B/vec codes both)")
    assert(recall > 0.1, f"IVF-PQ recall collapsed: $recall%.3f")
    // the point of residual encoding: codebooks only cover within-cell
    // variance, so recall must at least match raw-vector PQ even
    // though IVF-PQ ALSO prunes 12 of 16 cells per query
    assert(recall >= pqRecall,
      f"residual IVF-PQ ($recall%.3f) fell below raw PQ ($pqRecall%.3f)")
  }

  test("OPQ rotation beats plain PQ on anisotropic data (and is orthogonal)") {
    val s = spark
    import s.implicits._
    val dim = 64
    // anisotropic synthetic: strongly decaying spectrum, then a fixed
    // random rotation so the energy is NOT axis-aligned — plain PQ's
    // fixed subspace split mixes high- and low-variance directions,
    // which is exactly what the learned rotation undoes
    val rnd = new scala.util.Random(7)
    val q0 = Array.fill(dim, dim)(rnd.nextGaussian())
    // Gram-Schmidt for an exact orthogonal mixing matrix
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        val d = (0 until dim).map(t => q0(i)(t) * q0(j)(t)).sum
        for (t <- 0 until dim) q0(i)(t) -= d * q0(j)(t)
      }
      val nrm = math.sqrt((0 until dim).map(t => q0(i)(t) * q0(i)(t)).sum)
      for (t <- 0 until dim) q0(i)(t) /= nrm
    }
    def mkVec(id: Long): Array[Float] = {
      val r2 = new scala.util.Random(id * 911382323L + 3)
      val z = Array.tabulate(dim)(d => r2.nextGaussian() * math.pow(0.82, d))
      Array.tabulate(dim)(i => (0 until dim).map(j => q0(i)(j) * z(j)).sum.toFloat)
    }
    val corpus = (0L until 1500L).map(i => (i, mkVec(i))).toDF("id", "vec")
    val queries = (0L until 1500L by 50).map(i => (i, mkVec(i))).toDF("id", "vec")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = ids(Similarity.bruteForceTopK(queries, corpus, 10))
    val pq = ids(Pq.pqTopK(queries, corpus, 10, dim))
    val opqModel = Pq.fitOpq(corpus, dim)
    val opq = ids(Pq.opqTopK(queries, corpus, 10, dim, prefit = Some(opqModel)))
    val pqRecall = (brute & pq).size.toDouble / brute.size
    val opqRecall = (brute & opq).size.toDouble / brute.size
    info(f"anisotropic corpus: OPQ recall@10 = $opqRecall%.3f vs plain PQ $pqRecall%.3f")
    assert(opqRecall > pqRecall,
      f"learned rotation must beat the fixed subspace split: $opqRecall%.3f <= $pqRecall%.3f")
    // the learned rotation is orthogonal: R·Rᵀ ≈ I
    val r = opqModel.rotation
    for (i <- 0 until dim by 13; j <- 0 until dim by 13) {
      val dot = (0 until dim).map(t => r(i * dim + t).toDouble * r(j * dim + t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-4)
    }
  }

  test("OPQ+IVF-PQ composed: recall >= residual IVF-PQ on anisotropic data") {
    val s = spark
    import s.implicits._
    val dim = 64
    // same anisotropic construction as the OPQ test above: decaying
    // spectrum mixed by a fixed orthogonal matrix, so PQ's axis-aligned
    // subspace split is the thing the learned rotation must fix —
    // composing the rotation INTO the IVF-PQ chain must not lose that
    val rnd = new scala.util.Random(7)
    val q0 = Array.fill(dim, dim)(rnd.nextGaussian())
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        val d = (0 until dim).map(t => q0(i)(t) * q0(j)(t)).sum
        for (t <- 0 until dim) q0(i)(t) -= d * q0(j)(t)
      }
      val nrm = math.sqrt((0 until dim).map(t => q0(i)(t) * q0(i)(t)).sum)
      for (t <- 0 until dim) q0(i)(t) /= nrm
    }
    def mkVec(id: Long): Array[Float] = {
      val r2 = new scala.util.Random(id * 911382323L + 3)
      val z = Array.tabulate(dim)(d => r2.nextGaussian() * math.pow(0.82, d))
      Array.tabulate(dim)(i => (0 until dim).map(j => q0(i)(j) * z(j)).sum.toFloat)
    }
    val corpus = (0L until 1500L).map(i => (i, mkVec(i))).toDF("id", "vec")
    val queries = (0L until 1500L by 50).map(i => (i, mkVec(i))).toDF("id", "vec")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = ids(Similarity.bruteForceTopK(queries, corpus, 10))
    val plain = ids(Pq.ivfPqTopK(queries, corpus, 10, dim))
    val composed = ids(Pq.opqIvfPqTopK(queries, corpus, 10, dim))
    val plainRecall = (brute & plain).size.toDouble / brute.size
    val composedRecall = (brute & composed).size.toDouble / brute.size
    info(f"anisotropic corpus: OPQ+IVF-PQ recall@10 = $composedRecall%.3f vs residual IVF-PQ $plainRecall%.3f")
    assert(composedRecall >= plainRecall,
      f"the learned rotation must not hurt the composed chain: $composedRecall%.3f < $plainRecall%.3f")
  }

  test("dim-256 embeddings: full OPQ+IVF-PQ chain fits, round-trips, retrieves exact copies") {
    // the rest of the ANN suite runs at the testdata's dim 64; real
    // embedding models emit 256-4096 dims, and three costs move with
    // dim: the OPQ fit (driver-side 256×256 Procrustes SVD per
    // iteration), the models.txt sidecar (dim² rotation floats), and
    // the codegen expressions' per-row work (subDim 32 inner loops).
    // This pins all three at 256 so the "works on real models" claim
    // is tested, not assumed.
    val s = spark
    import s.implicits._
    val dim = 256
    // decaying spectrum (axis-aligned anisotropy): realistic energy
    // concentration without an O(dim²)-per-vector mixing loop in test code
    def mkVec(id: Long): Array[Float] = {
      val r2 = new scala.util.Random(id * 911382323L + 3)
      Array.tabulate(dim)(d => (r2.nextGaussian() * math.pow(0.985, d)).toFloat)
    }
    val corpus = (0L until 1200L).map(i => (i, mkVec(i))).toDF("id", "vec")
    // each query carries an exact copy of a corpus vector under a new id
    val queries = (0L until 1200L by 60).map(i => (5000L + i, mkVec(i))).toDF("id", "vec")
    val base = java.nio.file.Files.createTempDirectory("graft_dim256").toString
    val t0 = System.nanoTime()
    val index = new PqIndex(spark, s"$base/idx", dim = dim, m = 8, k = 16,
      nCells = 16, nProbe = 4, opq = true)
    index.build(corpus)
    val fitSec = (System.nanoTime() - t0) / 1e9
    info(f"dim-256 OPQ+IVF-PQ build (OPQ fit incl. 8 driver SVDs + full encode): $fitSec%.1f s")
    assert(fitSec < 120.0, f"dim-256 fit must stay interactive, took $fitSec%.1f s")
    // sidecar round-trip at dim²-sized rotation; subDim scaled with dim
    val (model, _, rot) = index.modelsWithRotation()
    assert(model.subDim == 32 && rot.get.length == dim * dim)
    for (i <- 0 until dim by 37; j <- 0 until dim by 37) {
      val dot = (0 until dim).map(t => rot.get(i * dim + t).toDouble * rot.get(j * dim + t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-3,
        s"persisted rotation must stay orthogonal at ($i,$j)")
    }
    // codegen correctness at subDim 32: the exact copy must rank first
    // through the rotated encode + probe path for (nearly) every query
    // (unrelated 256-dim gaussian cosines are ~0.06σ — a miss means a
    // broken buffer/stride, not noise)
    val top1 = index.topK(queries, 5).filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = top1.count { case (q, n) => n == q - 5000L }
    assert(hits >= top1.size - 1,
      s"exact copies must dominate rank 1 at dim 256: $hits of ${top1.size}")
  }

  test("suggestNCells: 4*sqrt(n) bounded by the trainable sample, monotone in n") {
    import Similarity.suggestNCells
    assert(suggestNCells(100) == 40)               // 4·√100
    assert(suggestNCells(200000, 2000) == 50)      // sample bound: 2000/40
    assert(suggestNCells(1000000000L, 1000000) == 25000)
    assert(suggestNCells(1) == 4 && suggestNCells(0) == 1)
    val pts = Seq(1000L, 10000L, 100000L, 10000000L)
    assert(pts.map(n => suggestNCells(n, 1000000)) == pts.map(n => suggestNCells(n, 1000000)).sorted,
      "cell count must grow with the corpus (the sf10 lesson)")
  }

  test("suggestNProbe: floor 4, ~1/32 of corpus-sized cells, clamped to tiny indexes") {
    import Similarity.suggestNProbe
    // spec-scale operating point unchanged: 4 of 16 cells (25%)
    assert(suggestNProbe(16) == 4)
    // the auto sf10 layout: ~500 cells must probe 16, not a frozen 4 —
    // a fixed probe count over 4√n cells is the last fixed-knob trap
    assert(suggestNProbe(500) == 16)
    // 1e11 vectors at fitSampleN=1M ⇒ 25k cells ⇒ 782 probes (~3.1%)
    assert(suggestNProbe(25000) == 782)
    // tiny index: probe everything, never more cells than exist
    assert(suggestNProbe(2) == 2 && suggestNProbe(1) == 1)
    // the probed FRACTION never collapses below ~3% as cells grow
    for (c <- Seq(16, 100, 1000, 10000, 100000))
      assert(suggestNProbe(c).toDouble / c >= 1.0 / 33.0,
        s"probe fraction collapsed at $c cells: ${suggestNProbe(c)}")
    // monotone in the cell count
    val pts = Seq(4, 64, 256, 4096, 65536).map(suggestNProbe)
    assert(pts == pts.sorted)
  }

  test("knn vote is deterministic and votes sum to <= k") {
    val out = SimilarityQueries.knnLabelVote(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= SimilarityQueries.K))
    val again = SimilarityQueries.knnLabelVote(spark, dir).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("brute force top-k: rank 1 really is the max cosine (spot check)") {
    import spark.implicits._
    val top = SimilarityQueries.annBruteforceTopk(spark, dir)
      .filter(col("rank") === 1).limit(1)
      .select("query_id", "cosine").as[(Long, Double)].head()
    val all = SimilarityQueries.annBruteforceTopk(spark, dir)
      .filter(col("query_id") === top._1)
      .select(max(col("cosine"))).as[Double].head()
    assert(math.abs(all - top._2) < 1e-12)
  }

  test("hybrid RRF: operator output equals an independent rank fusion of its two sides") {
    val dir = sf("any")
    val topK = graft.queries.SimilarityQueries.K
    val k0 = graft.queries.SimilarityQueries.RrfK0
    // the two component systems, collected independently
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val lex = graft.queries.TextQueries
      .bm25Search(docs, graft.queries.TextQueries.Bm25QuerySet, topK)
      .collect().map(r => (r.getInt(0).toLong, r.getLong(2)) -> r.getInt(1)).toMap
    val embs = graft.sources.Tables.load(spark, dir, "embeddings")
    val qids = graft.queries.TextQueries.Bm25QuerySet.map(_._1.toLong).toSet
    import org.apache.spark.sql.functions.col
    val qv = embs.filter(col("vec_id").isInCollection(qids))
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val corpus = embs.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val vec = Similarity.bruteForceTopK(qv, corpus, topK)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    // reference fusion in plain Scala — same fixed term order
    val fusedRef = (lex.keySet ++ vec.keySet).groupBy(_._1).flatMap { case (q, keys) =>
      keys.toSeq.map { k =>
        val s = lex.get(k).map(r => 1.0 / (k0 + r)).getOrElse(0.0) +
          vec.get(k).map(r => 1.0 / (k0 + r)).getOrElse(0.0)
        (q, k._2, s, lex.contains(k), vec.contains(k))
      }.sortBy { case (_, d, s, _, _) => (-s, d) }.take(topK).zipWithIndex.map {
        case ((qq, d, _, il, iv), i) => (qq, d, i + 1, il, iv)
      }
    }.toSet
    val got = graft.queries.SimilarityQueries.searchHybridRrf(spark, dir)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3), r.getBoolean(4))).toSet
    assert(got == fusedRef, s"fusion drifted: extra ${got -- fusedRef}, missing ${fusedRef -- got}")
    // sanity: the fusion is non-trivially hybrid — some retrieved docs
    // come from only one system each way
    assert(got.exists(t => t._4 && !t._5) && got.exists(t => !t._4 && t._5),
      "gate corpus should exercise lexical-only and vector-only hits")
    assert(got.nonEmpty && got.groupBy(_._1).forall(_._2.size <= topK))
  }

  test("fuseRrf owns the weight contract: a 0 weight DROPS that side for every caller; refusals bind ad-hoc too") {
    // the r13-ADVICE divergence: searchHybridRrf(wVec=0) used to score
    // the vector side at 0.0, so its hits still padded the top-k tail
    // with in_vec=true — the exact behavior the served path's contract
    // rejects. The drop now lives in the ONE fusion body.
    val zeroed = graft.queries.SimilarityQueries
      .searchHybridRrf(spark, sf("0.001"), wVec = 0.0).collect()
    assert(zeroed.nonEmpty)
    assert(zeroed.forall(r => r.getBoolean(3) && !r.getBoolean(4)),
      "wVec=0 must leave only lexical-membership rows — no zero-score padding")
    val e = intercept[IllegalArgumentException](
      graft.queries.SimilarityQueries.searchHybridRrf(spark, sf("0.001"), wLex = -1.0))
    assert(e.getMessage.contains("weights"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      graft.queries.SimilarityQueries.searchHybridRrf(spark, sf("0.001"),
        wLex = 0.0, wVec = 0.0))
    assert(e2.getMessage.contains("0"), e2.getMessage)
  }
}
