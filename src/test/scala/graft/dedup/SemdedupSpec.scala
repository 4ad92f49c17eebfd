package graft.dedup

import graft.{SparkSpec, VecFixtures}
import graft.queries.DedupQueries
import org.apache.spark.sql.functions._

/** dedup_semdedup: k-means-cluster + within-cluster exact cosine.
  * rows-only at the gate (no SQL oracle can replay the k-means fit),
  * so these specs ARE the correctness pin: exact-subset property,
  * planted-corpus recall at the operating point, determinism, and the
  * equi-join-only plan shape. */
class SemdedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  /** 3 well-separated gaussian clusters of 40 vectors, 10 planted
    * near-dups (cosine ≈ 0.97) per cluster. Cluster structure is what
    * SemDeDup exploits, so the fixture has some: members sit in a WIDE
    * cloud around 3 near-orthogonal anchors (0.10/coord noise ⇒
    * member-to-member cosine ≈ 0.6, safely below the 0.9 threshold),
    * while planted dups use the shared 0.03 near-dup level (≈ 0.97) —
    * the dup/non-dup gap the operator is supposed to resolve. */
  private lazy val corpus = {
    val anchors = (0 until 3).map(a => VecFixtures.unit(dim, 1000L + a))
    def cloudMember(a: Int, i: Int): Array[Float] = {
      val rnd = new scala.util.Random(a * 100L + i)
      anchors(a).map(x => x + 0.10f * rnd.nextGaussian().toFloat)
    }
    val base = for (a <- 0 until 3; i <- 0 until 40)
      yield ((a * 40 + i).toLong, cloudMember(a, i))
    val dups = for (a <- 0 until 3; i <- 0 until 10) yield {
      val (id, v) = base(a * 40 + i)
      (1000L + id, VecFixtures.nearDup(v, 5000L + id))
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  private def keyed(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e9)).toMap

  test("semdedup: exact subset of brute-force pairs with bit-identical cosines") {
    val exact = keyed(Dedup.embeddingPairs(corpus, col("embedding"), "vec_id", 0.9))
    val sem = keyed(Dedup.semdedupPairs(corpus, col("embedding"), "vec_id",
      nClusters = 6, minCosine = 0.9))
    assert(exact.size >= 30, s"corpus must contain the planted near-dups, got ${exact.size}")
    assert(sem.keySet.subsetOf(exact.keySet),
      s"within-cluster verification must admit only true pairs: ${sem.keySet -- exact.keySet}")
    assert(sem.forall { case (k, v) => exact(k) == v },
      "cosines must match the exact join bit-for-bit")
  }

  test("semdedup: planted near-dups land in one cell — recall 1.0 at the operating point") {
    // a 0.97-cosine pair is a tiny displacement deep inside one
    // gaussian mode; with nClusters matched to the mode count the
    // fitted centroids ARE the modes (seeded, deterministic), so both
    // ends quantize identically and recall vs the exact join is 1.0.
    // Cross-cell loss is the documented trade when the fit
    // over-segments a mode — the single-cell ceiling test below pins
    // the other end of that dial.
    val exact = keyed(Dedup.embeddingPairs(corpus, col("embedding"), "vec_id", 0.9))
    val sem = keyed(Dedup.semdedupPairs(corpus, col("embedding"), "vec_id",
      nClusters = 3, minCosine = 0.9))
    assert(exact.size >= 30)
    val missed = exact.keySet -- sem.keySet
    assert(missed.isEmpty, s"planted near-dups split across cells: $missed")
  }

  test("semdedup: a single-cell prefit model degenerates to the exact join (sanity ceiling)") {
    // Spark ML KMeans needs k >= 2, so the one-cell ceiling uses a
    // hand-built model: every vector lands in cell 0 and the
    // within-cell join IS the all-pairs join.
    val exact = keyed(Dedup.embeddingPairs(corpus, col("embedding"), "vec_id", 0.9))
    val one = keyed(Dedup.semdedupPairs(corpus, col("embedding"), "vec_id",
      nClusters = 99 /* ignored */ , minCosine = 0.9,
      prefit = Some(graft.similarity.Similarity.IvfModel(
        Array(VecFixtures.unit(dim, 7L))))))
    assert(one == exact, "a single cell means every pair is compared")
  }

  test("semdedup: deterministic across runs (fixed seed, layout-independent fit sample)") {
    def run() = keyed(Dedup.semdedupPairs(corpus, col("embedding"), "vec_id",
      nClusters = 6, minCosine = 0.9))
    assert(run() == run())
  }

  test("semdedup: prefit model is honored — no refit, same result") {
    val base = corpus.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val model = graft.similarity.Similarity.ivfFit(base, nCells = 6, seed = 42L)
    val pre = keyed(Dedup.semdedupPairs(corpus, col("embedding"), "vec_id",
      nClusters = 99 /* ignored with prefit */ , minCosine = 0.9, prefit = Some(model)))
    val fit = keyed(Dedup.semdedupPairs(corpus, col("embedding"), "vec_id",
      nClusters = 6, minCosine = 0.9))
    assert(pre == fit)
  }

  test("semdedup: plan is an equi-join on cell — no cartesian, no nested loop") {
    val plan = Dedup.semdedupPairs(corpus, col("embedding"), "vec_id",
      nClusters = 6, minCosine = 0.9).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"semdedup plan must be an equi-join on cell:\n$plan")
  }

  test("semdedup: nClusters = 0 self-sizes to suggestNCells — identical to the explicit call") {
    // the gate/production default: cells track the corpus (~4√n ⇒
    // n^1.5 total pair cost), never a pinned literal (n²/k). Seeded
    // fit ⇒ the auto path must be bit-identical to passing the
    // suggested count explicitly.
    val n = corpus.count()
    val suggested = math.max(2, graft.similarity.Similarity.suggestNCells(n))
    val auto = keyed(Dedup.semdedupPairs(corpus, col("embedding"), "vec_id",
      nClusters = 0, minCosine = 0.9))
    val explicit = keyed(Dedup.semdedupPairs(corpus, col("embedding"), "vec_id",
      nClusters = suggested, minCosine = 0.9))
    assert(auto == explicit, s"auto sizing must resolve to suggestNCells($n) = $suggested")
  }

  test("semdedup gate entry: non-trivial and a subset of the gate brute-force") {
    val sem = keyed(DedupQueries.dedupSemdedup(spark, sf("any")))
    val exact = keyed(DedupQueries.dedupEmbeddingBruteforce(spark, sf("any")))
    assert(sem.nonEmpty, "gate entry must be non-trivial on the gate corpus")
    assert(sem.keySet.subsetOf(exact.keySet))
  }
}
