package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** hybridRrfServed == the ad-hoc gate composition, exactly: the
  * index-served hybrid (TextIndex ranks × PqIndex SQ8-re-ranked ranks,
  * fused by the shared fuseRrf body) must reproduce the gate form's
  * arithmetic (bm25Search ranks × brute-force cosine ranks × the same
  * fuseRrf) row for row under the total order — the single-sourcing
  * contract VERDICT r11 asked for. The fixture plants WELL-SEPARATED
  * cosines (0.04+ gaps, an order of magnitude above the SQ8 byte
  * grid's ~0.005 error) and distinct per-doc term frequencies, so any
  * rank disagreement is a real composition bug, not quantization
  * noise. */
class HybridServedSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Unit vector with cosine exactly `c` to axis e0, orthogonal
    * remainder on a per-doc distinct axis. */
  private def planted(c: Double, axis: Int): Array[Float] = {
    val v = new Array[Float](dim)
    v(0) = c.toFloat
    v(1 + (axis % (dim - 1))) = math.sqrt(1.0 - c * c).toFloat
    v
  }

  // 12 docs: 1..3 match query 1 lexically (distinct tf), 4..5 are its
  // vector-only neighbors, 3 is in BOTH (the hybrid case); 6..8 / 9..10
  // mirror that for query 2; 11..12 are background.
  private lazy val docs = Seq(
    (1L, "alpha alpha alpha heron crane"),
    (2L, "alpha alpha stork crane heron"),
    (3L, "alpha egret stork crane heron"),
    (4L, "plover dunlin godwit curlew snipe"),
    (5L, "avocet dunlin godwit curlew snipe"),
    (6L, "bravo bravo bravo finch wren"),
    (7L, "bravo bravo robin wren finch"),
    (8L, "bravo thrush robin wren finch"),
    (9L, "siskin serin linnet twite brambling"),
    (10L, "redpoll serin linnet twite brambling"),
    (11L, "osprey merlin hobby kestrel saker"),
    (12L, "gyrfalcon merlin hobby kestrel saker")
  ).toDF("doc_id", "text")

  private lazy val vecs = Seq(
    // query 1 (vec = e0): 3 both-sides, 4..5 vector-only, rest far
    (1L, planted(0.10, 1)), (2L, planted(0.14, 2)), (3L, planted(0.95, 3)),
    (4L, planted(0.91, 4)), (5L, planted(0.87, 5)),
    // query 2 (vec = planted(…) near 8..10's cluster on a shifted axis)
    (6L, planted(0.18, 6)), (7L, planted(0.22, 7)), (8L, planted(-0.95, 8)),
    (9L, planted(-0.91, 9)), (10L, planted(-0.87, 10)),
    (11L, planted(0.02, 11)), (12L, planted(-0.02, 12))
  ).toDF("id", "vec")

  private val querySet = Seq(1001 -> "alpha crane", 1002 -> "bravo wren")
  private lazy val queryVecs = Seq(
    (1001L, planted(1.0, 1)), (1002L, planted(-1.0, 2))).toDF("id", "vec")

  test("index-served hybrid == the gate composition, rank for rank; lexical-only and vector-only hits both present") {
    val base = java.nio.file.Files.createTempDirectory("graft_hybrid").toString
    val tidx = new TextIndex(spark, s"$base/tidx", termParts = 8)
    tidx.build(docs)
    val pidx = new PqIndex(spark, s"$base/pidx", dim = dim, m = 4, k = 8,
      nCells = 2, nProbe = 2, sq8 = true)
    pidx.build(vecs)

    val k = 5
    // the ad-hoc gate arm, on the SAME fixture frames: bm25Search
    // ranks + brute-force cosine ranks through the shared fuseRrf
    val lexGate = graft.queries.TextQueries.bm25Search(docs, querySet, k)
      .select(col("query_id").cast("long").as("query_id"), col("doc_id"),
        col("rank").as("lrank"))
    val vecGate = Similarity.bruteForceTopK(queryVecs, vecs, k)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("vrank"))
    val gate = graft.queries.SimilarityQueries.fuseRrf(lexGate, vecGate, k)

    // the served arm: both sides from the persistent indexes, vector
    // side through the SQ8 tier at a corpus-covering shortlist
    val queries = querySet.toDF("query_id", "qtext")
      .join(queryVecs.withColumnRenamed("id", "query_id"), Seq("query_id"))
    val served = graft.queries.SimilarityQueries.hybridRrfServed(
      tidx, pidx, queries, k, candMult = 4)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int, Boolean, Boolean)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getBoolean(3), r.getBoolean(4))).toSeq.sorted
    assert(rows(served) == rows(gate),
      s"served:\n${rows(served).mkString("\n")}\ngate:\n${rows(gate).mkString("\n")}")

    // the fusion is genuinely hybrid on this fixture: per query there
    // are lexical-only, vector-only, and both-sides hits
    val byFlag = rows(served).groupBy(t => (t._4, t._5)).view.mapValues(_.size).toMap
    assert(byFlag.contains((true, false)), s"no lexical-only hit: $byFlag")
    assert(byFlag.contains((false, true)), s"no vector-only hit: $byFlag")
    assert(byFlag.contains((true, true)), s"no both-sides hit: $byFlag")
    // and the both-sides doc outranks single-side docs for query 1
    val q1 = rows(served).filter(_._1 == 1001L).sortBy(_._3)
    assert(q1.head._2 == 3L && q1.head._4 && q1.head._5,
      s"doc 3 (lexical AND vector) must fuse to rank 1: $q1")

    // warndf=0 (the serve-path latency knob, r14 plumbing): the df
    // guard is advisory only, so opting out changes NOTHING in ranks
    val noGuard = graft.queries.SimilarityQueries.hybridRrfServed(
      tidx, pidx, queries, k, candMult = 4, warnDfFrac = 0.0)
    assert(rows(noGuard) == rows(gate),
      "warnDfFrac=0 must serve identical fused ranks")

    // CLI smoke: the hybrid-search subcommand is the same composition
    queries.write.parquet(s"$base/q.parquet")
    val run = graft.Main.runPipeline(spark, Seq("hybrid-search",
      s"in=$base/q.parquet", s"text-index=$base/tidx", s"index=$base/pidx",
      s"out=$base/hits", "topk=5", "rerank=4", s"dim=$dim", "m=4", "k=8"))
    assert(run.rowsIn == 2)
    assert(rows(spark.read.parquet(s"$base/hits")
      .select("query_id", "doc_id", "rrf_rank", "in_lex", "in_vec")) == rows(gate),
      "the CLI must serve the same fused ranks")

    // a negative rerank= must refuse (the index-search misdirected-
    // knob rule, applied to hybrid-search too): silently serving the
    // plain search would contradict the knob the caller typed
    val bad = intercept[Exception] {
      graft.Main.runPipeline(spark, Seq("hybrid-search",
        s"in=$base/q.parquet", s"text-index=$base/tidx", s"index=$base/pidx",
        s"out=$base/hits_bad", "topk=5", "rerank=-1", s"dim=$dim", "m=4", "k=8"))
    }
    assert(bad.getMessage.contains("rerank"), bad.getMessage)
  }

  test("single-modality query rows: a text-only row ranks by lexical alone, a vector-only row by the index alone") {
    val base = java.nio.file.Files.createTempDirectory("graft_hybrid_mod").toString
    val tidx = new TextIndex(spark, s"$base/tidx", termParts = 8)
    tidx.build(docs)
    val pidx = new PqIndex(spark, s"$base/pidx", dim = dim, m = 4, k = 8,
      nCells = 2, nProbe = 2, sq8 = true)
    pidx.build(vecs)
    val k = 5
    // 2001 text-only (vec null), 2002 vector-only (qtext null)
    val nullVec: Array[Float] = null
    val queries = Seq(
      (2001L, "alpha crane", nullVec),
      (2002L, null.asInstanceOf[String], planted(1.0, 1)))
      .toDF("query_id", "qtext", "vec")
    val served = graft.queries.SimilarityQueries.hybridRrfServed(
      tidx, pidx, queries, k, candMult = 4)
    val byQ = served.collect().groupBy(_.getLong(0))
    // text-only: every hit is lexical, none vector, and the ranks are
    // the TextIndex ranks alone
    val lexAlone = tidx.search(Seq(2001 -> "alpha crane"), k)
      .select(col("doc_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val q1 = byQ(2001L).map(r => (r.getLong(1), r.getInt(2),
      r.getBoolean(3), r.getBoolean(4))).sortBy(_._2).toSeq
    assert(q1.forall(t => t._3 && !t._4), s"text-only row must fuse lexical-only: $q1")
    assert(q1.map(t => (t._1, t._2)).sorted == lexAlone,
      s"text-only fused ranks must equal the lexical ranks alone:\n$q1\n$lexAlone")
    // vector-only: every hit from the index side
    val q2 = byQ(2002L).map(r => (r.getLong(1), r.getInt(2),
      r.getBoolean(3), r.getBoolean(4))).sortBy(_._2).toSeq
    assert(q2.nonEmpty && q2.forall(t => !t._3 && t._4),
      s"vector-only row must fuse vector-only: $q2")
    // a row with NEITHER modality would silently vanish from the
    // output — it must refuse loudly instead (the knob-refusal
    // convention applied to malformed inputs)
    val withBothNull = queries.unionByName(
      Seq((2003L, null.asInstanceOf[String], nullVec)).toDF("query_id", "qtext", "vec"))
    val e = intercept[IllegalArgumentException] {
      graft.queries.SimilarityQueries.hybridRrfServed(tidx, pidx, withBothNull, k)
    }
    assert(e.getMessage.contains("NEITHER"), e.getMessage)
  }

  test("weighted RRF: weight 0 disables a side (equals the single-side search); negative weights refuse") {
    val base = java.nio.file.Files.createTempDirectory("graft_hybrid_w").toString
    val tidx = new TextIndex(spark, s"$base/tidx", termParts = 8)
    tidx.build(docs)
    val pidx = new PqIndex(spark, s"$base/pidx", dim = dim, m = 4, k = 8,
      nCells = 2, nProbe = 2, sq8 = true)
    pidx.build(vecs)
    val k = 5
    val queries = querySet.toDF("query_id", "qtext")
      .join(queryVecs.withColumnRenamed("id", "query_id"), Seq("query_id"))
    // wVec=0: output == the lexical search ranked alone, and the
    // vector index is never probed (in_vec all false)
    val lexOnly = graft.queries.SimilarityQueries.hybridRrfServed(
      tidx, pidx, queries, k, candMult = 4, wVec = 0.0)
    val lexGate = tidx.search(queries.select(col("query_id"), col("qtext")), k)
      .select(col("query_id").cast("long").as("query_id"), col("doc_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val got = lexOnly.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(got == lexGate, s"wVec=0 must equal the lexical search alone:\n$got\n$lexGate")
    assert(lexOnly.collect().forall(!_.getBoolean(4)), "wVec=0 must probe no vectors")
    // wLex=0 mirrors: equals the SQ8-tier vector search ranked alone
    val vecOnly = graft.queries.SimilarityQueries.hybridRrfServed(
      tidx, pidx, queries, k, candMult = 4, wLex = 0.0)
    val vecGate = pidx.topKRerankIndexed(
        queries.select(col("query_id").cast("long").as("id"), col("vec")), k, 4)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val gotV = vecOnly.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(gotV == vecGate, s"wLex=0 must equal the vector search alone:\n$gotV\n$vecGate")
    // a non-trivial weight changes fusion deterministically: with the
    // lexical side weighted up, a lexical-rank-1 doc must outrank a
    // vector-rank-1-only doc for query 1
    val weighted = graft.queries.SimilarityQueries.hybridRrfServed(
      tidx, pidx, queries, k, candMult = 4, wLex = 10.0, wVec = 1.0)
    val q1 = weighted.filter(col("query_id") === 1001L)
      .orderBy("rrf_rank").collect()
    assert(q1.head.getBoolean(3), s"wLex=10 must put a lexical hit at rank 1: ${q1.toSeq}")
    // refusals: negative weight, both-zero
    assert(intercept[IllegalArgumentException] {
      graft.queries.SimilarityQueries.hybridRrfServed(tidx, pidx, queries, k, wLex = -1.0)
    }.getMessage.contains("weights"))
    assert(intercept[IllegalArgumentException] {
      graft.queries.SimilarityQueries.hybridRrfServed(
        tidx, pidx, queries, k, wLex = 0.0, wVec = 0.0)
    }.getMessage.contains("0"))
  }
}
