package graft.queries

import graft.dedup.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication query surface over `documents` / `embeddings`
  * (SURVEY.md §2.C). Thresholds are pinned to values that produce
  * non-trivial results on the driver's synthetic corpus (near-dup
  * documents are planted at Jaccard ≈ 0.99; embeddings top out around
  * cosine 0.5). */
object DedupQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
  private def embs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(spark, dir), col("text"), "doc_id")

  def dedupExactNorm(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docs(spark, dir), Dedup.normalizedText(col("text")), "doc_id")

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(docs(spark, dir), col("text"), "doc_id", minJaccard = 0.8)

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(docs(spark, dir), col("text"), "doc_id", minJaccard = 0.8)

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(docs(spark, dir), col("text"), "doc_id", maxHamming = 3)

  /** EXACT embedding dedup via the distributed pair-grid — no
    * CartesianProduct in the plan, but necessarily all-pairs work
    * (τ=0.4 sits inside the noise floor; see
    * Dedup.embeddingPairsBlocked). The SCALE headline is
    * [[dedupEmbeddingLsh]]; this is the exact baseline. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairsBlocked(embs(spark, dir), col("embedding"), "vec_id", minCosine = 0.4)

  /** The documented brute-force baseline, kept as its own gate entry. */
  def dedupEmbeddingBruteforce(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairs(embs(spark, dir), col("embedding"), "vec_id", minCosine = 0.4)

  // gate params for the LSH path — shared with the oracle builder so
  // the SQL plane literals always match the Spark expression's planes
  private val LshBands = 6
  private val LshBits = 8
  private val LshDim = 64

  /** The SCALE path for embedding dedup: banded RHP-LSH candidates +
    * exact-cosine verification (Dedup.embeddingLshPairs). The gate runs
    * it at the corpus's only populated threshold (0.4 — inside the
    * noise floor, hostile to LSH by construction), so the result is
    * the DETERMINISTIC set "LSH candidates ∩ cosine ≥ 0.4" and the
    * oracle replays the banding exactly from seed-derived plane
    * literals; the near-dup regime (τ=0.9, recall 1.0) is pinned by
    * DedupSpec on a planted corpus where the exact join agrees. */
  def dedupEmbeddingLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingLshPairs(embs(spark, dir), col("embedding"), "vec_id",
      minCosine = 0.4, dim = LshDim, bands = LshBands, bitsPerBand = LshBits)

  // the 100×-corpus operating point (PLANS.md sf10 finding 2): at
  // 200k+ random 64-dim vectors the noise floor crosses τ=0.4, so a
  // real near-dup clean runs a high threshold with LONG bands —
  // random band collision 4·2⁻¹⁵ per pair vs 6·2⁻⁸ for the gate
  // params. NOT a gate entry: the driver corpus's pair cosines top
  // out at ~0.51 (no verbatim-copy regime exists there), so the gate
  // result would be trivially empty — the envelope is pinned on a
  // planted near-verbatim corpus in DedupSpec instead.
  private[queries] val TightBands = 4
  private[queries] val TightBits = 15

  /** [[dedupEmbeddingLsh]] at the scale-appropriate parameters:
    * τ=0.8 with banding selective enough for a 100× corpus. */
  def dedupEmbeddingLshTight(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    Dedup.embeddingLshPairs(df, col(vecCol), idCol,
      minCosine = 0.8, dim = LshDim, bands = TightBands, bitsPerBand = TightBits)

  /** SemDeDup gate entry: nClusters = 0 ⇒ the operator self-sizes via
    * `Similarity.suggestNCells(count)` (~4√n cells), so the within-cell
    * all-pairs cost follows the n^1.5/16 curve at ANY corpus size — a
    * pinned cell count here would be Σ|cell|² = n²/k, quadratic with a
    * constant divisor (the r7 verdict's one weak config). rows-only at
    * the gate (a DuckDB oracle cannot replay the k-means fit — same
    * adjudication as ann_ivf); SemdedupSpec pins the semantics: exact
    * subset of the brute-force pairs, planted-corpus recall,
    * determinism, and that auto-sizing == suggestNCells. */
  def dedupSemdedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.semdedupPairs(embs(spark, dir), col("embedding"), "vec_id",
      nClusters = 0, minCosine = 0.4)

  /** Dedup execution: near-dup pairs → canonical survivor per doc via
    * distributed connected components. */
  def dedupResolve(spark: SparkSession, dir: String): DataFrame =
    Dedup.resolveClusters(dedupNgramJaccard(spark, dir))

  /** Exact substring-window dedup: pairs sharing a verbatim
    * 10-token window (Dedup.substringPairs — the passage-copy regime
    * set-similarity misses). */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame =
    Dedup.substringPairs(docs(spark, dir), col("text"), "doc_id", windowTokens = SubstrWindow)

  private val SubstrWindow = 10

  /** Duplication profile of the corpus: the cluster-size histogram of
    * the near-dup graph — how many 2-clusters, 3-clusters, … the
    * Jaccard pairs resolve into. The number a curator reads to decide
    * whether dedup is worth a full pass ("3% of docs sit in clusters"
    * vs "40% do") and to spot template explosions (one giant cluster).
    * Docs in no pair are implicitly singletons and excluded, so the
    * histogram is exactly the non-trivial duplication mass. Cost on
    * top of resolution: two tiny aggregations of the (doc, canonical)
    * set — at 100 TB that set is O(duplicated docs), not O(corpus). */
  def dedupClusterStats(spark: SparkSession, dir: String): DataFrame =
    Dedup.resolveClusters(dedupNgramJaccard(spark, dir))
      .groupBy(col("canonical_id")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_exact_norm" -> (dedupExactNorm _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_embedding_bruteforce" -> (dedupEmbeddingBruteforce _),
    "dedup_embedding_lsh" -> (dedupEmbeddingLsh _),
    "dedup_semdedup" -> (dedupSemdedup _),
    "dedup_resolve" -> (dedupResolve _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_cluster_stats" -> (dedupClusterStats _))

  /** DuckDB shingle expression mirroring Dedup.shingles (word 3-grams,
    * distinct). */
  private[queries] val shinglesSql =
    """list_distinct(CASE WHEN len(ws) >= 3
      |  THEN list_transform(generate_series(1, len(ws) - 2),
      |                      i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
      |  ELSE [] END)""".stripMargin

  /** Exhaustive shingle-Jaccard pair join at the 0.8 threshold — shared
    * by the exact n-gram path and (since its candidate recall is 1.0
    * here, with identical exact-Jaccard verification) the MinHash-LSH
    * path. */
  private val exactJaccardSql =
    s"""WITH sh AS (
       |  SELECT doc_id, $shinglesSql AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |         CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.8""".stripMargin

  /** Recursive-CTE connected-components skeleton over the 0.8-Jaccard
    * pair graph, ending at the `cc(doc_id, lbl)` closure — shared by
    * `dedup_resolve` (min-label per doc) and `dedup_cluster_stats`
    * (histogram of cluster sizes) so the two oracles resolve the
    * exact same graph. */
  private val resolveCtesSql =
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, $shinglesSql AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |jpairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |           CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
       |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |  WHERE jaccard >= 0.8),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM jpairs
       |          UNION SELECT doc_b, doc_a FROM jpairs),
       |cc(doc_id, lbl) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, cc.lbl FROM edges e JOIN cc ON cc.doc_id = e.b)""".stripMargin

  /** Exact all-pairs cosine ≥ 0.4 — shared by both embedding-dedup
    * entries: the grid path must produce byte-identical pairs to the
    * brute-force baseline. */
  private val embeddingPairsSql =
    """WITH v AS (
      |  SELECT vec_id, embedding,
      |         sqrt(list_reduce(list_transform(embedding,
      |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      |              (a, b) -> a + b)) AS nrm
      |  FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |         list_reduce(list_transform(list_zip(a.embedding, b.embedding),
      |                z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
      |              (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
      |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
      |SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.4""".stripMargin

  /** Replays Dedup.embeddingLshPairs step for step in DuckDB: the
    * seed-derived hyperplanes are embedded as FLOAT[] literals (the
    * exact floats RhpBandKeys bakes into codegen — Float.toString
    * round-trips), signature = packed sign bits of double-fold
    * projections, band keys = integer shifts, candidates = band
    * equi-join, verification = the same a<b-ordered exact cosine as
    * [[embeddingPairsSql]]. Works because RHP-LSH has no
    * data-dependent state (cf. SimilarityQueries.lshOracleSql). */
  private[queries] lazy val embeddingLshOracleSql: String =
    embeddingLshSql(LshBands, LshBits, 0.4)

  private def embeddingLshSql(bands: Int, bits: Int, minCosine: Double): String = {
    val planes = graft.functions.VectorFunctions.rhpPlanes(bands * bits, LshDim)
    def dotSql(p: Array[Float]): String =
      s"""list_reduce(list_transform(list_zip(e.embedding, CAST([${p.mkString(", ")}] AS FLOAT[])),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (x, y) -> x + y)""".stripMargin
    val sigExpr = planes.zipWithIndex.map { case (p, k) =>
      s"(CASE WHEN ${dotSql(p)} >= 0 THEN ${1L << k} ELSE 0 END)"
    }.mkString("\n   + ")
    s"""WITH sigs AS (
       |  SELECT e.vec_id, ($sigExpr) AS sig FROM embeddings e),
       |bnd AS (
       |  SELECT vec_id, j AS band, (sig >> (j * $bits)) & ${(1 << bits) - 1} AS bkey
       |  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, ${bands - 1})) AS j)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS ca, b.vec_id AS cb
       |  FROM bnd a JOIN bnd b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.vec_id < b.vec_id),
       |v AS (
       |  SELECT vec_id, embedding,
       |         sqrt(list_reduce(list_transform(embedding,
       |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
       |              (a, b) -> a + b)) AS nrm
       |  FROM embeddings),
       |pairs AS (
       |  SELECT cand.ca AS vec_a, cand.cb AS vec_b,
       |         list_reduce(list_transform(list_zip(a.embedding, b.embedding),
       |                z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
       |              (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
       |  FROM cand JOIN v a ON cand.ca = a.vec_id
       |            JOIN v b ON cand.cb = b.vec_id)
       |SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= $minCosine""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      "SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents GROUP BY text",
    "dedup_exact_norm" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents
        |GROUP BY lower(regexp_replace(trim(text), '\s+', ' ', 'g'))""".stripMargin,
    "dedup_ngram_jaccard" -> exactJaccardSql,
    // LSH candidate recall is 1.0 on this corpus (planted near-dups sit
    // at Jaccard ≈ 0.99, far above the 16-band threshold curve) and the
    // verification step computes the same exact Jaccard — so the LSH
    // path must reproduce the exhaustive join bit-for-bit
    "dedup_minhash_lsh" -> exactJaccardSql,
    "dedup_resolve" ->
      s"""$resolveCtesSql
         |SELECT doc_id, min(lbl) AS canonical_id FROM cc GROUP BY doc_id""".stripMargin,
    // the same resolution, rolled up twice: size per canonical, then
    // count per size — one CTE skeleton so the two oracles can't drift
    "dedup_cluster_stats" ->
      s"""$resolveCtesSql,
         |canon AS (SELECT doc_id, min(lbl) AS canonical_id FROM cc GROUP BY doc_id),
         |sizes AS (SELECT canonical_id, count(*) AS cluster_size FROM canon GROUP BY canonical_id)
         |SELECT cluster_size, count(*) AS n_clusters FROM sizes GROUP BY cluster_size""".stripMargin,
    "dedup_substring" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |g AS (SELECT doc_id, unnest(list_distinct(
         |         CASE WHEN len(ws) >= $SubstrWindow
         |              THEN list_transform(generate_series(1, len(ws) - ${SubstrWindow - 1}),
         |                     i -> array_to_string(ws[i : i + ${SubstrWindow - 1}], ' '))
         |              ELSE [] END)) AS gram
         |      FROM w)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_windows
         |FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "dedup_embedding" -> embeddingPairsSql,
    "dedup_embedding_bruteforce" -> embeddingPairsSql,
    "dedup_embedding_lsh" -> embeddingLshOracleSql,
    // brute-force twin of the pigeonhole block join (complete for
    // hamming <= 3, so the pair sets are identical). Base hash mirrors
    // Dedup.simhashBaseHash: two Horner folds mod 2^31-1 (seeds
    // 17/131), each remixed (h*A + B) % p for avalanche, packed
    // h1'*2^31 + h2'; signature bit b is set when strictly more than
    // half the word hashes have bit b set (SimHash64's votes > 0
    // rule). Bits 62-63 are structurally zero on both sides.
    "dedup_simhash" ->
      """WITH w AS (
        |  SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws FROM documents),
        |h AS (
        |  SELECT doc_id, list_transform(ws, w ->
        |      ((list_reduce(list_prepend(CAST(17 AS BIGINT),
        |          list_transform(string_split_regex(w, ''), ch -> ord(ch))),
        |        (a, b) -> (a * 31 + b) % 2147483647) * 1103515245 + 12345) % 2147483647)
        |      * 2147483648
        |    + ((list_reduce(list_prepend(CAST(131 AS BIGINT),
        |          list_transform(string_split_regex(w, ''), ch -> ord(ch))),
        |        (a, b) -> (a * 31 + b) % 2147483647) * 1140671485 + 12820163) % 2147483647)) AS hl
        |  FROM w),
        |sig AS (
        |  SELECT doc_id, CAST(coalesce(list_sum(
        |      list_transform(generate_series(0, 61), b ->
        |        CASE WHEN 2 * len(list_filter(hl, x -> (x >> b) & 1 = 1)) > len(hl)
        |             THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END)), 0) AS BIGINT) AS sig
        |  FROM h)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin)
}
