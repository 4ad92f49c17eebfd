package graft.queries

import graft.dedup.Dedup
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation pipeline — the composition the
  * individual operators exist for: near-dup removal (keep the
  * canonical survivor of every cluster) + quality filtering + token
  * accounting, in one declarative plan.
  *
  * At 100 TB this runs as: pair detection via MinHash-LSH banding,
  * cluster resolution on the (tiny) pair set, a broadcast anti-join of
  * losers against the corpus, then pure per-row scoring — the corpus
  * is scanned twice (detection + final pass), and document TEXT never
  * shuffles (the detection pass exchanges only derived (hash, id)
  * band rows, a fixed few hundred bytes per doc). */
object PipelineQueries {
  val QualityFloor = 0.5

  def corpusClean(spark: SparkSession, dir: String): DataFrame =
    corpusCleanDocs(Tables.load(spark, dir, "documents")).drop("text")

  /** [[corpusClean]] over any `(doc_id, lang, text)` frame, KEEPING
    * the text column — the pipeline form, so a downstream stage
    * consumes survivors without re-joining text (the gate query drops
    * it to preserve its oracle schema). */
  def corpusCleanDocs(docs: DataFrame): DataFrame = {
    // hot-shingle guard ON: a shingle shared by >100 docs cannot make
    // a 0.8-Jaccard pair it alone witnesses (planted near-dups share
    // ~all their shingles, with doc-freq 2-3); verified identical to
    // the unguarded pair set at sf0.01 and sf0.1 — and DedupSpec pins
    // that equivalence so a corpus change fails loudly
    val pairs = Dedup.jaccardPairs(docs, col("text"), "doc_id",
      minJaccard = 0.8, maxDocFreq = 100L)
    val losers = Dedup.resolveClusters(pairs)
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"))
    scoreAndFloor(docs.join(broadcast(losers), Seq("doc_id"), "left_anti"),
      keepText = true)
  }

  /** The quality floor + token accounting shared by the full,
    * incremental, and pipeline cleans — ONE select list, so the
    * clean-output contract can't fork (`keepText` only inserts the
    * text column for the pipeline form). */
  private def scoreAndFloor(kept: DataFrame, keepText: Boolean = false): DataFrame =
    // r15: fanoutBy before scoring — the quality rules + BPE encode are
    // the heaviest per-row work in the clean and otherwise run inside
    // the serial single-row-group scan task (guide §2.5: repartition
    // immediately after an unsplittable read). No-op when the input is
    // already parallel (the incremental path, real multi-file layouts).
    graft.sources.PlanUtils.fanoutBy(kept, col("doc_id"))
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("quality") >= QualityFloor)
      .select(
        Seq(col("doc_id"), col("lang")) ++
          (if (keepText) Seq(col("text")) else Nil) ++
          Seq(col("quality"),
            size(words(col("text"))).as("n_words"),
            size(bpeTokens(col("text"))).as("n_bpe_tokens")): _*)

  /** CDC-incremental corpus hygiene: clean ONLY `newDocs` against the
    * accumulated signature index of prior survivors — history
    * participates as (signature, band-hash) rows, never as text, so
    * batch N+1 does no re-shingling (or even re-reading) of batch N.
    *
    * Composition: [[graft.streaming.Streaming.dedupNearBatch]] (intra-
    * batch LSH dedup + signature-estimated near-dup check vs the
    * index; survivors' signatures appended under `batchId` for replay
    * idempotency) followed by the same quality floor + token
    * accounting as [[corpusClean]]. At 100 TB this turns a daily
    * full-corpus clean into a scan of the day's delta plus a PRUNED
    * probe of the (≈1 KB/doc) signature index — only the batch's band
    * partitions and the candidates' sig buckets are read
    * ([[graft.streaming.SigIndex]]), never the whole index. The
    * canonical survivor is first-seen-wins instead of min-id, which IS
    * the CDC semantics (history is already published and must not be
    * retracted). */
  def corpusCleanIncremental(newDocs: DataFrame,
                             index: graft.streaming.SigIndex,
                             batchId: Long,
                             keepText: Boolean = false): DataFrame =
    scoreAndFloor(graft.streaming.Streaming.dedupNearBatch(
      newDocs, index, "text", "doc_id",
      minJaccard = 0.8, numPerm = 128, bands = 16, k = 3, batchId = batchId),
      keepText = keepText)

  /** Multimodal corpus hygiene: near-dup detection over BOTH
    * modalities at once — word-shingle Jaccard on the text (the
    * verbatim-copy signal) UNION banded-RHP cosine on the embedding
    * (the paraphrase signal; `documents.doc_id` and
    * `embeddings.vec_id` share one id space) — resolved through ONE
    * connected-components pass so a cluster chained through either
    * modality keeps a single survivor, then the same quality floor +
    * token accounting. This is the batch twin of the e2e streaming
    * loop's two dedup stages, and every leg is individually
    * oracle-proven (corpus_clean + dedup_embedding_lsh), so the
    * composition gets a full DuckDB oracle too. */
  def corpusCleanMultimodal(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val textPairs = Dedup.jaccardPairs(docs, col("text"), "doc_id",
        minJaccard = 0.8, maxDocFreq = 100L)
      .select("doc_a", "doc_b")
    // the embedding leg IS the dedup_embedding_lsh gate query — one
    // definition, so its oracle-pinned parameters (threshold, bands,
    // dim, seed) cannot drift from the multimodal oracle's literals
    val embPairs = DedupQueries.dedupEmbeddingLsh(spark, dir)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val losers = Dedup.resolveClusters(textPairs.unionByName(embPairs))
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"))
    scoreAndFloor(docs.join(broadcast(losers), Seq("doc_id"), "left_anti"))
  }

  /** Deterministic stratified sampling: per-language keep rates
    * rebalance an over-represented stratum (1-in-5 for `en`, 1-in-2
    * elsewhere). The keep decision is a pure function of the row key —
    * reproducible across runs/cluster sizes, no rand(), and expressible
    * as a WHERE clause so it pushes into the scan. At real scale the
    * modulo runs on a uniform hash of the key. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val rate = coalesce(
      map(lit("en"), lit(5)).getItem(col("lang")), lit(2))
    Tables.load(spark, dir, "documents")
      .filter(pmod(col("doc_id"), rate) === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  /** Exact k-docs-per-language sample — the curator's "pull k docs
    * per language to eyeball" before committing a pipeline change.
    * Deterministic: the sampling order is an affine residue of the
    * row key mod 2^31−1 (the [[shardDocs]] decorrelation machinery —
    * exact BIGINT both engines, independent multiplier so sample
    * order ≠ shard order), so the pull is reproducible across runs
    * and cluster sizes, free of source-order bias, and MONOTONE under
    * corpus growth: a new doc can displace at most the current rank-k
    * tail, never reshuffle the sample — rand() is none of those
    * things. The per-language window is the exact form; the 100 TB
    * path is [[corpusSampleKPruned]] (histogram-edge prefilter on
    * `ord` so each window sorts ≈k rows, not the language), which
    * shares this form's oracle bit-for-bit. */
  def corpusSampleK(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    sampleKDocs(Tables.load(spark, dir, "documents"), k)

  /** [[corpusSampleK]] over any frame with (doc_id, lang) — the spec
    * form. */
  private[graft] def sampleKDocs(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("ord"), col("doc_id"))
    docs.select(col("doc_id"), col("lang"), sampleOrd.as("ord"))
      .withColumn("sample_rank", row_number().over(win).cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col("doc_id"), col("lang"), col("sample_rank"))
  }

  /** The sampling-order residue both sample-k forms rank by — one
    * definition so the exact/pruned twins cannot drift. */
  private def sampleOrd: Column =
    pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(48271L) + lit(11L),
      lit(2147483647L))

  /** Bin count for [[corpusSampleKPruned]]'s ord histogram. The ord
    * residue is an integer in [0, 2^31−2] and the bin edge arithmetic
    * is integer, so no FP rounding can move a doc across the edge. */
  val SampleKBins = 4096

  /** The 100 TB form of [[corpusSampleK]] — IDENTICAL output, pruned
    * sort (the [[corpusSelectBudgetPruned]] pattern applied to the
    * sample window). The exact form's per-language `row_number` sorts
    * EVERY language partition in full to keep k≈3 rows — on a corpus
    * whose language mix is heavily skewed, that is a total sort of
    * the dominant language. Pass 1 here is a |langs|×[[SampleKBins]]
    * count histogram over the ord residue (the only thing collected);
    * walking bins from the BOTTOM, the per-language edge is the upper
    * boundary of the bin at which cumulative count first reaches k —
    * every doc at or above the edge has ≥ k docs with strictly
    * smaller ord and is provably dropped by the exact rule, so
    * `ord < edge` keeps an ord-prefix superset of the winners, and a
    * row_number over a prefix-superset assigns the surviving rows the
    * same ranks as over the full partition. Expected window input per
    * language ≈ max(k, n_lang/[[SampleKBins]]) — with 10^11 docs in
    * the dominant language, a ~4000× smaller sort; a language whose
    * supply never reaches k keeps everything (edge = the residue
    * modulus).
    *
    * Shares [[corpusSampleK]]'s oracle verbatim — the gate pins
    * bit-identical output, not "roughly the same sample". */
  def corpusSampleKPruned(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    sampleKDocsPruned(Tables.load(spark, dir, "documents"), k)

  /** [[corpusSampleKPruned]] over any (doc_id, lang) frame — the spec
    * form. */
  private[graft] def sampleKDocsPruned(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val scored = docs.select(col("doc_id"), col("lang"), sampleOrd.as("ord"))
    val edges = sampleKEdges(docs.sparkSession, scored, k)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("ord"), col("doc_id"))
    // NULL-SAFE join: the exact form's window treats a null lang as
    // its own partition (and returns up to k of it), so the prefilter
    // must too — a plain equi-join would drop every null-lang row and
    // break the pinned bit-identity on lang-less corpora
    val e = edges.withColumnRenamed("lang", "__elang")
    scored.join(broadcast(e), col("lang") <=> col("__elang")).drop("__elang")
      .filter(col("ord") < col("ordmax"))
      .withColumn("sample_rank", row_number().over(win).cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col("doc_id"), col("lang"), col("sample_rank"))
  }

  /** Pass 1 of the pruned sample: the per-language ord edge from a
    * bounded (|langs| × [[SampleKBins]]-row) count histogram. Exposed
    * for the spec, which pins that `ord < ordmax` admits ≈k docs of a
    * dominant language instead of all of them. */
  private[graft] def sampleKEdges(spark: SparkSession, scored: DataFrame,
                                  k: Int): DataFrame = {
    import spark.implicits._
    val width = 2147483647L / SampleKBins + 1L // ceil ⇒ bin < SampleKBins
    scored
      .groupBy(col("lang"), (col("ord") / width).cast("int").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getString(0)).toSeq.map { case (lang, rows) =>
        val fromBottom = rows.map(r => r.getInt(1) -> r.getLong(2)).sortBy(_._1)
        var cum = 0L
        var edge = 2147483647L // supply < k ⇒ keep the whole language
        val it = fromBottom.iterator
        while (cum < k && it.hasNext) {
          val (bin, cnt) = it.next(); cum += cnt; edge = (bin + 1L) * width
        }
        (lang, if (cum < k) 2147483647L else edge)
      }.toDF("lang", "ordmax")
  }

  /** Benchmark decontamination: flag corpus docs sharing any word
    * 5-gram with a held-out eval set (here: the deterministic
    * `doc_id % 23 == 0` slice stands in for the benchmark). The
    * standard pre-training hygiene pass: training text overlapping the
    * eval set inflates scores. Shape: distinct 5-gram hashes exploded
    * once per side, eval side broadcast (benchmarks are tiny next to a
    * 100 TB corpus), equi-join on the 8-byte hash, one count per doc. */
  def corpusDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    corpusDecontaminateDocs(
      docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0), k = 5)
  }

  /** Gate form of the bloom-prefilter variant: same eval slice, same
    * oracle SQL as `corpus_decontaminate` — the bit-identical-output
    * claim is CHECKED, not asserted. A high-fpp filter would still
    * pass (exact verify), so the spec additionally measures the
    * candidate reduction the bloom actually buys. */
  def corpusDecontaminateBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    corpusDecontaminateDocsBloom(
      docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0), k = 5)
  }

  /** [[corpusDecontaminate]] against a REAL eval corpus — the
    * CLI/scheduler form (`Main decontaminate`): flags every training
    * doc sharing any word `k`-gram with any eval text, with the shared
    * count (the decision input: scrub, or drop the doc). Eval n-grams
    * are hashed and broadcast — eval suites are small by nature, the
    * training corpus is never shuffled. */
  def corpusDecontaminateDocs(docs: DataFrame, evals: DataFrame,
                              k: Int = 5): DataFrame =
    corpusDecontaminateDocsFromGrams(docs,
      decontaminateGrams(evals, k).select("sh").distinct(), k)

  /** [[corpusDecontaminateDocs]] against an ALREADY-DERIVED distinct
    * eval-gram frame (`sh` column) — the frozen-eval-state form of the
    * incremental pipeline: the seed batch derives and persists the
    * gram table once, every later delta joins against the persisted
    * frame instead of re-shingling the eval corpus per batch. `k` is
    * display-only here (the output column name); the caller owns the
    * contract that the grams were derived at the same k. */
  private[graft] def corpusDecontaminateDocsFromGrams(docs: DataFrame,
                                                      evalGrams: DataFrame,
                                                      k: Int): DataFrame =
    decontaminateGrams(docs, k)
      .join(broadcast(evalGrams.select("sh")), Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as(s"n_shared_${k}grams"))

  /** One side's distinct-per-doc k-gram hashes: `(doc_id, sh)`. */
  private[graft] def decontaminateGrams(df: DataFrame, k: Int): DataFrame =
    df.select(col("doc_id"),
      explode(transform(Dedup.shingles(col("text"), k), x => xxhash64(x))).as("sh"))

  /** [[corpusDecontaminateDocs]] for eval suites too big to broadcast
    * exactly — the frontier-scale shape, where the "eval set" is a
    * UNION of benchmarks and the exact hash set is GBs. A bloom of the
    * eval grams is broadcast instead (~1.8 bytes/gram at the 0.1%
    * default fpp vs 8+ exact), the corpus prefilters its grams through
    * it MAP-SIDE (codegen'd [[graft.functions.expr.BloomMightContain]],
    * no shuffle of non-candidates), and only the surviving candidates
    * take the exact-verify equi-join — which kills the bloom's false
    * positives, so the OUTPUT CONTRACT IS IDENTICAL to the exact form
    * (the gate runs both against the same oracle). Shuffle volume:
    * true hits + fpp × corpus grams (at 1e11 grams and fpp 1e-3,
    * ~1e8 verify rows — vs the exact form's impossible broadcast).
    * Never false-negative: bloom misses would silently un-flag
    * contaminated text, so only POSITIVE candidates are pruned-in. */
  def corpusDecontaminateDocsBloom(docs: DataFrame, evals: DataFrame,
                                   k: Int = 5, fpp: Double = 0.001): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val evalG = decontaminateGrams(evals, k).select("sh").distinct()
    // the eval-side count + bloom build are eval-sized actions (the
    // small side by construction); the corpus side stays lazy
    val bloom = evalG.stat.bloomFilter("sh", math.max(64L, evalG.count()), fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    val candidates = decontaminateGrams(docs, k)
      .filter(ofExpr(graft.functions.expr.BloomMightContain(
        toExpr(col("sh")), bytes.toByteArray)))
    candidates.join(evalG, Seq("sh")) // exact verify: bloom FPs die here
      .groupBy("doc_id")
      .agg(count(lit(1)).as(s"n_shared_${k}grams"))
  }

  /** Gate form of [[corpusDecontaminateNearDocs]]: same eval slice as
    * `corpus_decontaminate`, MinHash threshold shared with
    * `dedup_minhash_lsh` (0.8). */
  def corpusDecontaminateNear(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    corpusDecontaminateNearDocs(
      docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0), minJaccard = 0.8)
  }

  /** NEAR-duplicate decontamination — the recall extension of the
    * exact-gram forms: a reworded eval item shares few verbatim
    * 5-grams but keeps most of its 3-shingle set, so MinHash/LSH vs
    * the eval corpus catches what [[corpusDecontaminateDocs]] can't
    * (the GPT-4-report motivation for fuzzy decontamination). Pure
    * composition of the dedup machinery
    * ([[graft.dedup.Dedup.minhashLshPairsBipartite]]): eval-side band
    * table + shingle sets broadcast, the corpus is scanned once and
    * never shuffled, candidates alone move. Output one row per
    * (training doc, eval doc) pair at true Jaccard ≥ `minJaccard` —
    * join-ready against both the drop policy and the audit table. */
  def corpusDecontaminateNearDocs(docs: DataFrame, evals: DataFrame,
                                  minJaccard: Double): DataFrame =
    Dedup.minhashLshPairsBipartite(docs, evals, col("text"), "doc_id", minJaccard)

  /** Gate form of [[corpusContaminationScoreDocs]]: same eval slice
    * as `corpus_decontaminate`, scored over EVERY training doc. */
  def corpusContaminationScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    corpusContaminationScoreDocs(
      docs.filter(col("doc_id") % 23 =!= 0),
      docs.filter(col("doc_id") % 23 === 0), k = 5)
  }

  /** GRADED contamination — the decision-surface complement to the
    * binary [[corpusDecontaminateDocs]] flag: for EVERY training doc,
    * the fraction of its distinct word `k`-grams that appear anywhere
    * in the eval corpus. The binary form answers "touched at all?";
    * real curation policies threshold on the FRACTION (drop above
    * ~0.8 = the doc IS the benchmark; scrub between; keep below —
    * the GPT-3/PaLM appendix-B shape), and reporting 0-overlap docs
    * matters because the output doubles as the decontamination AUDIT
    * table.
    *
    * Same scale plan as the exact form (eval grams broadcast, corpus
    * scanned once, shuffle = per-doc gram counts only) with one LEFT
    * join so clean docs survive with contamination 0. Docs with fewer
    * than `k` words have no grams and score 0 by definition, not
    * 0/0. The division is exact-int over exact-int in IEEE double —
    * bit-identical in DuckDB. */
  def corpusContaminationScoreDocs(docs: DataFrame, evals: DataFrame,
                                   k: Int = 5): DataFrame = {
    val evalG = decontaminateGrams(evals, k).select("sh").distinct()
      .withColumn("hit", lit(1L))
    val perDoc = decontaminateGrams(docs, k)
      .join(broadcast(evalG), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum("hit"), lit(0L)).as("n_shared"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(coalesce(col("n_grams"), lit(0L)) > 0L,
          coalesce(col("n_shared"), lit(0L)).cast("double") / col("n_grams"))
          .otherwise(lit(0.0)).as("contamination"))
  }

  /** Hashed n-gram feature space for importance resampling: every
    * word unigram and bigram maps to one of [[DsirBuckets]] buckets.
    * A power-of-two count keeps the DuckDB mirror a plain `%`. 4096
    * buckets is the bias/variance point the DSIR paper's 10k-bucket
    * choice also sits near: small enough that both distribution
    * estimates are dense at modest sample sizes, large enough that
    * domain-bearing vocabulary doesn't all collide. */
  val DsirBuckets = 4096

  /** Fraction of candidates the gate form keeps (top 20%). */
  val DsirKeepFrac = 0.2

  /** Word unigrams + bigrams from an already-extracted words-array
    * COLUMN, count-weighted (NOT distinct — the importance weight is
    * a sum over feature COUNTS). ASCII word extraction mirrors the
    * simhash oracle's: the bucket hash is byte-exact reproduced in
    * SQL via `ord()`, which equals the UTF-8 byte only for ASCII.
    *
    * Bigrams pair the array with its own 1-shifted slice via
    * `zip_with` — both are lambda ARGUMENTS, evaluated once per row.
    * The first cut indexed the outer array from INSIDE the lambda
    * (`element_at(ws, i + 2)` with `ws` a whole expression tree):
    * higher-order functions evaluate interpreted with no
    * subexpression reuse, so the regexp re-ran per ELEMENT —
    * O(words²·|text|) per document (measured: pass 1 at sf0.1 took
    * 17.6 s; the whole query now runs in a fraction of that).
    * zip_with pads the shorter slice with null, the trailing
    * (last-word, null) pair concats to null, and the filter drops
    * it — which also makes the 0/1-word edge cases fall out. */
  private[graft] def dsirGrams(ws: Column): Column =
    concat(ws,
      filter(zip_with(ws, slice(ws, lit(2), greatest(size(ws), lit(1))),
        (a, b) => concat(a, lit(" "), b)), g => g.isNotNull))

  /** The `[A-Za-z]+` word array both DSIR passes gram over. */
  private[graft] def dsirWords(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))

  /** Feature bucket of one gram: base-31 Horner fold mod 2^31−1
    * (seed 7 — independent of the simhash seeds), remixed through a
    * universal affine map so short grams don't concentrate in the
    * low buckets, then mod [[DsirBuckets]]. Every step is exact
    * integer arithmetic with a `list_reduce` DuckDB mirror — the same
    * oracle-checkability argument as [[Dedup.simhashBaseHash]]. */
  private[graft] def dsirBucket(g: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val p = 2147483647L
    val h = ofExpr(graft.functions.expr.RollingHash(toExpr(g), 7L, p))
    pmod(pmod(h * lit(1103515245L) + lit(12345L), lit(p)), lit(DsirBuckets))
  }

  /** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    * public): pick the candidate documents whose hashed-n-gram
    * distribution looks most like a target-domain sample. The gate
    * form targets the deterministic `doc_id % 17 == 0` slice (the
    * stand-in for "a sample of the domain we want more of", the same
    * held-out-slice idiom as [[corpusDecontaminate]]) and keeps the
    * top [[DsirKeepFrac]] of the rest. */
  def corpusDsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    corpusDsirSelectDocs(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0), DsirKeepFrac)
  }

  /** [[corpusDsirSelect]] over any candidate/target frames — the
    * CLI/scheduler form. Shape, built for a corpus that cannot be
    * sorted whole:
    *
    *  1. ONE scan of both sides aggregates per-bucket gram counts —
    *     map-side partial agg to ≤ [[DsirBuckets]]×partitions shuffle
    *     rows, a bounded 4096-row collect.
    *  2. The per-bucket importance weight λ_b = ⌊1000·ln(p̂_t(b) /
    *     p̂_r(b)) + 0.5⌋ (add-one smoothing both sides) is derived on
    *     the driver as a fixed-point integer MILLI-log-ratio — from
    *     here on every number is a BIGINT, so no float summation
    *     order can flip the selection, and the DuckDB oracle can
    *     reproduce the weights bit-for-bit (`floor(x+0.5)` on both
    *     sides: `math.round` and SQL `round` disagree on negative
    *     halves).
    *  3. A second scan computes each candidate's weight SCAN-LOCALLY:
    *     a higher-order `aggregate` over the doc's own gram array
    *     indexes the λ table shipped as a 4096-long array literal in
    *     the plan — no explode, no join, no shuffle of gram rows;
    *     persisted as a 16 B/doc (doc_id, weight) projection.
    *  4. Top-⌈frac·n⌉ selection WITHOUT a corpus-wide sort: weights
    *     are integers, so an exact 4096-bin histogram over
    *     [min, max] (integer bin arithmetic — no FP edge rounding)
    *     gives the highest weight edge E whose from-the-top
    *     cumulative count reaches K. `weight ≥ E` is then a provable
    *     prefix-superset of the winners — the same proof shape as
    *     [[corpusSelectBudgetPruned]] — and the row_number window
    *     runs over ≈K survivors instead of all n. At a 100:1
    *     supply-to-keep ratio that is a 100× smaller sort; steps 2–4
    *     touch only the persisted projection, never the text again.
    *
    * Docs with zero extractable grams carry no distributional
    * evidence and are excluded (both sides of the gate agree: the
    * oracle's explode/join drops them naturally). */
  /** Per-bucket fixed-point milli-log-ratio weights λ_b =
    * ⌊1000·ln(p̂_t(b)/p̂_r(b)) + 0.5⌋ over `grammed` rows of
    * `(tgt: boolean, grams: array<string>)` — add-one smoothing both
    * sides. This is BOTH the DSIR importance weight (tgt = target
    * domain, ¬tgt = raw pool) and the multinomial Naive-Bayes
    * log-count-ratio classifier weight (tgt = quality reference,
    * ¬tgt = rejected crawl; Wang & Manning 2012's NB feature — the
    * fastText/GPT-3-style linear quality filter reduces to exactly
    * this shape over hashed grams), which is why it is shared.
    *
    * Cost: ONE scan with map-side partial agg to ≤ DsirBuckets ×
    * partitions shuffle rows, a bounded 4096-row collect. The
    * smoothed-count products stay exact in a double up to 2^53 ≈ 9e15
    * gram tokens per side (~36 PB of ASCII text at 4 B/gram) — beyond
    * that the products round before the ln, shifting λ by < 1 ulp of
    * the ratio. Normalizers are cross-multiplied so both operands of
    * the one division are EXACT integers: (tc+1)/(tTot+B) ÷
    * (rc+1)/(rTot+B) = (tc+1)(rTot+B) / (rc+1)(tTot+B). `floor(x+0.5)`
    * on both engines: `math.round` and SQL `round` disagree on
    * negative halves. */
  private[graft] def milliLogRatioLambda(grammed: DataFrame): Array[Long] = {
    val B = DsirBuckets
    val counts = grammed.select(col("tgt"), explode(col("grams")).as("g"))
      .groupBy(dsirBucket(col("g")).as("b"))
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("tc"),
        sum(when(!col("tgt"), 1L).otherwise(0L)).as("rc"))
      .collect()
    val tc = Array.fill(B)(0L); val rc = Array.fill(B)(0L)
    counts.foreach { r =>
      val b = r.getLong(0).toInt; tc(b) = r.getLong(1); rc(b) = r.getLong(2)
    }
    val tTot = tc.sum; val rTot = rc.sum
    Array.tabulate(B) { b =>
      val x = 1000.0 * math.log(
        ((tc(b) + 1L) * (rTot + B)).toDouble / ((rc(b) + 1L) * (tTot + B)).toDouble)
      math.floor(x + 0.5).toLong
    }
  }

  // The scan-local DSIR weight of a `grams` array under a λ literal —
  // one definition for the exact select, the frozen-model fit, and
  // the frozen-model delta scorer.
  private def dsirWeightExpr(lams: Column): Column =
    aggregate(col("grams"), lit(0L),
      (acc, g) => acc + element_at(lams, (dsirBucket(g) + 1).cast("int")))

  /** Highest weight edge whose from-the-top cumulative count reaches
    * `k` over an integer [[DsirBuckets]]-bin histogram of
    * `wdoc("weight_milli")` ∈ [lo, hi] — shared by the exact top-k
    * select (as a prefix-superset bound) and the frozen-model fit
    * (as the calibrated keep threshold). Integer bin arithmetic —
    * no FP edge rounding. */
  private def weightEdge(wdoc: DataFrame, k: Long, lo: Long, hi: Long): Long = {
    val width = math.max(1L, (hi - lo) / DsirBuckets + 1L)
    val hist = wdoc.groupBy(((col("weight_milli") - lo) / width).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(-_._1)
    var cum = 0L; var edge = lo
    val it = hist.iterator
    while (cum < k && it.hasNext) {
      val (bin, cnt) = it.next(); cum += cnt; edge = lo + bin * width
    }
    edge
  }

  def corpusDsirSelectDocs(candidates: DataFrame, targets: DataFrame,
                           keepFrac: Double): DataFrame = {
    // words projected FIRST so the regexp runs once per row — grams
    // reference the materialized array attribute, not the regexp tree
    val grammed = candidates.select(col("doc_id"), lit(false).as("tgt"),
        dsirWords(col("text")).as("ws"))
      .unionByName(targets.select(col("doc_id"), lit(true).as("tgt"),
        dsirWords(col("text")).as("ws")))
      .select(col("doc_id"), col("tgt"), dsirGrams(col("ws")).as("grams"))
    val lam = milliLogRatioLambda(grammed)
    // pass 2: scan-local weights, persisted as the 16 B/doc projection
    val wdoc = grammed.filter(!col("tgt")).filter(size(col("grams")) > 0)
      .select(col("doc_id"), dsirWeightExpr(typedLit(lam.toSeq)).as("weight_milli"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one job materializes the persist AND returns count+min+max
    val stats = wdoc.agg(count(lit(1)), min("weight_milli"), max("weight_milli")).head()
    val n = stats.getLong(0)
    val k = math.ceil(n * keepFrac).toLong
    if (k <= 0L || n == 0L) return wdoc.limit(0)
      .withColumn("sel_rank", lit(0L)).filter(lit(false))
    // step 4: integer histogram → prefix-superset edge → small sort
    val edge = weightEdge(wdoc, k, stats.getLong(1), stats.getLong(2))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight_milli").desc, col("doc_id"))
    wdoc.filter(col("weight_milli") >= edge)
      .withColumn("sel_rank", row_number().over(w).cast("long"))
      .filter(col("sel_rank") <= k)
      .select(col("doc_id"), col("weight_milli"), col("sel_rank"))
  }

  /** Score `(doc_id, text)` docs under a FROZEN λ table: the
    * delta-scoring half of the frozen-model select. A pure per-doc
    * function of (text, λ) — no corpus statistics touched — which is
    * exactly what makes the incremental select batch-composable and
    * replay-idempotent. Gramless docs are excluded (no evidence),
    * as in the exact form. */
  private[graft] def dsirScoreDocs(docs: DataFrame, lam: Array[Long]): DataFrame = {
    require(lam.length == DsirBuckets,
      s"dsir lambda table must have $DsirBuckets buckets: ${lam.length}")
    docs.select(col("doc_id"), dsirWords(col("text")).as("ws"))
      .select(col("doc_id"), dsirGrams(col("ws")).as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), dsirWeightExpr(typedLit(lam.toSeq)).as("weight_milli"))
  }

  /** Fit-and-FREEZE: the [[graft.similarity.PqIndex.build]] discipline applied to
    * selection. λ is fit once from (seed pool, targets) and the keep
    * THRESHOLD is calibrated on the seed so it keeps ≈ `keepFrac`
    * (the same histogram edge the exact select uses as its pruning
    * bound — realized keep can exceed keepFrac by at most one bin's
    * mass). Returns (λ, threshold). Decisions thereafter are
    * `weight ≥ threshold` — per-doc, order-free — so corpus deltas
    * score under the frozen model exactly like corpus deltas encode
    * under frozen quantizers; domain drift is an explicit re-fit
    * (a new seed run), never a silent per-batch model.
    *
    * Also returns the seed's OWN kept doc_ids (checkpointed before
    * the scored projection is released): the fit already paid the
    * words→grams→weights scan over every seed doc, so the caller's
    * seed-batch decision must not re-scan the text to recompute the
    * identical weights. */
  private[graft] def dsirFitModel(candidates: DataFrame, targets: DataFrame,
                                  keepFrac: Double): (Array[Long], Long, DataFrame) = {
    val grammed = candidates.select(col("doc_id"), lit(false).as("tgt"),
        dsirWords(col("text")).as("ws"))
      .unionByName(targets.select(col("doc_id"), lit(true).as("tgt"),
        dsirWords(col("text")).as("ws")))
      .select(col("doc_id"), col("tgt"), dsirGrams(col("ws")).as("grams"))
    val lam = milliLogRatioLambda(grammed)
    val wdoc = grammed.filter(!col("tgt")).filter(size(col("grams")) > 0)
      .select(col("doc_id"), dsirWeightExpr(typedLit(lam.toSeq)).as("weight_milli"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = wdoc.agg(count(lit(1)), min("weight_milli"), max("weight_milli")).head()
      val n = stats.getLong(0)
      val k = math.ceil(n * keepFrac).toLong
      // an empty/gramless seed can calibrate nothing: fail loudly —
      // a silent Long.MinValue threshold would keep everything forever
      require(n > 0L && k > 0L,
        s"dsir fit: seed pool has no grammed docs to calibrate a threshold on (n=$n)")
      val edge = weightEdge(wdoc, k, stats.getLong(1), stats.getLong(2))
      val kept = wdoc.filter(col("weight_milli") >= edge)
        .select("doc_id").localCheckpoint()
      // the calibrated threshold over-keeps by at most "one bin's
      // mass" — which is UNBOUNDED when the seed's weights collapse
      // into one histogram bin (near-uniform weight_milli): the edge
      // equals the minimum and the frozen model keeps ~everything
      // forever, regardless of keepFrac. The exact select caps at k
      // via row_number; the frozen form cannot (a per-doc threshold
      // is the point), so a degenerate calibration must be VISIBLE at
      // seed time, not discovered as inflated keep rates batches later.
      val keptN = kept.count()
      if (keptN > 2 * k)
        System.err.println(f"[graft] dsir fit: DEGENERATE calibration — " +
          f"threshold $edge keeps $keptN of $n seed docs " +
          f"(${keptN.toDouble / n}%.2f realized vs $keepFrac%.2f requested); " +
          "the seed weight distribution is too flat to calibrate a " +
          "threshold on (one histogram bin holds the whole keep edge) — " +
          "every later batch will over-keep at the same rate")
      (lam, edge, kept)
    } finally wdoc.unpersist()
  }

  /** Per-bucket pack-id stride (2^40): pack_id = bucket·stride +
    * bucket-local pack index. The old 10^6 stride collided once a
    * bucket exceeded a million packs (~0.5 G tokens/bucket at the
    * 512 default — a ~32 GB corpus, far below target scale); 2^40
    * packs/bucket is ~5·10^14 tokens per bucket before collision,
    * while bucket·2^40 stays well inside a long for any sane bucket
    * count. Exact BIGINT in DuckDB, so the oracle mirrors verbatim. */
  private[graft] val PackBucketStride = 1099511627776L

  /** Bucket-local pack ids at or above this offset (2^39 — half the
    * stride space) are OVERSIZED-doc packs: a doc longer than the
    * budget gets a pack of its own and never co-mingles with normal
    * docs (nor advances their cumulative count — removing an
    * oversized doc can't re-shuffle its neighbors' packs). Normal
    * packs stay below the offset until a bucket holds ~2^39·budget
    * ≈ 2.8·10^14 tokens — far past any per-bucket mass the
    * [[suggestPackBuckets]] layout allows. */
  private[graft] val PackOversizedOffset = 549755813888L

  /** Pack-window bucket guideline — [[TextIndex.suggestTermParts]]'s
    * rule applied to the pack layout: the window sorts each bucket in
    * ONE task, so bucket count is the pack stage's parallelism AND its
    * per-task volume knob. ~1M tokens per bucket (a few MB of ids per
    * task), floor 16 (the legacy spec-scale default), cap 4096 (the
    * explicit-override point — a 25T-token corpus that wants more
    * passes `buckets=` itself). The suggestion consumes PRE-token
    * mass: for [[packTokens]] the true id mass is ≥ pre-tokens (each
    * pre-token yields ≥ 1 id) by at most the merge-depth factor
    * (~2-4× on natural text), so the per-bucket id volume stays
    * single-task-sized — this is a layout guideline, not an exact
    * count, and it avoids paying a second full BPE encode just to
    * size the layout. */
  def suggestPackBuckets(totalPreTokens: Long,
                         tokensPerBucket: Long = 1L << 20): Int =
    math.max(16L, math.min(
      math.ceil(totalPreTokens.toDouble / tokensPerBucket).toLong, 4096L)).toInt

  /** `buckets` = 0 ⇒ size the pack window from the corpus's pre-token
    * mass; explicit values win — the gate pins spec-scale literals so
    * its oracle's `% 16` stays exact. For [[packTokens]] the mass
    * aggregate is one EXTRA pre-tokenize scan of the text in auto
    * mode — a deliberate trade: persisting the corpus text (or the
    * encoded ids) to avoid it costs more than the re-scan at target
    * scale, and the pipeline pack stage's input is already
    * stage-persisted, so there the scan reads cache. [[packSequences]]
    * avoids the double tokenize entirely (it aggregates the
    * materialized n_tokens projection it packs from). */
  private[graft] def resolvePackBuckets(docs: DataFrame, buckets: Int): Int =
    if (buckets > 0) buckets
    else suggestPackBuckets(
      docs.agg(coalesce(sum(size(bpeTokens(col("text"))).cast("long")), lit(0L)))
        .head().getLong(0))

  // The shared pack-assignment columns over a (doc_id, n_tokens,
  // bucket, ...) frame: oversized docs (n_tokens > budget) are
  // EXCLUDED from the normal cumulative count and each takes a
  // bucket-local pack of its own above PackOversizedOffset; normal
  // docs pack by cumulative token count as before. One window
  // partitioning serves both running sums and the caller's
  // row_number.
  private def withPackId(toks: DataFrame, budget: Int): DataFrame = {
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    toks
      .withColumn("tokens_before",
        coalesce(sum(when(col("n_tokens") > lit(budget), lit(0L))
          .otherwise(col("n_tokens"))).over(wcum), lit(0L)))
      .withColumn("over_before",
        coalesce(sum(when(col("n_tokens") > lit(budget), lit(1L))
          .otherwise(lit(0L))).over(wcum), lit(0L)))
      .withColumn("pack_id",
        col("bucket").cast("long") * PackBucketStride +
          when(col("n_tokens") > lit(budget),
            lit(PackOversizedOffset) + col("over_before"))
          .otherwise(floor(col("tokens_before") / lit(budget))))
      .drop("tokens_before", "over_before")
  }

  /** The MATERIALIZED end of the tokenizer loop: [[packSequences]]'s
    * assignment executed over TRAINED-BPE token ids, one row per pack
    * with the concatenated id array — the tensor-shaped artifact a
    * training job memory-maps. Plan: encode is scan-local
    * (codegen [[graft.functions.expr.BpeEncodeIds]], model + vocab on the reference
    * array), the pack window rides the same hash-bucket partitioning
    * as [[packSequences]], and the ONE exchange of token ids (4 B
    * each) is the groupBy(pack) that assembles packs — the final
    * materialization, so the ids shuffle here and nowhere else
    * (the writeShards argument). Within-pack order is pinned by the
    * window's row_number, so re-runs are byte-identical. Docs whose
    * id count exceeds `budget` take a pack of their OWN (full ids,
    * honest n_tokens — see [[PackOversizedOffset]]); they never
    * co-mingle with normal docs. */
  def packTokens(docs: DataFrame, merges: Array[(String, String)],
                 vocab: Array[String], budget: Int = 512,
                 buckets: Int = 0): DataFrame = {
    val b = resolvePackBuckets(docs, buckets)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("doc_id"))
    withPackId(
      docs.select(col("doc_id"),
          graft.functions.Bpe.bpeEncodeIds(col("text"), merges, vocab).as("ids"),
          pmod(col("doc_id"), lit(b)).as("bucket"))
        .withColumn("n_tokens", size(col("ids")).cast("long")),
      budget)
      .withColumn("pos", row_number().over(w))
      .groupBy(col("pack_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("doc_id"), col("ids"))))
        .as("items"))
      .select(col("pack_id"),
        transform(col("items"), x => x.getField("doc_id")).as("doc_ids"),
        flatten(transform(col("items"), x => x.getField("ids"))).as("token_ids"))
      .withColumn("n_docs", size(col("doc_ids")).cast("long"))
      .withColumn("n_tokens", size(col("token_ids")).cast("long"))
  }

  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences. Docs are hash-bucketed (packs are independent, so
    * packing runs per-bucket in parallel — the window never sees more
    * than one bucket), ordered deterministically, and placed by
    * cumulative token count: pack = floor(tokens-before-this-doc /
    * budget). This is the shuffle-cheap streaming approximation of
    * first-fit (a doc straddling a boundary overflows its pack by at
    * most itself — the standard trade; exact bin packing needs a
    * sequential scan). Oversized docs each take a pack of their own
    * ([[PackOversizedOffset]]) and never advance the normal cumsum. */
  def packSequences(spark: SparkSession, dir: String,
                    budget: Int = 512, buckets: Int = 0): DataFrame =
    packSequencesDocs(Tables.load(spark, dir, "documents"), budget, buckets)

  /** [[packSequences]] over any `(doc_id, text)` frame — the
    * CLI/spec form. */
  private[graft] def packSequencesDocs(docs: DataFrame, budget: Int,
                                       buckets: Int): DataFrame = {
    val toks0 = docs.select(col("doc_id"),
      size(bpeTokens(col("text"))).cast("long").as("n_tokens"))
    def assign(toks: DataFrame, b: Int): DataFrame =
      withPackId(toks.withColumn("bucket", pmod(col("doc_id"), lit(b))), budget)
        .select(col("doc_id"), col("bucket"), col("n_tokens"), col("pack_id"))
    if (buckets > 0) assign(toks0, buckets)
    else {
      // auto layout: the mass aggregate and the assignment both
      // consume the tokenize — materialize the ~16 B/doc projection
      // once (eager localCheckpoint) instead of re-tokenizing the
      // corpus text for the aggregate, and RELEASE it before
      // returning: the final ~32 B/doc assignment is checkpointed
      // eagerly, so the intermediate's blocks are not left to the
      // context cleaner (the rule the mix stage pins)
      val t = toks0.localCheckpoint()
      try {
        val b = suggestPackBuckets(
          t.agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0))
        assign(t, b).localCheckpoint()
      } finally t.unpersist()
    }
  }

  /** Token budget for [[corpusMix]] — at sf0.01 (≈27k BPE tokens,
    * en holding ~43%) an equal 5-way split clamps some languages'
    * keep rate at 1.0 and downsamples the rest, so the gate exercises
    * both branches. */
  val MixBudgetTokens = 20000L
  /** Residue range of the deterministic sampling hash — public so
    * callers (the CLI) can express fractions in residue points. */
  val MixHashMod = 1048576L // 2^20
  private val MixHashMul = 2654435761L // Knuth multiplicative constant

  /** Domain-mix rebalancing — the data-mixing pass every pre-training
    * corpus gets (uniform target shares here; DoReMi-style learned
    * weights are the same plan with a different literal per domain):
    * give each language an equal slice of `MixBudgetTokens` and
    * deterministically downsample over-supplied languages to their
    * slice, keeping under-supplied ones whole (keep rate clamps at 1).
    *
    * The keep decision is a pure function of the row key (multiply-
    * shift residue — `pmod` first so the product can't overflow at any
    * id scale; a production corpus would use xxhash64, which has no
    * cross-engine oracle twin), so the sample is reproducible across
    * runs and cluster sizes and the filter evaluates inside the scan.
    * Per-language token supply is one small aggregate broadcast back —
    * the corpus itself is scanned once and never shuffled. */
  def corpusMix(spark: SparkSession, dir: String): DataFrame =
    corpusMixDocs(Tables.load(spark, dir, "documents"), MixBudgetTokens)

  /** [[corpusMix]] over any `(doc_id, lang, text)` frame with a caller
    * budget — the CLI/scheduler form (`Main corpus-mix`). */
  def corpusMixDocs(docs: DataFrame, budgetTokens: Long): DataFrame =
    corpusMixFromToked(tokenizeDocs(docs), budgetTokens)

  /** The token-count projection both the supply pass and the keep
    * filter consume — ~24 B/doc vs the corpus's text bytes. Decision
    * passes that need the supply FIRST (mix, budget selection) should
    * compute over a MATERIALIZED copy of this (spillable persist):
    * tokenizing 100 TB twice costs more than holding ~2.4 GB/executor
    * of counts, and locally the sf10 CLI measured the same 1.6×
    * (Main does exactly that; the gate queries keep the pure two-scan
    * plan their oracle pins). */
  private[graft] def tokenizeDocs(docs: DataFrame): DataFrame =
    // r15: scan fanout (guide §2.5); no-op on parallel inputs
    graft.sources.PlanUtils.fanoutBy(docs, col("doc_id"))
      .select(col("doc_id"), col("lang"),
        size(bpeTokens(col("text"))).cast("long").as("n_tokens"))

  /** Trained-BPE pricing for the mixing/budget machinery — identical
    * projection to [[tokenizeDocs]] but `n_tokens` counts tokens
    * under the frozen builtin BPE model (the `text_bpe_tokens`
    * codegen scan), not pre-tokens. The fertility table's own
    * rationale ([[TextQueries.bpeFertility]]): what a training run
    * budgets is MODEL-VISIBLE tokens, and a high-fertility language
    * burns more of them per pre-token — pre-token pricing
    * systematically over-buys exactly those languages. Same
    * supply/threshold machinery downstream; the choice of pricing is
    * the `tokens=` knob on the CLI (`corpus-mix`/`select-budget`/the
    * DAG mix stage). */
  private[graft] def tokenizeDocsBpe(docs: DataFrame): DataFrame =
    // r15: fanoutBy — trained-BPE encode is the most expensive per-row
    // expression in the repo; never run it in a serial scan (guide §2.5)
    graft.sources.PlanUtils.fanoutBy(docs, col("doc_id"))
      .select(col("doc_id"), col("lang"),
        size(graft.functions.Bpe.bpeEncode(col("text"), graft.functions.Bpe.builtin))
          .cast("long").as("n_tokens"))

  /** [[scoreDocs]] priced in trained-BPE tokens — the `tokens=bpe`
    * select-budget form (quality unchanged; only the budget
    * denomination moves). */
  private[graft] def scoreDocsBpe(docs: DataFrame): DataFrame =
    // r15: same scan fanout as scoreDocs/tokenizeDocsBpe (guide §2.5)
    graft.sources.PlanUtils.fanoutBy(docs, col("doc_id"))
      .select(col("doc_id"), col("lang"),
        size(graft.functions.Bpe.bpeEncode(col("text"), graft.functions.Bpe.builtin))
          .cast("long").as("n_tokens"),
        qualityScore(col("text")).as("quality"))

  /** [[corpusMix]] denominated in trained-BPE tokens — the gate form
    * of `tokens=bpe` (same equal-share budget, same residue filter;
    * only the per-doc price changes). Oracle: the corpus_mix SQL with
    * its pre-token count replaced by the bpe merge-loop replay CTE
    * (single-sourced with text_bpe_tokens, so the two cannot drift). */
  def corpusMixBpe(spark: SparkSession, dir: String): DataFrame =
    corpusMixFromToked(tokenizeDocsBpe(Tables.load(spark, dir, "documents")),
      MixBudgetTokens)

  private[graft] def corpusMixFromToked(toked: DataFrame,
                                        budgetTokens: Long): DataFrame = {
    // null-lang docs are KEPT WHOLE, not downsampled: no language
    // share applies to them, so they neither take a slice (excluded
    // from supply and the lang count) nor get destroyed (left join,
    // absent threshold coalesces to keep-all) — the same contract as
    // the frozen-share incremental mix's unlisted-language rule, so
    // the one-shot and CDC forms agree on every input
    val supply = toked.filter(col("lang").isNotNull)
      .groupBy("lang").agg(sum("n_tokens").as("lang_tokens"))
    val nLangs = supply.agg(count(lit(1)).as("n_langs"))
    val keepRate = least(lit(1.0),
      lit(budgetTokens.toDouble) / col("n_langs") / col("lang_tokens"))
    toked
      .join(broadcast(supply), Seq("lang"), "left")
      .crossJoin(broadcast(nLangs))
      .filter(
        pmod(pmod(col("doc_id"), lit(MixHashMod)) * lit(MixHashMul), lit(MixHashMod)) <
          coalesce(floor(keepRate * lit(MixHashMod.toDouble)).cast("long"),
            lit(MixHashMod)))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
  }

  /** Sampling temperature of the gate's [[corpusMixTemperature]] form:
    * α = 0.5 — the multilingual-LM convention's interpolation point
    * between proportional (α=1, big languages keep their dominance)
    * and uniform (α=0, [[corpusMix]]'s equal shares). 0.5 is also the
    * one non-trivial α whose weight function (√t) is CORRECTLY
    * ROUNDED per IEEE-754 in every engine — `pow` is libm-dependent
    * to the last ulp, and a 1-ulp drift can flip a floor'd keep
    * threshold, so only the sqrt path is oracle-checked (arbitrary α
    * works through the same API, spec-checked instead). */
  val MixAlpha = 0.5

  /** Temperature-weighted language mixing (the mBERT/XLM-R sampling
    * scheme, public): language `l` gets budget share ∝ t_l^α of
    * [[MixBudgetTokens]] instead of [[corpusMix]]'s equal slice —
    * α up-weights tail languages without flattening the head. */
  def corpusMixTemperature(spark: SparkSession, dir: String): DataFrame =
    corpusMixTemperatureDocs(Tables.load(spark, dir, "documents"),
      MixBudgetTokens, MixAlpha)

  /** [[corpusMixTemperature]] over any `(doc_id, lang, text)` frame.
    *
    * Shape: one supply aggregation (langs × 16 B — bounded by the
    * world's language count, collected), per-language keep thresholds
    * derived ON THE DRIVER with a lang-ORDERED left fold for Σ t^α —
    * a distributed float sum has engine- and partition-dependent
    * order, and the threshold floors the rate into a 2^20 residue
    * where a last-ulp drift flips documents; the ordered fold is the
    * arithmetic the DuckDB oracle replays (list_reduce over a
    * lang-sorted list). The keep filter itself is the same
    * scan-level multiply-shift residue as [[corpusMix]]: no second
    * shuffle, threshold rides a broadcast join. */
  def corpusMixTemperatureDocs(docs: DataFrame, budgetTokens: Long,
                               alpha: Double): DataFrame =
    // persist spans BOTH consumers of the tokenize — the collected
    // supply aggregate (which materializes the cache) and the final
    // keep-filter scan; without it the full BPE tokenize runs twice,
    // contradicting the one-aggregation-plus-one-scan cost model.
    // No explicit unpersist: the result frame still reads the cached
    // plan, so release is the context cleaner's job once the caller
    // drops the frame (long-lived batch drivers doing MANY mixes
    // should use the CLI pattern: tokenize, persist, mix, write,
    // unpersist — Main.runPipeline does exactly that).
    corpusMixTemperatureFromToked(
      tokenizeDocs(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      budgetTokens, alpha)

  private[graft] def corpusMixTemperatureFromToked(toked: DataFrame,
      budgetTokens: Long, alpha: Double): DataFrame = {
    val spark = toked.sparkSession
    import spark.implicits._
    // non-null langs only: the kept-whole rule for null-lang docs
    // (see corpusMixFromToked) — also what keeps the driver fold's
    // String sort total (a null key has no ordering)
    val supply = toked.filter(col("lang").isNotNull)
      .groupBy("lang").agg(sum("n_tokens").as("lang_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    mixApplyKeepPoints(toked,
      mixKeepPoints(supply, budgetTokens, alpha).toDF("lang", "keep_points"))
  }

  /** Per-language keep thresholds (residue points of [[MixHashMod]])
    * from a `(lang, lang_tokens)` supply — the lang-ORDERED driver
    * fold [[corpusMixTemperatureDocs]] documents, factored out so the
    * one-shot mix and the frozen-share incremental mix (which FREEZES
    * exactly this table under state/mix) cannot drift. */
  private[graft] def mixKeepPoints(supply: Seq[(String, Long)],
                                   budgetTokens: Long, alpha: Double): Seq[(String, Long)] = {
    // a null key has no String ordering (the sort below would NPE)
    // and no budget share (null-lang docs are kept whole by the left
    // join downstream, never thresholded) — drop it here so legacy
    // supply evidence that predates the caller-side filter (mix-refit
    // sums per-batch parquet that may carry a null row) cannot crash
    // or dilute the labeled languages' shares
    val sorted = supply.filter(_._1 != null).sortBy(_._1)
    def w(t: Long): Double =
      if (alpha == 0.5) math.sqrt(t.toDouble) else math.pow(t.toDouble, alpha)
    val sumW = sorted.foldLeft(0.0) { case (a, (_, t)) => a + w(t) }
    sorted.map { case (l, t) =>
      // t == 0 ⇒ keep-all, explicitly: w(0)/sumW/0 is NaN for α > 0 and
      // floor(NaN·mod) = 0 would silently DROP the language's docs —
      // the opposite of corpusMix, whose Inf rate clamps to keep-all.
      // A zero-token language has nothing to downsample; keep rate 1
      // (also covers the all-languages-empty corpus, where sumW = 0).
      val rate = if (t == 0L) 1.0
        else math.min(1.0, budgetTokens.toDouble * w(t) / sumW / t)
      (l, math.floor(rate * MixHashMod.toDouble).toLong)
    }
  }

  /** The scan-level residue keep filter both mix forms apply: join
    * the (broadcast) `(lang, keep_points)` table, keep docs whose
    * multiply-shift residue falls under the language's threshold.
    *
    * LEFT join + keep-all for absent languages — ONE semantics for
    * every mix form: a language the threshold table doesn't list
    * (null lang anywhere; a language the frozen seed never saw on
    * the incremental path) is never silently destroyed, it is kept
    * whole and the caller warns / the keep-rate drift signal
    * surfaces it. The DuckDB oracles replay the same plan
    * (`LEFT JOIN ... USING (lang)` + `coalesce(keep_points, mod)`),
    * so the join kinds cannot drift. */
  private[graft] def mixApplyKeepPoints(toked: DataFrame,
                                        keepPoints: DataFrame): DataFrame = {
    toked.join(broadcast(keepPoints), Seq("lang"), "left")
      .filter(
        pmod(pmod(col("doc_id"), lit(MixHashMod)) * lit(MixHashMul), lit(MixHashMod)) <
          coalesce(col("keep_points"), lit(MixHashMod)))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
  }

  /** Held-out fractions for [[corpusSplit]], in residue points of
    * [[MixHashMod]]: val gets 2%, test gets 2%, train the rest. */
  val SplitValPoints = MixHashMod / 50
  val SplitTestPoints = MixHashMod / 50

  /** Deterministic train/val/test assignment — the split every
    * training corpus needs before anything else consumes it. The
    * assignment is a pure multiply-shift function of `doc_id` (same
    * residue family as [[corpusMix]], different use: interval
    * membership instead of a supply-scaled threshold), so it is
    * reproducible across runs, engines, and cluster sizes, evaluates
    * inside the scan (no shuffle, no supply pass — fractions are
    * fixed, not data-dependent), and is STABLE UNDER CORPUS GROWTH: a
    * document keeps its split forever because the hash ignores every
    * other row, which is what keeps eval sets from leaking into train
    * as the corpus accretes. Language is carried through so split
    * balance per language is checkable downstream (the hash is
    * id-uniform, so each language splits ≈2/2/96 on its own). */
  def corpusSplit(spark: SparkSession, dir: String): DataFrame =
    corpusSplitDocs(Tables.load(spark, dir, "documents"),
      SplitValPoints, SplitTestPoints)

  /** [[corpusSplit]] over any `(doc_id, lang)` frame with caller
    * fractions (in residue points of [[MixHashMod]]) — the
    * CLI/scheduler form (`Main corpus-split`). */
  def corpusSplitDocs(docs: DataFrame,
                      valPoints: Long, testPoints: Long): DataFrame = {
    require(valPoints >= 0 && testPoints >= 0 &&
      valPoints + testPoints <= MixHashMod,
      s"val+test fractions exceed the residue range: $valPoints + $testPoints")
    val r = pmod(pmod(col("doc_id"), lit(MixHashMod)) * lit(MixHashMul), lit(MixHashMod))
    docs
      .select(col("doc_id"), col("lang"),
        when(r < lit(valPoints), "val")
          .when(r < lit(valPoints + testPoints), "test")
          .otherwise("train").as("split"))
  }

  /** Default shard count for [[corpusShard]] — gate-scale; the CLI
    * takes the real count (see the sizing note on [[shardDocs]]). */
  val ShardDefault = 16

  /** Deterministic training-shard assignment with a GLOBAL
    * pseudo-shuffle — the output step after selection/packing: a
    * training run wants its input decorrelated from source order
    * (crawl adjacency, per-domain runs, time locality), reproducible
    * across engines and cluster sizes, and stable under re-runs.
    * `rand()` gives none of that; this is a pure function of the row
    * key, like [[corpusSplit]]. */
  def corpusShard(spark: SparkSession, dir: String): DataFrame =
    shardDocs(Tables.load(spark, dir, "documents"), ShardDefault)

  /** [[corpusShard]] over any `(doc_id, ...)` frame — the CLI form
    * (`Main corpus-shard`). Shard and within-shard order are two
    * independent affine residues mod the Mersenne prime 2^31−1
    * (different multipliers; products < 2^62, so the arithmetic is
    * exact in both engines — the [[MixHashMod]] 2^20 residue the
    * split uses is too coarse for an ORDER key: at 1e11 docs a 2^20
    * range leaves ~1e5-doc tie runs that fall back to doc_id order,
    * which is exactly the correlation a shuffle must break; the
    * 2^31 range cuts ties to ~47 docs). shard_pos is a per-shard
    * row_number over (order residue, doc_id).
    *
    * Scale: the window partitions by shard, so each shard sorts
    * independently — size `shards` so one shard is one output file's
    * worth (e.g. corpus tokens / 4e9 ≈ one 8 GB shard each): at
    * 1e11 docs and 25k shards each task sorts 4M 16-byte rows, and
    * the only corpus-sized exchange is the one hash partition by
    * shard that the write needs anyway. */
  def shardDocs(docs: DataFrame, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    docs.select(col("doc_id"),
        pmod(shardMixCol(1103515245L, 12345L), lit(shards.toLong)).as("shard"),
        shardMixCol(1140671485L, 12820163L).as("ord"))
      .withColumn("shard_pos", row_number().over(shardWindow).cast("long"))
      .select(col("doc_id"), col("shard"), col("shard_pos"))
  }

  // the two affine residues shared by shardDocs and writeShards — one
  // definition so assignment and physical layout can never disagree
  private val ShardP = 2147483647L
  private def shardMixCol(a: Long, b: Long): Column =
    pmod(pmod(col("doc_id"), lit(ShardP)) * lit(a) + lit(b), lit(ShardP))
  private def shardWindow =
    org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("ord"), col("doc_id"))

  /** The physical OUTPUT step [[shardDocs]] stops short of: write the
    * sharded corpus as one parquet file per shard, rows in shard_pos
    * order — the on-disk layout a training job streams directly
    * (read shard k, rows arrive pre-shuffled). Plan: ONE corpus-sized
    * exchange (hash partition by shard — `shards` partitions, so each
    * shard occupies exactly one task and therefore one file under
    * `partitionBy`), a per-partition sort on (shard, ord, doc_id), and
    * the shard_pos window rides the SAME partitioning and ordering —
    * no second exchange, no extra sort. Deterministic end-to-end:
    * re-running writes the same rows in the same order to the same
    * `shard=` directories. ALL input columns ride along (text
    * included) — this is the final materialization, so the text
    * shuffles here and nowhere else. */
  def writeShards(docs: DataFrame, shards: Int, out: String): Unit = {
    require(shards > 0, s"shards must be positive: $shards")
    docs
      .withColumn("shard", pmod(shardMixCol(1103515245L, 12345L), lit(shards.toLong)))
      .withColumn("ord", shardMixCol(1140671485L, 12820163L))
      .repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"), col("doc_id"))
      .withColumn("shard_pos", row_number().over(shardWindow).cast("long"))
      .drop("ord")
      .write.mode("overwrite").partitionBy("shard").parquet(out)
  }

  /** Span width of the repeated-passage scrub: long enough that a
    * shared 20-word span is template text and not coincidence (the
    * boilerplate detector's 5-gram threshold flags CANDIDATE grams;
    * removal wants a stricter unit), short enough that real
    * boilerplate (headers, license blocks, nav bars) spans ≥ 1 chunk. */
  val ScrubChunkWords = 20

  /** A chunk present in ≥ this many DISTINCT documents is template
    * text (same floor as textBoilerplate's gram threshold). */
  val ScrubMinDocs = 3

  /** Driver-collect bound on the hot-span table (32 MB of longs at the
    * cap). Boilerplate is low-cardinality by nature — a span must
    * repeat across ≥ [[ScrubMinDocs]] docs to qualify, so the table is
    * O(distinct templates), not O(corpus); crossing the cap means the
    * corpus/width/threshold combination is degenerate (e.g. w=1 on a
    * natural-language corpus) and the scrub fails loudly rather than
    * silently truncating the removal set. */
  val ScrubMaxSpans = 4 << 20

  private[graft] val ScrubSeed = 11L // distinct from simhash 1,3 / dsir 7
  private[graft] val ScrubP = 2147483647L
  // second INDEPENDENT fold for the packed span key: the modulus must
  // differ, not just the seed — two same-length strings colliding
  // under (seed, p) collide under EVERY seed with the same base and
  // p (the seed term seed·31^n cancels in the difference), so a
  // seed-only second hash verifies nothing. 2147483629 is the next
  // prime below 2^31; the packed key h1·2^31 + h2 stays < 2^62
  // (exact BIGINT both engines).
  private[graft] val ScrubSeed2 = 13L
  private[graft] val ScrubP2 = 2147483629L

  /** Cross-document repeated-span scrub (C4/RefinedWeb-style
    * boilerplate REMOVAL — the scrubbing pass the detection-only
    * `text_boilerplate` feeds): rebuild every document with the
    * [[ScrubChunkWords]]-word aligned chunks that appear verbatim in
    * ≥ [[ScrubMinDocs]] distinct documents removed.
    * Reference behavior: tag_computer.py-era pipelines drop whole
    * duplicate docs; span scrub is the finer-grained op a training
    * corpus needs (duplicated nav/footer text inside otherwise-unique
    * pages). */
  def corpusScrub(spark: SparkSession, dir: String): DataFrame =
    scrubDocs(Tables.load(spark, dir, "documents"), ScrubChunkWords, ScrubMinDocs)

  /** [[corpusScrub]] over any `(doc_id, text)` frame. Two corpus
    * scans, document text never shuffles:
    *
    *  1. Frequency pass: explode per-doc chunk arrays ([[graft.functions.expr.WordChunks]],
    *     one compiled loop per row), hash each chunk into the PACKED
    *     62-bit span key h₁·2³¹ + h₂ — two independent Horner folds
    *     ([[graft.functions.expr.RollingHash]], seeds/moduli
    *     [[ScrubSeed]]/[[ScrubP]] and [[ScrubSeed2]]/[[ScrubP2]]; the
    *     arithmetic the DuckDB oracle replays exactly), count DISTINCT
    *     docs per key. A single 31-bit key was the r7 advisor's
    *     finding: at 100 TB (~1e13 chunks × up to 4M hot spans) the
    *     expected chunk↔hot collisions are ~n·|hot|/2³¹ ≈ thousands of
    *     legitimate spans silently deleted, and colliding chunks pool
    *     their doc counts across the threshold; at 2⁻⁶² the expectation
    *     is ~0.01 for the same corpus. Only FULL-WIDTH chunks enter
    *     the hot table: a tail chunk can be as short as one word, and
    *     "20 shared words = template text" says nothing about a shared
    *     1-word tail (common short tails and whole short docs are not
    *     boilerplate evidence). The only exchange carries
    *     (key, doc_id) 16-byte rows with map-side partial distinct;
    *     spans with df ≥ minDocs — the hot table — collect to the
    *     driver under [[ScrubMaxSpans]] (loud failure above it).
    *  2. Rebuild pass: scan-local [[graft.functions.expr.ScrubText]] — the sorted hot
    *     table rides the codegen reference array (the PQ-codebook /
    *     gram-bloom pattern), each chunk binary-searches it, and the
    *     document is rejoined from survivors in the same compiled
    *     loop. No join, no shuffle, no text exchange — at 100 TB the
    *     scrub costs two scans plus one broadcast of the template set.
    *
    * Alignment contract (also [[graft.functions.expr.ScrubUtil]]): only spans starting
    * on a w-word boundary in BOTH documents detect — the convention
    * line-based scrubbers inherit from '\n', transplanted to
    * width-w boundaries because the corpus has no line structure. */
  def scrubDocs(docs: DataFrame, chunkWords: Int, minDocs: Int,
                maxSpans: Int = ScrubMaxSpans): DataFrame =
    scrubWithSpans(docs, chunkWords,
      hotSpans(docs, chunkWords, minDocs, maxSpans))

  /** The frequency half of [[hotSpans]] as a FRAME: per packed 62-bit
    * span key, the number of DISTINCT docs carrying that full-width
    * chunk. This is also the ACCUMULABLE evidence of the incremental
    * scrub: each CDC batch persists its own `(h, df)` table, and
    * because a doc belongs to exactly one batch, summing `df` across
    * batch tables IS the union corpus's distinct-doc count — which is
    * what lets a later batch detect spans that crossed the hot
    * threshold only ACROSS batches (the frozen-model caveat, measured
    * instead of footnoted). ~16 B/span parquet rows, never collected
    * here. */
  private[graft] def spanFreq(docs: DataFrame, chunkWords: Int): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    docs.select(col("doc_id"),
        ofExpr(graft.functions.expr.WordChunks(toExpr(col("text")), chunkWords)).as("chunks"))
      .select(col("doc_id"), explode(col("chunks")).as("chunk"))
      // sub-width tail chunks never become hot (w words ⇒ w−1 spaces;
      // chunks are single-space rejoins so the count is exact)
      .filter(size(split(col("chunk"), " ", -1)) === chunkWords)
      .select(col("doc_id"),
        (ofExpr(graft.functions.expr.RollingHash(toExpr(col("chunk")), ScrubSeed, ScrubP))
          * lit(2147483648L) +
          ofExpr(graft.functions.expr.RollingHash(toExpr(col("chunk")), ScrubSeed2, ScrubP2)))
          .as("h"))
      .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("df"))
  }

  /** Threshold + collect of a [[spanFreq]] frame into the driver-side
    * hot table [[scrubWithSpans]] broadcasts. */
  private[graft] def hotSpansFromFreq(freq: DataFrame, minDocs: Int,
                                      maxSpans: Int = ScrubMaxSpans): Array[Long] = {
    val hot = freq.filter(col("df") >= minDocs)
      .select("h").limit(maxSpans + 1)
      .collect().map(_.getLong(0))
    require(hot.length <= maxSpans,
      s"hot-span table exceeds $maxSpans entries — the chunk width/" +
        "threshold combination is degenerate for this corpus; raise " +
        "maxSpans only if a multi-ten-MB broadcast is intended")
    java.util.Arrays.sort(hot)
    hot
  }

  /** Pass 1 of [[scrubDocs]] as its own artifact: the hot-span table
    * (sorted packed 62-bit keys of chunks shared by ≥ minDocs docs) —
    * also the FREEZABLE half of the incremental scrub: fit it once on
    * a seed corpus, persist the longs, scrub every later delta under
    * it with [[scrubWithSpans]]. */
  private[graft] def hotSpans(docs: DataFrame, chunkWords: Int, minDocs: Int,
                              maxSpans: Int = ScrubMaxSpans): Array[Long] =
    hotSpansFromFreq(spanFreq(docs, chunkWords), minDocs, maxSpans)

  /** Pass 2 of [[scrubDocs]]: scrub under a GIVEN span table (just-fit
    * or frozen). Defensively re-sorts — the binary search inside
    * [[graft.functions.expr.ScrubText]] requires it, and a frozen
    * table read back from parquet carries no order guarantee. */
  private[graft] def scrubWithSpans(docs: DataFrame, chunkWords: Int,
                                    spans: Array[Long]): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val hot = spans.clone()
    java.util.Arrays.sort(hot)
    docs.select(col("doc_id"),
        ofExpr(graft.functions.expr.ScrubText(toExpr(col("text")), chunkWords,
          ScrubSeed, ScrubP, ScrubSeed2, ScrubP2, hot)).as("s"))
      .select(col("doc_id"),
        col("s.text_scrubbed").as("text_scrubbed"),
        col("s.n_chunks").cast("long").as("n_chunks"),
        col("s.n_scrubbed").cast("long").as("n_scrubbed"))
  }

  /** Per-language token budget for [[corpusSelectBudget]] — sized so
    * sf0.01 exercises both branches (en/zh truncate, de/es/fr fit). */
  val SelectBudgetTokens = 4000L

  /** Quality-ranked budget selection — the other half of the mixing
    * story: [[corpusMix]] downsamples proportionally, this takes THE
    * BEST documents per language until each language's token budget is
    * spent (greedy by quality, doc_id tiebreak; the last kept doc may
    * straddle the budget — same bounded-overflow trade as
    * [[packSequences]]).
    *
    * Shape: one scoring pass, one per-language window (rank +
    * running token mass), a scan-level filter. At 100 TB the
    * per-language window is a sort of that language's partition —
    * with a skewed language mix the scale path is a sketch-quantile
    * quality THRESHOLD (the `value_quantiles_approx` machinery) to
    * pre-filter to ≈budget mass, then this exact window on the
    * survivors; the operator is the exact form the threshold path
    * must agree with. */
  /** The scored frame both select-budget forms run over — single
    * definition so the exact/pruned twins (and the spec) cannot
    * drift on tokenizer or quality formula. */
  private[graft] def selectBudgetScored(spark: SparkSession, dir: String): DataFrame =
    scoreDocs(Tables.load(spark, dir, "documents"))

  private[graft] def scoreDocs(docs: DataFrame): DataFrame =
    // r15: fanoutBy before the BPE + quality projection (guide §2.5 —
    // the serial single-row-group scan trap; no-op on parallel inputs).
    // Consumers that score twice (the pruned form's histogram + final
    // passes — the documented supply-first trade) get two PARALLEL
    // passes instead of two serial ones.
    graft.sources.PlanUtils.fanoutBy(docs, col("doc_id"))
      .select(col("doc_id"), col("lang"),
        size(bpeTokens(col("text"))).cast("long").as("n_tokens"),
        qualityScore(col("text")).as("quality"))

  def corpusSelectBudget(spark: SparkSession, dir: String): DataFrame =
    corpusSelectBudgetDocs(Tables.load(spark, dir, "documents"), SelectBudgetTokens)

  /** [[corpusSelectBudget]] over any `(doc_id, lang, text)` frame with
    * a caller budget — the CLI/scheduler form (`Main select-budget`). */
  def corpusSelectBudgetDocs(docs: DataFrame, budgetTokens: Long): DataFrame =
    selectBudgetFromScored(scoreDocs(docs), budgetTokens)

  /** The exact window over an already-scored `(doc_id, lang, n_tokens,
    * quality)` frame — callers that also run the histogram pass
    * (pruned form, CLI) score ONCE and share the frame. */
  private[graft] def selectBudgetFromScored(scored: DataFrame,
                                            budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
    scored
      .withColumn("sel_rank", row_number().over(w))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .filter(col("tokens_before") < budgetTokens)
      .select(col("doc_id"), col("lang"), col("sel_rank"), col("n_tokens"),
        col("tokens_before"), col("quality"))
  }

  /** Quality-bin count for [[corpusSelectBudgetPruned]]'s threshold
    * histogram. A power of two so `bin/Bins` is exact in floating
    * point: `floor(q*256) = B  ⟺  q >= B/256.0` holds bitwise, which
    * is what makes the pruned survivor set a provable prefix-superset
    * of the exact winners (no doc can fall on the wrong side of the
    * edge through rounding). */
  val SelectBudgetBins = 256

  /** The 100 TB form of [[corpusSelectBudget]] — IDENTICAL output,
    * pruned sort. A per-(language, quality-bin) token-mass histogram
    * (a |langs|×256-row aggregate, the only thing collected) picks the
    * highest bin edge at which cumulative from-the-top mass reaches
    * the budget; every document below that edge has preceding mass
    * ≥ budget and is provably dropped by the exact rule, so filtering
    * to `quality >= edge` BEFORE the window keeps a quality-prefix
    * superset of the winners — and a row_number/running-sum window
    * over a prefix-superset assigns the surviving rows the same ranks
    * and running masses as over the full partition. The expensive
    * per-language sort therefore runs over ≈budget token mass instead
    * of the whole language: with a 100:1 supply-to-budget skew that is
    * a 100× smaller sort, and the histogram pass is a scan-level
    * aggregate that never shuffles the corpus. Two tokenize passes
    * (histogram + final) is the same honest trade [[corpusMix]]
    * documents: the decision depends on the supply, so the supply
    * must be measured first.
    *
    * Shares [[corpusSelectBudget]]'s oracle verbatim — the gate pins
    * bit-identical output, not "approximately the same selection". */
  def corpusSelectBudgetPruned(spark: SparkSession, dir: String): DataFrame =
    corpusSelectBudgetPrunedDocs(
      Tables.load(spark, dir, "documents"), SelectBudgetTokens)

  /** [[corpusSelectBudgetPruned]] over any frame/budget — the scale
    * form the CLI uses by default (`Main select-budget pruned=true`). */
  def corpusSelectBudgetPrunedDocs(docs: DataFrame, budgetTokens: Long): DataFrame =
    selectBudgetPrunedFromScored(scoreDocs(docs), budgetTokens)

  /** Histogram-pruned selection over an already-scored frame. The
    * histogram collect is a SEPARATE ACTION from the final window, so
    * an unmaterialized `scored` is computed twice — the gate query
    * accepts that (two scans is the documented supply-first trade and
    * the oracle pins the plan), while the CLI persists the scored
    * projection first (sf10: 77 s → scoring once, see PLANS.md). */
  private[graft] def selectBudgetPrunedFromScored(scored: DataFrame,
                                                  budgetTokens: Long): DataFrame = {
    val edges = selectBudgetEdges(scored.sparkSession, scored, budgetTokens)
    // pass 2: the exact window, over survivors only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("quality").desc, col("doc_id"))
    scored
      .join(broadcast(edges), Seq("lang"))
      .filter(col("quality") >= col("qmin"))
      .withColumn("sel_rank", row_number().over(w))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .filter(col("tokens_before") < budgetTokens)
      .select(col("doc_id"), col("lang"), col("sel_rank"), col("n_tokens"),
        col("tokens_before"), col("quality"))
  }

  /** Pass 1 of the pruned selection: the per-language quality edge
    * from a bounded (|langs| × [[SelectBudgetBins]]-row) token-mass
    * histogram. Walking bins from the top, the edge is the lower
    * boundary of the bin at which cumulative mass first reaches the
    * budget; exhausting the bins first means the supply fits and the
    * language keeps everything (−∞ edge). Exposed for the spec, which
    * pins that `quality >= qmin` admits strictly fewer docs than the
    * over-supplied languages hold. */
  private[graft] def selectBudgetEdges(spark: SparkSession, scored: DataFrame,
                                       budgetTokens: Long = SelectBudgetTokens): DataFrame = {
    import spark.implicits._
    val bins = SelectBudgetBins
    scored
      .groupBy(col("lang"),
        least(floor(col("quality") * bins), lit(bins - 1)).cast("int").as("bin"))
      .agg(sum(col("n_tokens")).as("mass"))
      .collect()
      .groupBy(_.getString(0)).toSeq.map { case (lang, rows) =>
        val fromTop = rows.map(r => r.getInt(1) -> r.getLong(2)).sortBy(-_._1)
        var cum = 0L
        var edge = Double.NegativeInfinity
        val it = fromTop.iterator
        while (cum < budgetTokens && it.hasNext) {
          val (bin, mass) = it.next(); cum += mass; edge = bin.toDouble / bins
        }
        (lang, if (cum < budgetTokens) Double.NegativeInfinity else edge)
      }.toDF("lang", "qmin")
  }

  /** Per-language corpus report: doc counts, token budget, exact
    * order-independent mean quality (decimal-summed), and the median
    * document length — the dashboard numbers a data curator reads
    * before and after every cleaning run. One aggregation pass. */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    corpusStatsDocs(Tables.load(spark, dir, "documents"))

  /** [[corpusStats]] over any `(doc_id, lang, text[, n_chars])` frame
    * — the CLI/scheduler form (`Main corpus-stats`); n_chars derives
    * from the text when the warehouse didn't precompute it. */
  def corpusStatsDocs(docs0: DataFrame): DataFrame = {
    val docs = if (docs0.columns.contains("n_chars")) docs0
      else docs0.withColumn("n_chars", length(col("text")).cast("long"))
    // r15: fanoutBy so the BPE + quality work inside the partial
    // aggregate runs parallel instead of inside the serial scan task
    // (guide §2.5); the groupBy(lang) exchange then carries only the
    // per-partition partials. No-op on parallel inputs.
    graft.sources.PlanUtils.fanoutBy(docs, col("doc_id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(bpeTokens(col("text"))).cast("long")).as("total_bpe_tokens"),
        (sum(qualityScore(col("text")).cast("decimal(18,12)")).cast("double") /
          count(lit(1))).as("avg_quality"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        percentile(col("n_chars"), lit(0.5)).as("median_chars"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_mix" -> (corpusMix _),
    "corpus_mix_bpe" -> (corpusMixBpe _),
    "corpus_mix_temperature" -> (corpusMixTemperature _),
    "corpus_split" -> (corpusSplit _),
    "corpus_select_budget" -> (corpusSelectBudget _),
    "corpus_select_budget_pruned" -> (corpusSelectBudgetPruned _),
    "corpus_clean" -> (corpusClean _),
    "corpus_clean_multimodal" -> (corpusCleanMultimodal _),
    "corpus_stats" -> (corpusStats _),
    "corpus_decontaminate" -> (corpusDecontaminate _),
    "corpus_decontaminate_bloom" -> (corpusDecontaminateBloom _),
    "corpus_contamination" -> (corpusContaminationScore _),
    "corpus_decontaminate_near" -> (corpusDecontaminateNear _),
    "corpus_dsir_select" -> (corpusDsirSelect _),
    "corpus_shard" -> (corpusShard _),
    "corpus_scrub" -> (corpusScrub _),
    // buckets pinned to the spec-scale 16 so the oracle's `% 16` and
    // pack-id literals stay exact regardless of testdata token mass
    // (the API default is 0 = corpus-sized)
    "pack_sequences" -> ((s: SparkSession, d: String) => packSequences(s, d, buckets = 16)),
    "sample_stratified" -> (sampleStratified _),
    "corpus_sample_k" -> ((s: SparkSession, d: String) => corpusSampleK(s, d)),
    "corpus_sample_k_pruned" ->
      ((s: SparkSession, d: String) => corpusSampleKPruned(s, d)))

  /** The whole pipeline in one DuckDB query: recursive-CTE cluster
    * resolution + the quality formula (shared with text_quality). */
  private val oraclesBase: Map[String, String] = Map(
    // mirrors corpusMix: same BPE tokenizer regex, same division
    // order in the keep rate, same multiply-shift residue, same
    // kept-whole rule for null-lang docs (LEFT join, keep_points
    // coalesced to the full residue range, supply over labeled
    // langs only)
    "corpus_mix" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens
         |  FROM documents),
         |supply AS (SELECT lang, sum(n_tokens) AS lang_tokens FROM t
         |           WHERE lang IS NOT NULL GROUP BY lang),
         |nl AS (SELECT count(*) AS n_langs FROM supply)
         |SELECT doc_id, lang, n_tokens
         |FROM t LEFT JOIN supply USING (lang) CROSS JOIN nl
         |WHERE ((doc_id % $MixHashMod) * $MixHashMul) % $MixHashMod <
         |      coalesce(CAST(floor(least(1.0, ${MixBudgetTokens.toDouble} / n_langs / lang_tokens)
         |                 * ${MixHashMod.toDouble}) AS BIGINT), $MixHashMod)""".stripMargin,
    // the corpus_mix plan priced by the BPE merge-loop replay CTE
    // (single-sourced with text_bpe_tokens via TextQueries.bpeCntCte);
    // concatenated, NOT nested under this stripMargin — the CTE body
    // has SQL '||' operators at line starts
    "corpus_mix_bpe" ->
      (TextQueries.bpeCntCte + ",\n" +
        s"""t AS (
           |  SELECT d.doc_id, d.lang, coalesce(cnt.n_tok, 0) AS n_tokens
           |  FROM documents d LEFT JOIN cnt USING (doc_id)),
           |supply AS (SELECT lang, sum(n_tokens) AS lang_tokens FROM t
           |           WHERE lang IS NOT NULL GROUP BY lang),
           |nl AS (SELECT count(*) AS n_langs FROM supply)
           |SELECT doc_id, lang, n_tokens
           |FROM t LEFT JOIN supply USING (lang) CROSS JOIN nl
           |WHERE ((doc_id % $MixHashMod) * $MixHashMul) % $MixHashMod <
           |      coalesce(CAST(floor(least(1.0, ${MixBudgetTokens.toDouble} / n_langs / lang_tokens)
           |                 * ${MixHashMod.toDouble}) AS BIGINT), $MixHashMod)""".stripMargin),
    // mirrors corpusMixTemperature at the gate's alpha = 0.5: sqrt
    // weights (correctly rounded both engines), sum_w as an ORDERED
    // left fold over lang-sorted sqrt values (the driver fold's
    // arithmetic), same division order, same floor'd residue points
    "corpus_mix_temperature" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_tokens
         |  FROM documents),
         |supply AS (SELECT lang, sum(n_tokens) AS lt FROM t
         |           WHERE lang IS NOT NULL GROUP BY lang),
         |sw AS (SELECT list_reduce(list(sqrt(CAST(lt AS DOUBLE)) ORDER BY lang),
         |                          (a, b) -> a + b) AS sum_w FROM supply),
         |thr AS (
         |  SELECT lang,
         |         CAST(floor(least(1.0, ${MixBudgetTokens.toDouble}
         |                    * sqrt(CAST(lt AS DOUBLE)) / sum_w / lt)
         |                    * ${MixHashMod.toDouble}) AS BIGINT) AS keep_points
         |  FROM supply CROSS JOIN sw)
         |SELECT doc_id, lang, n_tokens
         |FROM t LEFT JOIN thr USING (lang)
         |WHERE ((doc_id % $MixHashMod) * $MixHashMul) % $MixHashMod <
         |      coalesce(keep_points, $MixHashMod)""".stripMargin,
    // mirrors corpusSplit: same residue, same interval edges
    "corpus_split" ->
      s"""SELECT doc_id, lang,
         |       CASE WHEN ((doc_id % $MixHashMod) * $MixHashMul) % $MixHashMod < $SplitValPoints THEN 'val'
         |            WHEN ((doc_id % $MixHashMod) * $MixHashMul) % $MixHashMod < ${SplitValPoints + SplitTestPoints} THEN 'test'
         |            ELSE 'train' END AS split
         |FROM documents""".stripMargin,
    // mirrors corpusSelectBudget: same quality formula (shared with
    // corpus_stats below), same (quality DESC, doc_id) window order,
    // same strict tokens_before < budget straddler rule
    "corpus_select_budget" ->
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tokens,
         |         least(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE) / 50.0, 1.0) * 0.4
         |          + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
         |                         / greatest(CAST(length(text) AS DOUBLE), 1.0) * 5.0, 1.0)) * 0.2
         |          + least(CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
         |                          w -> w IN (${stopwords.map(s => s"'$s'").mkString(", ")}))) AS DOUBLE)
         |                  / greatest(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.2
         |          + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
         |                         / greatest(CAST(length(text) AS DOUBLE), 1.0) * 3.0, 1.0)) * 0.2
         |           AS quality
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, lang, n_tokens, quality,
         |         CAST(row_number() OVER (PARTITION BY lang
         |                ORDER BY quality DESC, doc_id) AS INTEGER) AS sel_rank,
         |         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
         |                ORDER BY quality DESC, doc_id
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
         |  FROM s)
         |SELECT doc_id, lang, sel_rank, n_tokens, tokens_before, quality
         |FROM r WHERE tokens_before < $SelectBudgetTokens""".stripMargin,
    "corpus_stats" ->
      s"""WITH q AS (
         |  SELECT lang, n_chars,
         |         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
         |         least(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE) / 50.0, 1.0) * 0.4
         |          + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
         |                         / greatest(CAST(length(text) AS DOUBLE), 1.0) * 5.0, 1.0)) * 0.2
         |          + least(CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
         |                          w -> w IN (${stopwords.map(s => s"'$s'").mkString(", ")}))) AS DOUBLE)
         |                  / greatest(CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS DOUBLE), 1.0) * 5.0, 1.0) * 0.2
         |          + (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE)
         |                         / greatest(CAST(length(text) AS DOUBLE), 1.0) * 3.0, 1.0)) * 0.2
         |           AS quality
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
         |       CAST(sum(CAST(quality AS DECIMAL(18,12))) AS DOUBLE) / count(*) AS avg_quality,
         |       min(n_chars) AS min_chars,
         |       max(n_chars) AS max_chars,
         |       quantile_cont(n_chars, 0.5) AS median_chars
         |FROM q GROUP BY lang""".stripMargin,
    // mirrors packSequences/withPackId: oversized docs (> budget) are
    // excluded from the normal running sum and take bucket-local pack
    // ids above the 2^39 offset; normal docs pack by cumulative count
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens,
        |         doc_id % 16 AS bucket
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, bucket, n_tokens,
        |         CAST(coalesce(sum(CASE WHEN n_tokens > 512 THEN 0 ELSE n_tokens END)
        |                OVER win, 0) AS BIGINT) AS tokens_before,
        |         CAST(coalesce(sum(CASE WHEN n_tokens > 512 THEN 1 ELSE 0 END)
        |                OVER win, 0) AS BIGINT) AS over_before
        |  FROM t
        |  WINDOW win AS (PARTITION BY bucket ORDER BY doc_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT doc_id, bucket, n_tokens,
        |       bucket * 1099511627776 + CASE WHEN n_tokens > 512
        |         THEN 549755813888 + over_before
        |         ELSE CAST(floor(CAST(tokens_before AS DOUBLE) / 512.0) AS BIGINT) END
        |         AS pack_id
        |FROM w""".stripMargin,
    "corpus_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(CASE WHEN len(ws) >= 5
        |           THEN list_transform(generate_series(1, len(ws) - 4),
        |                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
        |                       ws[i+3] || ' ' || ws[i+4])
        |           ELSE [] END)) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 23 = 0)
        |SELECT doc_id, count(*) AS n_shared_5grams
        |FROM sh JOIN ev USING (s)
        |WHERE doc_id % 23 != 0
        |GROUP BY doc_id""".stripMargin,
    // graded twin of corpus_decontaminate: same shingling, LEFT joins
    // so 0-overlap and no-gram docs score 0; the division is exact
    // int / exact int in IEEE double on both engines
    "corpus_contamination" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(CASE WHEN len(ws) >= 5
        |           THEN list_transform(generate_series(1, len(ws) - 4),
        |                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
        |                       ws[i+3] || ' ' || ws[i+4])
        |           ELSE [] END)) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
        |ev AS (SELECT DISTINCT s, 1 AS hit FROM sh WHERE doc_id % 23 = 0),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_grams,
        |         CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_shared
        |  FROM sh LEFT JOIN ev USING (s)
        |  WHERE doc_id % 23 != 0
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |       coalesce(n_grams, 0) AS n_grams,
        |       coalesce(n_shared, 0) AS n_shared,
        |       CASE WHEN coalesce(n_grams, 0) > 0
        |            THEN CAST(n_shared AS DOUBLE) / n_grams ELSE 0.0 END
        |         AS contamination
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 23 != 0) d
        |LEFT JOIN agg USING (doc_id)""".stripMargin,
    // bipartite exact-Jaccard ground truth (dedup_minhash_lsh's
    // recall-1.0-at-gate-scale argument carries: the planted cross-
    // boundary pair sits at j ~ 0.96, where 16x8 banding misses with
    // probability ~1e-9)
    "corpus_decontaminate_near" ->
      s"""WITH sh AS (
         |  SELECT doc_id, ${DedupQueries.shinglesSql} AS s
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
         |SELECT a.doc_id AS doc_id, b.doc_id AS eval_id,
         |       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |       (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
         |FROM sh a JOIN sh b
         |  ON a.doc_id % 23 != 0 AND b.doc_id % 23 = 0
         |WHERE len(a.s) > 0 AND len(b.s) > 0
         |  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
         |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8""".stripMargin,
    // mirrors corpusDsirSelectDocs step for step: same Horner-fold
    // bucket hash (seed 7, universal remix), same integer milli-log
    // ratio (floor(x+0.5) both sides — SQL round() and Scala
    // math.round disagree on negative halves), same ceil-of-double
    // keep count (CAST(0.2 AS DOUBLE): DuckDB's bare 0.2 is a
    // DECIMAL whose exact product diverges from the JVM's FP one)
    "corpus_dsir_select" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws,
        |         doc_id % 17 = 0 AS tgt
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, tgt, unnest(list_concat(ws,
        |    CASE WHEN len(ws) >= 2
        |      THEN list_transform(generate_series(1, len(ws) - 1),
        |             i -> ws[i] || ' ' || ws[i + 1])
        |      ELSE [] END)) AS gram
        |  FROM d),
        |gb AS (
        |  SELECT doc_id, tgt,
        |         ((list_reduce(list_prepend(CAST(7 AS BIGINT),
        |             list_transform(string_split_regex(gram, ''), ch -> ord(ch))),
        |           (a, b) -> (a * 31 + b) % 2147483647) * 1103515245 + 12345)
        |          % 2147483647) % 4096 AS b
        |  FROM g),
        |counts AS (
        |  SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS tc,
        |         sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS rc
        |  FROM gb GROUP BY b),
        |tot AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM counts),
        |lam AS (
        |  SELECT b, CAST(floor(1000 * ln(CAST((tc + 1) * (rt + 4096) AS DOUBLE)
        |                     / CAST((rc + 1) * (tt + 4096) AS DOUBLE)) + 0.5) AS BIGINT) AS lam
        |  FROM counts, tot),
        |wdoc AS (
        |  SELECT gb.doc_id, CAST(sum(lam.lam) AS BIGINT) AS weight_milli
        |  FROM gb JOIN lam USING (b) WHERE NOT tgt GROUP BY gb.doc_id),
        |k AS (SELECT CAST(ceil(count(*) * CAST(0.2 AS DOUBLE)) AS BIGINT) AS k FROM wdoc)
        |SELECT doc_id, weight_milli, sel_rank FROM (
        |  SELECT doc_id, weight_milli,
        |         CAST(row_number() OVER (ORDER BY weight_milli DESC, doc_id) AS BIGINT)
        |           AS sel_rank
        |  FROM wdoc) q, k
        |WHERE sel_rank <= k.k""".stripMargin,
    // same two affine residues mod 2^31-1 (exact BIGINT arithmetic
    // both sides), same (ord, doc_id) window
    "corpus_shard" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         ((doc_id % 2147483647) * 1103515245 + 12345) % 2147483647 % 16 AS shard,
        |         ((doc_id % 2147483647) * 1140671485 + 12820163) % 2147483647 AS ord
        |  FROM documents)
        |SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS BIGINT)
        |         AS shard_pos
        |FROM m""".stripMargin,
    // same chunking (1-based inclusive slice = non-overlapping 20-word
    // spans), same PACKED two-fold span key (seed-11 mod 2^31−1 and
    // seed-13 mod 2147483629, h1·2^31 + h2 — exact BIGINT; ord =
    // UTF-8 byte on this ASCII corpus — the dsir/simhash mirror
    // argument), same full-width floor on hot membership, same
    // distinct-doc frequency floor; the rebuild keeps chunk order
    "corpus_scrub" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (
        |  SELECT doc_id, i AS chunk_idx,
        |         array_to_string(ws[(i*20+1):(i*20+20)], ' ') AS chunk
        |  FROM d, unnest(generate_series(0, (len(ws)-1)//20)) AS t(i)),
        |h AS (
        |  SELECT doc_id, chunk_idx, chunk,
        |         len(string_split(chunk, ' ')) AS cw,
        |         list_reduce(list_prepend(CAST(11 AS BIGINT),
        |             list_transform(string_split_regex(chunk, ''), ch -> ord(ch))),
        |           (a, b) -> (a * 31 + b) % 2147483647) * 2147483648 +
        |         list_reduce(list_prepend(CAST(13 AS BIGINT),
        |             list_transform(string_split_regex(chunk, ''), ch -> ord(ch))),
        |           (a, b) -> (a * 31 + b) % 2147483629) AS h
        |  FROM c),
        |hot AS (
        |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM h WHERE cw = 20)
        |  GROUP BY h HAVING count(*) >= 3),
        |m AS (
        |  SELECT h.*, hot.h IS NOT NULL AS is_hot
        |  FROM h LEFT JOIN hot ON h.h = hot.h)
        |SELECT doc_id,
        |  COALESCE(array_to_string(list(chunk ORDER BY chunk_idx)
        |    FILTER (WHERE NOT is_hot), ' '), '') AS text_scrubbed,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE is_hot) AS BIGINT) AS n_scrubbed
        |FROM m GROUP BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id % (CASE WHEN lang = 'en' THEN 5 ELSE 2 END) = 0""".stripMargin,
    // mirrors sampleKDocs: same affine residue (exact BIGINT — doc_id
    // is non-negative so % == pmod), same (ord, doc_id) tiebreak
    "corpus_sample_k" ->
      """WITH o AS (
        |  SELECT doc_id, lang,
        |         ((doc_id % 2147483647) * 48271 + 11) % 2147483647 AS ord
        |  FROM documents)
        |SELECT doc_id, lang, sample_rank FROM (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang ORDER BY ord, doc_id)
        |           AS sample_rank
        |  FROM o)
        |WHERE sample_rank <= 3""".stripMargin,
    "corpus_clean" ->
      cleanOracleSql("allpairs AS (SELECT doc_a, doc_b FROM jpairs)"),
    "corpus_clean_multimodal" ->
      cleanOracleSql(
        s"""epairs AS (
           |  SELECT vec_a AS doc_a, vec_b AS doc_b
           |  FROM (${DedupQueries.embeddingLshOracleSql}) lshq),
           |allpairs AS (SELECT doc_a, doc_b FROM jpairs
           |             UNION SELECT doc_a, doc_b FROM epairs)""".stripMargin))

  /** The pruned budget selection is bit-identical to the exact form by
    * construction, so it answers to the SAME oracle — the gate thereby
    * checks the prefix-superset equivalence proof on real data, not
    * just "roughly the same selection". */
  val oracles: Map[String, String] =
    oraclesBase +
      ("corpus_select_budget_pruned" -> oraclesBase("corpus_select_budget")) +
      ("corpus_sample_k_pruned" -> oraclesBase("corpus_sample_k")) +
      // the bloom prefilter is exact-verified, so it answers to the
      // SAME oracle as the exact form — identical output is checked
      ("corpus_decontaminate_bloom" -> oraclesBase("corpus_decontaminate"))

  /** Shared skeleton of the corpus-clean oracles — `pairCtes` must
    * define a CTE `allpairs(doc_a, doc_b)` (it can reference the
    * text-Jaccard `jpairs` CTE; the multimodal variant UNIONs in the
    * embedding-LSH pairs, nested-WITH from DedupQueries so the plane
    * literals stay single-sourced). One copy of the CC + scoring SQL,
    * so the exact and multimodal cleans cannot drift. */
  private def cleanOracleSql(pairCtes: String): String =
    s"""WITH RECURSIVE sh AS (
       |  SELECT doc_id, list_distinct(CASE WHEN len(ws) >= 3
       |    THEN list_transform(generate_series(1, len(ws) - 2),
       |                        i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
       |    ELSE [] END) AS s
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
       |jpairs AS (
       |  SELECT doc_a, doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |           CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS j
       |    FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
       |  WHERE j >= 0.8),
       |$pairCtes,
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM allpairs
       |          UNION SELECT doc_b, doc_a FROM allpairs),
       |cc(doc_id, lbl) AS (
       |  SELECT a, a FROM edges
       |  UNION
       |  SELECT e.a, cc.lbl FROM edges e JOIN cc ON cc.doc_id = e.b),
       |losers AS (
       |  SELECT doc_id FROM (SELECT doc_id, min(lbl) AS canon FROM cc GROUP BY doc_id)
       |  WHERE doc_id != canon),
       |scored AS (
       |  SELECT doc_id, lang, text,
       |         length(text) AS n_chars,
       |         len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
       |         length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
       |         length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
       |         len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
       |                         w -> w IN (${stopwords.map(s => s"'$s'").mkString(", ")}))) AS n_stop
       |  FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
       |fin AS (
       |  SELECT doc_id, lang,
       |         least(CAST(n_words AS DOUBLE) / 50.0, 1.0) * 0.4
       |          + (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) * 5.0, 1.0)) * 0.2
       |          + least(CAST(n_stop AS DOUBLE) / greatest(CAST(n_words AS DOUBLE), 1.0) * 5.0, 1.0) * 0.2
       |          + (1.0 - least(CAST(n_upper AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) * 3.0, 1.0)) * 0.2
       |           AS quality,
       |         n_words,
       |         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
       |  FROM scored)
       |SELECT doc_id, lang, quality, n_words, n_bpe_tokens
       |FROM fin WHERE quality >= $QualityFloor""".stripMargin
}
