package graft.queries

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis query surface over the `documents` table
  * (SURVEY.md §2.E) — token statistics, quality scoring, language ID,
  * fingerprints, n-gram counts. All per-row work is native column
  * expressions; the only shuffle in the whole section is the n-gram
  * count's groupBy. */
object TextQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  /** r15: [[docs]] behind a scan fanout (guide §2.5) — the testdata's
    * single-row-group parquet scans as ONE task, so per-row expression
    * work (BPE encode, regex passes, langid scoring) that codegen
    * fuses into the scan stage runs serial however many cores the
    * session has. `fanoutBy` is a no-op whenever the scan is already
    * parallel (multi-row-group / multi-file layouts — the 100 TB
    * case). Used by the queries whose per-row work dominates; trivial
    * projections (fingerprint, chunks) stay on the bare scan, where an
    * exchange costs more than it saves (measured). */
  private def docsFanned(spark: SparkSession, dir: String): DataFrame =
    graft.sources.PlanUtils.fanoutBy(docs(spark, dir), col("doc_id"))

  def textTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(wsTokens(col("text"))).as("n_ws_tokens"),
      size(words(col("text"))).as("n_words"),
      size(bpeTokens(col("text"))).as("n_bpe_tokens"),
      length(col("text")).as("n_chars"))

  /** Token counts under the TRAINED BPE model ([[graft.functions.Bpe.builtin]],
    * learned by [[graft.functions.Bpe.train]] from the sf0.001 slice and
    * frozen — the LangProfiles pattern: derivation in-repo, model as
    * data, encode arithmetic oracle-checked against a DuckDB
    * recursive-CTE replay of the merge loop). One compiled scan-local
    * pass per row; no exchange. */
  def textBpeTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(bpeTokens(col("text"))).as("n_pretokens"),
      size(graft.functions.Bpe.bpeEncode(col("text"), graft.functions.Bpe.builtin))
        .as("n_tokens"))

  /** Per-language tokenizer FERTILITY under the frozen builtin BPE
    * model: subword tokens per pre-token. The tokenizer-fairness
    * table a multilingual curation pass reads before committing a
    * tokenizer — a language whose fertility runs high pays more
    * sequence budget per word (more tokens to say the same thing),
    * so its token-denominated mixing budget buys fewer documents;
    * fertility imbalance is a published failure mode of shared
    * multilingual vocabularies. One scan: the codegen'd encode runs
    * scan-locally, the only exchange is the per-language aggregation
    * (bounded by #languages, partial-agg friendly). Sums are exact
    * longs; fertility = exact-int / exact-int in IEEE double, so it
    * is bit-identical cross-engine (null where a language has no
    * pre-tokens, in both engines). */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame =
    bpeFertilityDocs(docsFanned(spark, dir))

  /** [[bpeFertility]] over an arbitrary (lang, text) frame under a
    * caller-supplied model — the spec / trained-model form. */
  def bpeFertilityDocs(in: DataFrame,
                       model: Array[(String, String)] =
                         graft.functions.Bpe.builtin): DataFrame = {
    // NULL text contributes zero tokens, like the oracle (where a
    // NULL row produces no pre-token rows at all) — an unguarded
    // size() would return -1 per NULL row and silently corrupt the
    // language's sums
    val t = coalesce(col("text"), lit(""))
    in.select(
        col("lang"),
        size(bpeTokens(t)).cast("long").as("pre"),
        size(graft.functions.Bpe.bpeEncode(t, model)).cast("long").as("tok"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("pre")).as("n_pretokens"),
        sum(col("tok")).as("n_tokens"))
      .withColumn("fertility",
        when(col("n_pretokens") === 0L, lit(null).cast("double"))
          .otherwise(col("n_tokens").cast("double") / col("n_pretokens").cast("double")))
  }

  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nWords = size(words(col("text"))).cast("double")
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(words(col("text"))).as("n_words"),
      (nChars / greatest(nWords, lit(1.0))).as("chars_per_word"),
      (punctCount(col("text")).cast("double") / greatest(nChars, lit(1.0))).as("punct_ratio"),
      (stopwordCount(col("text")).cast("double") / greatest(nWords, lit(1.0))).as("stopword_ratio"),
      qualityScore(col("text")).as("quality"))
  }

  def textLangid(spark: SparkSession, dir: String): DataFrame =
    docsFanned(spark, dir).select(
      col("doc_id"), col("lang"), langId(col("text")).as("predicted_lang"))

  /** Character-trigram language ID — the production-grade upgrade of
    * [[textLangid]]'s function-word heuristic, whose envelope is only
    * "documents containing the listed stopwords" (short texts and
    * stopword-free phrasing fall through to its `en` default; TextSpec
    * measures exactly that gap). Profiles ship as DATA
    * ([[graft.functions.LangProfiles]]) and are embedded into the
    * DuckDB oracle, so the scorer is gate-checked end-to-end. */
  def textLangidNgram(spark: SparkSession, dir: String): DataFrame =
    langIdNgram(docsFanned(spark, dir))

  /** The trigram scorer on any `(doc_id, lang, text)` frame. Plan: one
    * tokenize+trigram explode over the corpus, a broadcast join against
    * the O(langs × topK) profile table, one integer aggregate per
    * (doc, matched lang), argmax by window. Scores are exact integer
    * sums (milli-log weights), so the argmax cannot flip on summation
    * order — see LangProfiles. CJK short-circuits to `zh` as in the
    * heuristic; evidence-free documents default to `en` (priority 0).
    *
    * The full score is `n_tg·Miss + Σ(w−Miss over matches)`, but n_tg
    * is constant across langs for one doc and LangProfiles CLAMPS
    * every kept weight strictly above Miss — so a lang with ≥1 match
    * always outscores every matchless lang, and the argmax needs only
    * the matched (doc, lang) rows: no per-doc fan-out to all langs
    * (a cartesian at plan level), no n_tg aggregate at all. */
  def langIdNgram(in: DataFrame,
                  profiles: graft.functions.LangProfiles.ProfileSet =
                    graft.functions.LangProfiles.builtin): DataFrame = {
    val s = in.sparkSession
    import s.implicits._
    import graft.functions.LangProfiles
    val prof = profiles.rows.toDF("plang", "tg", "w")
    val langs = profiles.languages.toDF("plang", "prio")
    val tgs = in.select(col("doc_id"), trigramsCol(col("text")).as("tgs"))
      .select(col("doc_id"), explode(col("tgs")).as("tg"))
    val matched = tgs.join(broadcast(prof), Seq("tg"))
      .groupBy("doc_id", "plang")
      .agg(sum(col("w") - lit(LangProfiles.MissMilli)).as("adj"))
      .join(broadcast(langs), Seq("plang"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("adj").desc, col("prio"))
    val best = matched.withColumn("rn", row_number().over(win))
      .filter(col("rn") === 1).select(col("doc_id"), col("plang"))
    val cjk = length(lower(col("text"))) -
      length(regexp_replace(lower(col("text")), "[\\x{4e00}-\\x{9fff}]", ""))
    in.select(col("doc_id"), col("lang"), cjk.as("cjk"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        when(col("cjk") > 0, lit("zh"))
          .otherwise(coalesce(col("plang"), lit(profiles.defaultLang)))
          .as("predicted_lang"))
  }

  /** Space-padded character trigrams of every `[a-z]+` word in `text`
    * — the ONE trigram expression shared by the scorer and the profile
    * derivation, so the two can never disagree on tokenization (it
    * also mirrors `LangProfiles.wordTrigrams` in Scala and the oracle
    * SQL — three engines, one definition). */
  private def trigramsCol(text: Column): Column =
    flatten(transform(
      regexp_extract_all(lower(text), lit("[a-z]+"), lit(0)),
      w => transform(sequence(lit(1), length(w)),
        i => concat(lit(" "), w, lit(" ")).substr(i, lit(3)))))

  /** Derive a [[graft.functions.LangProfiles.ProfileSet]] from a real
    * `(lang, text)` corpus slice — the production path the built-in
    * passages stand in for: one distributed trigram count (ONE scan of
    * the slice, map-side partial agg; distinct trigrams per language
    * are bounded at ~27³ so the aggregate is small however large the
    * slice), two bounded collects (per-lang totals + per-lang top-K
    * via window over the tiny aggregate), then the SAME clamp-enforced
    * derivation as the built-in table. Language priority: `en` first
    * when present (the evidence-free default stays aligned with the
    * word heuristic), remaining languages alphabetically — a
    * deterministic order whatever the slice's row order. New languages
    * ride along free: ship rows for them and they become candidates. */
  def deriveLangProfiles(slices: DataFrame): graft.functions.LangProfiles.ProfileSet = {
    import graft.functions.LangProfiles
    val counts = slices
      .select(col("lang"), explode(trigramsCol(col("text"))).as("tg"))
      .groupBy("lang", "tg").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = counts.groupBy("lang").agg(sum("c").as("t")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("c").desc, col("tg"))
      val top = counts.withColumn("rn", row_number().over(win))
        .filter(col("rn") <= LangProfiles.TopK)
        .select("lang", "tg", "c").collect()
        .groupBy(_.getString(0))
        .map { case (l, rs) =>
          l -> rs.map(r => r.getString(1) -> r.getLong(2)).toMap
        }
      val order = {
        val langs = totals.keySet
        (if (langs("en")) Seq("en") else Seq.empty) ++
          (langs - "en").toSeq.sorted
      }
      require(order.nonEmpty, "profile slice contains no languages")
      // counts hold only the collected top-K per language — the true
      // normalizer rides in via the totals override
      LangProfiles.fromCounts(
        order.map(l => l -> top.getOrElse(l, Map.empty)).toMap, order, totals)
    } finally { counts.unpersist() }
  }

  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fp64"),
      rollingHash(col("text")).as("rolling_fp"))

  /** Repetition scoring (the Gopher-rules duplicate-n-gram signal):
    * fraction of word bigrams that are repeats of an earlier bigram in
    * the same document. High values flag boilerplate/spam — a standard
    * LLM-training-data quality filter. Pure per-row expressions. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionScore(docs(spark, dir))

  /** The repetition transform on any `(doc_id, text)` frame. */
  def repetitionScore(in: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    def bigrams(distinct: Boolean) = ofExpr(graft.functions.expr.WordShingles(
      toExpr(col("text")), 2, distinct = distinct))
    in
      .select(col("doc_id"),
        size(bigrams(distinct = false)).as("n_bigrams"),
        size(bigrams(distinct = true)).as("n_distinct_bigrams"))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") > 0,
          lit(1.0) - col("n_distinct_bigrams").cast("double") / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** PII detection + scrubbing: count and redact email addresses,
    * URLs, and long digit runs — the pre-training privacy pass every
    * production corpus gets. Patterns are cross-engine-stable (no
    * lookarounds), all per-row codegen. */
  def textPii(spark: SparkSession, dir: String): DataFrame =
    piiScrub(docsFanned(spark, dir))

  /** The PII transform on any `(doc_id, text)` frame. */
  def piiScrub(in: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[^ \\t\\n]+"
    val digits = "[0-9]{7,}"
    in.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(url), lit(0))).as("n_urls"),
      size(regexp_extract_all(col("text"), lit(digits), lit(0))).as("n_long_digits"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        email, "<EMAIL>"), url, "<URL>"), digits, "<NUM>").as("scrubbed"))
  }

  /** Document chunking for context-bounded training samples: fixed
    * word windows of `chunkWords` at `strideWords` steps (overlap =
    * chunk − stride). One posexplode per doc — no shuffle, no UDF;
    * trailing chunks may be short (they end at the document). */
  def chunkDocs(in: DataFrame, chunkWords: Int, strideWords: Int): DataFrame =
    in.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        posexplode(sequence(lit(1), greatest(size(col("ws")), lit(1)), lit(strideWords)))
          .as(Seq("chunk_idx", "s")))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("ws"), col("s"), lit(chunkWords))).as("chunk_text"),
        size(slice(col("ws"), col("s"), lit(chunkWords))).as("n_chunk_words"))

  def textChunks(spark: SparkSession, dir: String): DataFrame =
    chunkDocs(docs(spark, dir), chunkWords = 64, strideWords = 48)

  /** Corpus-wide top-20 bigrams: per-row n-gram expansion (native
    * WordShingles expression, non-distinct so counts are true), one
    * explode, one count shuffle, deterministic tiebreak. */
  def textNgrams(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    docs(spark, dir)
      .select(explode(ofExpr(graft.functions.expr.WordShingles(
        toExpr(col("text")), 2, distinct = false))).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  /** TF-IDF keyword extraction: top-3 terms per document by
    * tf·ln((N+1)/(df+1)), stopwords excluded, ties broken by term.
    * Two shuffles total — term-frequency aggregation and the small
    * document-frequency aggregate (broadcast back) — then a per-doc
    * top-k window. The emitted columns are integers + rank (the float
    * score stays internal, so cross-engine float noise can't flip the
    * gate). */
  def textKeywords(spark: SparkSession, dir: String, topK: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
    // r15: docsFanned so the tokenize+explode+partial-agg runs parallel
    // instead of inside the serial single-row-group scan (guide §2.5)
    val terms = docsFanned(spark, dir)
      .select(col("doc_id"), explode(words(lower(col("text")))).as("word"))
      .filter(!col("word").isInCollection(stopwords))
    // barrier: tf feeds both the df aggregate and the join probe —
    // without it the term explode + count re-runs per consumer. r15:
    // barrierBy(word), not the conditional round-robin fanout — the
    // scan fanout above would turn `fanout` into a no-op and silently
    // drop the reuse barrier, and KEYING the barrier on `word` lets
    // the dfreq aggregate reuse the exchange's partitioning outright
    // (one Exchange where the round-robin form needed two).
    val tf = graft.sources.PlanUtils.barrierBy(
      terms.groupBy("doc_id", "word").agg(count(lit(1)).as("tf")), col("word"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    // corpus size as a 1-row broadcast, not an eager driver count():
    // building the plan must not launch a job
    val nDocs = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(dfreq), Seq("word"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("doc_id", "rank", "word", "tf", "df")
  }

  /** Boilerplate detection (the RefinedWeb / CCNet "frequent lines"
    * pass, over word 5-grams since the corpus is single-line): n-grams
    * appearing in at least `BoilerplateMinDocs` DISTINCT documents.
    * Per-doc dedup happens inside the row (`array_distinct` before the
    * explode), so the groupBy counts documents, not occurrences; the
    * single shuffle carries one row per distinct (doc, gram). Output
    * feeds a scrubbing pass: any gram here is template/boilerplate
    * text, not content. */
  def textBoilerplate(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      // WordShingles (distinct=true), not wordNgrams∘split: the native
      // expression splits the text ONCE per row — the HOF form
      // re-evaluates split() inside every element_at of every window
      .select(explode(graft.dedup.Dedup.shingles(
        col("text"), BoilerplateNgram)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= BoilerplateMinDocs)

  private val BoilerplateNgram = 5
  private val BoilerplateMinDocs = 3

  /** Fixed benchmark query set for the lexical-retrieval gate entry —
    * one list, interpolated into both the Spark frame and the DuckDB
    * oracle so the literals cannot drift. */
  val Bm25QuerySet: Seq[(Int, String)] = Seq(
    1 -> "hash join table",
    2 -> "window agg stream",
    3 -> "fast scan filter",
    4 -> "customer order query")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 lexical retrieval — the keyword half of the retrieval story
    * (the embedding half is the ANN stack, §2.D): top-`topK` documents
    * per query by Okapi BM25 (Lucene idf form, k1/b above).
    *
    * Plan, sized for a 100 TB corpus and a small query batch: the
    * corpus is tokenized in ONE pass that carries the per-doc length
    * alongside the exploded term, and a broadcast semi-join against
    * the query vocabulary prunes that stream BEFORE the (doc, term)
    * aggregation — the only corpus-sized shuffle carries just the
    * docs × |query vocab| matching rows, never the full posting list.
    * Document frequency and the 1-row corpus stats (N, avgdl) are
    * small aggregates broadcast back. Scores stay internal (floats
    * don't cross the gate); the emitted rank is windowed per query
    * with a doc_id tiebreak, and ties are exact-equal score groups so
    * both engines order them identically. */
  def searchBm25(spark: SparkSession, dir: String, topK: Int = 10): DataFrame =
    bm25Search(docsFanned(spark, dir), Bm25QuerySet, topK)

  /** The BM25 transform on any `(doc_id, text)` frame + query list. */
  def bm25Search(in: DataFrame, querySet: Seq[(Int, String)], topK: Int): DataFrame = {
    import in.sparkSession.implicits._
    val qterms = querySet.toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("word"))
    val toks = in
      .select(col("doc_id"), words(lower(col("text"))).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
        explode(col("ws")).as("word"))
    // prune to query vocabulary BEFORE the tf shuffle, then take the
    // document frequency as a WINDOW over the pruned aggregate — a
    // separate dfreq groupBy would be a second CONSUMER of the tfq
    // subtree, and Spark re-executes multi-consumer subtrees (column
    // pruning specializes each copy, which also defeats AQE exchange
    // reuse — verified on the executed plan). The window keeps one
    // tokenize+shuffle pass over the corpus by construction; the df
    // exchange it adds only carries the docs × |query vocab| rows.
    val tfq = toks.join(broadcast(qterms.select("word").distinct()), Seq("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("word"))))
    val stats = in.agg(
      count(lit(1)).as("n_docs"),
      avg(size(words(lower(col("text")))).cast("double")).as("avgdl"))
    bm25Rank(tfq.join(broadcast(qterms), Seq("word")), stats, topK)
  }

  /** The BM25 ranking core, shared by [[bm25Search]] and the
    * persistent [[graft.similarity.TextIndex]] so the ad-hoc and
    * index-served paths cannot drift: `perTerm` rows `(query_id,
    * doc_id, tf, dl, df)` + a 1-row `stats` frame `(n_docs, avgdl)`
    * → `(query_id, rank, doc_id, n_matched)` top-`topK` per query.
    * Lucene-form idf (always positive); score internal; rank ties
    * broken by doc_id.
    *
    * `maxDfFrac` (0 = off, the gate default) is the SCORING-LEVEL
    * stopword cap PLANS.md's skew story calls for: terms matching more
    * than that fraction of the corpus are excluded from scoring — the
    * only mitigation that bounds a stopword query's cost, since a
    * stopword's postings mass is the term's true document frequency
    * wherever the rows live (no layout fixes it). Deliberately a
    * CALLER decision: silently dropping terms changes ranks, so the
    * default stays off and the oracle-checked queries never set it.
    * A doc matched ONLY via capped terms drops out (its remaining
    * n_matched is 0), exactly as if the query had not contained
    * them. */
  def bm25Rank(perTerm: DataFrame, stats: DataFrame, topK: Int,
               maxDfFrac: Double = 0.0): DataFrame = {
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * col("tf") * lit(Bm25K1 + 1.0) /
      (col("tf") + lit(Bm25K1) *
        (lit(1.0 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
    val joined = perTerm.crossJoin(broadcast(stats))
    val capped =
      if (maxDfFrac <= 0.0) joined
      else joined.filter(col("df") <= lit(maxDfFrac) * col("n_docs"))
    capped
      .groupBy("query_id", "doc_id")
      .agg(sum(termScore).as("score"), count(lit(1)).as("n_matched"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "doc_id", "n_matched")
  }

  /** Reference-slice modulus for the bigram-LM fit: `doc_id %
    * LmRefMod == 0` stands in for the curated reference corpus (the
    * CCNet recipe fits KenLM on Wikipedia, then scores the crawl). */
  val LmRefMod = 5

  /** Bigram-LM quality scoring — the CCNet-style perplexity filter:
    * fit an add-one-smoothed bigram model on the reference slice,
    * score EVERY document by average negative log-likelihood (and
    * perplexity) under it. Low-ppl docs read like the reference;
    * high-ppl docs are the gibberish/spam tail a curator drops.
    *
    * Plan: the model is two aggregates over the slice's bigrams (c2 =
    * bigram counts, c1 = context counts derived FROM c2, so the slice
    * is shingled once) plus a 1-row vocabulary size; scoring is one
    * corpus pass joining each bigram occurrence against the model.
    * Model tables broadcast here (toy vocab); at a real vocabulary
    * they exceed the broadcast threshold and Spark picks the shuffle
    * equi-join on `bigram` — same plan shape, still one corpus pass.
    * Docs with <2 tokens have no bigrams and drop from BOTH engines'
    * outputs (no LM evidence either way). */
  def textLmScore(spark: SparkSession, dir: String): DataFrame =
    lmScore(docs(spark, dir))

  /** The bigram-LM transform on any `(doc_id, text)` frame. */
  def lmScore(in: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val bigrams = ofExpr(graft.functions.expr.WordShingles(
      toExpr(col("text")), 2, distinct = false))
    val bg = in.select(col("doc_id"), explode(bigrams).as("bigram"))
    // the model is ONE w1-keyed frame: context count c1 + a w2→c2 map
    // of the continuations. Separate c2/c1 tables would mean two
    // broadcast joins whose build subtrees each re-run the slice fit
    // (multi-consumer subtrees re-execute); this shape fits the model
    // once and scores through a single left join. An unseen bigram
    // under a SEEN context still finds c1 and misses only in the map —
    // exactly the add-one backoff the two-table form computes. At a
    // real vocabulary the model outgrows broadcast and Spark falls
    // back to a shuffle join on w1 — same plan shape; a stopword
    // context's map is as wide as its true continuation set (that IS
    // the model's size, not an expansion of it).
    val model = bg.filter(col("doc_id") % LmRefMod === 0)
      .groupBy("bigram").agg(count(lit(1)).as("c2"))
      .select(split(col("bigram"), " ").getItem(0).as("w1"),
        split(col("bigram"), " ").getItem(1).as("w2"), col("c2"))
      .groupBy("w1")
      .agg(sum(col("c2")).as("c1"),
        map_from_arrays(collect_list(col("w2")), collect_list(col("c2"))).as("cont"))
    val vocab = in.filter(col("doc_id") % LmRefMod === 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val c2 = element_at(col("cont"), col("w2")) // null map/miss → null
    val nll = -log((coalesce(c2, lit(0L)) + lit(1.0)) /
      (coalesce(col("c1"), lit(0L)) + col("v")))
    bg.withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(broadcast(model), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), avg(nll).as("avg_nll"))
      .withColumn("ppl", exp(col("avg_nll")))
  }

  /** Stand-in weight table for the model-based quality scorer — the
    * "shipped model" slot. A real deployment trains a linear
    * classifier offline (fastText-style: quality-reference vs random
    * crawl) and ships its per-bucket weights as data; the gate needs a
    * DETERMINISTIC table both engines can derive, so this is a
    * zero-mean affine residue over the bucket id (range −1001..+1001
    * milli-units, mean ≈ 0 so the keep/drop boundary is exercised).
    * Same 4096-bucket hashed uni+bigram feature space as DSIR —
    * scorer and importance-resampler stay feature-compatible, which is
    * how the pair is used in practice (score with one model, resample
    * with another, one gram pass each). */
  private[graft] def qualityModelWeights: Array[Long] =
    Array.tabulate(PipelineQueries.DsirBuckets)(b =>
      (b.toLong * 2654435761L + 97L) % 2003L - 1001L)

  def textQualityModel(spark: SparkSession, dir: String): DataFrame =
    qualityModelScore(docsFanned(spark, dir), qualityModelWeights)

  /** TRAIN the model-based quality filter in-repo: multinomial
    * Naive-Bayes log-count-ratio weights (Wang & Manning 2012, public
    * — the NB half of NBSVM; the GPT-3/LLaMA quality-classifier loop
    * is the same linear-model-over-hashed-grams shape) over the shared
    * [[PipelineQueries.DsirBuckets]] uni+bigram feature space.
    * `good` is the quality reference (curated corpus), `bad` the
    * rejected crawl sample; w_b = ⌊1000·ln(p̂_good(b)/p̂_bad(b))+0.5⌋
    * — exactly [[PipelineQueries.milliLogRatioLambda]], so trainer and
    * DSIR resampler stay feature- AND fixed-point-compatible, and the
    * output feeds [[qualityModelScore]] unchanged: a doc's score is
    * its summed per-gram log-odds, i.e. the NB decision function with
    * the class prior dropped (keep ⟺ mean gram log-odds ≥ 0).
    *
    * Cost at 100 TB: ONE scan over each labeled corpus (map-side
    * partial agg to ≤ 4096 × partitions rows), one bounded 4096-row
    * collect. No iterative solver, no label shuffling — determinism
    * is free, which is what lets QualityTrainSpec pin separation
    * exactly. */
  def qualityModelFit(good: DataFrame, bad: DataFrame): Array[Long] =
    PipelineQueries.milliLogRatioLambda(
      good.select(lit(true).as("tgt"),
          PipelineQueries.dsirGrams(PipelineQueries.dsirWords(col("text"))).as("grams"))
        .unionByName(bad.select(lit(false).as("tgt"),
          PipelineQueries.dsirGrams(PipelineQueries.dsirWords(col("text"))).as("grams"))))

  /** Trained weights as the `(bucket, weight_milli)` table
    * `quality-score weights=` ingests — always FULL 4096-bucket
    * coverage, so a train→score round trip never relies on the
    * reader's zero-fill default. */
  def qualityWeightsTable(spark: SparkSession, lam: Array[Long]): DataFrame = {
    require(lam.length == PipelineQueries.DsirBuckets)
    import spark.implicits._
    lam.toSeq.zipWithIndex.map { case (w, b) => (b, w) }
      .toDF("bucket", "weight_milli")
  }

  /** Model-based quality scoring (the GPT-3/LLaMA-style learned
    * quality FILTER, vs `text_quality`'s hand-rule heuristics): each
    * doc's hashed uni+bigram features index a weight table and the
    * doc's score is the weight SUM — scan-local via one higher-order
    * `aggregate` over the gram array with the λ table a broadcast
    * plan literal (the DSIR pass-2 shape: no explode, no join, no
    * shuffle of gram rows; at 100 TB this is one read-only scan).
    * Integer milli-weights end-to-end, so no float summation order
    * can flip `keep` and the DuckDB oracle reproduces every row
    * bit-for-bit. `keep = sum ≥ 0` ⟺ mean-weight ≥ 0 (n_grams > 0 —
    * gramless docs carry no evidence and are excluded, the DSIR
    * convention); the score/count split is emitted rather than a
    * quotient because Spark `div` truncates where DuckDB `//`
    * floors on negatives. */
  def qualityModelScore(in: DataFrame, lam: Array[Long]): DataFrame = {
    require(lam.length == PipelineQueries.DsirBuckets,
      s"weight table must cover all ${PipelineQueries.DsirBuckets} feature buckets")
    val lams = typedLit(lam.toSeq)
    in.select(col("doc_id"), PipelineQueries.dsirWords(col("text")).as("ws"))
      .select(col("doc_id"), PipelineQueries.dsirGrams(col("ws")).as("grams"))
      .filter(size(col("grams")) > 0)
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        aggregate(col("grams"), lit(0L), (acc, g) =>
          acc + element_at(lams, (PipelineQueries.dsirBucket(g) + 1).cast("int")))
          .as("sum_milli"))
      .withColumn("keep", col("sum_milli") >= 0L)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_bm25" -> ((s: SparkSession, d: String) => searchBm25(s, d)),
    "text_lm_score" -> (textLmScore _),
    "text_boilerplate" -> (textBoilerplate _),
    "text_tokens" -> (textTokens _),
    "text_bpe_tokens" -> (textBpeTokens _),
    "bpe_fertility" -> (bpeFertility _),
    "text_quality" -> (textQuality _),
    "text_quality_model" -> (textQualityModel _),
    "text_langid" -> (textLangid _),
    "text_langid_ngram" -> (textLangidNgram _),
    // gate form keeps the DuckDB-reproducible polynomial hash; fp64
    // (xxhash64, no DuckDB twin) is pinned by TextSpec instead
    "text_fingerprint" -> ((s: SparkSession, d: String) =>
      textFingerprint(s, d).select("doc_id", "rolling_fp")),
    "text_ngrams" -> (textNgrams _),
    "text_repetition" -> (textRepetition _),
    "text_pii" -> (textPii _),
    "text_chunks" -> (textChunks _),
    "text_keywords" -> ((s: SparkSession, d: String) => textKeywords(s, d)))

  private val stopwordsSql = stopwords.map(s => s"'$s'").mkString(", ")

  private val bm25QueriesSql =
    Bm25QuerySet.map { case (i, q) => s"($i, '$q')" }.mkString(", ")

  /** [[graft.functions.Bpe.builtin]] as a SQL VALUES list — the same
    * frozen model on both sides of the gate (symbols are letter runs
    * on this corpus; quotes doubled anyway for SQL safety). */
  private def bpeMergeValues: String =
    graft.functions.Bpe.builtin.zipWithIndex.map { case ((l, r), i) =>
      def q(s: String) = "'" + s.replace("'", "''") + "'"
      s"(${i + 1}, ${q(l)}, ${q(r)})"
    }.mkString(", ")

  /** The shared BPE-replay CTE prefix (merge table → pre-tokens →
    * per-distinct-word merge loop → per-doc (n_pre, n_tok)) — single-
    * sourced so the per-doc and per-language oracles cannot drift.
    * See the merge-loop equivalence argument at its use site. */
  private[queries] def bpeCntCte: String =
    s"""WITH RECURSIVE m(rank, l, r) AS (VALUES $bpeMergeValues),
       |pt AS (
       |  SELECT doc_id,
       |         unnest(regexp_extract_all(text,
       |           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS word
       |  FROM documents),
       |w AS (SELECT DISTINCT word FROM pt),
       |enc(word, s, it) AS (
       |  SELECT word,
       |         ' ' || array_to_string(string_split_regex(word, ''), ' ') || ' ',
       |         0
       |  FROM w
       |  UNION ALL
       |  SELECT e.word,
       |         substr(e.s, 1, strpos(e.s, ' ' || m.l || ' ' || m.r || ' '))
       |           || m.l || m.r || ' '
       |           || substr(e.s, strpos(e.s, ' ' || m.l || ' ' || m.r || ' ')
       |                            + len(m.l) + len(m.r) + 3),
       |         e.it + 1
       |  FROM enc e JOIN m ON m.rank = (
       |    SELECT min(m2.rank) FROM m m2
       |    WHERE strpos(e.s, ' ' || m2.l || ' ' || m2.r || ' ') > 0)),
       |toks AS (
       |  SELECT word, len(string_split(trim(arg_max(s, it)), ' ')) AS nt
       |  FROM enc GROUP BY word),
       |cnt AS (
       |  SELECT doc_id, count(*) AS n_pre, CAST(sum(nt) AS BIGINT) AS n_tok
       |  FROM pt JOIN toks USING (word) GROUP BY doc_id)""".stripMargin

  val oracles: Map[String, String] = Map(
    // mirrors searchBm25: same Lucene-idf BM25, same k1/b, same
    // query-vocabulary pruning before tf; rank tiebreak on doc_id
    "search_bm25" ->
      s"""WITH q(query_id, qtext) AS (VALUES $bm25QueriesSql),
         |qt AS (SELECT query_id, unnest(string_split(qtext, ' ')) AS word FROM q),
         |toks AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS word
         |         FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
         |               FROM documents)),
         |tfq AS (SELECT doc_id, word, count(*) AS tf, CAST(max(dl) AS DOUBLE) AS dl
         |        FROM toks WHERE word IN (SELECT DISTINCT word FROM qt)
         |        GROUP BY doc_id, word),
         |dfreq AS (SELECT word, count(*) AS df FROM tfq GROUP BY word),
         |stats AS (SELECT count(*) AS n_docs,
         |                 avg(CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS DOUBLE)) AS avgdl
         |          FROM documents),
         |scored AS (
         |  SELECT query_id, doc_id,
         |         sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         |             * tf * ${Bm25K1 + 1.0} /
         |             (tf + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B * dl / avgdl))) AS score,
         |         count(*) AS n_matched
         |  FROM qt JOIN tfq USING (word) JOIN dfreq USING (word) CROSS JOIN stats
         |  GROUP BY query_id, doc_id)
         |SELECT query_id, rank, doc_id, n_matched FROM (
         |  SELECT query_id, doc_id, n_matched,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY score DESC, doc_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10""".stripMargin,
    // mirrors textLmScore: add-one-smoothed bigram LM fit on the
    // doc_id % LmRefMod slice, c1 derived from c2, V = distinct
    // slice unigrams; scoring joins are LEFT so unseen bigrams hit
    // the smoothing floor (c2=0, and c1=0 for unseen contexts)
    "text_lm_score" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |bg AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
         |         THEN list_transform(generate_series(1, len(ws) - 1),
         |                             i -> ws[i] || ' ' || ws[i + 1])
         |         ELSE [] END) AS bigram FROM w),
         |c2 AS (SELECT bigram, count(*) AS c2 FROM bg
         |       WHERE doc_id % $LmRefMod = 0 GROUP BY bigram),
         |c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, sum(c2) AS c1
         |       FROM c2 GROUP BY 1),
         |v AS (SELECT count(DISTINCT u) AS v
         |      FROM (SELECT unnest(ws) AS u FROM w WHERE doc_id % $LmRefMod = 0)),
         |s AS (SELECT doc_id,
         |             -ln((coalesce(c2, 0) + 1.0) / (coalesce(c1, 0) + v)) AS nll
         |      FROM bg LEFT JOIN c2 USING (bigram)
         |              LEFT JOIN c1 ON string_split(bg.bigram, ' ')[1] = c1.w1
         |              CROSS JOIN v)
         |SELECT doc_id, count(*) AS n_bigrams, avg(nll) AS avg_nll,
         |       exp(avg(nll)) AS ppl
         |FROM s GROUP BY doc_id""".stripMargin,
    // mirrors graft.functions.expr.RollingHash exactly: Horner fold
    // (acc*31 + byte) mod P over UTF-8 bytes, seeded 17 (texts are
    // ASCII, so codepoints == bytes)
    "text_fingerprint" ->
      """SELECT doc_id,
        |       list_reduce(list_prepend(17 % 1125899906842597,
        |                     list_transform(string_split_regex(text, ''), ch -> ord(ch))),
        |                   (a, b) -> (a * 31 + b) % 1125899906842597) AS rolling_fp
        |FROM documents""".stripMargin,
    // mirrors TextFunctions.langId token-for-token (word-set hit counts
    // over whitespace tokens of the lowercased text, CJK char count,
    // same tie-break order)
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang, lower(text) AS lt,
        |                  string_split_regex(lower(text), '\s+') AS ws FROM documents),
        |c AS (SELECT doc_id, lang,
        |  len(list_filter(ws, w -> w IN ('the','and','of','to','is','that','it','with'))) AS en,
        |  len(list_filter(ws, w -> w IN ('der','die','das','und','ist','nicht','ein','mit'))) AS de,
        |  len(list_filter(ws, w -> w IN ('le','la','les','et','est','une','que','dans'))) AS fr,
        |  len(list_filter(ws, w -> w IN ('el','los','las','es','una','que','por','con'))) AS es,
        |  length(lt) - length(regexp_replace(lt, '[\x{4e00}-\x{9fff}]', '', 'g')) AS cjk
        | FROM t)
        |SELECT doc_id, lang,
        | CASE WHEN cjk > 0 THEN 'zh'
        |      WHEN de >= en AND de >= fr AND de >= es AND de > 0 THEN 'de'
        |      WHEN fr >= en AND fr >= es AND fr > 0 THEN 'fr'
        |      WHEN es >= en AND es > 0 THEN 'es'
        |      ELSE 'en' END AS predicted_lang
        |FROM c""".stripMargin,
    // mirrors langIdNgram: same embedded trigram table (LangProfiles
    // generates both sides from one derivation), same integer
    // milli-log scoring, same (score desc, priority) argmax
    "text_langid_ngram" ->
      s"""WITH prof(plang, tg, w) AS (VALUES ${graft.functions.LangProfiles.sqlValues}),
         |langs(plang, prio) AS (VALUES ('en', 0), ('de', 1), ('fr', 2), ('es', 3)),
         |words AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS wd
         |          FROM documents),
         |tgs AS (SELECT doc_id, substr(' ' || wd || ' ', i, 3) AS tg
         |        FROM (SELECT doc_id, wd,
         |                     unnest(generate_series(1, length(wd))) AS i FROM words)),
         |n AS (SELECT doc_id, count(*) AS n_tg FROM tgs GROUP BY doc_id),
         |matched AS (SELECT doc_id, plang, sum(w - (-10000)) AS adj
         |            FROM tgs JOIN prof USING (tg) GROUP BY doc_id, plang),
         |scores AS (SELECT doc_id, plang, prio,
         |                  n_tg * (-10000) + coalesce(adj, 0) AS score
         |           FROM n CROSS JOIN langs LEFT JOIN matched USING (doc_id, plang)),
         |best AS (SELECT doc_id, plang,
         |                row_number() OVER (PARTITION BY doc_id
         |                  ORDER BY score DESC, prio) AS rn FROM scores)
         |SELECT d.doc_id, d.lang,
         |       CASE WHEN length(lower(d.text)) -
         |                 length(regexp_replace(lower(d.text), '[\\x{4e00}-\\x{9fff}]', '', 'g')) > 0
         |            THEN 'zh'
         |            ELSE coalesce(b.plang, 'en') END AS predicted_lang
         |FROM documents d
         |LEFT JOIN (SELECT doc_id, plang FROM best WHERE rn = 1) b USING (doc_id)""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(trim(text), '\S+')) AS n_ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
        |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
        |       length(text) AS n_chars
        |FROM documents""".stripMargin,
    // replays the trained-BPE merge loop in SQL: the builtin merge
    // table rides as VALUES, and a recursive CTE applies, per distinct
    // pre-token, the leftmost occurrence of the lowest-rank applicable
    // pair until none applies. One occurrence at a time is EQUAL to
    // the engine's merge-all-per-rank loop because the table is rank-
    // valid (a pair containing symbol s can only be learned after the
    // merge creating s — see BpeUtil.Model), so a merge can never
    // create a lower-ranked pair. Symbols are tracked in a space-
    // separated sentinel string ' a b c '; a merge is substring
    // surgery at strpos, which sidesteps replace()'s shared-boundary
    // miss on overlapping occurrences.
    // concatenated, NOT interpolated under stripMargin: the CTE body
    // contains SQL '||' operators at line starts, which a second
    // stripMargin pass would eat down to '|'
    "text_bpe_tokens" ->
      (bpeCntCte + "\n" +
        """SELECT d.doc_id,
          |       coalesce(cnt.n_pre, 0) AS n_pretokens,
          |       coalesce(cnt.n_tok, 0) AS n_tokens
          |FROM documents d LEFT JOIN cnt USING (doc_id)""".stripMargin),
    // same CTE, aggregated per language; fertility is an exact-int /
    // exact-int double division (bit-identical cross-engine), NULL
    // where a language has no pre-tokens in both engines
    "bpe_fertility" ->
      (bpeCntCte + "\n" +
        """SELECT d.lang,
          |       CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(coalesce(sum(cnt.n_pre), 0) AS BIGINT) AS n_pretokens,
          |       CAST(coalesce(sum(cnt.n_tok), 0) AS BIGINT) AS n_tokens,
          |       CASE WHEN coalesce(sum(cnt.n_pre), 0) = 0 THEN NULL
          |            ELSE CAST(coalesce(sum(cnt.n_tok), 0) AS DOUBLE) /
          |                 CAST(sum(cnt.n_pre) AS DOUBLE) END AS fertility
          |FROM documents d LEFT JOIN cnt USING (doc_id)
          |GROUP BY d.lang""".stripMargin),
    // mirrors qualityModelScore: same DSIR gram/bucket arithmetic
    // (seed-7 Horner fold, affine remix, 4096 buckets) and the same
    // stand-in weight formula — all exact BIGINT, summed per doc
    "text_quality_model" ->
      """WITH d AS (
        |  SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+') AS ws
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_concat(ws,
        |    CASE WHEN len(ws) >= 2
        |      THEN list_transform(generate_series(1, len(ws) - 1),
        |             i -> ws[i] || ' ' || ws[i + 1])
        |      ELSE [] END)) AS gram
        |  FROM d),
        |gb AS (
        |  SELECT doc_id,
        |         ((list_reduce(list_prepend(CAST(7 AS BIGINT),
        |             list_transform(string_split_regex(gram, ''), ch -> ord(ch))),
        |           (a, b) -> (a * 31 + b) % 2147483647) * 1103515245 + 12345)
        |          % 2147483647) % 4096 AS b
        |  FROM g)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(sum((b * 2654435761 + 97) % 2003 - 1001) AS BIGINT) AS sum_milli,
        |       CAST(sum((b * 2654435761 + 97) % 2003 - 1001) AS BIGINT) >= 0 AS keep
        |FROM gb GROUP BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH base AS (
         |  SELECT doc_id,
         |         length(text) AS n_chars,
         |         len(regexp_extract_all(text, '[A-Za-z]+')) AS n_words,
         |         length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS n_punct,
         |         length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
         |         len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
         |                         w -> w IN ($stopwordsSql))) AS n_stop
         |  FROM documents)
         |SELECT doc_id, n_chars, n_words,
         |       CAST(n_chars AS DOUBLE) / greatest(CAST(n_words AS DOUBLE), 1.0) AS chars_per_word,
         |       CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) AS punct_ratio,
         |       CAST(n_stop AS DOUBLE) / greatest(CAST(n_words AS DOUBLE), 1.0) AS stopword_ratio,
         |       least(CAST(n_words AS DOUBLE) / 50.0, 1.0) * 0.4
         |        + (1.0 - least(CAST(n_punct AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) * 5.0, 1.0)) * 0.2
         |        + least(CAST(n_stop AS DOUBLE) / greatest(CAST(n_words AS DOUBLE), 1.0) * 5.0, 1.0) * 0.2
         |        + (1.0 - least(CAST(n_upper AS DOUBLE) / greatest(CAST(n_chars AS DOUBLE), 1.0) * 3.0, 1.0)) * 0.2
         |         AS quality
         |FROM base""".stripMargin,
    "text_keywords" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, word, count(*) AS tf FROM terms
         |  WHERE word NOT IN ($stopwordsSql) GROUP BY doc_id, word),
         |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
         |scored AS (
         |  SELECT doc_id, word, tf, df,
         |         tf * ln(((SELECT count(*) FROM documents) + 1.0) / (df + 1.0)) AS score
         |  FROM tf JOIN dfreq USING (word))
         |SELECT doc_id, rank, word, tf, df FROM (
         |  SELECT doc_id, word, tf, df,
         |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rank
         |  FROM scored)
         |WHERE rank <= 3""".stripMargin,
    // DuckDB list slicing is 1-based inclusive: ws[s : s+chunk-1]
    "text_chunks" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id, CAST(k AS INTEGER) AS chunk_idx,
        |       array_to_string(ws[1 + k * 48 : k * 48 + 64], ' ') AS chunk_text,
        |       CAST(len(ws[1 + k * 48 : k * 48 + 64]) AS INTEGER) AS n_chunk_words
        |FROM w, LATERAL (SELECT unnest(generate_series(0,
        |       CAST(floor((greatest(len(ws), 1) - 1) / 48.0) AS BIGINT))) AS k)""".stripMargin,
    "text_repetition" ->
      """WITH b AS (
        |  SELECT doc_id,
        |         CASE WHEN len(ws) >= 2
        |              THEN list_transform(generate_series(1, len(ws) - 1),
        |                                  i -> ws[i] || ' ' || ws[i + 1])
        |              ELSE [] END AS bg
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))
        |SELECT doc_id, len(bg) AS n_bigrams,
        |       len(list_distinct(bg)) AS n_distinct_bigrams,
        |       CASE WHEN len(bg) > 0
        |            THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE)
        |            ELSE 0.0 END AS dup_bigram_frac
        |FROM b""".stripMargin,
    "text_pii" ->
      """SELECT doc_id,
        |       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |       len(regexp_extract_all(text, 'https?://[^ \t\n]+')) AS n_urls,
        |       len(regexp_extract_all(text, '[0-9]{7,}')) AS n_long_digits,
        |       regexp_replace(regexp_replace(regexp_replace(text,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         'https?://[^ \t\n]+', '<URL>', 'g'),
        |         '[0-9]{7,}', '<NUM>', 'g') AS scrubbed
        |FROM documents""".stripMargin,
    "text_ngrams" ->
      """WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |bg AS (SELECT unnest(CASE WHEN len(ws) >= 2
        |                     THEN list_transform(generate_series(1, len(ws) - 1),
        |                                         i -> ws[i] || ' ' || ws[i + 1])
        |                     ELSE [] END) AS bigram
        |       FROM w)
        |SELECT bigram, count(*) AS n FROM bg
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "text_boilerplate" ->
      s"""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
         |g AS (SELECT unnest(list_distinct(
         |         CASE WHEN len(ws) >= $BoilerplateNgram
         |              THEN list_transform(generate_series(1, len(ws) - ${BoilerplateNgram - 1}),
         |                     i -> array_to_string(ws[i : i + ${BoilerplateNgram - 1}], ' '))
         |              ELSE [] END)) AS gram
         |      FROM w)
         |SELECT gram, count(*) AS doc_freq FROM g
         |GROUP BY gram HAVING count(*) >= $BoilerplateMinDocs""".stripMargin)
}
