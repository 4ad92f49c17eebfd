package graft.functions

import graft.SparkSpec
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("bm25: planted relevance orders docs, misses excluded, gate shape sane") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash join hash join hash join table"), // all 3 terms, high tf
      (2L, "hash value value value value value"),  // 1 term, once
      (3L, "sort merge window group order line"),  // no query terms
      (4L, "hash join table"))                     // all 3 terms, shortest
      .toDF("doc_id", "text")
    val out = TextQueries.bm25Search(docs, Seq(1 -> "hash join table"), topK = 10)
      .orderBy("rank").collect()
    // doc 3 matches nothing and must be absent
    assert(out.map(_.getLong(2)).toSet == Set(1L, 2L, 4L))
    // both full-match docs outrank the single-rare-term doc (their
    // relative order is a near-tie of tf saturation vs length norm —
    // not asserted; the DuckDB oracle pins it exactly)
    assert(out.take(2).map(_.getLong(2)).toSet == Set(1L, 4L))
    assert(out.last.getLong(2) == 2L)
    // n_matched counts matched query terms
    assert(out.map(r => r.getLong(2) -> r.getLong(3)).toMap ==
      Map(1L -> 3L, 4L -> 3L, 2L -> 1L))
    // gate query on the real corpus: every query returns ranked rows
    val gate = TextQueries.searchBm25(spark, sf("any"))
    val perQ = gate.groupBy("query_id").count().collect()
    assert(perQ.length == TextQueries.Bm25QuerySet.length)
    assert(perQ.forall(_.getLong(1) > 0))
  }

  test("lm score: reference-like text scores lower perplexity than unseen text") {
    import spark.implicits._
    // doc_id % 5 == 0 rows form the reference slice; doc 1 repeats the
    // slice's bigrams verbatim, doc 2 is out-of-vocabulary gibberish
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (5L, "the cat sat on the mat again"),
      (1L, "the cat sat on the mat"),
      (2L, "zyx wvu tsr qpo nml kji"))
      .toDF("doc_id", "text")
    val out = TextQueries.lmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) < out(2L),
      s"in-distribution doc should have lower avg_nll: $out")
    // smoothing keeps everything finite
    assert(out.values.forall(v => !v.isNaN && !v.isInfinite))
    // a doc with one word has no bigrams and drops from the output
    val one = TextQueries.lmScore(Seq((9L, "word")).toDF("doc_id", "text"))
    assert(one.count() == 0)
  }

  private def dir = sf("any")

  test("fingerprints are deterministic and collision-free on the corpus") {
    val fp = TextQueries.textFingerprint(spark, dir).cache()
    val n = fp.count()
    assert(fp.select("fp64").distinct().count() == n, "xxhash64 collision on tiny corpus")
    assert(fp.select("rolling_fp").distinct().count() == n, "rolling hash collision on tiny corpus")
    // stable across runs
    val a = fp.orderBy("doc_id").limit(3).collect().toSeq
    val b = TextQueries.textFingerprint(spark, dir).orderBy("doc_id").limit(3).collect().toSeq
    assert(a == b)
    fp.unpersist()
  }

  test("rolling hash: identical normalized text hashes equal, different text differs") {
    import spark.implicits._
    val df = Seq("a b c", "a b c", "a b d").toDF("text")
      .select(TextFunctions.rollingHash(col("text")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) == hs(1) && hs(0) != hs(2))
  }

  test("quality score stays in [0,1] and penalizes word salad less than punct noise") {
    import spark.implicits._
    val q = TextQueries.textQuality(spark, dir)
    val bounds = q.agg(min("quality"), max("quality")).head()
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
    val probe = Seq(
      ("good", "the cat sat on the mat and it is a fine day in the sun"),
      ("noise", "@@@ ### $$$ %%% ^^^ &&& *** ((( )))")).toDF("k", "text")
      .select(col("k"), TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(probe("good") > probe("noise"))
  }

  test("langid flags CJK as zh and anglo text as en") {
    import spark.implicits._
    val out = Seq(("z", "中文文本"), ("e", "the cat and the dog"))
      .toDF("k", "text")
      .select(col("k"), TextFunctions.langId(col("text")).as("l"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("z") == "zh" && out("e") == "en")
  }

  test("bigram expansion handles short docs") {
    import spark.implicits._
    val out = Seq("one", "", "two words").toDF("text")
      .select(TextFunctions.wordNgrams(split(col("text"), " "), 2).as("bg"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).isEmpty && out(1).isEmpty && out(2) == Seq("two words"))
  }

  test("repetition score: repeated phrases raise the duplicate-bigram fraction") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "every word here appears exactly once"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val got = TextQueries.repetitionScore(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) > 0.7, s"heavy repetition must score high: ${got(1L)}")
    assert(got(2L) == 0.0 && got(3L) == 0.0)
  }

  test("pii scrub: counts and redacts emails, urls, long digit runs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "mail me at jo.doe+x@site.example.org or see https://ex.org/a?b=1 card 12345678901"),
      (2L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val rows = TextQueries.piiScrub(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    val hit = rows(1L)
    assert(hit.getInt(1) == 1 && hit.getInt(2) == 1 && hit.getInt(3) == 1)
    assert(hit.getString(4) == "mail me at <EMAIL> or see <URL> card <NUM>")
    val clean = rows(2L)
    assert(clean.getInt(1) == 0 && clean.getInt(2) == 0 && clean.getInt(3) == 0 &&
      clean.getString(4) == "nothing sensitive here")
  }

  test("chunking: windows cover every word with the configured overlap") {
    val s = spark
    import s.implicits._
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val chunks = TextQueries.chunkDocs(Seq((1L, text)).toDF("doc_id", "text"),
        chunkWords = 30, strideWords = 20)
      .orderBy("chunk_idx").collect()
    assert(chunks.length == 5) // starts at 1, 21, 41, 61, 81
    assert(chunks.forall(_.getInt(3) <= 30))
    assert(chunks.head.getString(2).startsWith("w1 w2") &&
      chunks.last.getString(2).endsWith("w100"))
    // consecutive chunks overlap by chunk - stride = 10 words
    val first = chunks(0).getString(2).split(" ")
    val second = chunks(1).getString(2).split(" ")
    assert(first.takeRight(10).sameElements(second.take(10)))
  }

  test("sequence packing: no pack exceeds budget by more than one straddling doc") {
    val P = graft.queries.PipelineQueries
    val packs = P.packSequences(spark, sf("any"))
      .groupBy("pack_id").agg(sum("n_tokens").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(packs.nonEmpty)
    // testdata has no oversized docs (max ~99 pre-tokens), so every
    // pack is a normal pack below the oversized offset and the
    // straddler bound holds
    assert(packs.forall(_._1 % P.PackBucketStride < P.PackOversizedOffset))
    assert(packs.forall(_._2 < 2 * 512),
      s"pack overflow beyond straddler bound: ${packs.map(_._2).max}")
  }

  test("sequence packing: oversized docs take a pack of their own and never shift normal packs") {
    import spark.implicits._
    val P = graft.queries.PipelineQueries
    val word = "alpha "
    // bucket 0 (doc_ids all ≡ 0 mod 1): two normal docs around an
    // oversized one — budget 10, the 25-token doc is oversized
    def doc(id: Long, n: Int) = (id, (word * n).trim)
    val docs = Seq(doc(1, 6), doc(2, 25), doc(3, 6), doc(4, 25), doc(5, 6))
      .toDF("doc_id", "text")
    val got = P.packSequencesDocs(docs, budget = 10, buckets = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(2))).toMap
    val overBase = P.PackOversizedOffset
    // oversized docs: own packs, in doc order, full honest n_tokens
    assert(got(2L) == (overBase, 25L), s"first oversized: ${got(2L)}")
    assert(got(4L) == (overBase + 1, 25L), s"second oversized: ${got(4L)}")
    // normal docs pack as if the oversized ones were absent:
    // cumsums 0, 6, 12 -> packs 0, 0, 1
    assert(got(1L)._1 == 0L && got(3L)._1 == 0L && got(5L)._1 == 1L,
      s"normal docs must ignore oversized neighbors: $got")
    // and removing the oversized docs changes nothing for the normal ones
    val without = P.packSequencesDocs(
      docs.filter(col("doc_id") =!= 2L && col("doc_id") =!= 4L),
      budget = 10, buckets = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(Seq(1L, 3L, 5L).forall(id => without(id) == got(id)._1))
  }

  test("pack buckets self-size from pre-token mass (auto == suggested; floor and cap hold)") {
    import spark.implicits._
    val P = graft.queries.PipelineQueries
    val docs = (0L until 50L).map(i => (i, "one two three four five"))
      .toDF("doc_id", "text")
    // 250 pre-tokens -> floor
    assert(P.resolvePackBuckets(docs, 0) == P.suggestPackBuckets(250L))
    assert(P.suggestPackBuckets(0L) == 16, "floor")
    assert(P.suggestPackBuckets(100L << 20) == 100, "~1M tokens per bucket")
    assert(P.suggestPackBuckets(Long.MaxValue / 4) == 4096, "cap")
    // explicit wins
    assert(P.resolvePackBuckets(docs, 7) == 7)
  }

  test("decontamination: flagged docs are outside the eval slice with positive overlap") {
    val rows = graft.queries.PipelineQueries.corpusDecontaminate(spark, sf("any")).collect()
    assert(rows.nonEmpty, "corpus plants near-dups across the eval slice")
    assert(rows.forall(r => r.getLong(0) % 23 != 0 && r.getLong(1) > 0))
  }

  test("ngram langid beats the word heuristic on stopword-free and short text") {
    import spark.implicits._
    import graft.functions.TextFunctions.langId
    // the word heuristic's blind spot, by construction: correct
    // sentences that avoid its stopword lists, plus short greetings —
    // it defaults them all to 'en'. The trigram scorer must not.
    val hard = Seq(
      (1L, "en", "tomorrow we will go shopping because we need fresh vegetables"),
      (2L, "de", "wir fahren morgen zum markt weil wir frisches gemüse brauchen"),
      (3L, "fr", "nous irons demain au marché pour acheter des légumes frais"),
      (4L, "es", "mañana iremos al mercado para comprar verduras frescas"),
      (5L, "de", "guten morgen alle zusammen"),
      (6L, "fr", "bonjour tout le monde"),
      (7L, "es", "buenos dias a todos"),
      (8L, "en", "good morning everyone"),
      (9L, "zh", "你好世界 这是一个测试")).toDF("doc_id", "lang", "text")
    val ngram = graft.queries.TextQueries.langIdNgram(hard)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val heur = hard.select(col("doc_id"), col("lang"), langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val truth = hard.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ngramAcc = truth.count { case (d, l) => ngram(d) == l }
    val heurAcc = truth.count { case (d, l) => heur(d) == l }
    info(s"hard-set accuracy: ngram $ngramAcc/9 vs word-heuristic $heurAcc/9")
    info(s"ngram predictions: ${ngram.toSeq.sortBy(_._1)}")
    assert(ngramAcc >= 8, s"trigram scorer must handle the hard set, got $ngramAcc/9: $ngram")
    assert(ngramAcc > heurAcc,
      s"trigram profiles must beat the stopword heuristic where it is blind: $ngramAcc vs $heurAcc")
    // and on text squarely inside the heuristic's envelope, both agree
    val easy = Seq(
      (10L, "en", "the cat and the dog it is with that"),
      (11L, "de", "der hund und die katze ist nicht ein problem mit"),
      (12L, "fr", "le chat et la maison est dans une rue"),
      (13L, "es", "el gato es una casa con los perros por que")).toDF("doc_id", "lang", "text")
    val easyNgram = graft.queries.TextQueries.langIdNgram(easy)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(easyNgram == Map(10L -> "en", 11L -> "de", 12L -> "fr", 13L -> "es"),
      s"ngram scorer must also get the heuristic's home turf right: $easyNgram")
  }

  test("bloom decontamination: identical flags even when the bloom false-positives; candidates shrink") {
    import graft.queries.PipelineQueries._
    val dir = sf("any")
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val (train, evals) =
      (docs.filter(col("doc_id") % 23 =!= 0), docs.filter(col("doc_id") % 23 === 0))
    def flags(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = flags(corpusDecontaminateDocs(train, evals, k = 5))
    // force false positives: a saturated filter (high fpp) makes most
    // grams "hit" — the exact-verify join must kill every one of them
    val saturated = flags(corpusDecontaminateDocsBloom(train, evals, k = 5, fpp = 0.4))
    assert(saturated == exact,
      "a false-positive-heavy bloom must still produce the exact form's flags")
    // and the production fpp too (the gate re-checks this vs DuckDB)
    assert(flags(corpusDecontaminateDocsBloom(train, evals, k = 5)) == exact)
    // the reduction claim: the prefilter passes a small fraction of
    // the corpus grams at the default fpp (true hits + ~0.1% FPs)
    val evalG = decontaminateGrams(evals, 5).select("sh").distinct()
    val bloom = evalG.stat.bloomFilter("sh", math.max(64L, evalG.count()), 0.001)
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
    val grams = decontaminateGrams(train, 5)
    val candidates = grams.filter(ofExpr(graft.functions.expr.BloomMightContain(
      toExpr(col("sh")), bytes.toByteArray))).count()
    val total = grams.count()
    val trueHits = grams.join(evalG, Seq("sh"), "left_semi").count()
    info(s"bloom prefilter: $candidates of $total grams pass ($trueHits true hits)")
    assert(candidates < total / 2,
      s"prefilter must prune most grams: $candidates of $total")
    assert(candidates >= trueHits, "prefilter must never drop a true hit")
  }

  test("boilerplate: grams counted once per doc, threshold respected") {
    import spark.implicits._
    val tpl = "subscribe to our newsletter for more"
    val docs = Seq(
      (1L, s"$tpl article one body text"),
      (2L, s"$tpl another piece of content"),
      (3L, s"$tpl third completely different story"),
      // doc with the template REPEATED — must still count as one doc
      (4L, s"unrelated $tpl middle words $tpl end words here"),
      (5L, "no template in this one at all right"))
      .toDF("doc_id", "text")
    // mirror the query's gram construction at n=5 on a local frame
    val grams = docs.select(explode(array_distinct(
        graft.functions.TextFunctions.wordNgrams(split(col("text"), " "), 5))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= 3)
      .as[(String, Long)].collect().toMap
    // the 6-word template yields two 5-gram windows present in docs 1-4
    assert(grams.keySet.exists(_.startsWith("subscribe to our newsletter")), s"got $grams")
    grams.foreach { case (g, df) => assert(df <= 4, s"gram '$g' overcounted: $df") }
    val gateRows = graft.queries.TextQueries.textBoilerplate(spark, sf("any")).collect()
    assert(gateRows.nonEmpty, "gate corpus has planted near-dups sharing 5-grams")
  }

  test("quality model: sum semantics — uniform weights scale with gram count, sign sets keep") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta")).toDF("doc_id", "text")
    val B = graft.queries.PipelineQueries.DsirBuckets
    // 3 words -> 3 unigrams + 2 bigrams = 5 grams; 1 word -> 1 gram
    val plus = graft.queries.TextQueries
      .qualityModelScore(docs, Array.fill(B)(5L)).orderBy("doc_id").collect()
    assert(plus.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq((1L, 5L, 25L, true), (2L, 1L, 5L, true)))
    val minus = graft.queries.TextQueries
      .qualityModelScore(docs, Array.fill(B)(-1L)).orderBy("doc_id").collect()
    assert(minus.map(r => (r.getLong(2), r.getBoolean(3))).toSeq ==
      Seq((-5L, false), (-1L, false)))
  }

  test("quality model: gramless docs carry no evidence and are excluded; bad table loud") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, ""), (3L, "12345 !!")).toDF("doc_id", "text")
    val B = graft.queries.PipelineQueries.DsirBuckets
    val out = graft.queries.TextQueries.qualityModelScore(docs, Array.fill(B)(1L)).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    val e = intercept[IllegalArgumentException] {
      graft.queries.TextQueries.qualityModelScore(docs, Array.fill(7)(1L))
    }
    assert(e.getMessage.contains("feature buckets"))
  }

  test("quality model gate entry: stand-in weights exercise both sides of the keep boundary") {
    val out = graft.queries.TextQueries.textQualityModel(spark, sf("any")).collect()
    assert(out.nonEmpty)
    val kept = out.count(_.getBoolean(3))
    assert(kept > 0 && kept < out.length,
      s"stand-in model must split the corpus, kept $kept of ${out.length}")
    // keep is definitionally sum >= 0 -- a drift between column and
    // predicate would silently re-label the corpus
    assert(out.forall(r => r.getBoolean(3) == (r.getLong(2) >= 0L)))
  }
}
