package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** corpus_mix: deterministic domain rebalancing toward equal
  * per-language token shares. Runs at sf0.01 — the budget is sized so
  * that corpus splits the languages across BOTH branches (some clamp
  * at keep-rate 1, some downsample); sf0.001 is too small to
  * exercise the downsample path at all. */
class PipelineMixSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  test("mix: under-budget langs kept whole, over-budget langs downsampled toward their slice") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(graft.functions.TextFunctions.bpeTokens(col("text"))).cast("long").as("n_tokens"))
    val supply = docs.groupBy("lang")
      .agg(sum("n_tokens").as("lang_tokens"), count(lit(1)).as("n_docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val slice = PipelineQueries.MixBudgetTokens.toDouble / supply.size

    val kept = PipelineQueries.corpusMix(spark, dir)
    val keptByLang = kept.groupBy("lang")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    // the budget must actually split the branches on this corpus, or
    // the test is vacuous
    assert(supply.exists { case (_, (t, _)) => t <= slice },
      "no language under budget — resize MixBudgetTokens")
    assert(supply.exists { case (_, (t, _)) => t > slice },
      "no language over budget — resize MixBudgetTokens")

    supply.foreach { case (lang, (langTokens, nDocs)) =>
      val (kt, kn) = keptByLang(lang)
      if (langTokens <= slice) {
        assert(kn == nDocs, s"$lang under budget must be kept whole")
        assert(kt == langTokens)
      } else {
        assert(kn < nDocs, s"$lang over budget must be downsampled")
        // multiply-shift residues are uniform enough that the kept
        // token mass lands near the slice (loose band — it's a
        // per-doc Bernoulli sample, not an exact knapsack)
        assert(kt > slice * 0.5 && kt < slice * 1.6,
          s"$lang kept $kt tokens vs slice $slice")
      }
    }

    // pure function of the row key: byte-identical across runs
    val again = PipelineQueries.corpusMix(spark, dir)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
  }

  test("mix: null-lang docs kept whole outside the budget; labeled decisions unchanged (both forms)") {
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    // strip the label from a deterministic third of the corpus — the
    // lang-less-crawl shape every mix form must now survive: null-lang
    // docs are KEPT WHOLE (no threshold applies) and the labeled
    // languages decide exactly as if the unlabeled docs were absent
    // (they take no budget share)
    val partial = docs.withColumn("lang",
      when(pmod(col("doc_id"), lit(3)) === 0, lit(null).cast("string"))
        .otherwise(col("lang")))
    val nNull = partial.filter(col("lang").isNull).count()
    assert(nNull > 0)
    val forms: Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame] =
      Seq(
        d => PipelineQueries.corpusMixDocs(d, PipelineQueries.MixBudgetTokens),
        d => PipelineQueries.corpusMixTemperatureDocs(d,
          PipelineQueries.MixBudgetTokens, PipelineQueries.MixAlpha))
    forms.foreach { mix =>
      val kept = mix(partial)
      assert(kept.filter(col("lang").isNull).count() == nNull,
        "every null-lang doc must survive the mix")
      val labeledAlone = mix(partial.filter(col("lang").isNotNull))
      val keptLabeled = kept.filter(col("lang").isNotNull)
      assert(keptLabeled.exceptAll(labeledAlone).isEmpty &&
        labeledAlone.exceptAll(keptLabeled).isEmpty,
        "labeled docs must decide as if the unlabeled docs were absent")
    }
  }

  test("select-budget: greedy quality prefix per language, straddler-bounded overflow") {
    val sel = PipelineQueries.corpusSelectBudget(spark, dir).cache()
    val budget = PipelineQueries.SelectBudgetTokens
    // every kept row respects the strict preceding-mass rule
    assert(sel.filter(col("tokens_before") >= budget).count() == 0)
    // overflow is bounded by the one straddling doc
    val spent = sel.groupBy("lang").agg(
      sum("n_tokens").as("t"), max("n_tokens").as("maxDoc"),
      count(lit(1)).as("kept")).collect()
    spent.foreach { r =>
      assert(r.getLong(1) < budget + r.getLong(2),
        s"${r.getString(0)}: kept ${r.getLong(1)} tokens vs budget $budget")
    }
    // the kept set is a quality PREFIX: min kept quality >= max dropped
    // quality per language (modulo the shared-boundary tie)
    val docs = PipelineQueries.corpusSelectBudget(spark, dir)
      .select("lang", "quality").groupBy("lang").agg(min("quality").as("minKept"))
    val all = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
    val dropped = all.join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("lang").agg(max("quality").as("maxDropped"))
    docs.join(dropped, Seq("lang")).collect().foreach { r =>
      assert(r.getDouble(1) >= r.getDouble(2) - 1e-12,
        s"${r.getString(0)}: kept set must be a quality prefix")
    }
    sel.unpersist()
  }

  test("pruned select-budget: bit-identical to exact, and the pre-filter actually prunes") {
    val exact = PipelineQueries.corpusSelectBudget(spark, dir)
    val pruned = PipelineQueries.corpusSelectBudgetPruned(spark, dir)
    assert(exact.exceptAll(pruned).isEmpty && pruned.exceptAll(exact).isEmpty,
      "the histogram-thresholded path must produce the exact selection, ranks included")
    // the claim isn't just equality — the PRE-WINDOW filter must admit
    // fewer docs than the over-supplied languages hold (en/zh truncate
    // at SelectBudgetTokens by construction of the sf0.01 fixture)
    val scored = PipelineQueries.selectBudgetScored(spark, dir)
    val edges = PipelineQueries.selectBudgetEdges(spark, scored)
    val counts = scored.join(broadcast(edges), Seq("lang"))
      .groupBy("lang").agg(
        count(lit(1)).as("total"),
        sum(when(col("quality") >= col("qmin"), 1L).otherwise(0L)).as("admitted"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Seq("en", "zh").foreach { lang =>
      val (total, admitted) = counts(lang)
      assert(admitted < total,
        s"$lang: the quality edge must prune the window input ($admitted of $total admitted)")
    }
  }

  test("split: exhaustive, near-target fractions, and stable under corpus growth") {
    val sp = PipelineQueries.corpusSplit(spark, dir).cache()
    val total = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(sp.count() == total, "every doc gets exactly one split")
    val byS = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet.subsetOf(Set("train", "val", "test")))
    // 2%/2% targets; a 500-doc corpus gives coarse sampling noise, so
    // bound loosely — the REAL property is determinism + stability
    assert(byS("train") > total * 9 / 10, s"train must dominate: $byS")
    assert(byS.getOrElse("val", 0L) > 0 && byS.getOrElse("test", 0L) > 0,
      s"held-out splits must be populated at sf0.01: $byS")
    // stability: a doc's split is a pure function of its id — the same
    // doc in a HALVED corpus keeps its assignment (no leakage as the
    // corpus accretes)
    val full = sp.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    sp.unpersist()
    val halfDir = java.nio.file.Files.createTempDirectory("graft_split").toString
    graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 0)
      .write.parquet(s"$halfDir/documents.parquet")
    PipelineQueries.corpusSplit(spark, halfDir).collect().foreach { r =>
      assert(full(r.getLong(0)) == r.getString(2),
        s"doc ${r.getLong(0)} changed split when the corpus shrank")
    }
  }

  test("temperature mix: alpha=0 is exactly the equal-share mix, to the last document") {
    val s = spark
    import s.implicits._
    val toked = (0L until 5000L).map(i => (i, if (i % 10 == 0) "tl" else "hd", 1L))
      .toDF("doc_id", "lang", "n_tokens")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // w = t^0 = 1 for every lang makes the share budget/n_langs --
    // bitwise the same keep threshold as corpusMix's formula
    val uniform = ids(PipelineQueries.corpusMixFromToked(toked, 600L))
    val temp0 = ids(PipelineQueries.corpusMixTemperatureFromToked(toked, 600L, 0.0))
    assert(temp0 == uniform)
  }

  test("temperature mix: a zero-token language keeps all its docs, matching corpusMix's clamp") {
    val s = spark
    import s.implicits._
    // "zz" contributes 0 tokens: w(0)/sumW/0 is NaN for alpha > 0, and
    // an unguarded floor(NaN*mod) = 0 silently dropped the language
    // (corpusMix's Inf rate clamps the same case to keep-all)
    val toked = ((0L until 1000L).map(i => (i, "en", 5L)) ++
      (2000L until 2020L).map(i => (i, "zz", 0L)))
      .toDF("doc_id", "lang", "n_tokens")
    val kept = PipelineQueries.corpusMixTemperatureFromToked(toked, 600L, 0.5)
      .filter(col("lang") === "zz").count()
    assert(kept == 20L, s"zero-token language must be kept whole, got $kept of 20")
    // the all-empty corpus keeps everything rather than dropping everything
    val empty = (0L until 10L).map(i => (i, "en", 0L)).toDF("doc_id", "lang", "n_tokens")
    assert(PipelineQueries.corpusMixTemperatureFromToked(empty, 600L, 0.5).count() == 10L)
  }

  test("temperature mix: alpha interpolates tail shares between uniform and proportional") {
    val s = spark
    import s.implicits._
    // head: 9000 docs x 1 token, tail: 1000 docs x 1 token; budget 2000
    // tail keep fraction: alpha=0 -> min(1, 1000/1000)=1.0;
    // alpha=0.5 -> share 2000*(sqrt1000/(sqrt9000+sqrt1000)) = 500 -> 0.5;
    // alpha=1 -> share 200 -> 0.2. Strictly decreasing in alpha.
    val toked = ((0L until 9000L).map(i => (i, "hd", 1L)) ++
      (10000L until 11000L).map(i => (i, "tl", 1L)))
      .toDF("doc_id", "lang", "n_tokens")
    def tailFrac(alpha: Double): Double =
      PipelineQueries.corpusMixTemperatureFromToked(toked, 2000L, alpha)
        .filter(col("lang") === "tl").count().toDouble / 1000.0
    val (f0, f05, f1) = (tailFrac(0.0), tailFrac(0.5), tailFrac(1.0))
    assert(f0 > 0.95, s"uniform shares keep the whole tail: $f0")
    assert(math.abs(f05 - 0.5) < 0.06, s"sqrt shares keep ~half the tail: $f05")
    assert(math.abs(f1 - 0.2) < 0.05, s"proportional shares keep ~a fifth: $f1")
    assert(f0 > f05 && f05 > f1, "tail share must fall as alpha rises")
    // and the head moves the other way (fractions, not absolute docs)
    def headFrac(alpha: Double): Double =
      PipelineQueries.corpusMixTemperatureFromToked(toked, 2000L, alpha)
        .filter(col("lang") === "hd").count().toDouble / 9000.0
    assert(headFrac(0.0) < headFrac(0.5) && headFrac(0.5) < headFrac(1.0))
  }

  test("temperature mix gate entry: deterministic, keep fraction anti-monotone in language size") {
    val a = PipelineQueries.corpusMixTemperature(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val b = PipelineQueries.corpusMixTemperature(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    // the property temperature shares promise: keep FRACTION is
    // anti-monotone in language size — the biggest language is
    // downsampled hardest, the smallest kept at the highest rate,
    // and the gate budget separates them by a wide margin
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val perLang = PipelineQueries.corpusMixTemperature(spark, dir)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fracs = totals.map { case (l, n) => n -> (perLang.getOrElse(l, 0L).toDouble / n) }
      .toSeq.sortBy(_._1)
    assert(fracs.head._2 > fracs.last._2 + 0.2,
      s"smallest language must keep a much higher fraction than the biggest: $fracs")
  }

  test("corpus_sample_k: deterministic per-language pull; growth only displaces the tail") {
    val s = spark
    import s.implicits._
    def ordOf(id: Long) = ((id % 2147483647L) * 48271L + 11L) % 2147483647L
    val docs = (1L to 40L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val k = 3
    def sample(df: org.apache.spark.sql.DataFrame): Set[(String, Long, Long)] =
      PipelineQueries.sampleKDocs(df, k).collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(0))).toSet
    val s1 = sample(docs)
    assert(s1 == sample(docs), "re-runs must produce the identical sample")
    assert(s1.count(_._1 == "en") == k && s1.count(_._1 == "de") == k,
      s"exactly k rows per language: $s1")
    // the sample is the residue-order prefix — verify against a pure
    // Scala replay of the order
    val curEn = (2L to 40L by 2).sortBy(id => (ordOf(id), id)).take(k)
    assert(s1.filter(_._1 == "en") ==
      curEn.zipWithIndex.map { case (id, i) => ("en", (i + 1).toLong, id) }.toSet, s1)
    // monotone growth: a doc ordering past rank k changes nothing; a
    // doc ordering first enters at rank 1, shifts ranks 1..k-1 down,
    // and drops exactly the former rank-k doc
    // the affine map only wraps past id ≈ 2^31/48271 ≈ 44.5k, so a
    // low-ord candidate needs a wide search range
    val hi = (42L to 500000L by 2).find(id => ordOf(id) > ordOf(curEn.last)).get
    val lo = (42L to 500000L by 2).find(id => ordOf(id) < ordOf(curEn.head)).get
    assert(sample(docs.union(Seq((hi, "en")).toDF("doc_id", "lang"))) == s1,
      "a new doc past rank k must not change the sample")
    val withLo = sample(docs.union(Seq((lo, "en")).toDF("doc_id", "lang")))
    val expectedEn = Set(("en", 1L, lo)) ++
      curEn.take(k - 1).zipWithIndex.map { case (id, i) => ("en", (i + 2).toLong, id) }
    assert(withLo.filter(_._1 == "en") == expectedEn,
      s"displacement must be exactly one doc at the tail: $withLo")
    assert(withLo.filter(_._1 == "de") == s1.filter(_._1 == "de"),
      "the other language's sample is untouched")
  }

  test("tokens=bpe pricing: a high-fertility language buys fewer documents than under pre-token pricing") {
    val s = spark
    import s.implicits._
    // lang "lo": single-letter words — fertility 1 by construction
    // (a 1-char pre-token IS one BPE token under any model). lang
    // "hi": rare consonant runs the builtin English-ish model has no
    // merges for — each pre-token shatters into many tokens. Equal
    // PRE-token supply (100 docs × 20 words each), so pre-token
    // pricing sees two identical languages.
    val docs = ((1L to 100L).map(i => (i, "lo", Seq.fill(20)("a").mkString(" "))) ++
      (101L to 200L).map(i => (i, "hi", Seq.fill(20)("zqxvwkjq").mkString(" "))))
      .toDF("doc_id", "lang", "text")
    // sanity: the fixture really is high-fertility (else the test
    // passes vacuously when the builtin model changes)
    val fert = PipelineQueries.tokenizeDocsBpe(docs).groupBy("lang")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fert("hi") >= 4 * fert("lo"),
      s"fixture must diverge in fertility: $fert")
    val budget = 4000L // = the two languages' exact pre-token supply
    def keptPerLang(toked: org.apache.spark.sql.DataFrame): Map[String, Long] =
      PipelineQueries.corpusMixFromToked(toked, budget)
        .groupBy("lang").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pre = keptPerLang(PipelineQueries.tokenizeDocs(docs))
    val bpe = keptPerLang(PipelineQueries.tokenizeDocsBpe(docs))
    assert(pre("hi") == 100L && pre("lo") == 100L,
      s"pre-token pricing sees identical supplies and keeps both whole: $pre")
    assert(bpe("lo") == 100L, s"fertility-1 language is unaffected: $bpe")
    assert(bpe.getOrElse("hi", 0L) < 50L,
      s"BPE pricing must shrink the high-fertility language's doc count: $bpe")
    // the CLI knob drives the same path; a misdirected value refuses
    val base = java.nio.file.Files.createTempDirectory("graft_mixbpe").toString
    docs.write.parquet(s"$base/docs.parquet")
    graft.Main.runPipeline(spark, Seq("corpus-mix", s"in=$base/docs.parquet",
      s"out=$base/out", s"budget=$budget", "tokens=bpe"))
    val cliHi = spark.read.parquet(s"$base/out")
      .filter(col("lang") === "hi").count()
    assert(cliHi == bpe.getOrElse("hi", 0L), s"CLI tokens=bpe == library form: $cliHi")
    val eTok = intercept[RuntimeException](graft.Main.runPipeline(spark,
      Seq("corpus-mix", s"in=$base/docs.parquet", s"out=$base/out2", "tokens=words")))
    assert(eTok.getMessage.contains("tokens="), eTok.getMessage)
  }

  test("corpus_sample_k_pruned: bit-identical to the exact form; the edge prunes the dominant language's window input") {
    val s = spark
    import s.implicits._
    // heavily skewed mix — the 100 TB shape the pruned form exists
    // for: one dominant language, one modest, one below k
    val docs = ((1L to 5000L).map(i => (i, "en")) ++
      (5001L to 5040L).map(i => (i, "de")) ++
      Seq((9001L, "fr"), (9002L, "fr")))
      .toDF("doc_id", "lang")
    val k = 3
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val exact = rows(PipelineQueries.sampleKDocs(docs, k))
    val pruned = rows(PipelineQueries.sampleKDocsPruned(docs, k))
    assert(pruned == exact, s"pruned must be bit-identical to exact:\n$pruned\n$exact")
    // below-k language keeps everything (edge = keep-all)
    assert(exact.count(_._2 == "fr") == 2, exact)
    // the proof obligation the gate can't see: the prefilter actually
    // prunes — the dominant language's window input is ≈k, not 5000
    val scored = docs.select(col("doc_id"), col("lang"),
      expr("pmod(pmod(doc_id, 2147483647) * 48271 + 11, 2147483647)").as("ord"))
    val edges = PipelineQueries.sampleKEdges(spark, scored, k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val enSurvivors = scored.filter(col("lang") === "en")
      .filter(col("ord") < edges("en")).count()
    assert(enSurvivors >= k && enSurvivors < 100,
      s"edge must shrink the en window input from 5000 to ≈k: $enSurvivors")
    assert(edges("fr") == 2147483647L,
      s"below-k supply keeps the whole language: ${edges("fr")}")
    // null-lang bit-identity (r11 review): the exact form's window
    // treats NULL as its own partition, so the pruned form's edge
    // join must be null-safe — a plain equi-join silently returned
    // zero null-lang rows where the exact form returns k
    val withNulls = docs.unionByName(
      (7001L to 7020L).map(i => (i, null: String)).toDF("doc_id", "lang"))
    def rowsN(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val exactN = rowsN(PipelineQueries.sampleKDocs(withNulls, k))
    assert(exactN.count(_._2 == null) == k, s"fixture: null lang is a partition: $exactN")
    assert(rowsN(PipelineQueries.sampleKDocsPruned(withNulls, k)) == exactN,
      "pruned must stay bit-identical on a lang-less (null) group")
  }
}
