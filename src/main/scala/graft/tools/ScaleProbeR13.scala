package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: round-13 scale measurements for PLANS.md — not gate input.
  *
  * Arms (independently runnable; delete inputs between arms — the
  * sandbox disk budget rule from the r12 probe):
  *
  *  - `deltaprep` / `deltas` — the VERDICT-r12 #1 measurement: delta
  *    clean cost across THREE delta sizes against one seeded history,
  *    plus a candidates() bloom-prefilter A/B on the largest delta
  *    (`SigIndex.bloomPrefilter` off reproduces the r12 full-shuffle
  *    join on identical data/batch — replay idempotency makes the
  *    re-run with the same batchId read the same history view).
  *  - `warm` — the SQ8 warm-serving cache (VERDICT-r12 #4): cold vs
  *    warm topKRerankIndexed vs exact re-rank walls at 2M clustered
  *    vectors (bench_scratch/sf100c).
  *  - `ann` — the ANN decade completion (VERDICT-r12 #7): PqIndex
  *    build / CDC add / plain topK / SQ8 re-rank walls + recall at
  *    the candMult rule's predicted operating point, at the largest
  *    clustered vector corpus that fits (20M × 64-dim).
  *
  * {{{ runMain graft.tools.ScaleProbeR13 deltaprep bench_scratch/sf200 /tmp/graft_r13probe }}}
  * {{{ runMain graft.tools.ScaleProbeR13 deltas    bench_scratch/sf200 /tmp/graft_r13probe }}}
  * {{{ runMain graft.tools.ScaleProbeR13 warm      bench_scratch/sf100c /tmp/graft_r13probe }}}
  * {{{ runMain graft.tools.ScaleProbeR13 ann       bench_scratch/sf1000v /tmp/graft_r13probe }}}
  */
object ScaleProbeR13 {
  def main(args: Array[String]): Unit = {
    val arm = args.headOption.getOrElse("warm")
    val dataDir = if (args.length > 1) args(1) else "bench_scratch/sf100c"
    val out = if (args.length > 2) args(2) else "/tmp/graft_r13probe"
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val hconf = spark.sparkContext.hadoopConfiguration
    def rm(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).delete(hp, true)
    }
    def bytesOf(p: String): Long = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(hconf)
      if (fs.exists(hp)) fs.getContentSummary(hp).getLength else 0L
    }
    def timed[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[r13probe] $name: $sec%.2f s")
      (r, sec)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    arm match {
      // ---- delta clean cost vs delta size ----
      // Slices: seed = ids below the cap outside the held-out delta
      // ranges; three id-disjoint deltas of 1x / 4x / 16x the base
      // size. All from one ScaleGen corpus (pass its dir).
      case "deltaprep" =>
        rm(s"$out/deltas")
        val srcD = if (dataDir.endsWith(".parquet")) dataDir
          else s"$dataDir/documents.parquet"
        val docs = spark.read.parquet(srcD).select("doc_id", "lang", "text")
        val n = docs.count()
        val unit = sys.env.getOrElse("SPARK_GRAFT_DELTA_UNIT", "50000").toLong
        // deltas take the TOP 21 units of the id space (1+4+16), seed
        // is everything below — id-disjoint by construction
        val deltaBase = n - 21L * unit
        require(deltaBase > 0, s"corpus too small: $n docs for unit $unit")
        docs.filter(col("doc_id") < deltaBase)
          .write.mode("overwrite").parquet(s"$out/deltas/seed.parquet")
        Seq(("d1", deltaBase, deltaBase + unit),
            ("d4", deltaBase + unit, deltaBase + 5 * unit),
            ("d16", deltaBase + 5 * unit, deltaBase + 21 * unit))
          .foreach { case (tag, lo, hi) =>
            docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
              .write.mode("overwrite").parquet(s"$out/deltas/$tag.parquet")
          }
        println(s"[r13probe] deltaprep: seed ${deltaBase} docs, unit $unit")
      case "deltas" =>
        val P = graft.queries.PipelineQueries
        rm(s"$out/deltas/sig")
        val index = new graft.streaming.SigIndex(spark, s"$out/deltas/sig",
          idCol = "doc_id")
        def clean(p: String, batch: Long): (Long, Double) = {
          val docs = spark.read.parquet(p).select("doc_id", "lang", "text")
          val nd = docs.count()
          val (kept, sec) = timed(s"clean $p ($nd docs, batch $batch)")(
            P.corpusCleanIncremental(docs, index, batch).count())
          println(f"[r13probe]   -> $kept kept, ${sec * 1000 / nd}%.3f ms/doc " +
            s"(pruneDead=${index.lastCandidateProbe._1} " +
            s"predRead=${index.lastCandidateProbe._2})")
          (nd, sec)
        }
        clean(s"$out/deltas/seed.parquet", 1L)
        println(s"[r13probe] state after seed: sig=${bytesOf(s"$out/deltas/sig")}")
        clean(s"$out/deltas/d1.parquet", 2L)
        clean(s"$out/deltas/d4.parquet", 3L)
        clean(s"$out/deltas/d16.parquet", 4L)
        // candidates() A/B on the largest delta: the bloom prefilter's
        // shuffle cut, isolated. Same batchId both ways — replays read
        // the same history view (batch-own rows excluded).
        import graft.dedup.Dedup
        val d16 = spark.read.parquet(s"$out/deltas/d16.parquet")
        val bNew = d16
          .select(col("doc_id"),
            Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 128).as("sig"))
          .withColumn("bh", Dedup.bandHashes(col("sig"), 16, 8))
          .select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "h")))
          .localCheckpoint()
        for (on <- Seq(false, true, false, true)) {
          index.bloomPrefilter = on
          timed(s"candidates d16, bloomPrefilter=$on")(
            index.candidates(bNew, 4L).count())
        }

      // ---- candidates() bloom A/B only (state from a prior `deltas` run) ----
      case "deltaab" =>
        import graft.dedup.Dedup
        val index = new graft.streaming.SigIndex(spark, s"$out/deltas/sig",
          idCol = "doc_id")
        val d16 = spark.read.parquet(s"$out/deltas/d16.parquet")
        val bNew = d16
          .select(col("doc_id"),
            Dedup.minhashSignature(Dedup.shingles(col("text"), 3), 128).as("sig"))
          .withColumn("bh", Dedup.bandHashes(col("sig"), 16, 8))
          .select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "h")))
          .localCheckpoint()
        println(s"[r13probe] d16 band keys: ${bNew.count()}")
        for (on <- Seq(false, true, false, true)) {
          index.bloomPrefilter = on
          timed(s"candidates d16, bloomPrefilter=$on")(
            index.candidates(bNew, 4L).count())
        }

      // ---- SQ8 warm-serving cache ----
      case "warm" =>
        rm(s"$out/warm")
        val vecs = spark.read.parquet(s"$dataDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
        val nv = vecs.count()
        println(s"[r13probe] clustered vectors: $nv")
        val queries = vecs.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
          .orderBy("h").limit(100).drop("h").cache()
        queries.count()
        val idx = new graft.similarity.PqIndex(spark, s"$out/warm/idx", sq8 = true)
        timed(s"build with SQ8 tier ($nv vecs)")(idx.build(vecs))
        val warm = new graft.similarity.PqIndex(spark, s"$out/warm/idx",
          sq8 = true, warmRerank = true)
        val cm = 256
        (1 to 3).foreach { it =>
          timed(s"COLD SQ8 rerank, 100 q, candMult=$cm (iter $it)")(
            noop(idx.topKRerankIndexed(queries, 10, cm)))
        }
        (1 to 3).foreach { it =>
          timed(s"WARM SQ8 rerank, 100 q, candMult=$cm (iter $it)")(
            noop(warm.topKRerankIndexed(queries, 10, cm)))
        }
        (1 to 3).foreach { it =>
          timed(s"EXACT rerank (cached raw table), 100 q, candMult=$cm (iter $it)")(
            noop(idx.topKRerank(queries, vecs, 10, cm)))
        }
        warm.releaseWarmCache()

      // ---- ANN decade: build/add/serve at the largest fitting corpus ----
      case "ann" =>
        rm(s"$out/ann")
        val all = spark.read.parquet(s"$dataDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val nAll = all.count()
        // hold out the top 1% of ids as the CDC delta
        val cut = nAll - nAll / 100
        val corpus = all.filter(col("id") < cut)
        val delta = all.filter(col("id") >= cut)
        val nv = corpus.count()
        println(s"[r13probe] vectors: $nv build + ${nAll - nv} delta " +
          s"(raw bytes ${bytesOf(s"$dataDir/embeddings.parquet")})")
        // SPARK_GRAFT_ANN_FITN sizes the coarse k-means fit sample
        // (0 = the 20k default, which CAPS the auto cell count —
        // suggestNCells can't exceed what the sample supports)
        val fitN = sys.env.getOrElse("SPARK_GRAFT_ANN_FITN", "0").toInt
        val idx = new graft.similarity.PqIndex(spark, s"$out/ann/idx", sq8 = true,
          fitSampleN = fitN)
        timed(s"build with SQ8 tier ($nv vecs, auto layout, fitN=$fitN)")(
          idx.build(corpus))
        idx.describe().foreach { case (k, v) => println(s"[r13probe] idx $k=$v") }
        println(s"[r13probe] bytes codes=${bytesOf(s"$out/ann/idx/codes")} " +
          s"sq8=${bytesOf(s"$out/ann/idx/sq8")}")
        timed(s"CDC add (${nAll - nv} vecs)")(idx.add(delta))
        val queries = corpus.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
          .orderBy("h").limit(100).drop("h").cache()
        queries.count()
        (1 to 2).foreach { it =>
          timed(s"plain topK, 100 q (iter $it)")(noop(idx.topK(queries, 10)))
        }
        // the candMult rule's predicted operating point on this
        // corpus: modeSize/topK = (n/1024)/10
        val cmRule = math.max(8, (nAll / 1024 / 10).toInt)
        for (cm <- Seq(cmRule / 4, cmRule)) {
          (1 to 2).foreach { it =>
            timed(s"SQ8 rerank, 100 q, candMult=$cm (iter $it)")(
              noop(idx.topKRerankIndexed(queries, 10, cm)))
          }
        }
        val (bf, _) = timed("brute-force ground truth, 100 q")(
          graft.similarity.Similarity.bruteForceTopK(queries, all, 10).cache())
        bf.count()
        println(f"[r13probe] plain recall@10: ${
          graft.similarity.Similarity.recall(idx.topK(queries, 10), bf)}%.3f")
        for (cm <- Seq(cmRule / 4, cmRule))
          println(f"[r13probe] SQ8-rerank recall@10 candMult=$cm: ${
            graft.similarity.Similarity.recall(
              idx.topKRerankIndexed(queries, 10, cm), bf)}%.3f")

      case other => sys.error(s"unknown arm '$other' (deltaprep|deltas|deltaab|warm|ann)")
    }
    spark.stop()
  }
}
