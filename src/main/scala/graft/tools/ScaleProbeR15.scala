package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: round-15 scale measurements for PLANS.md — not gate input.
  *
  * Arms (independently runnable; delete inputs between arms — the
  * sandbox disk budget rule):
  *
  *  - `textcdc` — the r14-VERDICT #3 measurement: warm lexical serving
  *    under FREQUENT CDC. A serve-shaped loop interleaves a small add
  *    (5k docs) before EVERY 100-query batch at 5M docs, A/B'd against
  *    the no-CDC warm loop and the cold path. Whole-store invalidation
  *    predicts per-batch ≈ cache rebuild (~47 s at r14) + search —
  *    WORSE than cold; the file-grained delta cache (r15) should bring
  *    an append-only add's invalidation cost down to reading the delta
  *    files only.
  *  - `ann500` — the ladder's fifth point (r14-VERDICT #7): ≥500M
  *    dim-16 clustered vectors, CODES-ONLY via streaming encode — the
  *    input frame synthesizes [[ScaleGen.embVec]] per row inside the
  *    scan, so raw vectors never touch disk (only the 8 B/vec codes +
  *    16 B/vec SQ8 tier do, ~12 GB at 500M). Build + CDC add 200k +
  *    warm SQ8 serve at the candMult rule's cm ≈ modeSize/topK,
  *    recall@10 vs full brute force (the corpus re-synthesizes inside
  *    the brute-force scan too — two extra synthesis passes instead of
  *    32 GB of parquet).
  *  - `anncdc` — the textcdc measurement's VECTOR twin: warm SQ8
  *    serving with a fresh-keyed 100k CDC add before every 100-query
  *    batch at 20M vectors, A/B'd against no-CDC warm and cold. The
  *    file-grained sidecar cache should layer each add's delta files
  *    instead of paying a whole-sidecar re-read per batch.
  *  - `servepar` — serve-loop concurrency: 8 identical 5-query hybrid
  *    batches at 5M docs + 2M vectors answered by `Main serve` at
  *    parallel=1 vs parallel=4 (bracketed 1 → 4 → 1), warm=false so
  *    both walls are pure loop mechanics. Small batches are the
  *    overlap regime: their stages can't fill the cores, so walls are
  *    per-job fixed costs. Parity-checked parallel == sequential.
  *  - `textcap` — the warm cache's layer-cap transition at 5M docs:
  *    12 fresh-keyed adds with a warm batch after each cross the
  *    8-layer cap repeatedly; the LSM merge should keep cap-batches
  *    at the layered wall (the first cut paid a ~66 s whole-store
  *    rebuild there). Parity-checked against cold after the merges.
  *
  * {{{ runMain graft.tools.ScaleGen /root/testdata/sf0.1 bench_scratch/sf1000 1000 corpus-only }}}
  * {{{ runMain graft.tools.ScaleProbeR15 textcdc bench_scratch/sf1000 /tmp/graft_r15probe }}}
  * {{{ runMain graft.tools.ScaleProbeR15 ann500 unused /tmp/graft_r15probe }}}
  *    (SPARK_GRAFT_ANN_N overrides the 500M default)
  */
object ScaleProbeR15 {
  def main(args: Array[String]): Unit = {
    val arm = args.headOption.getOrElse("textcdc")
    val dataDir = if (args.length > 1) args(1) else "bench_scratch/sf1000"
    val out = if (args.length > 2) args(2) else "/tmp/graft_r15probe"
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val hconf = spark.sparkContext.hadoopConfiguration
    def rm(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).delete(hp, true)
    }
    def timed[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[r15probe] $name: $sec%.2f s")
      (r, sec)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    arm match {
      // ---- warm lexical serving under frequent CDC at 5M docs ----
      case "textcdc" =>
        rm(s"$out/textcdc")
        val docs = spark.read.parquet(s"$dataDir/documents.parquet")
          .select("doc_id", "text")
        val n = docs.count()
        println(s"[r15probe] docs: $n")
        val idxDir = s"$out/textcdc/idx"
        val build = new graft.similarity.TextIndex(spark, idxDir)
        timed(s"build ($n docs)")(build.build(docs))
        val qs = docs.select(col("doc_id"), col("text"),
            xxhash64(col("doc_id")).as("h"))
          .orderBy("h").limit(100).collect().zipWithIndex.map { case (r, i) =>
            (i, r.getString(1).split(' ').filter(_.startsWith("w")).take(2).mkString(" "))
          }.toSeq
        val queries = qs.toDF("query_id", "qtext").localCheckpoint()
        // fresh-keyed 5k-doc deltas (ids far above the corpus — the
        // store's insert fast path appends files, no bucket rewrite)
        def delta(i: Int) = docs.limit(5000)
          .withColumn("doc_id", col("doc_id") + lit(100000000L + i * 1000000L))
          .localCheckpoint()
        val warm = new graft.similarity.TextIndex(spark, idxDir, warmSearch = true)
        val cold = new graft.similarity.TextIndex(spark, idxDir)
        // A: warm steady state (no CDC) — the r14 number, re-measured
        (1 to 3).foreach { it =>
          timed(s"A warm, no CDC (iter $it)")(noop(warm.search(queries, 10)))
        }
        // B: a CDC add lands before EVERY batch (warm, invalidated
        // each time)
        (1 to 4).foreach { it =>
          timed(s"B add 5k (iter $it)")(warm.add(delta(it)))
          timed(s"B warm after add (iter $it)")(noop(warm.search(queries, 10)))
        }
        // C: same cadence, served cold (the warm=false alternative)
        (5 to 7).foreach { it =>
          timed(s"C add 5k (iter $it)")(cold.add(delta(it)))
          timed(s"C cold after add (iter $it)")(noop(cold.search(queries, 10)))
        }
        // parity after all the CDC: warm == cold ranks
        val cRows = cold.search(queries, 10)
          .select("query_id", "rank", "doc_id").collect().toSet
        val wRows = warm.search(queries, 10)
          .select("query_id", "rank", "doc_id").collect().toSet
        println(s"[r15probe] warm == cold ranks after CDC: ${cRows == wRows} (${cRows.size} rows)")
        warm.releaseWarmCache()

      // ---- the fifth ladder point: 500M dim-16, codes-only ----
      case "ann500" =>
        val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "500000000").toLong
        val deltaN = 200000L
        val dim = 16
        def synth(from: Long, until: Long) =
          spark.range(from, until, 1L, 256).as[Long]
            .map(id => (id, ScaleGen.embVec(id, clustered = true, dim)))
            .toDF("id", "vec")
        val idxDir = s"$out/ann500/idx"
        val idx = new graft.similarity.PqIndex(spark, idxDir, dim = dim, sq8 = true)
        // resumable: the build is the long pole — adopt an existing one
        if (!idx.isBuilt) {
          rm(s"$out/ann500") // a crashed build's orphan staging wastes scratch
          println(s"[r15probe] streaming-encode build: $n vecs, dim $dim (raw never hits disk)")
          // shareEncodePass=false: the checkpointed encode frame at
          // 500M rows (~40 GB) + two write shuffles overflowed the
          // sandbox scratch; recomputing the synthesized-corpus encode
          // per store costs one extra codegen pass and zero scratch
          timed(s"build with SQ8 tier ($n vecs)")(
            idx.build(synth(0L, n), shareEncodePass = false))
          timed(s"CDC add $deltaN (streamed)")(idx.add(synth(n, n + deltaN)))
        } else println(s"[r15probe] adopting existing index at $idxDir")
        val nAll = n + deltaN
        val queries = spark.range(0L, nAll, 1L, 256)
          .select(col("id"), xxhash64(col("id")).as("h"))
          .orderBy("h").limit(100).select("id").as[Long].collect().toSeq
          .map(id => (id, ScaleGen.embVec(id, clustered = true, dim)))
          .toDF("id", "vec").localCheckpoint()
        val warm = new graft.similarity.PqIndex(spark, idxDir,
          dim = dim, sq8 = true, warmRerank = true)
        val cm = (nAll / ScaleGen.EmbModes / 10).toInt
        (1 to 3).foreach { it =>
          timed(s"WARM SQ8 rerank, 100 q, candMult=$cm (iter $it)")(
            noop(warm.topKRerankIndexed(queries, 10, cm)))
        }
        // ground truth: FULL brute force, corpus re-synthesized inside
        // the scan (one pass of 100 × nAll codegen cosines). Skippable
        // so a serve-only re-run (e.g. at a different heap size — the
        // 500M sidecar needs ~3× the 24g default to stay resident)
        // doesn't pay the ~17-min pass again.
        if (!sys.env.get("SPARK_GRAFT_SKIP_RECALL").contains("1")) {
          val (r, _) = timed(s"recall@10 at cm=$cm (100 q vs full brute force)")(
            idx.recallAt(queries, synth(0L, nAll), 10, cm, inIndex = true))
          println(f"[r15probe] recall@10 = $r%.4f (the 2M/20M/80M/200M arms predict ~0.96-0.97 at the rule's cm)")
        }
        warm.releaseWarmCache()

      // ---- warm SQ8 serving under frequent CDC (the textcdc twin) ----
      // The serve-shaped access pattern the lexical measurement used,
      // on the VECTOR side: a fresh-keyed 100k-vector CDC add lands
      // before EVERY 100-query warm batch at 20M vectors. Whole-store
      // invalidation pays a full sidecar re-read per batch; the
      // file-grained cache should layer the delta only.
      case "anncdc" =>
        val n = sys.env.getOrElse("SPARK_GRAFT_ANN_N", "20000000").toLong
        val deltaN = 100000L
        val dim = 16
        def synth(from: Long, until: Long) =
          spark.range(from, until, 1L, 64).as[Long]
            .map(id => (id, ScaleGen.embVec(id, clustered = true, dim)))
            .toDF("id", "vec")
        rm(s"$out/anncdc")
        val idxDir = s"$out/anncdc/idx"
        val idx = new graft.similarity.PqIndex(spark, idxDir, dim = dim, sq8 = true)
        timed(s"build with SQ8 tier ($n vecs)")(idx.build(synth(0L, n)))
        val queries = spark.range(0L, n, 1L, 64)
          .select(col("id"), xxhash64(col("id")).as("h"))
          .orderBy("h").limit(100).select("id").as[Long].collect().toSeq
          .map(id => (id, ScaleGen.embVec(id, clustered = true, dim)))
          .toDF("id", "vec").localCheckpoint()
        val warm = new graft.similarity.PqIndex(spark, idxDir,
          dim = dim, sq8 = true, warmRerank = true)
        val cold = new graft.similarity.PqIndex(spark, idxDir, dim = dim, sq8 = true)
        val cm = (n / ScaleGen.EmbModes / 10).toInt
        // A: warm steady state (no CDC)
        (1 to 3).foreach { it =>
          timed(s"A warm, no CDC (iter $it)")(noop(warm.topKRerankIndexed(queries, 10, cm)))
        }
        // B: a fresh-keyed CDC add lands before EVERY batch (warm)
        (1 to 4).foreach { it =>
          timed(s"B add $deltaN (iter $it)")(
            idx.add(synth(n + it * deltaN, n + (it + 1) * deltaN)))
          timed(s"B warm after add (iter $it, layers=${warm.warmLayerCount})")(
            noop(warm.topKRerankIndexed(queries, 10, cm)))
        }
        println(s"[r15probe] layers after B: ${warm.warmLayerCount}")
        // C: same cadence, served cold
        (5 to 7).foreach { it =>
          timed(s"C add $deltaN (iter $it)")(
            idx.add(synth(n + it * deltaN, n + (it + 1) * deltaN)))
          timed(s"C cold after add (iter $it)")(noop(cold.topKRerankIndexed(queries, 10, cm)))
        }
        // parity after all the CDC: warm == cold rows
        def rows(i: graft.similarity.PqIndex) =
          i.topKRerankIndexed(queries, 10, cm)
            .select("query_id", "neighbor_id", "rank").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        println(s"[r15probe] warm == cold rows after CDC: ${rows(warm) == rows(cold)}")
        warm.releaseWarmCache()

      // ---- serve-loop concurrency: parallel=N vs the sequential loop ----
      // Small batches are the regime where loop-level overlap matters:
      // a 5-query batch's stages cannot fill 32 cores, so its wall is
      // mostly fixed per-job overhead — exactly what parallel=N
      // overlaps. warm=false keeps the comparison pure loop mechanics
      // (no one-off cache build inside either wall); the 8 batches are
      // IDENTICAL so per-batch work is symmetric across runs.
      case "servepar" =>
        val docs = spark.read.parquet(s"$dataDir/documents.parquet")
          .select("doc_id", "text")
        val embs = spark.read.parquet(s"$dataDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val nV = embs.count()
        val ti = new graft.similarity.TextIndex(spark, s"$out/servepar/tidx")
        val tiStats = new org.apache.hadoop.fs.Path(s"$out/servepar/tidx/stats.txt")
        if (!tiStats.getFileSystem(hconf).exists(tiStats))
          timed("text index build")(ti.build(docs))
        val pi = new graft.similarity.PqIndex(spark, s"$out/servepar/vidx",
          dim = 64, sq8 = true)
        if (!pi.isBuilt) timed("vector index build (SQ8)")(pi.build(embs))
        val qrows = docs.filter(col("doc_id") < nV)
          .select(col("doc_id"), col("text"), xxhash64(col("doc_id")).as("h"))
          .orderBy("h").limit(5).collect().zipWithIndex.map { case (r, i) =>
            (i.toLong, r.getString(1).split(' ').filter(_.startsWith("w"))
              .take(2).mkString(" "), r.getLong(0))
          }.toSeq.toDF("query_id", "qtext", "docref")
        val qdf = qrows.join(embs.withColumnRenamed("id", "docref"), Seq("docref"))
          .select(col("query_id"), col("qtext"), col("vec"))
          .localCheckpoint()
        rm(s"$out/servepar/q")
        (1 to 8).foreach(b => qdf.write.mode("overwrite")
          .parquet(s"$out/servepar/q/batch-$b"))
        // bracket order 1 → 4 → 1: the second sequential run exposes
        // any page-cache warming the first run bought the parallel one
        Seq(1, 4, 1).zipWithIndex.foreach { case (par, i) =>
          val aDir = s"$out/servepar/a$i"
          rm(aDir)
          timed(s"serve 8 × 5-q hybrid batches, parallel=$par (run ${i + 1})")(
            graft.Main.runPipeline(spark, Seq("serve",
              s"queries=$out/servepar/q", s"out=$aDir",
              s"index=$out/servepar/vidx", s"text-index=$out/servepar/tidx",
              "dim=64", "sq8=true", "rerank=32", "topk=10", "pollms=200",
              "warm=false", "maxbatches=8", s"parallel=$par")))
        }
        // parity: the parallel run's answers == the sequential run's
        val equal = (1 to 8).count { b =>
          def rows(a: String) = spark.read.parquet(s"$out/servepar/$a/batch-$b")
            .select("query_id", "rrf_rank", "doc_id").collect()
            .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
          rows("a0") == rows("a1")
        }
        println(s"[r15probe] parallel == sequential: $equal/8 batches equal")

      // ---- the layer-cap transition: LSM merge vs whole rebuild ----
      // Adopts the servepar text index (5M docs). 12 fresh-keyed adds
      // with a warm search after each crosses the 8-layer cap several
      // times; the cap-transition batches show the consolidation cost
      // (the r15 first cut paid the ~77 s whole-store rebuild there;
      // the LSM merge should pay a delta-sized relayout instead).
      case "textcap" =>
        val docs = spark.read.parquet(s"$dataDir/documents.parquet")
          .select("doc_id", "text")
        val idxDir = s"$out/servepar/tidx"
        val built = new org.apache.hadoop.fs.Path(s"$idxDir/stats.txt")
        if (!built.getFileSystem(hconf).exists(built))
          timed("text index build")(new graft.similarity.TextIndex(spark, idxDir)
            .build(docs))
        val queries = docs.select(col("doc_id"), col("text"),
            xxhash64(col("doc_id")).as("h"))
          .orderBy("h").limit(100).collect().zipWithIndex.map { case (r, i) =>
            (i, r.getString(1).split(' ').filter(_.startsWith("w")).take(2).mkString(" "))
          }.toSeq.toDF("query_id", "qtext").localCheckpoint()
        def delta(i: Int) = docs.limit(5000)
          .withColumn("doc_id", col("doc_id") + lit(200000000L + i * 1000000L))
          .localCheckpoint()
        val warm = new graft.similarity.TextIndex(spark, idxDir, warmSearch = true)
        val cold = new graft.similarity.TextIndex(spark, idxDir)
        timed("warm batch 0 (cache build)")(noop(warm.search(queries, 10)))
        (1 to 12).foreach { it =>
          timed(s"add 5k (iter $it)")(warm.add(delta(it)))
          timed(s"warm after add (iter $it, layers=${warm.warmLayerCount})")(
            noop(warm.search(queries, 10)))
        }
        println(s"[r15probe] layers after 12 adds: ${warm.warmLayerCount}")
        val cR = cold.search(queries, 10)
          .select("query_id", "rank", "doc_id").collect().toSet
        val wR = warm.search(queries, 10)
          .select("query_id", "rank", "doc_id").collect().toSet
        println(s"[r15probe] warm == cold ranks after cap merges: ${cR == wR} (${cR.size} rows)")
        warm.releaseWarmCache()

      case other => sys.error(s"unknown arm $other (textcdc|ann500|anncdc|servepar|textcap)")
    }
    spark.stop()
  }
}
