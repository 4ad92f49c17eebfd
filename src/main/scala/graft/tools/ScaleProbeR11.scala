package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: round-11 scale measurements for PLANS.md — not gate input.
  *
  * Two open questions from VERDICT r10, each its own section:
  *
  *  1. `cells` — the r10 cells/probe/rerank table was measured on
  *     ISOTROPIC gaussians, where recall@10 sits at the noise ceiling
  *     BY CONSTRUCTION (0.029 at 2M vectors; no quantizer can beat
  *     it), so "recall flat across 8× cells" was only ever validated
  *     on data where finer cells provably cannot help. Re-run the
  *     table on `ScaleGen clustered` embeddings (1024-mode gaussian
  *     mixture, intra-mode cosine ≈ 0.8 vs inter ≈ 0) — the data shape
  *     on which the conclusion COULD invert.
  *  2. `lex` — the vector store has sf100 serve numbers; TextIndex
  *     and the hybrid fusion have sf10 only. Build the inverted index
  *     over the 5M-doc corpus and measure probe-pruned search, the
  *     stopword-partition skew story, the stoplist/maxDfFrac knobs,
  *     and the at-scale hybrid form (TextIndex lexical ranks fused
  *     with PqIndex vector ranks by RRF — the composition
  *     searchHybridRrf's scaladoc promises at scale).
  *
  * {{{ runMain graft.tools.ScaleProbeR11 bench_scratch/sf100 /tmp/graft_r11probe cells bench_scratch/sf100c }}}
  * {{{ runMain graft.tools.ScaleProbeR11 bench_scratch/sf100 /tmp/graft_r11probe lex }}}
  */
object ScaleProbeR11 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench_scratch/sf100")
    val out = if (args.length > 1) args(1) else "/tmp/graft_r11probe"
    val only = if (args.length > 2) args(2) else "all"
    // the clustered vector table (documents are shared with sfDir)
    val vecDir = if (args.length > 3) args(3) else "bench_scratch/sf100c"
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r11probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- 1. the cells table, on data with exploitable structure ----
    if (only == "cells" || only == "all") {
      val vecs0 = spark.read.parquet(s"$vecDir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
      val nv = vecs0.count()
      println(s"[r11probe] clustered vectors: $nv")
      val queries0 = vecs0.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
        .orderBy("h").limit(100).drop("h").cache()
      queries0.count()
      val bf = graft.similarity.Similarity.bruteForceTopK(queries0, vecs0, 10).cache()
      bf.count()
      // (0,0) = auto layout; explicit rows mirror the r10 table
      Seq((0, 0), (1000, 40000), (2000, 80000), (4000, 160000)).foreach {
        case (cells, fitN) =>
          val label = if (cells == 0) "auto" else cells.toString
          val idx = new graft.similarity.PqIndex(spark, s"$out/idx$label",
            nCells = cells, fitSampleN = fitN)
          timed(s"index build cells=$label fitsample=${if (fitN == 0) 20000 else fitN} ($nv vecs)")(
            idx.build(vecs0))
          val coarse = idx.models()._2
          (1 to 2).foreach { it =>
            timed(s"plain topK cells=${coarse.nCells} (probe ${
              idx.resolvedNProbe}/${coarse.nCells}, iter $it)")(
              noop(idx.topK(queries0, 10)))
          }
          println(f"[r11probe] plain PQ recall@10 cells=${coarse.nCells}: ${
            graft.similarity.Similarity.recall(idx.topK(queries0, 10), bf)}%.3f")
          Seq(4, 8).foreach { cm =>
            val rr = timed(s"topKRerank candMult=$cm cells=${coarse.nCells}")(
              idx.topKRerank(queries0, vecs0, 10, candMult = cm).cache())
            rr.count()
            println(f"[r11probe] rerank recall@10 candMult=$cm cells=${coarse.nCells}: ${
              graft.similarity.Similarity.recall(rr, bf)}%.3f")
            rr.unpersist()
          }
          val allowed = vecs0.filter(col("id") % 200L === 0L).select("id").cache()
          allowed.count()
          timed(s"filtered topK 0.5% cells=${coarse.nCells}")(
            noop(idx.topK(queries0, 10, allowed)))
          val bfa = graft.similarity.Similarity.bruteForceTopK(queries0,
            vecs0.join(allowed, Seq("id"), "left_semi"), 10)
          println(f"[r11probe] filtered recall@10 at 0.5%% cells=${coarse.nCells}: ${
            graft.similarity.Similarity.recall(idx.topK(queries0, 10, allowed), bfa)}%.3f")
          allowed.unpersist()
      }
      bf.unpersist(); queries0.unpersist(); vecs0.unpersist()
      if (only == "cells") { spark.stop(); return }
    }

    // ---- 1b. the incremental DAG with the FULL r11 step set ----
    // mix and pack joined the incremental step set this round; the
    // r10 sf100 DAG measured clean..shard,index — this re-run proves
    // the two new stages are delta-shaped a decade up (the seed pays
    // the BPE train + threshold calibration once; a delta's mix is a
    // per-doc residue filter and its pack a batch-local encode)
    if (only == "dag" || only == "all") {
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "lang", "text")
      val split = s"$out/split"
      docs0.filter(col("doc_id") % 10 =!= 9).write.mode("overwrite")
        .parquet(s"$split/seed.parquet")
      docs0.filter(col("doc_id") % 10 === 9).write.mode("overwrite")
        .parquet(s"$split/delta.parquet")
      docs0.filter(col("doc_id") % 2500 === 13).select("doc_id", "text")
        .write.mode("overwrite").parquet(s"$split/evals.parquet")
      docs0.filter(col("doc_id") % 2500 === 7).select("doc_id", "text")
        .write.mode("overwrite").parquet(s"$split/targets.parquet")
      println("[r11probe] split fixtures written")
      val dagArgs = Seq("steps=clean,decontaminate,scrub,select,mix,shard,pack",
        "budget=100000000", // 100M of ~400M seed tokens: a real downsample
        "nmerges=500", "packbudget=512", "shards=32", "journalkeep=8")
      timed("DAG seed batch (4.5M docs; fits + freezes incl. mix thresholds + pack BPE)") {
        graft.Main.runPipeline(spark, Seq("corpus-pipeline",
          s"in=$split/seed.parquet", s"out=$out/dag_out", "incremental=true",
          s"state=$out/state", "batch=1",
          s"evals=$split/evals.parquet", s"targets=$split/targets.parquet",
          "frac=0.3") ++ dagArgs)
      }
      println("[r11probe] seed stats.json: " + java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$out/dag_out", "stats.json")).trim)
      timed("DAG delta batch (500k docs; frozen mix filter + per-batch pack)") {
        graft.Main.runPipeline(spark, Seq("corpus-pipeline",
          s"in=$split/delta.parquet", s"out=$out/dag_out", "incremental=true",
          s"state=$out/state", "batch=2") ++ dagArgs)
      }
      println("[r11probe] delta stats.json: " + java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$out/dag_out", "stats.json")).trim)
      if (only == "dag") { spark.stop(); return }
    }

    // ---- 2. lexical serve at 5M docs ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").cache()
    val nDocs = docs.count()
    println(s"[r11probe] corpus: $nDocs docs")
    val tindex = new graft.similarity.TextIndex(spark, s"$out/tidx")
    timed(s"text index build ($nDocs docs, auto layout)")(tindex.build(docs))
    tindex.describe().foreach { case (k, v) => println(s"[r11probe] tidx $k = $v") }

    // query batches from the corpus's own vocabulary (ScaleGen: content
    // words letter-code a 20k vocab; "the/and/..." are the stop pool)
    def alpha(n: Int): String = {
      var v = n; val sb = new StringBuilder
      do { sb.append(('a' + v % 26).toChar); v /= 26 } while (v > 0)
      sb.result()
    }
    def contentWord(seed: Int): String = {
      val rnd = new scala.util.Random(seed * 40503L + 11)
      "w" + alpha(rnd.nextInt(20000))
    }
    import spark.implicits._
    val rareQ = (0 until 100)
      .map(i => (i, s"${contentWord(3 * i)} ${contentWord(3 * i + 1)} ${contentWord(3 * i + 2)}"))
      .toDF("query_id", "qtext")
    val stopQ = (0 until 100)
      .map(i => (i, s"the ${contentWord(3 * i)} ${contentWord(3 * i + 1)}"))
      .toDF("query_id", "qtext")

    // skew accounting: the Zipf partition story a decade up
    val mass = tindex.partitionMass()
    val sorted = mass.values.toSeq.sorted
    println(s"[r11probe] postings partitions: ${mass.size}, mass max=${sorted.last} " +
      s"median=${sorted(sorted.size / 2)} (hot/median = ${
        sorted.last / math.max(1L, sorted(sorted.size / 2))}x)")
    val hotParts = tindex.probeParts("the and of to in is it that")
    val rareParts = tindex.probeParts((0 until 100).map(i => contentWord(3 * i)).mkString(" "))
    val (hotFiles, live) = tindex.scanFootprint(hotParts)
    val (rareFiles, _) = tindex.scanFootprint(rareParts)
    println(s"[r11probe] scan footprint: 8 stopwords -> $hotFiles/$live files; " +
      s"100 rare terms -> $rareFiles/$live files")

    (1 to 2).foreach { it =>
      timed(s"bm25 search, 100 rare-term queries (iter $it)")(
        noop(tindex.search(rareQ, 10)))
    }
    (1 to 2).foreach { it =>
      timed(s"bm25 search, 100 stopword-bearing queries (iter $it)")(
        noop(tindex.search(stopQ, 10)))
    }
    timed("bm25 search, stopword-bearing + stoplist (scan-level cap)")(
      noop(tindex.search(stopQ, 10, stoplist = Set("the"))))
    timed("bm25 search, stopword-bearing + maxDfFrac=0.1 (scoring-level cap)")(
      noop(tindex.search(stopQ, 10, maxDfFrac = 0.1)))

    // ---- 3. hybrid RRF at scale: TextIndex ranks × PqIndex ranks ----
    // the composition searchHybridRrf documents for scale ("swap
    // bruteForceTopK for PqIndex.topK at scale, ranks are ranks"):
    // both sides index-served, fusion corpus-size-independent
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
    val pqDir = s"$out/pidx"
    val pindex = new graft.similarity.PqIndex(spark, pqDir)
    timed(s"vector index build (auto layout, ${vecs.count()} vecs)")(pindex.build(vecs))
    val qv = vecs.filter(col("id") < 100L)
      .select(col("id").as("query_id"), col("vec")).cache()
    qv.count()
    val rrfK0 = graft.queries.SimilarityQueries.RrfK0
    def hybrid(): org.apache.spark.sql.DataFrame = {
      val lex = tindex.search(rareQ, 10)
        .select(col("query_id").cast("long").as("query_id"), col("doc_id"),
          col("rank").as("lrank"))
      val vec = pindex.topK(qv.select(col("query_id").as("id"), col("vec")), 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"),
          col("rank").as("vrank"))
      val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
        .select(col("query_id"), col("doc_id"),
          (coalesce(lit(1.0) / (lit(rrfK0) + col("lrank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK0) + col("vrank")), lit(0.0))).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id"))
      fused.withColumn("rrf_rank", row_number().over(w))
        .filter(col("rrf_rank") <= 10)
    }
    (1 to 2).foreach { it =>
      timed(s"hybrid RRF, 100 queries, both sides index-served (iter $it)")(
        noop(hybrid()))
    }
    qv.unpersist(); vecs.unpersist(); docs.unpersist()
    spark.stop()
  }
}
