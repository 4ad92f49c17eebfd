package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: round-10 scale measurements for PLANS.md — not gate input.
  *
  * The decade jump sf10 → sf100 (5M docs / 2M embeddings). Every
  * previous decade falsified at least one suggest rule (r3: AQE
  * coalescing + hash avalanche; r5: fixed cells + noise-floor τ;
  * r8: mix budget), so each corpus-sized rule gets its third decade:
  *
  *  1. The incremental corpus-pipeline DAG, seed (90%) + delta (10%),
  *     with this round's additions riding along: frozen decontaminate
  *     eval state, drift rates in stats.json, cross-batch scrub span
  *     accumulation, and the CDC `index` step maintaining text+vector
  *     serving artifacts inside the DAG.
  *  2. Standalone auto-layout PqIndex build on 2M vectors + filtered
  *     serve across a 1000× selectivity range + exact re-rank (the
  *     r9 table, one decade up).
  *  3. BPE: 8k-merge train on 5M docs, full-corpus encode under the
  *     40-merge gate model vs the 8k model (vocab-size independence
  *     at the new decade).
  *  4. corpus_scrub end-to-end at 5M docs (the r7 table's headline).
  *
  * In-process `Main.runPipeline` calls: walls EXCLUDE JVM/sbt startup
  * (the r9 sf10 table included ~25-30 s of it — noted when comparing).
  *
  * {{{ runMain graft.tools.ScaleProbeR10 bench_scratch/sf100 /tmp/graft_r10probe }}}
  */
object ScaleProbeR10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench_scratch/sf100")
    val out = if (args.length > 1) args(1) else "/tmp/graft_r10probe"
    // "dag" re-runs only the incremental-DAG section (fresh out dir) —
    // the first sf100 run measured the plan-identity cache-eviction
    // bug in the seed's index step; the re-run measures the fix
    val only = if (args.length > 2) args(2) else "all"
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r10probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // "cells": the decade experiment the first sf100 pass motivated —
    // auto layout froze at 500 cells (the 20k fit-sample bound), so
    // measure build/serve/recall at progressively larger explicit
    // layouts to re-derive the default bound from data
    if (only == "cells") {
      val vecs0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
      val nv = vecs0.count()
      val queries0 = vecs0.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
        .orderBy("h").limit(100).drop("h").cache()
      queries0.count()
      val bf = graft.similarity.Similarity.bruteForceTopK(queries0, vecs0, 10).cache()
      bf.count()
      Seq((1000, 40000), (2000, 80000), (4000, 160000)).foreach { case (cells, fitN) =>
        val idx = new graft.similarity.PqIndex(spark, s"$out/idx$cells",
          nCells = cells, fitSampleN = fitN)
        timed(s"index build cells=$cells fitsample=$fitN ($nv vecs)")(idx.build(vecs0))
        val coarse = idx.models()._2
        (1 to 2).foreach { it =>
          timed(s"plain topK cells=$cells (probe ${
            idx.resolvedNProbe}/${coarse.nCells}, iter $it)")(
            noop(idx.topK(queries0, 10)))
        }
        println(f"[r10probe] plain PQ recall@10 cells=$cells: ${
          graft.similarity.Similarity.recall(idx.topK(queries0, 10), bf)}%.3f")
        val allowed = vecs0.filter(col("id") % 200L === 0L).select("id").cache()
        allowed.count()
        timed(s"filtered topK 0.5%% cells=$cells")(
          noop(idx.topK(queries0, 10, allowed)))
        val bfa = graft.similarity.Similarity.bruteForceTopK(queries0,
          vecs0.join(allowed, Seq("id"), "left_semi"), 10)
        println(f"[r10probe] filtered recall@10 at 0.5%% cells=$cells: ${
          graft.similarity.Similarity.recall(idx.topK(queries0, 10, allowed), bfa)}%.3f")
        allowed.unpersist()
      }
      spark.stop(); return
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text")
    val nDocs = docs.count()
    println(s"[r10probe] corpus: $nDocs docs")

    // ---- 0. split fixtures for the DAG (seed 90% / delta 10%) ----
    val split = s"$out/split"
    docs.filter(col("doc_id") % 10 =!= 9).write.mode("overwrite")
      .parquet(s"$split/seed.parquet")
    docs.filter(col("doc_id") % 10 === 9).write.mode("overwrite")
      .parquet(s"$split/delta.parquet")
    // targets: an on-corpus slice (~2k docs) — the DSIR fit only needs
    // a target distribution; evals: a disjoint slice (~2k) so the
    // frozen decontaminate state has real contamination to catch
    docs.filter(col("doc_id") % 2500 === 7).select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$split/targets.parquet")
    docs.filter(col("doc_id") % 2500 === 13).select("doc_id", "text")
      .write.mode("overwrite").parquet(s"$split/evals.parquet")
    println("[r10probe] split fixtures written")

    // ---- 1. the incremental DAG, this round's full step set ----
    val dagSteps = "steps=clean,decontaminate,scrub,select,shard,index"
    timed("DAG seed batch (4.5M docs, fits + freezes + seeds indexes)") {
      graft.Main.runPipeline(spark, Seq("corpus-pipeline",
        s"in=$split/seed.parquet", s"out=$out/dag_out", "incremental=true",
        s"state=$out/state", "batch=1", dagSteps,
        s"evals=$split/evals.parquet", s"targets=$split/targets.parquet",
        "frac=0.3", "shards=32",
        s"vectors=$sfDir/embeddings.parquet", "idcol=vec_id", "veccol=embedding"))
    }
    println("[r10probe] seed stats.json: " + java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/dag_out", "stats.json")).trim)
    timed("DAG delta batch (500k docs, frozen models + CDC index adds)") {
      graft.Main.runPipeline(spark, Seq("corpus-pipeline",
        s"in=$split/delta.parquet", s"out=$out/dag_out", "incremental=true",
        s"state=$out/state", "batch=2", dagSteps,
        s"vectors=$sfDir/embeddings.parquet", "idcol=vec_id", "veccol=embedding"))
    }
    println("[r10probe] delta stats.json: " + java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/dag_out", "stats.json")).trim)
    if (only == "dag") { spark.stop(); return }

    // ---- 2. standalone PqIndex at 2M vectors ----
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
    val nVecs = vecs.count()
    val index = new graft.similarity.PqIndex(spark, s"$out/idx")
    timed(s"index build (auto layout, $nVecs vecs)")(index.build(vecs))
    val coarse = index.models()._2
    println(s"[r10probe] layout: ${coarse.nCells} cells")
    val queries = vecs.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
      .orderBy("h").limit(100).drop("h").cache()
    queries.count()

    Seq(("50%", 2L), ("5%", 20L), ("0.5%", 200L), ("0.05%", 2000L)).foreach {
      case (label, mod) =>
        val allowed = vecs.filter(col("id") % mod === 0L).select("id").cache()
        val na = allowed.count()
        val np = index.probeForFiltered(coarse, na, nVecs)
        (1 to 2).foreach { it =>
          timed(s"filtered topK allow=$label ($na ids, probe $np/${coarse.nCells}, iter $it)")(
            noop(index.topK(queries, 10, allowed)))
        }
        if (mod >= 200L) {
          val bf = graft.similarity.Similarity.bruteForceTopK(queries,
            vecs.join(allowed, Seq("id"), "left_semi"), 10)
          val r = graft.similarity.Similarity.recall(index.topK(queries, 10, allowed), bf)
          println(f"[r10probe] filtered recall@10 vs brute-force-over-allowed at $label: $r%.3f")
        }
        allowed.unpersist()
    }

    val bfAll = graft.similarity.Similarity.bruteForceTopK(queries, vecs, 10).cache()
    bfAll.count()
    println(f"[r10probe] plain PQ recall@10: ${
      graft.similarity.Similarity.recall(index.topK(queries, 10), bfAll)}%.3f")
    Seq(4, 8).foreach { cm =>
      val rr = timed(s"topKRerank candMult=$cm")(
        index.topKRerank(queries, vecs, 10, candMult = cm).cache())
      rr.count()
      println(f"[r10probe] rerank recall@10 candMult=$cm: ${
        graft.similarity.Similarity.recall(rr, bfAll)}%.3f")
      rr.unpersist()
    }
    bfAll.unpersist()
    vecs.unpersist()

    // ---- 3. BPE at the new decade ----
    val cdocs = docs.cache()
    cdocs.count()
    val merges8k = timed("bpe train nMerges=8000 (5M docs)")(
      graft.functions.Bpe.train(cdocs, 8000))
    println(s"[r10probe] merges learned: ${merges8k.length}")
    val alphaSet = graft.functions.Bpe.alphabet(cdocs)
    val vocab8k = graft.functions.Bpe.vocab(merges8k, alphaSet)
    val vocab40 = graft.functions.Bpe.vocab(graft.functions.Bpe.builtin, alphaSet)
    (1 to 2).foreach { it =>
      timed(s"encode ids, 40-merge gate model (iter $it)")(
        noop(cdocs.select(graft.functions.Bpe.bpeEncodeIds(col("text"),
          graft.functions.Bpe.builtin, vocab40).as("ids"))))
      timed(s"encode ids, ${merges8k.length}-merge model (iter $it)")(
        noop(cdocs.select(graft.functions.Bpe.bpeEncodeIds(col("text"),
          merges8k, vocab8k).as("ids"))))
    }

    // ---- 4. corpus_scrub end-to-end ----
    (1 to 2).foreach { it =>
      timed(s"corpus_scrub w=4 mindocs=50 (iter $it)")(
        noop(graft.queries.PipelineQueries.scrubDocs(
          cdocs.select("doc_id", "text"), 4, 50)))
    }
    spark.stop()
  }
}
