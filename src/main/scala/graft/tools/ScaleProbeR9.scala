package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: round-9 scale measurements for PLANS.md — not gate input.
  *
  *  1. Real-vocab BPE (VERDICT r8 #4): train merges=8000 on the sf10
  *     corpus, then time the full-corpus encode under the 40-merge
  *     gate model vs the 8k-merge model. The memo question is settled
  *     by data shape: distinct pre-token forms are counted and
  *     compared to the 64k LRU bound.
  *  2. Pack under the auto window layout (VERDICT r8 #1 done-clause):
  *     packTokens at buckets=0 (resolved count printed) vs the old
  *     fixed 16.
  *  3. Filtered/rerank serve (VERDICT r8 #6): filtered topK wall at
  *     ~50%/5%/0.5% allow-lists (resolved probe budgets printed,
  *     recall vs brute-force-over-allowed at the selective end), and
  *     topKRerank recall/wall at candMult 2/4/8 vs plain PQ.
  *
  * {{{ runMain graft.tools.ScaleProbeR9 bench_scratch/sf10 /tmp/graft_r9probe }}}
  */
object ScaleProbeR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench_scratch/sf10")
    val out = if (args.length > 1) args(1) else "/tmp/graft_r9probe"
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r9probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").cache()
    val nDocs = docs.count()
    val forms = docs.select(explode(graft.functions.TextFunctions.bpeTokens(col("text"))).as("w"))
      .agg(countDistinct("w"), count(lit(1))).head()
    println(s"[r9probe] corpus: $nDocs docs, ${forms.getLong(1)} pre-tokens, " +
      s"${forms.getLong(0)} distinct forms (memo LRU bound 65536)")

    // ---- 1. BPE: 40-merge gate model vs 8k-merge trained model ----
    val merges8k = timed("bpe train nMerges=8000")(
      graft.functions.Bpe.train(docs, 8000))
    println(s"[r9probe] merges learned: ${merges8k.length}")
    val alpha = graft.functions.Bpe.alphabet(docs)
    val vocab8k = graft.functions.Bpe.vocab(merges8k, alpha)
    val vocab40 = graft.functions.Bpe.vocab(graft.functions.Bpe.builtin, alpha)
    (1 to 2).foreach { it =>
      timed(s"encode ids, 40-merge gate model (iter $it)")(
        noop(docs.select(graft.functions.Bpe.bpeEncodeIds(col("text"),
          graft.functions.Bpe.builtin, vocab40).as("ids"))))
      timed(s"encode ids, ${merges8k.length}-merge model (iter $it)")(
        noop(docs.select(graft.functions.Bpe.bpeEncodeIds(col("text"),
          merges8k, vocab8k).as("ids"))))
    }

    // ---- 2. pack under the auto window layout ----
    val autoBuckets = graft.queries.PipelineQueries.resolvePackBuckets(docs, 0)
    println(s"[r9probe] auto pack buckets: $autoBuckets")
    timed(s"packTokens buckets=auto($autoBuckets)")(
      noop(graft.queries.PipelineQueries.packTokens(docs, merges8k, vocab8k,
        512, autoBuckets)))
    timed("packTokens buckets=16 (the old fixed default)")(
      noop(graft.queries.PipelineQueries.packTokens(docs, merges8k, vocab8k,
        512, 16)))

    // ---- 3. filtered / rerank serve ----
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
    val nVecs = vecs.count()
    val index = new graft.similarity.PqIndex(spark, s"$out/idx")
    timed(s"index build (auto layout, $nVecs vecs)")(index.build(vecs))
    val coarse = index.models()._2
    println(s"[r9probe] layout: ${coarse.nCells} cells")
    val queries = vecs.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
      .orderBy("h").limit(100).drop("h").cache()
    queries.count()

    Seq(("50%", 2L), ("5%", 20L), ("0.5%", 200L)).foreach { case (label, mod) =>
      val allowed = vecs.filter(col("id") % mod === 0L).select("id").cache()
      val na = allowed.count()
      val np = index.probeForFiltered(coarse, na, nVecs)
      (1 to 2).foreach { it =>
        timed(s"filtered topK allow=$label ($na ids, probe $np/${coarse.nCells}, iter $it)")(
          noop(index.topK(queries, 10, allowed)))
      }
      if (mod == 200L) {
        val bf = graft.similarity.Similarity.bruteForceTopK(queries,
          vecs.join(allowed, Seq("id"), "left_semi"), 10)
        val r = graft.similarity.Similarity.recall(index.topK(queries, 10, allowed), bf)
        println(f"[r9probe] filtered recall@10 vs brute-force-over-allowed at $label: $r%.3f")
      }
      allowed.unpersist()
    }

    val bfAll = graft.similarity.Similarity.bruteForceTopK(queries, vecs, 10)
      .cache()
    bfAll.count()
    val plain = index.topK(queries, 10)
    println(f"[r9probe] plain PQ recall@10: ${
      graft.similarity.Similarity.recall(plain, bfAll)}%.3f")
    Seq(2, 4, 8).foreach { cm =>
      val rr = timed(s"topKRerank candMult=$cm")(
        index.topKRerank(queries, vecs, 10, candMult = cm).cache())
      rr.count()
      println(f"[r9probe] rerank recall@10 candMult=$cm: ${
        graft.similarity.Similarity.recall(rr, bfAll)}%.3f")
      rr.unpersist()
    }
    spark.stop()
  }
}
