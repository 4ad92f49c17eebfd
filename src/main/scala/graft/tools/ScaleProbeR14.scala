package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: round-14 scale measurements for PLANS.md — not gate input.
  *
  * Arms (independently runnable; delete inputs between arms — the
  * sandbox disk budget rule):
  *
  *  - `textwarm` — the r13-VERDICT #2 done-criterion: TextIndex warm
  *    vs cold search walls on the 5M-doc corpus (bench_scratch/sf1000
  *    documents), 100-query batches, 3 iters each. The r11 lexical
  *    probe's ~5 s serving wall is the baseline.
  *  - `ann80` — the next ANN decade inside the disk budget
  *    (r13-VERDICT #6, route (a)): dim=16 clustered ScaleGen corpus,
  *    80M build + 200k CDC add, warm SQ8 serve at the candMult rule's
  *    operating point (cm ≈ modeSize/topK = 80M/1024/10 ≈ 7812),
  *    recall@10 vs brute force on a 100-query sample.
  *
  * {{{ runMain graft.tools.ScaleGen /root/testdata/sf0.1 bench_scratch/sf1000 1000 corpus-only }}}
  * {{{ runMain graft.tools.ScaleProbeR14 textwarm bench_scratch/sf1000 /tmp/graft_r14probe }}}
  * {{{ runMain graft.tools.ScaleGen /root/testdata/sf0.1 bench_scratch/v80 40100 embeddings-only clustered dim16 }}}
  * {{{ runMain graft.tools.ScaleProbeR14 ann80 bench_scratch/v80 /tmp/graft_r14probe }}}
  */
object ScaleProbeR14 {
  def main(args: Array[String]): Unit = {
    val arm = args.headOption.getOrElse("textwarm")
    val dataDir = if (args.length > 1) args(1) else "bench_scratch/sf1000"
    val out = if (args.length > 2) args(2) else "/tmp/graft_r14probe"
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
      println(f"[r14probe] $name: $sec%.2f s")
      (r, sec)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    arm match {
      // ---- warm vs cold lexical serving at 5M docs ----
      case "textwarm" =>
        rm(s"$out/textwarm")
        val docs = spark.read.parquet(s"$dataDir/documents.parquet")
          .select("doc_id", "text")
        val n = docs.count()
        println(s"[r14probe] docs: $n")
        val cold = new graft.similarity.TextIndex(spark, s"$out/textwarm/idx")
        timed(s"build ($n docs)")(cold.build(docs))
        // 100 queries of 2 content words each, drawn from real doc
        // texts (hash-ordered sample) so every query matches rows
        val qs = docs.select(col("doc_id"), col("text"),
            xxhash64(col("doc_id")).as("h"))
          .orderBy("h").limit(100).collect().zipWithIndex.map { case (r, i) =>
            val ws = r.getString(1).split(' ').filter(_.startsWith("w"))
            (i, ws.take(2).mkString(" "))
          }.toSeq
        val queries = qs.toDF("query_id", "qtext")
        val warm = new graft.similarity.TextIndex(spark, s"$out/textwarm/idx",
          warmSearch = true)
        val small = qs.take(5).toDF("query_id", "qtext")
        (1 to 3).foreach { it =>
          timed(s"COLD search, 100 q (iter $it)")(noop(cold.search(queries, 10)))
        }
        (1 to 3).foreach { it =>
          timed(s"COLD search, 5 q (iter $it)")(noop(cold.search(small, 10)))
        }
        (1 to 3).foreach { it =>
          timed(s"WARM search, 100 q (iter $it)")(noop(warm.search(queries, 10)))
        }
        (1 to 3).foreach { it =>
          timed(s"WARM search, 5 q (iter $it)")(noop(warm.search(small, 10)))
        }
        // parity sanity on the big corpus (ranks, not walls)
        val cRows = cold.search(queries, 10)
          .select("query_id", "rank", "doc_id").collect().toSet
        val wRows = warm.search(queries, 10)
          .select("query_id", "rank", "doc_id").collect().toSet
        println(s"[r14probe] warm == cold ranks: ${cRows == wRows} (${cRows.size} rows)")
        warm.releaseWarmCache()

      // ---- the 80M-vector decade (dim=16 clustered) ----
      case "ann80" =>
        rm(s"$out/ann80")
        val all = spark.read.parquet(s"$dataDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val nAll = all.count()
        val deltaFrom = nAll - 200000L
        val corpus = all.filter(col("id") < deltaFrom)
        val delta = all.filter(col("id") >= deltaFrom)
        println(s"[r14probe] corpus: $deltaFrom build + 200000 delta (dim 16)")
        val idx = new graft.similarity.PqIndex(spark, s"$out/ann80/idx",
          dim = 16, sq8 = true)
        timed(s"build with SQ8 tier ($deltaFrom vecs)")(idx.build(corpus))
        timed("CDC add 200k")(idx.add(delta))
        val queries = all.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
          .orderBy("h").limit(100).drop("h").cache()
        queries.count()
        val warm = new graft.similarity.PqIndex(spark, s"$out/ann80/idx",
          dim = 16, sq8 = true, warmRerank = true)
        // the rule: cm ≈ modeSize/topK; modeSize = n/1024 modes
        val cm = (nAll / 1024 / 10).toInt
        (1 to 3).foreach { it =>
          timed(s"WARM SQ8 rerank, 100 q, candMult=$cm (iter $it)")(
            noop(warm.topKRerankIndexed(queries, 10, cm)))
        }
        val (r, _) = timed(s"recall@10 at cm=$cm (100 q vs brute force)")(
          idx.recallAt(queries, all, 10, cm, inIndex = true))
        println(f"[r14probe] recall@10 = $r%.4f (rule predicts ~0.97 from the 2M/20M arms)")
        warm.releaseWarmCache()

      // ---- serve-loop walls: batch 2+ must approach the warm API wall ----
      case "servewall" =>
        // resumable: existing indexes are adopted (the builds dominate
        // the arm's wall; the A/B knobs below only need the serving
        // side re-run), answered-batch markers are cleared per run
        rm(s"$out/servewall/a")
        rm(s"$out/servewall/q")
        val docs = spark.read.parquet(s"$dataDir/documents.parquet")
          .select("doc_id", "text")
        val embs = spark.read.parquet(s"$dataDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec"))
        val (nD, nV) = (docs.count(), embs.count())
        println(s"[r14probe] corpus: $nD docs, $nV vectors")
        val ti = new graft.similarity.TextIndex(spark, s"$out/servewall/tidx")
        val tiBuilt = new org.apache.hadoop.fs.Path(s"$out/servewall/tidx/stats.txt")
          .getFileSystem(hconf).exists(
            new org.apache.hadoop.fs.Path(s"$out/servewall/tidx/stats.txt"))
        if (!tiBuilt) timed("text index build")(ti.build(docs))
        val pi = new graft.similarity.PqIndex(spark, s"$out/servewall/vidx",
          dim = 64, sq8 = true)
        if (!pi.isBuilt) timed("vector index build (SQ8)")(pi.build(embs))
        // 100 hybrid queries: real doc words + that id's own embedding
        // (doc ids and vec ids share the 0..n space by construction)
        val qrows = docs.filter(col("doc_id") < nV)
          .select(col("doc_id"), col("text"), xxhash64(col("doc_id")).as("h"))
          .orderBy("h").limit(100).collect().zipWithIndex.map { case (r, i) =>
            (i.toLong, r.getString(1).split(' ').filter(_.startsWith("w"))
              .take(2).mkString(" "), r.getLong(0))
          }.toSeq.toDF("query_id", "qtext", "docref")
        val qdf = qrows.join(embs.withColumnRenamed("id", "docref"), Seq("docref"))
          .select(col("query_id"), col("qtext"), col("vec"))
          .localCheckpoint()
        (1 to 3).foreach { b =>
          qdf.write.mode("overwrite").parquet(s"$out/servewall/q/batch-$b")
        }
        // one serve process, three identical batches: batch 1 pays the
        // cache builds, batches 2-3 are the warm serving wall (the
        // per-batch timings print from the serve loop itself)
        val warndf = sys.env.getOrElse("SPARK_GRAFT_WARNDF", "0.5")
        val st = graft.Main.runPipeline(spark, Seq("serve",
          s"queries=$out/servewall/q", s"out=$out/servewall/a",
          s"index=$out/servewall/vidx", s"text-index=$out/servewall/tidx",
          "dim=64", "sq8=true", "rerank=32", "topk=10", "pollms=200",
          s"warndf=$warndf", "maxbatches=3"))
        println(s"[r14probe] serve stats (warndf=$warndf): $st")

      case other => sys.error(s"unknown arm $other (textwarm|ann80|servewall)")
    }
    spark.stop()
  }
}
