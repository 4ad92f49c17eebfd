package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: round-12 scale measurements for PLANS.md — not gate input.
  *
  * Arms (each independently runnable; sf1000 phases are split so a
  * partial run still yields numbers):
  *
  *  - `sq8` — the in-index re-rank tier measured where recall is
  *    falsifiable (bench_scratch/sf100c, 2M clustered vectors): the
  *    recall/bytes/wall table for codes-only vs SQ8-tier re-rank vs
  *    exact re-rank at the r11 candMult ladder. The question the tier
  *    exists to answer: how much of the exact-rerank recall does a
  *    dim-byte sidecar recover when the raw 4·dim-byte table never
  *    ships?
  *  - `dag` — the decade probe's pipeline half at ~10× r11's sf100:
  *    incremental DAG seed (clean, scrub, mix) over the sf1000 corpus
  *    minus a held-out delta slice, then the delta batch under the
  *    frozen models.
  *  - `bpe` — trained-BPE encode pass over the full sf1000 corpus
  *    (the tokens=bpe pricing scan).
  *  - `lex` — TextIndex build over a bounded slice (disk-bounded in
  *    this sandbox; the term-partition layout is what's under test)
  *    + rare-term serve + the guarded stopword query with maxDfFrac.
  *
  * {{{ runMain graft.tools.ScaleProbeR12 sq8 bench_scratch/sf100c /tmp/graft_r12probe }}}
  * {{{ runMain graft.tools.ScaleProbeR12 dag bench_scratch/sf1000 /tmp/graft_r12probe }}}
  */
object ScaleProbeR12 {
  def main(args: Array[String]): Unit = {
    val arm = args.headOption.getOrElse("sq8")
    val dataDir = if (args.length > 1) args(1)
      else if (arm == "sq8") "bench_scratch/sf100c" else "bench_scratch/sf1000"
    val out = if (args.length > 2) args(2) else "/tmp/graft_r12probe"
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
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r12probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    arm match {
      // ---- the SQ8 tier, on data with exploitable structure ----
      case "sq8" =>
        rm(out)
        val vecs = spark.read.parquet(s"$dataDir/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
        val nv = vecs.count()
        println(s"[r12probe] clustered vectors: $nv")
        val queries = vecs.select(col("id"), col("vec"), xxhash64(col("id")).as("h"))
          .orderBy("h").limit(100).drop("h").cache()
        queries.count()
        val bf = graft.similarity.Similarity.bruteForceTopK(queries, vecs, 10).cache()
        bf.count()
        // two builds, same auto layout: the tier's build + bytes cost
        // is the with/without delta, not a guess
        val plainIdx = new graft.similarity.PqIndex(spark, s"$out/plain")
        timed(s"build codes-only ($nv vecs)")(plainIdx.build(vecs))
        val idx = new graft.similarity.PqIndex(spark, s"$out/sq8", sq8 = true)
        timed(s"build with SQ8 tier ($nv vecs)")(idx.build(vecs))
        println(s"[r12probe] bytes codes=${bytesOf(s"$out/sq8/codes")} " +
          s"sq8=${bytesOf(s"$out/sq8/sq8")} " +
          s"raw_vectors=${bytesOf(s"$dataDir/embeddings.parquet")}")
        println(f"[r12probe] plain PQ recall@10: ${
          graft.similarity.Similarity.recall(idx.topK(queries, 10), bf)}%.3f")
        Seq(8, 64, 256).foreach { cm =>
          val ex = timed(s"exact rerank candMult=$cm")(
            idx.topKRerank(queries, vecs, 10, candMult = cm).cache())
          ex.count()
          println(f"[r12probe] exact-rerank recall@10 candMult=$cm: ${
            graft.similarity.Similarity.recall(ex, bf)}%.3f")
          ex.unpersist()
          val sq = timed(s"SQ8 in-index rerank candMult=$cm")(
            idx.topKRerankIndexed(queries, 10, candMult = cm).cache())
          sq.count()
          println(f"[r12probe] SQ8-rerank recall@10 candMult=$cm: ${
            graft.similarity.Similarity.recall(sq, bf)}%.3f")
          sq.unpersist()
        }
        // serve-shaped wall: 100 queries end to end, tier path
        (1 to 2).foreach { it =>
          timed(s"SQ8 rerank serve, 100 queries, candMult=256 (iter $it)")(
            noop(idx.topKRerankIndexed(queries, 10, candMult = 256)))
        }

      // ---- decade probe: the DAG, disk-bounded ----
      // `dagprep` writes the seed/delta slices (capped by
      // SPARK_GRAFT_DAG_DOCS — this sandbox has ~52 GB free, and the
      // clean stage's shingle shuffle needs headroom on the same
      // filesystem; the caller deletes the source corpus between prep
      // and run to reclaim its bytes), `dag` runs the two batches.
      case "dagprep" =>
        val tag = sys.env.getOrElse("SPARK_GRAFT_DAG_OUT", "dag")
        rm(s"$out/$tag")
        val cap = sys.env.getOrElse("SPARK_GRAFT_DAG_DOCS", "10000000").toLong
        val srcD = if (dataDir.endsWith(".parquet")) dataDir
          else s"$dataDir/documents.parquet"
        val docs = spark.read.parquet(srcD).filter(col("doc_id") < cap)
        // hold out every 10th block of 1000 ids as the delta —
        // id-disjoint by construction (the CDC contract)
        val isDelta = (col("doc_id") % 10000L) >= 9000L
        timed(s"split seed/delta (cap $cap docs)") {
          docs.filter(!isDelta).write.mode("overwrite")
            .parquet(s"$out/$tag/seed.parquet")
          docs.filter(isDelta).write.mode("overwrite")
            .parquet(s"$out/$tag/delta.parquet")
        }
      case "dag" =>
        val tag = sys.env.getOrElse("SPARK_GRAFT_DAG_OUT", "dag")
        val seedP = s"$out/$tag/seed.parquet"
        val deltaP = s"$out/$tag/delta.parquet"
        val steps = "clean,scrub,mix"
        val common = Seq(s"out=$out/$tag/out", s"steps=$steps", "incremental=true",
          s"state=$out/$tag/state", "w=20", "mindocs=100", "budget=200000000")
        val rSeed = timed(s"DAG seed batch ($steps)")(
          graft.Main.runPipeline(spark, Seq("corpus-pipeline", s"in=$seedP",
            "batch=1") ++ common))
        println(s"[r12probe] seed: in=${rSeed.rowsIn} out=${rSeed.rowsOut}")
        val rDelta = timed(s"DAG delta batch ($steps)")(
          graft.Main.runPipeline(spark, Seq("corpus-pipeline", s"in=$deltaP",
            "batch=2") ++ common))
        println(s"[r12probe] delta: in=${rDelta.rowsIn} out=${rDelta.rowsOut}")
        println(s"[r12probe] state bytes: sig=${bytesOf(s"$out/$tag/state/sig")} " +
          s"survivors=${bytesOf(s"$out/$tag/state/survivors")} " +
          s"scrub_freq=${bytesOf(s"$out/$tag/state/scrub/freq")}")

      // ---- decade probe: trained-BPE pricing scan ----
      // (bpe/lex accept either a ScaleGen dir or a bare docs parquet —
      // the disk-bounded sequencing deletes the source corpus after
      // dagprep, so later arms read the seed slice)
      case "bpe" =>
        val srcP = if (dataDir.endsWith(".parquet")) dataDir
          else s"$dataDir/documents.parquet"
        val docs = spark.read.parquet(srcP)
          .select("doc_id", "lang", "text")
        val n = docs.count()
        timed(s"BPE-token supply aggregate ($n docs, builtin model)")(
          println(s"[r12probe] bpe tokens total: " +
            docs.select(size(graft.functions.Bpe.bpeEncode(col("text"),
                graft.functions.Bpe.builtin)).cast("long").as("t"))
              .agg(sum("t")).head().getLong(0)))

      // ---- decade probe: lexical index + serve ----
      case "lex" =>
        rm(s"$out/lex")
        val sliceN = sys.env.getOrElse("SPARK_GRAFT_LEX_DOCS", "10000000").toLong
        val srcL = if (dataDir.endsWith(".parquet")) dataDir
          else s"$dataDir/documents.parquet"
        val docs = spark.read.parquet(srcL)
          .select("doc_id", "text").filter(col("doc_id") < sliceN)
        val n = docs.count()
        val tindex = new graft.similarity.TextIndex(spark, s"$out/lex/tidx")
        timed(s"TextIndex build ($n docs, auto term layout)")(tindex.build(docs))
        tindex.describe().foreach { case (k, v) => println(s"[r12probe] tidx $k=$v") }
        // rare-term serve: one distinct marker per ~400 docs by the
        // ScaleGen vocabulary shape ("w"+alpha ids)
        val rareQ = (1 to 100).map(i => i -> s"w${i * 37}").toDF("query_id", "qtext")
        (1 to 2).foreach { it =>
          timed(s"rare-term serve, 100 queries (iter $it)")(
            noop(tindex.search(rareQ, 10)))
        }
        // the guarded stopword query, remedy on (the r11 wall shape)
        val stopQ = (1 to 100).map(i => i -> s"the w${i * 37}").toDF("query_id", "qtext")
        timed("stopword-bearing serve, maxDfFrac=0.1, 100 queries")(
          noop(tindex.search(stopQ, 10, maxDfFrac = 0.1)))

      case other => sys.error(s"unknown arm '$other' (sq8|dag|bpe|lex)")
    }
    spark.stop()
  }
}
