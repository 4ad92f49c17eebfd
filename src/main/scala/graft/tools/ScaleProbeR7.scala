package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: times the round-7 additions at an sf10-scale corpus —
  * DSIR importance selection, bloom-vs-exact decontamination, and the
  * keyed DELETE path — the numbers PLANS.md's round-7 section reports.
  *
  * Not gate input; run manually:
  * {{{ runMain graft.tools.ScaleProbeR7 bench_scratch/sf10 /tmp/graft_r7probe }}}
  */
object ScaleProbeR7 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench_scratch/sf10")
    val out = if (args.length > 1) args(1) else "/tmp/graft_r7probe"
    // optional stage filter, e.g. "scrub,semdedup" — the late-round
    // stages shouldn't pay for a rerun of the measured early ones
    val stages: Set[String] = if (args.length > 2)
      args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet else Set.empty
    def on(s: String): Boolean = stages.isEmpty || stages(s)
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[r7probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").cache()
    println(s"[r7probe] corpus: ${docs.count()} docs")

    // ---- 1. DSIR importance selection ----
    if (on("dsir")) {
      val cand = docs.filter(col("doc_id") % 17 =!= 0)
      val tgt = docs.filter(col("doc_id") % 17 === 0)
      timed("dsir-select (keep 20%)") {
        noop(graft.queries.PipelineQueries.corpusDsirSelectDocs(cand, tgt, 0.2))
      }
    }

    // ---- 2. decontamination: exact broadcast vs bloom prefilter ----
    if (on("decon")) {
      val evals = docs.filter(col("doc_id") % 97 === 0)
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      println(s"[r7probe] eval slice: ${evals.count()} docs")
      timed("decontaminate exact")(
        noop(graft.queries.PipelineQueries.corpusDecontaminateDocs(train, evals, 5)))
      timed("decontaminate bloom")(
        noop(graft.queries.PipelineQueries.corpusDecontaminateDocsBloom(train, evals, 5)))
      // candidate volume the bloom admits into the verify join vs the
      // full gram stream the exact form shuffles nothing of but the
      // bloom form would without the prefilter
      val totalGrams = graft.queries.PipelineQueries
        .decontaminateGrams(train, 5).count()
      val evalG = graft.queries.PipelineQueries
        .decontaminateGrams(evals, 5).select("sh").distinct()
      val bloom = evalG.stat.bloomFilter("sh", math.max(64L, evalG.count()), 0.001)
      val bytes = new java.io.ByteArrayOutputStream(); bloom.writeTo(bytes)
      import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
      val candGrams = graft.queries.PipelineQueries.decontaminateGrams(train, 5)
        .filter(ofExpr(graft.functions.expr.BloomMightContain(
          toExpr(col("sh")), bytes.toByteArray))).count()
      println(f"[r7probe] bloom verify-join input: $candGrams%,d of $totalGrams%,d grams " +
        f"(${100.0 * candGrams / totalGrams}%.2f%%)")
    }

    // ---- 4. cross-doc repeated-span scrub ----
    if (on("scrub")) {
      // frequency pass (ends in the bounded hot-table collect) timed
      // apart from the rebuild: the two scans are the whole cost model
      timed("corpus_scrub (freq pass + scan-local rebuild)") {
        val scrubbed = graft.queries.PipelineQueries.scrubDocs(
          docs.select("doc_id", "text"),
          graft.queries.PipelineQueries.ScrubChunkWords,
          graft.queries.PipelineQueries.ScrubMinDocs)
        noop(scrubbed)
      }
      val res = graft.queries.PipelineQueries.scrubDocs(
        docs.select("doc_id", "text"),
        graft.queries.PipelineQueries.ScrubChunkWords,
        graft.queries.PipelineQueries.ScrubMinDocs)
      val st = res.agg(count(lit(1)), sum(col("n_scrubbed")),
        sum(when(col("n_scrubbed") > 0, 1L).otherwise(0L))).head()
      println(s"[r7probe] scrub: ${st.getLong(0)} docs, ${st.getLong(1)} spans " +
        s"removed across ${st.getLong(2)} docs")
    }

    // ---- 5. semantic dedup at the near-dup operating point ----
    if (on("semdedup")) {
      val embs = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
      val nVec = embs.count()
      val cells = graft.similarity.Similarity.suggestNCells(nVec)
      println(s"[r7probe] semdedup: $nVec vectors, $cells cells (suggestNCells)")
      val base = embs.select(col("vec_id").as("id"), col("embedding").as("vec"))
      val model = timed(s"semdedup ivfFit ($cells cells)")(
        graft.similarity.Similarity.ivfFit(base, cells))
      // cell-size profile BEFORE the join — the fit-quality check the
      // operator doc tells callers to run (max cell drives the tile cost)
      val sizes = base
        .select(graft.similarity.Similarity.ivfAssign(col("vec"), model).as("cell"))
        .groupBy("cell").count().agg(max("count"), avg("count")).head()
      println(f"[r7probe] semdedup cells: max ${sizes.getLong(0)}%,d avg ${sizes.getDouble(1)}%.0f")
      var pairs = -1L
      timed("semdedup pairs (tau=0.8)") {
        pairs = graft.dedup.Dedup.semdedupPairs(embs, col("embedding"), "vec_id",
          nClusters = cells, minCosine = 0.8, prefit = Some(model)).count()
      }
      println(s"[r7probe] semdedup pairs found: $pairs")
      // the established scale path on the same corpus/threshold — the
      // candidate-generation trade the PLANS.md table compares
      var lshPairs = -1L
      timed("embedding LSH tight pairs (tau=0.8)") {
        lshPairs = graft.queries.DedupQueries
          .dedupEmbeddingLshTight(embs, "vec_id", "embedding").count()
      }
      println(s"[r7probe] LSH tight pairs found: $lshPairs")
      embs.unpersist()
    }

    if (!on("delete")) { spark.stop(); return }

    // ---- 3. keyed DELETE through SnapshotStore ----
    val store = new graft.sources.SnapshotStore(spark, s"$out/snap",
      key = "doc_id", buckets = 32)
    timed("store overwrite (500k rows, 32 buckets)")(store.overwrite(docs))
    def delCase(name: String, doomed: org.apache.spark.sql.DataFrame): Unit = {
      val n = doomed.count()
      val removed = timed(s"store delete $name ($n keys)")(store.delete(doomed))
      val (scanned, cleared) = store.lastProbeStats
      println(s"[r7probe]   removed $removed rows; buckets key-scanned $scanned, " +
        s"bloom-cleared without scan $cleared, untouched ${32 - scanned - cleared}")
    }
    // spread takedown: keys land in every bucket — the worst case,
    // cost ≈ full rewrite because every bucket genuinely collides
    delCase("spread", docs.select("doc_id").filter(col("doc_id") % 499 === 0))
    // small takedown: the case the path exists for — a handful of
    // keys touch a handful of buckets, everything else is untouched
    delCase("small", docs.select("doc_id").filter(col("doc_id") % 49999 === 0))
    // absent keys (replayed takedown): blooms clear every bucket, no
    // version is committed, cost is the probe only
    delCase("absent-replay",
      spark.range(1, 11).select((col("id") + 10000000L).as("doc_id")))

    spark.stop()
  }
}
