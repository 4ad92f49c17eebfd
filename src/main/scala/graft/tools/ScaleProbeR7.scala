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
    val cand = docs.filter(col("doc_id") % 17 =!= 0)
    val tgt = docs.filter(col("doc_id") % 17 === 0)
    timed("dsir-select (keep 20%)") {
      noop(graft.queries.PipelineQueries.corpusDsirSelectDocs(cand, tgt, 0.2))
    }

    // ---- 2. decontamination: exact broadcast vs bloom prefilter ----
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
