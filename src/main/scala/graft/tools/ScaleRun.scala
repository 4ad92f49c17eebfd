package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: the PERSISTENT-layer scaling scenario at a given SF dir —
  * the measurements PLANS.md's scaling sections report. The bench
  * times the stateless queries; this times the stateful loop the
  * engine runs in production:
  *
  *  1. CDC incremental clean — a 90% seed batch populates the
  *     signature index, then the 10% "nightly delta" is cleaned
  *     against it (timed), then a single-doc "streaming micro-batch"
  *     is cleaned (timed, with the pruned band-partition footprint
  *     printed: a point lookup must NOT read the accumulated index).
  *  2. Persistent ANN index — build on the embeddings, upsert a 1%
  *     delta under frozen models (timed), serve a 1k-query batch and a
  *     single query (timed, with files-opened vs live footprint).
  *
  * Not gate input; run manually:
  * {{{ runMain graft.tools.ScaleRun bench_scratch/sf10 /tmp/graft_scalerun }}}
  */
object ScaleRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("bench_scratch/sf10")
    val out = if (args.length > 1) args(1) else "/tmp/graft_scalerun"
    // "auto": build both persistent indexes with ALL-DEFAULT layout
    // knobs (nCells = buckets = termParts = 0) — validates that the
    // r6 corpus-sizing defaults pick a sane layout at scale, not just
    // that hand-tuned knobs do. Footprint lines print the RESOLVED
    // layout either way.
    val auto = args.length > 2 && args(2) == "auto"
    val spark = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    def timed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scalerun] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- 1. incremental clean against the signature index ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "text").cache()
    val nDocs = docs.count()
    val sig = new graft.streaming.SigIndex(spark, s"$out/sig", idCol = "doc_id")
    timed(s"seed clean (${nDocs * 9 / 10} docs, batch 0)") {
      noop(graft.queries.PipelineQueries.corpusCleanIncremental(
        docs.filter(col("doc_id") % 10 =!= 0L), sig, 0L))
    }
    timed(s"delta clean (${nDocs / 10} docs, batch 1)") {
      noop(graft.queries.PipelineQueries.corpusCleanIncremental(
        docs.filter(col("doc_id") % 10 === 0L), sig, 1L))
    }
    // the streaming point-lookup shape: ONE fresh doc vs the full index
    val one = docs.filter(col("doc_id") === 42L)
      .withColumn("doc_id", col("doc_id") + 900000000L)
    timed("micro-batch clean (1 doc, batch 2)") {
      noop(graft.queries.PipelineQueries.corpusCleanIncremental(one, sig, 2L))
    }
    // footprint of that micro-batch's band probe (≤16 band keys)
    val bNew = one.select(col("doc_id"),
        graft.dedup.Dedup.minhashSignature(
          graft.dedup.Dedup.shingles(col("text"), 3), 128).as("sig"))
      .withColumn("bh", graft.dedup.Dedup.bandHashes(col("sig"), 16, 8))
      .select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "h")))
    val parts = sig.partsFor(bNew)
    println(s"[scalerun] 1-doc band probe: ${sig.bands.filesForPartitions(parts).size} " +
      s"of ${sig.bands.liveFileCount} band-store files " +
      s"(${parts.size} of 64 partitions; sig rows=${sig.read().map(_.count()).getOrElse(0L)})")

    // ---- 1b. embedding near-dup pairs at the parameters this corpus
    // size needs. The GATE query pins τ=0.4 with 6×8-bit bands — the
    // sf0.1 noise floor. At 200k random 64-dim vectors the pairwise
    // cosine noise is σ=1/√64: τ=0.4 sits at 3.2σ, so ~10⁷ random
    // pairs genuinely cross it and the PAIR SET itself is quadratic —
    // no algorithm fixes a threshold that admits noise. A real clean
    // at this size runs τ=0.8 (planted dups ≈ 0.9996) with longer
    // bands (4×15 bits: random collision 4·2⁻¹⁵, near-dup miss
    // ~(1−0.87)⁴) — banding selectivity must scale with corpus. ----
    val embAll = spark.read.parquet(s"$sfDir/embeddings.parquet")
    timed(s"embedding near-dup pairs (τ=0.8, 4×15-bit bands)") {
      noop(graft.dedup.Dedup.embeddingLshPairs(embAll, col("embedding"), "vec_id",
        minCosine = 0.8, dim = 64, bands = 4, bitsPerBand = 15))
    }

    // ---- 2. persistent ANN index ----
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")).cache()
    val nVecs = vecs.count()
    // layout sized to the data, not defaults: nCells from the 4√n
    // guideline (bounded by the fit sample), buckets so the
    // (bucket × cell) file floor yields sanely-sized files — the
    // first run used 32×64 = 2048 files for ~30 MB of codes and paid
    // ~7 ms/file open on every read
    // auto leaves nProbe = 0 too: the probe budget must track the
    // corpus-sized cell count (suggestNProbe), and this run measures
    // the recall that validates it
    val idx = if (auto)
      new graft.similarity.PqIndex(spark, s"$out/idx", opq = true)
    else {
      val cells = graft.similarity.Similarity.suggestNCells(nVecs, sampleN = 2000)
      new graft.similarity.PqIndex(spark, s"$out/idx",
        nCells = cells, nProbe = 8, opq = true, buckets = 4)
    }
    timed(s"index build ($nVecs vecs, OPQ+IVF-PQ, ${if (auto) "auto" else "manual"} layout)") {
      idx.build(vecs.filter(col("id") % 100 =!= 0L))
    }
    locally {
      val bc = new graft.sources.SnapshotStore(spark, s"$out/idx/codes",
        key = "neighbor_id").bucketCount
      println(s"[scalerun] codes layout: ${idx.models()._2.nCells} cells × " +
        s"${bc.getOrElse(-1)} buckets")
    }
    timed(s"index add (${nVecs / 100} vec delta under frozen models)") {
      idx.add(vecs.filter(col("id") % 100 === 0L)
        .withColumn("id", col("id") + 800000000L))
    }
    println(s"[scalerun] add probe: ${idx.lastAddProbe._1} buckets key-scanned, " +
      s"${idx.lastAddProbe._2} bloom-cleared")
    idx.compact()
    val queries1k = vecs.filter(col("id") % 200 === 3L).limit(1000).cache()
    queries1k.count()
    timed("serve 1k-query batch (topK=10)") { noop(idx.topK(queries1k, 10)) }
    val query1 = queries1k.limit(1).cache()
    query1.count()
    timed("serve 1 query (topK=10)") { noop(idx.topK(query1, 10)) }
    val (model, coarse, rot) = idx.modelsWithRotation()
    val np = idx.resolvedNProbe
    val cells1 = graft.similarity.Pq.probeCells(query1, model, coarse, np, rot)
    val (opened, live) = idx.scanFootprint(cells1)
    println(s"[scalerun] 1-query probe: $opened of $live codes files " +
      s"(${cells1.size} of ${coarse.nCells} cells, nProbe=$np)")
    val cells1k = graft.similarity.Pq.probeCells(queries1k, model, coarse, np, rot)
    val (opened1k, _) = idx.scanFootprint(cells1k)
    println(s"[scalerun] 1k-query probe: $opened1k of $live codes files " +
      s"(${cells1k.size} of ${coarse.nCells} cells, nProbe=$np)")
    // recall@10 against brute force over what the index actually holds
    // (seed + shifted delta) — the number that validates the auto
    // layout end-to-end: probe fraction without recall is half a claim.
    // One-off O(1k × corpus) validation cost, same idea as build-time
    // recall checks in production (bounded query sample).
    val indexed = vecs.filter(col("id") % 100 =!= 0L).unionByName(
      vecs.filter(col("id") % 100 === 0L).withColumn("id", col("id") + 800000000L))
    timed("recall@10 (1k queries vs brute force)") {
      val r = idx.recallAt(queries1k, indexed, 10)
      println(f"[scalerun] recall@10 = $r%.3f (nProbe=$np of ${coarse.nCells} cells)")
    }

    // ---- 3. persistent lexical index (TextIndex) ----
    // same layout arithmetic as the codes store: termParts is the
    // probe dimension (a query reads |its terms| partitions of the
    // postings), buckets × termParts is the file floor
    val tidx = if (auto) new graft.similarity.TextIndex(spark, s"$out/tidx")
      else new graft.similarity.TextIndex(spark, s"$out/tidx",
        buckets = 4, termParts = 64)
    timed(s"text index build ($nDocs docs, ${if (auto) "auto" else "manual"} layout)") {
      tidx.build(docs.select("doc_id", "text"))
    }
    locally {
      val bc = new graft.sources.SnapshotStore(spark, s"$out/tidx/postings",
        key = "doc_id").bucketCount
      println(s"[scalerun] postings layout: ${tidx.frozenTermParts} term " +
        s"partitions × ${bc.getOrElse(-1)} buckets")
    }
    timed(s"text index add (${nDocs / 100} doc delta)") {
      tidx.add(docs.filter(col("doc_id") % 100 === 7L)
        .select("doc_id", "text")
        .withColumn("doc_id", col("doc_id") + 700000000L))
    }
    val tq = docs.filter(col("doc_id") % 500 === 11L).limit(100)
      .select((col("doc_id") % 1000000L).cast("int").as("query_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 3)).as("qtext")).cache()
    tq.count()
    timed("text search 100-query batch (topK=10)") { noop(tidx.search(tq, 10)) }
    val tq1 = tq.limit(1).cache()
    tq1.count()
    timed("text search 1 query (topK=10)") { noop(tidx.search(tq1, 10)) }
    val tparts = tidx.probeParts(tq1.head().getString(1))
    val (topen, tlive) = tidx.scanFootprint(tparts)
    println(s"[scalerun] 1-query term probe: $topen of $tlive postings files " +
      s"(${tparts.size} of ${tidx.frozenTermParts} term partitions)")
    spark.stop()
  }
}
