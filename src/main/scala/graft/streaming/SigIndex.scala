package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** Persistent near-duplicate signature index — the accumulated state of
  * the streaming dedup paths ([[Streaming.dedupNearStream]] /
  * [[Streaming.dedupNearEmbeddingStream]]) and the CDC corpus clean
  * ([[graft.queries.PipelineQueries.corpusCleanIncremental]]).
  *
  * Two keyed [[graft.sources.SnapshotStore]]s under `dir`, laid out so
  * every per-batch read is PRUNED instead of a full-index scan:
  *
  *  - `bands/` — one row per (doc, band): `(bk, <id>, band, h, hb,
  *    batch_id)`, keyed by `bk = "<id>:<band>"`, PARTITIONED by
  *    `hb = hash(band, h) % bandParts`. A micro-batch's candidate
  *    lookup computes the same `hb` for its own band keys and opens
  *    only those partitions' files — O(batch keys / bandParts) of the
  *    store, not O(index). At 10⁹ indexed docs a small micro-batch
  *    reads a few partitions of a few thousand, where the previous
  *    single-store design re-read ~1 TB of signatures per batch.
  *  - `sigs/` — one row per doc: `(<id>, sig, batch_id)`, keyed by the
  *    id. Candidate verification fetches ONLY the candidate old ids'
  *    key buckets ([[graft.sources.SnapshotStore.readForKeys]]).
  *
  * Splitting the stores keeps the (large) signature out of the
  * per-band rows — duplicating a 128-long MinHash signature across 16
  * band rows would grow the index 16×; here each store holds each
  * datum once and each read path prunes on its own access key.
  *
  * Replay safety is unchanged from the single-store design: every row
  * carries the `batch_id` that wrote it, readers exclude THIS batch's
  * rows, and both upserts are keyed — an at-least-once re-delivery
  * recomputes the same survivors and overwrites the same rows, even if
  * the previous attempt crashed between the two store writes.
  */
/** `bandParts` = 0 (the default) ADOPTS the layout a prior writer
  * froze in `meta.txt`, or 64 for a fresh index. Unlike the
  * build-time-sized indexes (PqIndex/TextIndex), this store GROWS
  * from empty — there is no build step that knows the final corpus,
  * so the layout must be chosen for the TARGET scale at creation:
  * pass [[SigIndex.suggestBandParts]](expected docs) for the first
  * writer. A 1-doc probe opens ≤ its ~16 band keys' partitions, so
  * the pruned fraction is ~16/bandParts — 64 is right for local/test
  * corpora; a 1e9-doc deployment wants ~9.5k parts (0.2% probes,
  * ~64 MiB partitions). An EXPLICIT non-zero value that disagrees
  * with the recorded one still refuses loudly: hashing probes with a
  * different modulus than the writer silently misses candidates. */
final class SigIndex(spark: SparkSession, dir: String, idCol: String,
                     idBuckets: Int = 32, bandParts: Int = 0) {

  private[graft] val sigs =
    new graft.sources.SnapshotStore(spark, s"$dir/sigs", key = idCol, buckets = idBuckets)
  private[graft] val bands =
    new graft.sources.SnapshotStore(spark, s"$dir/bands", key = "bk",
      buckets = idBuckets, partitionCol = Some("hb"))

  // hb is baked into the layout at write time: a reader MUST hash its
  // probe keys with the same modulus or pruning silently misses
  // candidates. Persist it once; on reopen, 0 adopts the recorded
  // value and an explicit mismatch is a configuration error, not a
  // degraded mode.
  private val metaPath = new Path(s"$dir/meta.txt")
  private def fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def readMetaLine(prefix: String): Option[Int] =
    if (!fs.exists(metaPath)) None
    else {
      val in = fs.open(metaPath)
      val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      text.linesIterator.collectFirst {
        case l if l.startsWith(s"$prefix=") => l.stripPrefix(s"$prefix=").toInt
      }
    }
  private def readMeta(): Option[Int] = readMetaLine("bandParts")
  /** The banding width (bands per doc) the first writer froze — like
    * `bandParts`, a per-index constant (a writer with a DIFFERENT
    * banding config would probe band indices that mean different
    * things, so the config is frozen with the layout). Recorded since
    * r14; legacy indexes lack the line and [[delete]] falls back to a
    * column-pruned max(band) scan. */
  private def readMetaBands(): Option[Int] = readMetaLine("bands")
  private val resolvedBandParts: Int = {
    val recorded = readMeta()
    require(bandParts == 0 || recorded.forall(_ == bandParts),
      s"index at $dir was written with bandParts=${recorded.getOrElse(-1)}, " +
        s"opened with $bandParts")
    recorded.getOrElse(if (bandParts > 0) bandParts else 64)
  }
  private def ensureMeta(bandsPerDoc: Int): Unit =
    if (!fs.exists(metaPath)) {
      val tmp = new Path(s"$dir/.tmp-meta-${java.util.UUID.randomUUID}")
      val out = fs.create(tmp, true)
      try {
        val b = bandsPerDoc
        // an empty first batch can't witness the banding width; leave
        // the line out rather than freeze a wrong 0 (delete's scan
        // fallback covers a meta without it, same as legacy indexes)
        val bandsLine = if (b > 0) s"bands=$b\n" else ""
        out.write(s"bandParts=$resolvedBandParts\n$bandsLine"
          .getBytes(StandardCharsets.UTF_8))
      } finally out.close()
      fs.rename(tmp, metaPath)
      // two concurrent FIRST writers with different explicit bandParts
      // can both pass the exists-check; the loser's rename silently
      // fails on no-overwrite filesystems and it would proceed to hash
      // band rows with a modulus meta.txt doesn't record — the silent
      // candidate miss this file exists to prevent. Re-reading after
      // the rename makes the loser fail loudly whatever rename did.
      require(readMeta().contains(resolvedBandParts),
        s"index at $dir lost the bandParts=$resolvedBandParts publish race " +
          s"(recorded: ${readMeta().getOrElse(-1)}) — reopen with bandParts=0")
    } else {
      require(readMeta().forall(_ == resolvedBandParts),
        s"index at $dir changed bandParts concurrently")
      // banding WIDTH gets the same loud-refusal discipline as
      // bandParts: a writer with a different width (e.g. a MinHash
      // 16-band and an RHP 6-band pipeline sharing one dir) would
      // append band rows delete() can never reach — its exact-key
      // generation spans only the frozen width, so orphan band rows
      // would survive every takedown and trip sigsFor's corruption
      // error on the next clean batch. An empty batch (width 0)
      // witnesses nothing and passes.
      readMetaBands() match {
        case Some(frozen) =>
          require(bandsPerDoc == 0 || bandsPerDoc == frozen,
            s"index at $dir was written with bands=$frozen per doc; this " +
              s"batch carries $bandsPerDoc — one banding config per index " +
              "(a different writer must use its own directory)")
        case None if bandsPerDoc > 0 =>
          // meta without the line (legacy index, or a first batch that
          // was EMPTY and couldn't witness the width): the refusal
          // above never arms, so a mixed-width writer would slip in.
          // Freeze the width NOW, at the first non-empty append —
          // verified against the history's own witness first (one
          // column-pruned max(band) scan; an empty history witnesses
          // nothing), then published with the same tmp + rename +
          // re-read discipline as bandParts (the rename may need a
          // delete first on no-overwrite filesystems; the re-read
          // makes every interleaving fail loudly, never silently).
          val observed = bands.read() match {
            case None => 0
            case Some(df) =>
              df.agg(coalesce(max(col("band")), lit(-1))).head().getInt(0) + 1
          }
          require(observed == 0 || observed == bandsPerDoc,
            s"index at $dir carries history with bands=$observed per doc; " +
              s"this batch carries $bandsPerDoc — one banding config per " +
              "index (a different writer must use its own directory)")
          val tmp = new Path(s"$dir/.tmp-meta-${java.util.UUID.randomUUID}")
          val out = fs.create(tmp, true)
          try out.write(s"bandParts=$resolvedBandParts\nbands=$bandsPerDoc\n"
            .getBytes(StandardCharsets.UTF_8))
          finally out.close()
          fs.delete(metaPath, false)
          fs.rename(tmp, metaPath)
          require(readMeta().contains(resolvedBandParts) &&
            readMetaBands().contains(bandsPerDoc),
            s"index at $dir lost the bands=$bandsPerDoc publish race " +
              s"(recorded: ${readMetaBands().getOrElse(-1)}) — retry the append")
        case None => // empty batch: width stays unfrozen, as at create
      }
    }

  private def hb(band: Column, h: Column): Column =
    pmod(hash(band, h), lit(resolvedBandParts))

  /** Rows written before batch_id existed (schema evolution nulls) are
    * HISTORY, not this batch — a plain =!= would null-out and wrongly
    * exclude them. */
  private def excludeBatch(df: DataFrame, batchId: Long): DataFrame =
    if (df.columns.contains("batch_id"))
      df.filter(col("batch_id").isNull || col("batch_id") =!= lit(batchId))
    else df

  def exists: Boolean = sigs.exists

  /** The full signature table (one row per indexed doc) — monitoring /
    * spec surface, NOT the serving read path. */
  def read(): Option[DataFrame] = sigs.read()

  /** The band partitions a batch's keys hash into — the prune list
    * [[candidates]] reads (exposed for spec/monitoring footprints). */
  private[graft] def partsFor(bNew: DataFrame): Seq[Int] =
    bNew.select(hb(col("band"), col("h")).as("hb")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted

  /** Big-delta controls (see [[candidates]]): once a batch's keys
    * touch at least this fraction of the band layout, the partition
    * prune has stopped biting and the delta-key bloom prefilter takes
    * over on the history side. */
  private val PruneDeadFrac = 0.5
  /** Bloom FPP for the prefilter — a false positive only reaches the
    * exact equi-join and dies there, so this buys size, not
    * correctness (~8.7 bits/key at 0.02). */
  private val BloomFpp = 0.02
  /** Reads predicted above this warn loudly with the batch-size rule
    * (spec injection point; default 1 GiB so sub-scale batches — which
    * trivially touch every partition of a 64-part test layout — stay
    * quiet). */
  private[graft] var warnReadBytesFloor: Long = 1L << 30
  /** Whether the last [[candidates]] call found the partition prune
    * dead, and the predicted read bytes of the touched partitions
    * (spec/monitoring). */
  private[graft] var lastCandidateProbe: (Boolean, Long) = (false, 0L)
  /** Opt-in delta-key bloom prefilter on the history side of a
    * prune-dead probe. MEASURED OFF by default: at 45M history band
    * rows on local[32] the bloom lost ~2× to the plain equi-join
    * (PLANS r13 A/B — build 4-16 s for an 8 MB bloom over 12.8M
    * delta keys, plus ~6 random probes/row thrashing the shared L3
    * across 32 threads), because the shuffle it eliminates is
    * intra-machine memcpy there. The win it buys — only colliding
    * history rows ever serialize into the join exchange — is
    * network-bound-cluster shaped; enable it deliberately on
    * deployments where the band store shuffles across racks, and
    * measure (the correctness spec pins bloom == plain on identical
    * input either way: an FP only reaches the exact join and dies). */
  var bloomPrefilter: Boolean = false

  /** Historical candidate pairs for a batch: `(<id>, old_id)` sharing
    * any (band, h) key, this batch's own (replayed) writes excluded.
    * `bNew` needs `(<id>, band, h)`.
    *
    * Two prune regimes, detected per batch:
    *  - SMALL delta (keys touch < [[PruneDeadFrac]] of the layout):
    *    opens only the batch keys' band partitions — O(batch keys /
    *    bandParts) of the store, the design point.
    *  - BIG delta: a batch with |delta|·bands ≳ bandParts keys hashes
    *    into EVERY partition, and the r12 sf1000 probe measured
    *    exactly that (a 1.08M-doc delta's ~16M band keys → full band-
    *    store read, 0.44 vs 0.12 ms/doc). The columnar READ of the
    *    touched partitions is then unavoidable without a second
    *    storage order — the honest floor — so the operator dial is
    *    BATCH SIZE: the read cost is per-batch, so fewer/bigger
    *    batches amortize it (measured r13: 1.04 → 0.45 → 0.22 ms/doc
    *    as the delta grows 50k → 200k → 800k against a 2.8M-doc
    *    history). When the predicted read exceeds
    *    [[warnReadBytesFloor]] the batch warns, naming that rule and
    *    the layout knob. [[bloomPrefilter]] optionally also cuts the
    *    history SHUFFLE to key-colliding rows (+ [[BloomFpp]] false
    *    positives, which the exact equi-join then discards) through
    *    Spark's codegen `BloomFilterMightContain` over the same
    *    `xxhash64(band, h)` both sides hash — semantics-preserving by
    *    construction, but measured a net LOSS on a single node (see
    *    the field doc), so it is opt-in for network-bound clusters. */
  def candidates(bNew: DataFrame, batchId: Long): DataFrame = {
    // n = band ROWS per partition (duplicate (band,h) keys counted);
    // nd = DISTINCT keys per partition — hb is a pure function of
    // (band,h), so per-partition distincts sum to the global distinct
    // count, and it is measured on exactly the xxhash64(band,h) value
    // set the bloom will hold, so the bloom is sized to its true
    // item count instead of the row count (the r13 ADVICE oversize:
    // total rows overstate keys whenever docs share band hashes)
    val keyed = bNew.groupBy(hb(col("band"), col("h")).as("hb"))
      .agg(count(lit(1)).as("n"),
        count_distinct(xxhash64(col("band"), col("h"))).as("nd")).collect()
    val parts = keyed.map(_.getInt(0)).toSeq.sorted
    val nRows = keyed.map(_.getLong(1)).sum
    val nKeys = keyed.map(_.getLong(2)).sum
    // reset up front: every exit (including the empty-store one)
    // reports THIS call, never a previous batch's probe
    lastCandidateProbe = (false, 0L)
    bands.readPartitions(parts) match {
      case None => bNew.select(col(idCol), col(idCol).as("old_id")).limit(0)
      case Some(hist0) =>
        val hist1 = excludeBatch(hist0, batchId)
        val pruneDead =
          parts.size >= math.max(1.0, resolvedBandParts * PruneDeadFrac)
        if (pruneDead) {
          // manifest paths are store-relative (the readFiles contract)
          val files = bands.filesForPartitions(parts)
          val readBytes = files.map { f =>
            val p = new Path(s"$dir/bands/$f")
            try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .getFileStatus(p).getLen
            catch { case _: java.io.IOException => 0L }
          }.sum
          lastCandidateProbe = (true, readBytes)
          if (readBytes > warnReadBytesFloor)
            System.err.println(s"[graft] SigIndex.candidates WARNING: this " +
              s"batch's $nRows band rows ($nKeys distinct keys) touch ${parts.size} of " +
              s"$resolvedBandParts band partitions — the partition prune is " +
              s"dead and the history probe will READ ~$readBytes bytes of " +
              "signature state (columnar, never text). The read is per-batch: " +
              "size batches so |delta| <= bandParts/bands docs " +
              s"(~${resolvedBandParts / 16} here at the 16-band default — " +
              "divide by YOUR band count) to keep the prune biting, or batch " +
              "bigger deltas to amortize it; create the NEXT index with " +
              "bandParts=SigIndex.suggestBandParts(target docs)")
        }
        val hist = if (!(pruneDead && bloomPrefilter)) hist1
        else {
          val tB = System.nanoTime()
          val bloom = bNew.select(xxhash64(col("band"), col("h")).as("hk"))
            .stat.bloomFilter("hk", math.max(nKeys, 1L), BloomFpp)
          val bos = new java.io.ByteArrayOutputStream()
          bloom.writeTo(bos)
          System.err.println(f"[graft] SigIndex bloom prefilter: built in " +
            f"${(System.nanoTime() - tB) / 1e9}%.2f s, ${bos.size} bytes")
          import org.apache.spark.sql.graftbridge.ColumnBridge.{column => ofExpr, expression => toExpr}
          hist1.filter(ofExpr(
            org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
              org.apache.spark.sql.catalyst.expressions.Literal(
                bos.toByteArray, org.apache.spark.sql.types.BinaryType),
              toExpr(xxhash64(col("band"), col("h"))))))
        }
        bNew.join(hist.select(col(idCol).as("old_id"), col("band"), col("h")),
            Seq("band", "h"))
          .filter(col("old_id") =!= col(idCol))
          .select(idCol, "old_id").distinct()
    }
  }

  /** Signatures of candidate old ids as `(old_id, old_sig)` — reads
    * only the ids' key buckets. */
  def sigsFor(oldIds: DataFrame, batchId: Long): DataFrame =
    sigs.readForKeys(oldIds.select(col("old_id").as(idCol))) match {
      // unreachable through the dedup paths (append writes sigs BEFORE
      // bands, so a band row implies its sig row): a miss here means
      // the store is corrupt — fail loudly, don't silently keep dups
      case None => sys.error(s"sig index at $dir has band rows but no signatures")
      case Some(df) => excludeBatch(df, batchId)
        .select(col(idCol).as("old_id"), col("sig").as("old_sig"))
    }

  /** Append a batch's survivors (`(<id>, sig, bh)`) under `batchId`:
    * keyed upserts into both stores — replays overwrite the same rows.
    * A crash between the two writes is repaired by the replay for the
    * same reason (both readers exclude the batch's own rows). */
  def append(signed: DataFrame, batchId: Long): Unit = {
    ensureMeta(signed.agg(coalesce(max(size(col("bh"))), lit(0))).head().getInt(0))
    sigs.upsert(signed.select(col(idCol), col("sig"), lit(batchId).as("batch_id")))
    bands.upsert(signed
      .select(col(idCol), posexplode(col("bh")).as(Seq("band", "h")))
      .select(concat_ws(":", col(idCol), col("band")).as("bk"),
        col(idCol), col("band"), col("h"),
        hb(col("band"), col("h")).as("hb"), lit(batchId).as("batch_id")))
  }

  /** TAKEDOWN through the dedup state — the right-to-be-forgotten
    * sweep's missing store (r13 VERDICT #1): without it, a doc
    * removed from the corpus ([[graft.similarity.PqIndex.remove]] /
    * [[graft.similarity.TextIndex.delete]] / SnapshotStore.delete)
    * keeps its band + sig rows here forever, so every FUTURE
    * near-copy is silently suppressed against a ghost canonical that
    * no longer exists downstream. Delete removes both:
    *
    *  - band rows by their exact keys: `bk = "<id>:<band>"` for band
    *    0..bands-1, generated from the meta-frozen banding width (the
    *    width is a per-index constant like `bandParts` — a writer
    *    with a different banding config would already be semantically
    *    broken against this history). A legacy meta without the line
    *    resolves the width ONCE per instance from a column-pruned
    *    max(band) scan (logged). Over-generating keys for a doc with
    *    fewer bands is a committed no-op (SnapshotStore.delete on
    *    absent keys), so the resolved width only needs to be an upper
    *    bound. The delete is keyed → bloom-pruned, O(touched buckets).
    *  - sig rows by id (the store key) — same keyed O(touched buckets).
    *
    * Band rows go FIRST (the [[graft.similarity.PqIndex.remove]]
    * ordering argument, mirrored): after the band delete the doc can
    * never surface as a candidate — [[candidates]] joins on band rows
    * — so a crash before the sig delete leaves only an UNREACHABLE
    * sig row ([[sigsFor]] fetches candidates' old ids only), which a
    * replayed delete clears. The reverse order would leave band rows
    * whose sig lookup trips [[sigsFor]]'s corruption error on every
    * later batch. Deleting absent ids is a no-op (idempotent
    * replays); [[vacuum]] is what makes the bytes unrecoverable —
    * run it after legally-binding takedowns, as with the other
    * stores. Returns (docs removed, band rows removed). */
  def delete(ids: DataFrame): (Long, Long) = {
    if (!exists) return (0L, 0L)
    // two keyed deletes must see ONE key set (the PqIndex.remove rule)
    val keys = ids.select(col(ids.columns.head).as(idCol)).distinct()
      .localCheckpoint()
    val nBands = resolvedBands()
    val bandRows =
      if (nBands == 0) 0L
      else {
        val spark0 = ids.sparkSession
        import spark0.implicits._
        val bks = keys.crossJoin((0 until nBands).toDF("band"))
          .select(concat_ws(":", col(idCol), col("band")).as("bk"))
        bands.delete(bks)
      }
    val sigRows = sigs.delete(keys)
    (sigRows, bandRows)
  }

  // cached per instance: repeated takedown batches pay the legacy
  // fallback scan once, not per call. A 0 (EMPTY legacy band store)
  // is deliberately NOT cached: an append can land between deletes
  // and a stale 0 would silently skip the band rows forever after —
  // the exact ghost-canonical bug delete exists to fix.
  private var cachedBands: Option[Int] = None
  private def resolvedBands(): Int = cachedBands.getOrElse {
    val b = readMetaBands().getOrElse {
      System.err.println(s"[graft] SigIndex.delete: meta at $dir predates the " +
        "frozen banding width — resolving it once from a column-pruned " +
        "max(band) scan of the band store")
      bands.read() match {
        case None => 0
        case Some(df) =>
          df.agg(coalesce(max(col("band")), lit(-1))).head().getInt(0) + 1
      }
    }
    if (b > 0) cachedBands = Some(b)
    b
  }

  /** Compact both stores toward their layout floors (see
    * [[graft.sources.SnapshotStore.compact]]); returns buckets
    * compacted. Run periodically under continuous maintenance. */
  def compact(maxFilesPerBucket: Int = 1): Int =
    sigs.compact(maxFilesPerBucket) + bands.compact(maxFilesPerBucket)

  /** Reclaim superseded files in both stores. */
  def vacuum(keepVersions: Int = 1, minAgeMs: Long = 3600L * 1000L): Long =
    sigs.vacuum(keepVersions, minAgeMs) + bands.vacuum(keepVersions, minAgeMs)

  /** Operator-facing store report — the numbers a compact / vacuum
    * decision reads (`Main sig-stats`). Manifest metadata plus one
    * row-count job on the (smaller) sig store. */
  def describe(): Seq[(String, String)] =
    if (!exists) Seq("built" -> "false")
    else Seq(
      "built" -> "true",
      "docs" -> sigs.read().map(_.count()).getOrElse(0L).toString,
      "band_parts" -> resolvedBandParts.toString,
      "sig_live_files" -> sigs.liveFileCount.toString,
      "band_live_files" -> bands.liveFileCount.toString,
      "sig_versions" -> sigs.versions().size.toString,
      "band_versions" -> bands.versions().size.toString)
}

object SigIndex {
  /** Band-partition guideline for a GROWING index, sized for the
    * TARGET corpus (the layout freezes at the first write): ~16 band
    * rows of ~40 B per doc, one partition per 64 MiB of band rows —
    * floor 64 (the local/test default), cap 65536. The r12 cap of
    * 4096 ("driver bookkeeping") under-partitioned at a billion docs:
    * 1e9 docs is ~640 GB of band rows — 4096 parts made each 156 MiB
    * and, worse, let a 256k-doc nightly delta (4M band keys) touch
    * every partition. Corpus-sizing the cap keeps partitions at the
    * 64 MiB design point (1e9 docs ⇒ ~9.5k parts) and raises the
    * delta size at which the partition prune dies to bandParts/bands
    * docs (~600k at 1e9); the driver bookkeeping is a Seq[Int] of
    * partition ids and a manifest entry per partition — 65536 of
    * either is noise. Past the point where the prune still dies
    * (deltas of millions of docs), [[SigIndex.candidates]]'s bloom
    * prefilter bounds the SHUFFLE and the read cost is the honest
    * O(history signature bytes) floor. */
  def suggestBandParts(expectedDocs: Long, bandsPerDoc: Int = 16,
                       bytesPerBandRow: Long = 40L): Int = {
    val bytes = expectedDocs * bandsPerDoc * bytesPerBandRow
    math.max(64L, math.min(math.ceil(bytes.toDouble / (64L << 20)).toLong, 65536L)).toInt
  }
}
