package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import java.nio.charset.StandardCharsets

/** Keyed snapshot store with UPSERT semantics — the Spark-native
  * stand-in for the reference's MySQL `user_tags` table and its
  * `INSERT ... ON DUPLICATE KEY UPDATE` writer (reference:
  * src/writers/optimized_mysql_writer.py:73-178).
  *
  * Layout + commit protocol (object-store safe, Delta/Iceberg style):
  * rows are hash-bucketed on `hash(key) % buckets` into immutable
  * parquet files under unique `data-*` directories — files are NEVER
  * overwritten or renamed. A versioned text manifest lists the live
  * files per bucket; committing a write is ONE atomic single-file
  * manifest publish. Consequences:
  *
  *  - an upsert reads and replaces only the buckets its keys touch
  *    (manifest-driven file pruning — the incremental nightly batch
  *    does bounded I/O against a billions-row snapshot);
  *  - a crashed job leaves orphan data files but never a corrupt or
  *    half-visible snapshot (readers follow the last manifest);
  *  - lazy readers opened BEFORE an upsert keep reading their
  *    version's files afterwards (snapshot isolation) — directory
  *    rename/delete protocols break exactly this on object stores;
  *  - [[vacuum]] reclaims files no manifest references.
  *
  * READ pruning mirrors the write pruning: [[readForKeys]] opens only
  * the buckets a probe's keys hash into (point lookups / validation /
  * incremental-user detection do O(probed buckets) I/O, not
  * O(snapshot)), and with `partitionCol` set the layout gains a second
  * level — each bucket's files are split by that column's value, so
  * [[readPartitions]] opens only the requested values' files. The
  * partition column is how a serving-shaped store (ANN codes keyed by
  * vector id but probed by cell; signature indexes keyed by doc id but
  * probed by band key) reads O(probed fraction) instead of O(store)
  * per query batch.
  *
  * On a lakehouse table format the same calls map to `MERGE INTO` —
  * the API is the contract, not the file layout.
  */
final class SnapshotStore(spark: SparkSession, path: String, key: String = "user_id",
                          buckets: Int = 32, partitionCol: Option[String] = None) {

  private val BucketCol = "snap_bucket"
  private val PartDir = "snap_part"
  private val ManifestPrefix = "manifest-"
  private val BloomFile = ".blooms"
  /** Commit-conflict retries for [[upsert]]: enough for realistic
    * writer fan-in (each retry re-merges against the winner's state),
    * small enough that a livelocked store fails loudly. */
  private val UpsertAttempts = 5
  /** Delta sizes up to this take the bloom-cleared probe (keys are
    * collected driver-side to test against the sidecar blooms); larger
    * deltas fall back to the column-scan probe, whose cost the delta
    * itself then dwarfs. */
  private val ProbeKeyBound = 100000

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def withBucket(df: DataFrame, bucketCount: Int = buckets): DataFrame =
    df.withColumn(BucketCol, pmod(hash(col(key)), lit(bucketCount)))

  /** Duplicate the partition column into the internal layout column:
    * `partitionBy` strips its columns from the data files, so the
    * user's column must survive as data while its copy becomes the
    * directory. */
  private def withPart(df: DataFrame, pcol: Option[String]): DataFrame =
    pcol.fold(df)(c => df.withColumn(PartDir, col(c)))

  // ---- manifest protocol ----

  private final case class Manifest(version: Long, recordedBuckets: Option[Int],
                                    recordedPcol: Option[String],
                                    mapping: Map[Int, Seq[String]])

  /** The newest manifest. The recorded bucket count is part of the
    * layout — an upsert MUST hash with the count the snapshot was
    * written with, or a key's new row lands in a different bucket than
    * its old one and the upsert silently duplicates the key. The
    * recorded partition column binds the same way: later writers keep
    * splitting by it even if constructed without. */
  private def latestRaw(): Option[Manifest] = {
    val root = new Path(path)
    if (!fs.exists(root)) return None
    val versions = fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith(ManifestPrefix) && n.endsWith(".txt"))
      .map(n => n.stripPrefix(ManifestPrefix).stripSuffix(".txt").toLong)
    if (versions.isEmpty) return None
    val v = versions.max
    val in = fs.open(new Path(path, f"$ManifestPrefix$v%012d.txt"))
    val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    val recorded = lines.collectFirst {
      case l if l.startsWith("#buckets=") => l.stripPrefix("#buckets=").toInt
    }
    val pcol = lines.collectFirst {
      case l if l.startsWith("#pcol=") => l.stripPrefix("#pcol=")
    }
    val mapping = lines.filterNot(_.startsWith("#"))
      .map { line => val Array(b, f) = line.split("\t", 2); (b.toInt, f) }
      .groupBy(_._1).map { case (b, fs0) => b -> fs0.map(_._2) }
    Some(Manifest(v, recorded, pcol, mapping))
  }

  private[sources] def latestManifest(): Option[(Long, Map[Int, Seq[String]])] =
    latestRaw().map(m => (m.version, m.mapping))

  /** Publish a new manifest version: write to a unique temp name, then
    * a single-file rename — the one atomic primitive object stores
    * give us (locally: POSIX rename). */
  private[sources] def commit(version: Long, bucketCount: Int,
                              mapping: Map[Int, Seq[String]],
                              pcol: Option[String] = None): Unit = {
    fs.mkdirs(new Path(path))
    val header = s"#buckets=$bucketCount" +: pcol.map(c => s"#pcol=$c").toSeq
    val body = (header ++ mapping.toSeq.sortBy(_._1)
      .flatMap { case (b, files) => files.sorted.map(f => s"$b\t$f") })
      .mkString("\n")
    val tmp = new Path(path, s".tmp-manifest-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dst = new Path(path, f"$ManifestPrefix$version%012d.txt")
    // the rename IS the publish — a silent failure (concurrent writer,
    // cross-FS move, transient error) would leave the new data files
    // as unreferenced orphans that vacuum() later deletes, i.e. a
    // silently lost write. The existence check matters on POSIX, where
    // rename REPLACES an existing destination and returns true — that
    // would overwrite a concurrent writer's committed manifest (lost
    // update) rather than fail. Object stores with atomic
    // if-none-match publish make the check-then-rename race-free;
    // locally it narrows the race to the commit instant.
    if (fs.exists(dst))
      throw new java.io.IOException(
        s"manifest version $version already published — concurrent writer conflict ($dst)")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"manifest commit conflict/failure for version $version ($tmp -> $dst)")
  }

  /** Test hook: runs after an upsert attempt has read its base version
    * and written its data files, immediately before its commit — the
    * window a concurrent writer races in. Specs inject a competing
    * commit here to exercise the retry deterministically. */
  private[sources] var onBeforeCommit: () => Unit = () => ()

  private def isCommitConflict(e: Throwable): Boolean = e match {
    case io: java.io.IOException =>
      val m = Option(io.getMessage).getOrElse("")
      m.contains("concurrent writer") || m.contains("manifest commit conflict")
    case _ => false
  }

  /** Retry ONLY on commit conflicts (capped backoff): every other
    * failure propagates on first occurrence — a schema error or a dead
    * filesystem is not a race to wait out. The body must re-read the
    * latest manifest itself so each retry merges against the winner's
    * state. */
  private def withConflictRetry[T](f: => T): T = {
    var attempt = 1
    var backoff = 50L
    while (true) {
      try return f
      catch {
        case e: Throwable if isCommitConflict(e) && attempt < UpsertAttempts =>
          System.err.println(s"[graft] snapshot commit conflict, retry $attempt: ${e.getMessage}")
          Thread.sleep(backoff)
          backoff = math.min(backoff * 2, 2000L)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write `df` (already bucketed/partitioned) into a fresh immutable
    * data dir; return bucket → relative file paths. With a partition
    * column the files sit one level deeper (`snap_bucket=B/snap_part=V/…`),
    * which is what [[readPartitions]] prunes on. */
  private def writeData(bucketed: DataFrame, pcol: Option[String]): Map[Int, Seq[String]] = {
    val dataDir = s"data-${java.util.UUID.randomUUID}"
    val layoutCols = BucketCol +: (if (pcol.isDefined) Seq(PartDir) else Nil)
    // cluster the write by the layout key when a partition column is
    // in play: partitionBy fans each task out to every (bucket, value)
    // dir it holds rows for, so an unshuffled bulk load writes
    // tasks × dirs files (measured: a 450k-doc band-store seed began
    // writing ~65k small files). One exchange keyed on the layout
    // writes exactly one file per populated (bucket, value) — the
    // same price every clustered table write pays. Without a
    // partition column the dir count equals the touched buckets and
    // the fan-out is already bounded; compact() handles the rest.
    val clustered =
      if (pcol.isDefined) bucketed.repartition(col(BucketCol), col(PartDir))
      else bucketed
    clustered.write.partitionBy(layoutCols: _*).parquet(s"$path/$dataDir")
    writeBlooms(bucketed, dataDir)
    val out = scala.collection.mutable.Map.empty[Int, Vector[String]]
    val it = fs.listFiles(new Path(s"$path/$dataDir"), true)
    val prefix = fs.makeQualified(new Path(path)).toUri.getPath.stripSuffix("/") + "/"
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) {
        val rel = f.toUri.getPath.stripPrefix(prefix)
        val bucket = rel.split('/').collectFirst {
          case seg if seg.startsWith(s"$BucketCol=") => seg.stripPrefix(s"$BucketCol=").toInt
        }.getOrElse(sys.error(s"no bucket segment in $rel"))
        out(bucket) = out.getOrElse(bucket, Vector.empty) :+ rel
      }
    }
    out.toMap
  }

  // mergeSchema: a snapshot legitimately mixes file generations
  // (upsert rewrites only touched buckets), so after a schema
  // evolution the live file set has both pre- and post-evolution
  // footers — a plain read takes ONE footer's schema and silently
  // drops or surfaces the evolved column depending on file order.
  // Merging unions the footers (missing columns null), which is the
  // same contract upsert's allowMissingColumns union promises.
  private def readFiles(files: Seq[String]): Option[DataFrame] =
    if (files.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$path/$f"): _*))

  // key-column-only read WITHOUT schema merging: the key column is the
  // store's identity and exists in every file generation by
  // construction, so the collision probe skips the per-footer merge
  // pass a wide mixed-generation file set would otherwise pay
  private def readKeys(files: Seq[String]): Option[DataFrame] =
    if (files.isEmpty) None
    else Some(spark.read.parquet(files.map(f => s"$path/$f"): _*).select(key))

  // ---- bloom sidecar: O(delta) collision probes ----
  //
  // Even column-pruned, the key-scan probe reads O(store keys) per
  // upsert once a uniform delta touches every bucket — at 10⁹ rows
  // that is GBs per micro-batch on the WRITE path, the same per-batch
  // scan the read paths were cured of. Each data generation therefore
  // carries a `.blooms` sidecar (per-bucket key bloom, 1% FPR, sized
  // from that write's per-bucket counts): a small delta tests its
  // collected keys against a few KB of blooms and key-scans ONLY the
  // buckets with a bloom hit. The sidecar is advisory — missing or
  // unreadable blooms (pre-bloom generations, crashed writes) fail
  // open into the key scan, never into a wrong answer.

  /** Build and persist per-bucket key blooms for one written data
    * generation. Two O(delta) passes: per-bucket APPROX-DISTINCT key
    * counts (sizes the filters — a multi-row-per-key table like a
    * postings store would otherwise oversize every filter by its
    * rows-per-key factor), then a build clustered by (bucket, bounded
    * key salt): each bucket's filter is allocated at its counted size
    * by every task that sees it and the driver receives ≤ salt ×
    * |buckets| filters of known total bytes. The first cut built
    * partition-locally with full-size filters and merged driver-side —
    * |partitions| × |buckets| × filter-size task results, UNBOUNDED,
    * which broke spark.driver.maxResultSize the first time a
    * token-scale store (27M postings) was written; the salted
    * exchange is delta-sized, write-path-only, and its reduce cost is
    * explicitly budgeted before it runs. */
  private def writeBlooms(bucketed: DataFrame, dataDir: String): Unit = {
    val counts = bucketed.groupBy(BucketCol)
      .agg(approx_count_distinct(col(key)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) return
    val bcCounts = spark.sparkContext.broadcast(counts)
    // Salt the build exchange when there are fewer buckets than cores:
    // clustering strictly by bucket serializes a 1-bucket store's
    // whole bloom build onto one task (measured at sf10: the
    // corpus-sized floor-1 layouts paid ~25% of build wall-time here).
    // Each salted task allocates a full-size filter per bucket it
    // sees, so the transient reduce cost is salt × filter bytes —
    // bounded BY CONSTRUCTION two ways: salt ≤ cores/buckets (no more
    // tasks than cores), and salt ≤ 256 MB / largest filter (the
    // counts are already collected, so the largest filter size is
    // known before choosing). buckets ≥ cores ⇒ salt = 1 ⇒ exactly
    // the old clustered build.
    val maxFilterBytes = math.max(64L, counts.values.max) * 18L / 10L // ~1.8 B/key at fpp 1e-3
    val salt = math.max(1, math.min(
      spark.sparkContext.defaultParallelism / math.max(1, counts.size),
      ((256L << 20) / math.max(1L, maxFilterBytes)).toInt))
    // the salt must be DECORRELATED from the bucket: BucketCol is
    // pmod(hash(key), buckets), so salting with the same hash yields
    // only lcm(buckets, salt) distinct groups whenever the two share a
    // factor (typical: both powers of two) — xxhash64 is an
    // independent hash family, so (bucket, salt) really fans out to
    // buckets × salt tasks
    val partial = bucketed.select(col(BucketCol), col(key))
      .repartition(col(BucketCol), pmod(xxhash64(col(key)), lit(salt)))
      .rdd.mapPartitions { it =>
        val m = scala.collection.mutable.Map.empty[Int, BloomFilter]
        it.foreach { r =>
          if (!r.isNullAt(1)) {
            val b = r.getInt(0)
            // fpp 0.1%, not the usual 1%: a k-key delta false-positives
            // a bucket back into the key scan with probability
            // ≈ 1-(1-fpp)^(k/buckets) — at 1% a few-thousand-key delta
            // re-scans half its buckets; at 0.1% it clears >90% for
            // ~1.5× the (tiny) sidecar bytes. The ~5% ACD sizing error
            // only nudges the realized fpp, and the sidecar is advisory.
            m.getOrElseUpdate(b,
              BloomFilter.create(math.max(bcCounts.value.getOrElse(b, 64L), 64L), 0.001))
              .put(r.get(1))
          }
        }
        Iterator(m.toMap)
      }
    // same-bucket partials from salted tasks merge via mergeInPlace —
    // sound because every task sizes bucket b's filter from the SAME
    // broadcast count (mergeInPlace requires equal-sized filters);
    // unsalted buckets are disjoint and union untouched
    val blooms = partial.reduce { (a, b) =>
      val m = scala.collection.mutable.Map.empty[Int, BloomFilter] ++= a
      b.foreach { case (k2, bf) =>
        m.get(k2) match {
          case Some(e) => e.mergeInPlace(bf)
          case None => m(k2) = bf
        }
      }
      m.toMap
    }
    val out = new java.io.DataOutputStream(
      fs.create(new Path(s"$path/$dataDir/$BloomFile"), true))
    try {
      out.writeInt(blooms.size)
      blooms.toSeq.sortBy(_._1).foreach { case (b, bf) =>
        // length-framed: BloomFilter.readFrom consumes the WHOLE
        // remaining stream, so naive concatenation breaks on read
        val bytes = new java.io.ByteArrayOutputStream()
        bf.writeTo(bytes)
        out.writeInt(b); out.writeInt(bytes.size()); bytes.writeTo(out)
      }
    } finally out.close()
  }

  /** The per-bucket blooms of one data generation; None = no/corrupt
    * sidecar (callers must fail open into the key scan). */
  private def loadBlooms(dataDir: String): Option[Map[Int, BloomFilter]] = {
    val p = new Path(s"$path/$dataDir/$BloomFile")
    try {
      if (!fs.exists(p)) None
      else {
        val in = new java.io.DataInputStream(fs.open(p))
        try {
          val n = in.readInt()
          Some((0 until n).map { _ =>
            val b = in.readInt()
            val len = in.readInt()
            val bytes = new Array[Byte](len)
            in.readFully(bytes)
            b -> BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
          }.toMap)
        } finally in.close()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Probe telemetry of the last upsert: (buckets key-scanned, buckets
    * bloom-cleared). Spec/monitoring surface. */
  private[graft] var lastProbeStats: (Int, Int) = (0, 0)

  /** Touched buckets PROVABLY free of key collisions: every live
    * generation of the bucket has a readable bloom and no delta key
    * might be contained. Anything uncertain (oversized delta, missing
    * sidecar, null key) stays un-cleared and takes the key scan. */
  private def bloomClearedBuckets(incoming: DataFrame, touched: Set[Int],
                                  mapping: Map[Int, Seq[String]]): Set[Int] = {
    val pairs = incoming.select(col(BucketCol), col(key)).distinct()
      .limit(ProbeKeyBound + 1).collect()
    if (pairs.length > ProbeKeyBound) return Set.empty
    val keysByBucket = pairs.groupBy(_.getInt(0))
      .map { case (b, rs) => b -> rs.map(r => if (r.isNullAt(1)) null else r.get(1)) }
    val bloomCache = scala.collection.mutable.Map.empty[String, Option[Map[Int, BloomFilter]]]
    def bloomsOf(dir: String) = bloomCache.getOrElseUpdate(dir, loadBlooms(dir))
    touched.filter { b =>
      val dirs = mapping.getOrElse(b, Nil).map(_.split('/').head).distinct
      val ks = keysByBucket.getOrElse(b, Array.empty[Any])
      ks.forall(_ != null) && dirs.forall { d =>
        bloomsOf(d) match {
          case None => false // unknown generation → scan
          case Some(mp) => mp.get(b) match {
            case None => true // generation holds no rows of this bucket
            case Some(bf) => !ks.exists(bf.mightContain)
          }
        }
      }
    }
  }

  // ---- public API ----

  def exists: Boolean = latestManifest().isDefined

  /** Bucket count the last commit recorded — the layout truth every
    * reader resolves against (the constructor's `buckets` is only the
    * fallback for a store with no manifest yet). */
  def bucketCount: Option[Int] = latestRaw().flatMap(_.recordedBuckets)

  /** Data files the newest manifest references — the number every
    * reader must open. Monitoring / compaction-trigger input. */
  def liveFileCount: Int =
    latestManifest().map(_._2.values.map(_.size).sum).getOrElse(0)

  /** The snapshot at the newest committed version. The plan pins the
    * version's file list, so later upserts don't disturb it. */
  def read(): Option[DataFrame] =
    latestManifest().flatMap { case (_, m) => readFiles(m.values.flatten.toSeq) }

  /** The newest committed version's store-relative file list, and a
    * read of an explicit subset of it — the pair a FILE-GRAINED warm
    * cache needs: after an insert-fast-path add (fresh keys append
    * files, nothing rewrites), the new live set is a superset of the
    * cached one and the cache can read ONLY the delta files instead of
    * rebuilding from the whole store ([[graft.similarity.TextIndex]]
    * warm serving). Callers must treat file names as opaque tokens
    * from [[liveFiles]] — passing names from an older manifest risks
    * reading vacuumed paths. */
  private[graft] def liveFiles: Seq[String] =
    latestManifest().map(_._2.values.flatten.toSeq).getOrElse(Nil)

  private[graft] def readFileSubset(files: Seq[String]): Option[DataFrame] =
    readFiles(files)

  /** Pruned read by partition value: only the live files whose layout
    * path carries one of `values` for the partition column. Files from
    * generations written WITHOUT the partition layout carry no
    * `snap_part=` segment and are conservatively included (they may
    * hold any value). This is the serve-path primitive: a probe that
    * touches nProbe of nCells reads nProbe/nCells of the store, not
    * all of it. */
  def readPartitions(values: Seq[Any]): Option[DataFrame] =
    readFiles(filesForPartitions(values))

  /** The file list [[readPartitions]] would open — exposed so specs
    * (and monitoring) can pin scan-pruning ratios. */
  private[graft] def filesForPartitions(values: Seq[Any]): Seq[String] = {
    val wanted = values.map(v => s"$PartDir=$v").toSet
    latestManifest().map(_._2.values.flatten.toSeq.filter { f =>
      f.split('/').find(_.startsWith(s"$PartDir=")).forall(wanted.contains)
    }).getOrElse(Nil)
  }

  /** Pruned keyed read: only the files of the buckets `probe`'s keys
    * hash into. Sound for any per-key lookup AND for anti-joins of
    * probe-vs-snapshot: a snapshot key outside the probed buckets
    * cannot equal any probe key (same hash, same modulus). At a
    * billions-row snapshot a k-key probe opens ≤min(k, buckets)
    * buckets instead of every live file. */
  def readForKeys(probe: DataFrame): Option[DataFrame] =
    latestRaw().flatMap(m => readFiles(filesForKeys(probe, m)))

  /** Both prunes at once: only the files whose bucket one of `probe`'s
    * keys hashes into AND whose partition value is in `values` — the
    * shortlist-re-rank read shape (candidate ids × probed cells),
    * where either prune alone still opens most of a big store. Sound
    * for per-key lookups whose rows are KNOWN to lie in `values`
    * partitions (the caller's contract — a key whose row lives in an
    * unlisted partition is simply not returned). */
  def readForKeysAndPartitions(probe: DataFrame, values: Seq[Any]): Option[DataFrame] =
    latestRaw().flatMap { m =>
      val wanted = values.map(v => s"$PartDir=$v").toSet
      readFiles(filesForKeys(probe, m).filter { f =>
        f.split('/').find(_.startsWith(s"$PartDir=")).forall(wanted.contains)
      })
    }

  private[graft] def filesForKeys(probe: DataFrame): Seq[String] =
    latestRaw().map(filesForKeys(probe, _)).getOrElse(Nil)

  private def filesForKeys(probe: DataFrame, m: Manifest): Seq[String] = {
    val bc = m.recordedBuckets.getOrElse(buckets)
    val touched = withBucket(probe.select(key).distinct(), bc)
      .select(BucketCol).distinct().collect().map(_.getInt(0)).toSet
    touched.toSeq.sorted.flatMap(m.mapping.getOrElse(_, Nil))
  }

  /** Identity token of the latest committed generation: the manifest
    * version PLUS a hash of the live file list. The bare version
    * number is NOT an identity — a store deleted and rebuilt restarts
    * at version 1, so a cache keyed on it would serve the old
    * corpus's rows against the new one's queries — but data paths
    * embed per-write generation UUIDs, so the file-list hash changes
    * whenever the content can have. The cache-invalidation key for
    * warm readers ([[graft.similarity.PqIndex]] `warmRerank`). */
  private[graft] def latestToken: Option[(Long, Int)] =
    latestManifest().map { case (v, m) =>
      (v, scala.util.hashing.MurmurHash3.orderedHash(m.values.flatten.toSeq.sorted))
    }

  /** Committed versions currently on disk, oldest first (shrinks as
    * [[vacuum]] retires old manifests). */
  def versions(): Seq[Long] = {
    val root = new Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith(ManifestPrefix) && n.endsWith(".txt"))
      .map(_.stripPrefix(ManifestPrefix).stripSuffix(".txt").toLong)
      .sorted.toSeq
  }

  /** Time travel: the snapshot as of a specific committed `version` —
    * free, because manifests are immutable and data files are never
    * rewritten (a version's file list IS the version). Readable until
    * [[vacuum]] retires the manifest; None if it already has. The
    * audit/debug answer ("what did the tags table say before last
    * night's merge?") the reference's destructive MySQL UPSERT cannot
    * give. */
  def readVersion(version: Long): Option[DataFrame] = {
    val mp = new Path(path, f"$ManifestPrefix$version%012d.txt")
    if (!fs.exists(mp)) None
    else {
      val in = fs.open(mp)
      val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
      val files = text.linesIterator
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(_.split("\t", 2)(1)).toSeq
      readFiles(files)
    }
  }

  /** Full overwrite: new data files + new manifest listing only them
    * (the whole layout is replaced, so the constructor's bucket count
    * and partition column take effect). */
  def overwrite(df: DataFrame): Unit = {
    val files = writeData(withPart(withBucket(df), partitionCol), partitionCol)
    // data files are version-independent (immutable, unique dir); only
    // the version number races, so a conflict retries the commit alone
    withConflictRetry {
      val v = latestRaw().map(_.version).getOrElse(0L)
      onBeforeCommit()
      commit(v + 1, buckets, files, partitionCol)
    }
  }

  /** UPSERT: rows in `df` replace snapshot rows with the same key; all
    * other snapshot rows are kept (mysql_writer UPSERT semantics).
    * Reads ONLY the files of the buckets the incoming keys hash into
    * (the touched-bucket list is a ≤`buckets`-element driver collect),
    * merges with one key-partitioned anti-join + union, writes new
    * files for those buckets, and publishes a manifest that reuses
    * every untouched bucket's existing files verbatim.
    *
    * Concurrent writers: the manifest publish detects a lost race and
    * the whole merge re-runs against the winner's state (bounded
    * attempts, capped backoff) — two interleaved upserts BOTH land, in
    * some serial order, instead of the loser failing. The loser's
    * first-attempt data files become unreferenced orphans that
    * [[vacuum]] reclaims. */
  def upsert(df: DataFrame): Unit = withConflictRetry(upsertOnce(df))

  private def upsertOnce(df: DataFrame): Unit = latestRaw() match {
    case None => overwrite(df)
    case Some(m) =>
      // hash with the count the snapshot was WRITTEN with — a store
      // opened with a different constructor value must not re-bucket.
      // Same for the partition column: the RECORDED layout wins (an
      // unpartitioned snapshot may predate the column entirely);
      // migrating the layout is an explicit overwrite()/compact-cycle,
      // never a silent per-upsert drift.
      val bc = m.recordedBuckets.getOrElse(buckets)
      val pcol = m.recordedPcol
      val incoming = withPart(withBucket(df, bc), pcol)
      val touched = incoming.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSet
      // INSERT FAST PATH, decided per bucket: copy-on-write is only
      // needed where an incoming key actually replaces a stored row.
      // The sidecar blooms clear most buckets of a fresh-keyed delta
      // without touching data at all; the remainder get a
      // key-column-only probe (column-pruned parquet scan — bytes ∝
      // keys, not rows×width). Every collision-free touched bucket
      // just APPENDS its new files to the manifest, zero read, zero
      // rewrite. This is what keeps a continuously maintained store's
      // ingest O(delta): a fresh-keyed delta over a uniform hash
      // touches EVERY bucket, and without the probe each batch
      // rewrote ~the whole snapshot (measured at sf10: a 1% codes
      // delta cost a 23 s full rewrite). Replays stay safe by
      // construction — a replayed batch's keys ARE present, so they
      // take the merge path and overwrite.
      val cleared = bloomClearedBuckets(incoming, touched, m.mapping)
      val scanned = (touched -- cleared).toSeq.sorted
      lastProbeStats = (scanned.size, cleared.size)
      val colliding: Set[Int] = readKeys(scanned.flatMap(m.mapping.getOrElse(_, Nil))) match {
        case None => Set.empty
        case Some(existing) =>
          withBucket(existing, bc)
            .join(df.select(key).distinct(), Seq(key), "left_semi")
            .select(BucketCol).distinct().collect().map(_.getInt(0)).toSet
      }
      // inserts land UNCLUSTERED (one file per bucket, no partition
      // dirs): clustering every micro-delta would write one tiny file
      // per (bucket, value) it touches — thousands per streaming batch
      // (measured: a 2k-vec add appended ~1200 files). Pruned reads
      // conservatively include unpartitioned files, so correctness is
      // unchanged, and the next compact() folds them into the
      // clustered layout — the standard ingest-then-recluster trade.
      val inserted =
        if (colliding.size == touched.size) Map.empty[Int, Seq[String]]
        else {
          val ins = incoming.filter(!col(BucketCol).isin(colliding.toSeq: _*))
          writeData(pcol.fold(ins)(_ => ins.drop(PartDir)).repartition(col(BucketCol)), None)
        }
      val merged: Map[Int, Seq[String]] =
        if (colliding.isEmpty) Map.empty
        else {
          val existing = readFiles(colliding.toSeq.sorted
            .flatMap(m.mapping.getOrElse(_, Nil))).get
          val kept = withPart(withBucket(existing, bc), pcol)
            .join(df.select(key).distinct(), Seq(key), "left_anti")
          // schema evolution: a column the incoming frame adds (e.g. a
          // later code version's batch_id) must land in the snapshot,
          // null-filled on kept rows — projecting incoming onto kept's
          // columns would silently drop it forever
          writeData(kept.unionByName(
            incoming.filter(col(BucketCol).isin(colliding.toSeq: _*)),
            allowMissingColumns = true), pcol)
        }
      // appended buckets keep their existing files AND gain the new
      // ones; colliding buckets are replaced wholesale
      val appended = inserted.map { case (b, fs0) =>
        b -> (m.mapping.getOrElse(b, Nil) ++ fs0)
      }
      onBeforeCommit()
      commit(m.version + 1, bc, (m.mapping -- colliding) ++ appended ++ merged, pcol)
  }

  /** Keyed DELETE: remove every row whose key appears in `keys`; all
    * other rows are kept. The takedown/opt-out path a training-data
    * pipeline is required to have — upsert can replace a key but
    * nothing could make one vanish. Same bounded shape as [[upsert]]:
    * only the buckets the keys hash into are considered, the sidecar
    * blooms clear buckets that provably hold none of them (zero I/O),
    * the rest take a key-column-only scan, and only buckets that
    * actually contain a key are rewritten (anti-join) — O(touched
    * buckets), not O(snapshot). A bucket whose every row is deleted
    * drops out of the manifest entirely. Deleting absent keys is a
    * no-op: no rewrite, NO new manifest version (idempotent replays
    * don't churn versions). Readers opened before the delete keep
    * their version's files (snapshot isolation — a takedown becomes
    * visible to NEW reads; [[vacuum]] is what makes the bytes
    * unrecoverable, so run it after legally-binding deletes).
    * Concurrent writers: same conflict-retry as upsert, each attempt
    * re-reads the winner's state. Returns rows removed (rows, not
    * keys — a multi-row-per-key store like a postings table removes
    * every row of the key). */
  def delete(keys: DataFrame): Long = withConflictRetry(deleteOnce(keys))

  private def deleteOnce(keys: DataFrame): Long = latestRaw() match {
    case None => 0L
    case Some(m) =>
      val bc = m.recordedBuckets.getOrElse(buckets)
      val pcol = m.recordedPcol
      val probe = keys.select(key).distinct()
      val incoming = withBucket(probe, bc)
      val touched = incoming.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSet
      val cleared = bloomClearedBuckets(incoming, touched, m.mapping)
      val scanned = (touched -- cleared).toSeq.sorted
      lastProbeStats = (scanned.size, cleared.size)
      // buckets that actually hold a doomed key (key-column-only scan)
      val colliding: Set[Int] = readKeys(scanned.flatMap(m.mapping.getOrElse(_, Nil))) match {
        case None => Set.empty
        case Some(existing) =>
          withBucket(existing, bc)
            .join(probe, Seq(key), "left_semi")
            .select(BucketCol).distinct().collect().map(_.getInt(0)).toSet
      }
      if (colliding.isEmpty) 0L
      else {
        val existing = readFiles(colliding.toSeq.sorted
          .flatMap(m.mapping.getOrElse(_, Nil))).get
        val kept = withPart(withBucket(
          existing.join(probe, Seq(key), "left_anti"), bc), pcol)
          .localCheckpoint() // pin counts + write input to ONE evaluation
        val removed = existing.count() - kept.count()
        // an all-deleted bucket writes no files and must leave the
        // manifest; writeData only returns buckets it wrote (kept
        // holds only colliding buckets' rows — existing read just them)
        val rewritten = writeData(kept, pcol)
        onBeforeCommit()
        commit(m.version + 1, bc, (m.mapping -- colliding) ++ rewritten, pcol)
        removed
      }
  }

  /** Rewrite every bucket whose live file list exceeds
    * `maxFilesPerBucket` into one file per (bucket, partition value)
    * and publish a new manifest — the small-file countermeasure for
    * continuously maintained snapshots. A streaming upsert ([[upsert]]
    * per micro-batch) writes each touched bucket as parallel part
    * files, so N batches leave O(tasks) live files per hot bucket;
    * every reader then pays that open/footer cost forever. Compaction
    * is layout-only: rows are untouched (the merge is a read + union),
    * readers of older versions keep their pinned file lists (snapshot
    * isolation), and the superseded files become vacuum food. Each
    * over-split bucket lands in exactly one partition (repartition on
    * the bucket column) so the rewrite emits exactly one file per
    * bucket (per partition value when partitioned). Returns the number
    * of buckets compacted.
    *
    * `maxBuckets` bounds one call's rewrite to the FATTEST that many
    * buckets — a billions-row store compacts incrementally (each call
    * is one bounded job + one manifest version) instead of rewriting
    * every over-split bucket in a single monolithic commit; repeat
    * until it returns 0. */
  /** Concurrent-writer safety: compaction publishes a manifest like
    * any writer, so it can lose the commit race to an upsert/delete
    * that landed between its read and its publish — committing the
    * stale mapping anyway would resurrect replaced rows. Same
    * conflict-retry as upsert: each attempt re-reads the winner's
    * manifest and re-plans (the loser attempt's rewrite files become
    * vacuum food). Both writers land, in some serial order. */
  def compact(maxFilesPerBucket: Int = 1, maxBuckets: Int = Int.MaxValue): Int =
    withConflictRetry(compactOnce(maxFilesPerBucket, maxBuckets))

  private def compactOnce(maxFilesPerBucket: Int, maxBuckets: Int): Int = latestRaw() match {
    case None => 0
    case Some(m) =>
      val bc = m.recordedBuckets.getOrElse(buckets)
      val pcol = m.recordedPcol
      // with a partition column the layout floor is one file per
      // (bucket, partition value), so the threshold applies per value —
      // judging the whole bucket would see every multi-value bucket as
      // permanently fat and rewrite the store on every compaction.
      // Files WITHOUT a partition segment (unclustered insert-path
      // ingest) always mark their bucket fat: they evade partition
      // pruning until compaction folds them into the clustered layout
      val fat = m.mapping.filter { case (_, files) =>
        if (pcol.isEmpty) files.size > maxFilesPerBucket
        else {
          val groups = files.groupBy(
            _.split('/').find(_.startsWith(s"$PartDir=")).getOrElse(""))
          groups.contains("") || groups.values.exists(_.size > maxFilesPerBucket)
        }
      }.toSeq.sortBy { case (b, files) => (-files.size, b) }
        .take(maxBuckets).toMap
      if (fat.isEmpty) 0
      else {
        // schema evolution must survive compaction exactly as it
        // survives upsert: readFiles merges mixed-generation footers
        // per bucket, and buckets at different schema versions union
        // with missing columns nulled
        val merged = fat.keys.toSeq.sorted
          .map(b => readFiles(fat(b)).get.withColumn(BucketCol, lit(b)))
          .reduce(_.unionByName(_, allowMissingColumns = true))
          .repartition(fat.size, col(BucketCol))
        val rewritten = writeData(withPart(merged, pcol), pcol)
        onBeforeCommit()
        commit(m.version + 1, bc, m.mapping ++ rewritten, pcol)
        fat.size
      }
  }

  /** Delete data files no manifest version references and manifests
    * older than the newest `keepVersions`. `minAgeMs` is the retention
    * grace: files younger than it are NEVER deleted, because an
    * in-flight writer may have produced them but not yet committed its
    * manifest (the same reason every lakehouse vacuum has a retention
    * window). Run out-of-band. Returns the number of files deleted. */
  def vacuum(keepVersions: Int = 1, minAgeMs: Long = 3600L * 1000L): Long =
    latestManifest() match {
    case None => 0L
    case Some((latest, _)) =>
      val keep = fs.listStatus(new Path(path)).map(_.getPath.getName)
        .filter(n => n.startsWith(ManifestPrefix))
        .map(n => n.stripPrefix(ManifestPrefix).stripSuffix(".txt").toLong)
        .filter(_ > latest - keepVersions)
        .toSet
      val live = keep.flatMap { v =>
        val in = fs.open(new Path(path, f"$ManifestPrefix$v%012d.txt"))
        val text = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
        text.linesIterator.filter(l => l.nonEmpty && !l.startsWith("#"))
          .map(_.split("\t", 2)(1)).toSet
      }
      val cutoff = System.currentTimeMillis() - minAgeMs
      var deleted = 0L
      for (entry <- fs.listStatus(new Path(path))) {
        val name = entry.getPath.getName
        if (entry.isDirectory && name.startsWith("data-")) {
          val it = fs.listFiles(entry.getPath, true)
          val prefix = fs.makeQualified(new Path(path)).toUri.getPath.stripSuffix("/") + "/"
          while (it.hasNext) {
            val f = it.next()
            val rel = f.getPath.toUri.getPath.stripPrefix(prefix)
            if (f.getPath.getName.endsWith(".parquet") && !live.contains(rel) &&
                f.getModificationTime < cutoff) {
              fs.delete(f.getPath, false); deleted += 1
            }
          }
          // a generation with no live data left takes its bloom
          // sidecar with it (same age gate as the data files)
          val bloomP = new Path(entry.getPath, BloomFile)
          if (!live.exists(_.startsWith(name + "/")) && fs.exists(bloomP) &&
              fs.getFileStatus(bloomP).getModificationTime < cutoff)
            fs.delete(bloomP, false)
        } else if (name.startsWith(ManifestPrefix) &&
          !keep.contains(name.stripPrefix(ManifestPrefix).stripSuffix(".txt").toLong) &&
          entry.getModificationTime < cutoff) {
          fs.delete(entry.getPath, false)
        }
      }
      deleted
  }

  /** Post-write validation (optimized_mysql_writer.py:180-220): every
    * key written must be present in the snapshot. Pruned: only the
    * written keys' buckets are read, not the whole snapshot. Returns
    * the number of missing keys (0 = good). */
  def validateWrite(written: DataFrame): Long = {
    val probe = written.select(key).distinct()
    readForKeys(probe) match {
      case None => probe.count()
      case Some(snap) => probe.join(snap.select(key), Seq(key), "left_anti").count()
    }
  }

  /** Distinct keys currently in the snapshot (used by incremental-user
    * detection, scenario_scheduler.py:514-531). */
  def keys(): DataFrame = read() match {
    case Some(df) => df.select(key).distinct()
    case None => emptyKeys()
  }

  /** Distinct snapshot keys RESTRICTED to the buckets `probe`'s keys
    * hash into — the right-hand side for "which probe keys are new?"
    * anti-joins (incremental-user detection at scale): snapshot keys
    * in other buckets can't match any probe key, so the anti-join
    * result is identical while the scan is O(probed buckets). */
  def keysFor(probe: DataFrame): DataFrame = readForKeys(probe) match {
    case Some(df) => df.select(key).distinct()
    case None => emptyKeys()
  }

  private def emptyKeys(): DataFrame = {
    import spark.implicits._
    Seq.empty[Long].toDF(key)
  }
}

object SnapshotStore {
  /** Bucket-count guideline for a PARTITIONED store: the layout floor
    * is one file per (bucket, partition), so the only reason to raise
    * buckets above 1 is per-partition data outgrowing the target file
    * size — buckets ≈ bytes / (partitions × 64 MiB). The floor really
    * is 1: any fixed bucket floor multiplies the partition count into
    * a small-file explosion exactly when partitions are corpus-sized
    * (the legacy 32 default is for UNPARTITIONED key stores, where 32
    * buckets = 32 files total). Fewer buckets mean coarser key-probe
    * pruning and copy-on-write — acceptable because bytes per bucket
    * is bounded by construction (it only shrinks as the corpus grows
    * buckets). Cap 4096 bounds driver-side manifest/bloom
    * bookkeeping. */
  def suggestBuckets(totalBytes: Long, partitions: Int,
                     targetFileBytes: Long = 64L << 20): Int = {
    val ideal = math.ceil(totalBytes.toDouble /
      (math.max(1, partitions).toDouble * targetFileBytes)).toLong
    math.max(1L, math.min(ideal, 4096L)).toInt
  }
}
