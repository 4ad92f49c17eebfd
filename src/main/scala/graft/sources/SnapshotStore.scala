package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  * On a lakehouse table format the same calls map to `MERGE INTO` —
  * the API is the contract, not the file layout.
  */
final class SnapshotStore(spark: SparkSession, path: String, key: String = "user_id",
                          buckets: Int = 32) {

  private val BucketCol = "snap_bucket"
  private val ManifestPrefix = "manifest-"

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def withBucket(df: DataFrame, bucketCount: Int = buckets): DataFrame =
    df.withColumn(BucketCol, pmod(hash(col(key)), lit(bucketCount)))

  // ---- manifest protocol ----

  /** `(version, recorded bucket count, bucket → relative files)` of the
    * newest manifest. The bucket count is part of the layout — an
    * upsert MUST hash with the count the snapshot was written with, or
    * a key's new row lands in a different bucket than its old one and
    * the upsert silently duplicates the key. */
  private def latestRaw(): Option[(Long, Option[Int], Map[Int, Seq[String]])] = {
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
    val mapping = lines.filterNot(_.startsWith("#"))
      .map { line => val Array(b, f) = line.split("\t", 2); (b.toInt, f) }
      .groupBy(_._1).map { case (b, fs0) => b -> fs0.map(_._2) }
    Some((v, recorded, mapping))
  }

  private[sources] def latestManifest(): Option[(Long, Map[Int, Seq[String]])] =
    latestRaw().map { case (v, _, m) => (v, m) }

  /** Publish a new manifest version: write to a unique temp name, then
    * a single-file rename — the one atomic primitive object stores
    * give us (locally: POSIX rename). */
  private[sources] def commit(version: Long, bucketCount: Int,
                              mapping: Map[Int, Seq[String]]): Unit = {
    fs.mkdirs(new Path(path))
    val body = (s"#buckets=$bucketCount" +: mapping.toSeq.sortBy(_._1)
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

  /** Write `df` (already bucketed) into a fresh immutable data dir;
    * return bucket → relative file paths. */
  private def writeData(bucketed: DataFrame): Map[Int, Seq[String]] = {
    val dataDir = s"data-${java.util.UUID.randomUUID}"
    bucketed.write.partitionBy(BucketCol).parquet(s"$path/$dataDir")
    val out = scala.collection.mutable.Map.empty[Int, Vector[String]]
    for (dir <- fs.listStatus(new Path(s"$path/$dataDir"))
         if dir.isDirectory && dir.getPath.getName.startsWith(s"$BucketCol=")) {
      val b = dir.getPath.getName.stripPrefix(s"$BucketCol=").toInt
      for (f <- fs.listStatus(dir.getPath) if f.getPath.getName.endsWith(".parquet"))
        out(b) = out.getOrElse(b, Vector.empty) :+ s"$dataDir/${dir.getPath.getName}/${f.getPath.getName}"
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

  // ---- public API ----

  def exists: Boolean = latestManifest().isDefined

  /** Data files the newest manifest references — the number every
    * reader must open. Monitoring / compaction-trigger input. */
  def liveFileCount: Int =
    latestManifest().map(_._2.values.map(_.size).sum).getOrElse(0)

  /** The snapshot at the newest committed version. The plan pins the
    * version's file list, so later upserts don't disturb it. */
  def read(): Option[DataFrame] =
    latestManifest().flatMap { case (_, m) => readFiles(m.values.flatten.toSeq) }

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
    * takes effect). */
  def overwrite(df: DataFrame): Unit = {
    val v = latestRaw().map(_._1).getOrElse(0L)
    commit(v + 1, buckets, writeData(withBucket(df)))
  }

  /** UPSERT: rows in `df` replace snapshot rows with the same key; all
    * other snapshot rows are kept (mysql_writer UPSERT semantics).
    * Reads ONLY the files of the buckets the incoming keys hash into
    * (the touched-bucket list is a ≤`buckets`-element driver collect),
    * merges with one key-partitioned anti-join + union, writes new
    * files for those buckets, and publishes a manifest that reuses
    * every untouched bucket's existing files verbatim. */
  def upsert(df: DataFrame): Unit = latestRaw() match {
    case None => overwrite(df)
    case Some((v, recorded, mapping)) =>
      // hash with the count the snapshot was WRITTEN with — a store
      // opened with a different constructor value must not re-bucket
      val bc = recorded.getOrElse(buckets)
      val incoming = withBucket(df, bc)
      val touched = incoming.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSet
      val merged = readFiles(touched.toSeq.sorted.flatMap(mapping.getOrElse(_, Nil))) match {
        case None => incoming
        case Some(existing) =>
          val kept = withBucket(existing, bc)
            .join(df.select(key).distinct(), Seq(key), "left_anti")
          // schema evolution: a column the incoming frame adds (e.g. a
          // later code version's batch_id) must land in the snapshot,
          // null-filled on kept rows — projecting incoming onto kept's
          // columns would silently drop it forever
          kept.unionByName(incoming, allowMissingColumns = true)
      }
      commit(v + 1, bc, (mapping -- touched) ++ writeData(merged))
  }

  /** Rewrite every bucket whose live file list exceeds
    * `maxFilesPerBucket` into ONE file and publish a new manifest —
    * the small-file countermeasure for continuously maintained
    * snapshots. A streaming upsert ([[upsert]] per micro-batch) writes
    * each touched bucket as parallel part files, so N batches leave
    * O(tasks) live files per hot bucket; every reader then pays that
    * open/footer cost forever. Compaction is layout-only: rows are
    * untouched (the merge is a read + union), readers of older
    * versions keep their pinned file lists (snapshot isolation), and
    * the superseded files become vacuum food. Each over-split bucket
    * lands in exactly one partition (repartition on the bucket column)
    * so the rewrite emits exactly one file per bucket. Returns the
    * number of buckets compacted. */
  def compact(maxFilesPerBucket: Int = 1): Int = latestRaw() match {
    case None => 0
    case Some((v, recorded, mapping)) =>
      val bc = recorded.getOrElse(buckets)
      val fat = mapping.filter(_._2.size > maxFilesPerBucket)
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
        commit(v + 1, bc, mapping ++ writeData(merged))
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
          for (bucketDir <- fs.listStatus(entry.getPath) if bucketDir.isDirectory;
               f <- fs.listStatus(bucketDir.getPath)) {
            val rel = s"$name/${bucketDir.getPath.getName}/${f.getPath.getName}"
            if (f.getPath.getName.endsWith(".parquet") && !live.contains(rel) &&
                f.getModificationTime < cutoff) {
              fs.delete(f.getPath, false); deleted += 1
            }
          }
        } else if (name.startsWith(ManifestPrefix) &&
          !keep.contains(name.stripPrefix(ManifestPrefix).stripSuffix(".txt").toLong) &&
          entry.getModificationTime < cutoff) {
          fs.delete(entry.getPath, false)
        }
      }
      deleted
  }

  /** Post-write validation (optimized_mysql_writer.py:180-220): every
    * key written must be present in the snapshot. Returns the number
    * of missing keys (0 = good). */
  def validateWrite(written: DataFrame): Long =
    written.select(key).distinct().join(keys(), Seq(key), "left_anti").count()

  /** Distinct keys currently in the snapshot (used by incremental-user
    * detection, scenario_scheduler.py:514-531). */
  def keys(): DataFrame = read() match {
    case Some(df) => df.select(key).distinct()
    case None =>
      import spark.implicits._
      Seq.empty[Long].toDF(key)
  }
}
