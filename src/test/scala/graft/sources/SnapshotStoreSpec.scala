package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SnapshotStoreSpec extends SparkSpec {

  test("upsert touching one user replaces exactly one bucket's files in the manifest") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_part").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 8)
    store.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("user_id", "v"))
    val (v1, before) = store.latestManifest().get
    assert(before.size > 1, "100 users over 8 buckets must span several partitions")

    store.upsert(Seq((5L, "updated")).toDF("user_id", "v"))
    val (v2, after) = store.latestManifest().get
    assert(v2 == v1 + 1)
    val changed = (before.keySet ++ after.keySet)
      .filter(b => before.get(b) != after.get(b))
    assert(changed.size == 1, s"one-user upsert must replace one bucket, got $changed")
    // untouched buckets reference the SAME immutable files — zero rewrite
    (before.keySet - changed.head).foreach(b => assert(before(b) == after(b)))

    val snap = store.read().get
    assert(snap.count() == 100)
    assert(snap.filter(col("user_id") === 5L).select("v").head().getString(0) == "updated")
    assert(snap.columns.toSeq == Seq("user_id", "v"))
  }

  test("time travel: every committed version stays readable until vacuum retires it") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_tt").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite(Seq((1L, "a"), (2L, "b")).toDF("user_id", "v"))
    store.upsert(Seq((2L, "b2"), (3L, "c")).toDF("user_id", "v"))
    store.upsert(Seq((1L, "a3")).toDF("user_id", "v"))
    val Seq(v1, v2, v3) = store.versions()
    def snap(v: Long) = store.readVersion(v).get.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap(v1) == Map(1L -> "a", 2L -> "b"))
    assert(snap(v2) == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    assert(snap(v3) == Map(1L -> "a3", 2L -> "b2", 3L -> "c"))
    assert(snap(v3) == store.read().get.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap)
    assert(store.readVersion(v3 + 17).isEmpty, "unknown versions read as None")
    // vacuum retires old versions; the live one survives
    store.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(store.readVersion(v1).isEmpty && store.versions() == Seq(v3))
    assert(snap(v3) == Map(1L -> "a3", 2L -> "b2", 3L -> "c"))
  }

  test("compact: one live file per bucket, rows unchanged, vacuum reclaims the rest") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_compact").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    // overwrite from a 6-way-partitioned frame: up to 6 part files per
    // bucket, the layout a parallel write / micro-batch stream leaves
    store.overwrite((1L to 200L).map(i => (i, s"v$i")).toDF("user_id", "v").repartition(6))
    // a few upserts pile on more generations of touched buckets
    store.upsert((1L to 50L).map(i => (i, s"u$i")).toDF("user_id", "v").repartition(6))
    store.upsert((51L to 90L).map(i => (i, s"u$i")).toDF("user_id", "v").repartition(6))
    val before = store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(store.liveFileCount > 4, s"setup should be over-split, got ${store.liveFileCount}")

    val compacted = store.compact(maxFilesPerBucket = 1)
    assert(compacted > 0)
    assert(store.liveFileCount == 4, s"each bucket must compact to one file, got ${store.liveFileCount}")
    val after = store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == before, "compaction is layout-only; rows must be untouched")
    // compacting an already-compact store is a no-op (no new version)
    val (vAfter, _) = store.latestManifest().get
    assert(store.compact(maxFilesPerBucket = 1) == 0)
    assert(store.latestManifest().get._1 == vAfter)

    // superseded generations + old manifests are vacuum food
    val reclaimed = store.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(reclaimed > 0, "pre-compaction files must be reclaimable")
    assert(store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap == before,
      "vacuum must never touch the live version")
  }

  test("incremental compaction: maxBuckets bounds each call, repeats converge") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_compact_inc").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite((1L to 200L).map(i => (i, s"v$i")).toDF("user_id", "v").repartition(6))
    store.upsert((1L to 200L).map(i => (i, s"u$i")).toDF("user_id", "v").repartition(6))
    val before = store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(store.liveFileCount > 4, "setup must be over-split")

    // each bounded call rewrites at most maxBuckets buckets (one
    // bounded job per call — how a huge store compacts incrementally)
    val first = store.compact(maxFilesPerBucket = 1, maxBuckets = 2)
    assert(first == 2, s"first call must compact exactly 2 buckets, got $first")
    assert(store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap == before)
    var total = first
    var n = store.compact(maxFilesPerBucket = 1, maxBuckets = 2)
    while (n > 0) { total += n; n = store.compact(maxFilesPerBucket = 1, maxBuckets = 2) }
    assert(total == 4 && store.liveFileCount == 4,
      s"repeated bounded calls must converge to the floor, got $total buckets / ${store.liveFileCount} files")
    assert(store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap == before)
  }

  test("compact preserves a schema-evolved column across mixed-generation buckets") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_compact_evo").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite((1L to 80L).map(i => (i, s"v$i")).toDF("user_id", "v").repartition(4))
    // later code version starts writing batch_id: the upsert nulls it
    // on kept rows (upsert's allowMissingColumns contract) — buckets
    // now mix pre- and post-evolution file generations
    store.upsert((1L to 20L).map(i => (i, s"u$i", 7L)).toDF("user_id", "v", "batch_id"))
    val before = store.read().get.collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    assert(before(1L).contains(7L) && before(80L).isEmpty, "setup: mixed schema generations")

    assert(store.compact(maxFilesPerBucket = 1) > 0)
    val after = store.read().get.collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    assert(after == before,
      "compaction must carry the evolved column through mixed-generation buckets")
  }

  test("a concurrently published manifest version makes the commit throw, not lose a write") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_conflict").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite(Seq((1L, "a"), (2L, "b")).toDF("user_id", "v"))
    val (v1, _) = store.latestManifest().get
    // simulate the race: a concurrent writer publishes v1+1 after this
    // writer decided on the same target version. On POSIX a bare
    // rename would silently REPLACE it (lost update); commit must
    // refuse instead.
    val conflicting = new org.apache.hadoop.fs.Path(dir, f"manifest-${v1 + 1}%012d.txt")
    val fs = conflicting.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(conflicting, true)
    out.write("#buckets=4\n".getBytes("UTF-8")); out.close()
    val e = intercept[java.io.IOException] {
      store.commit(v1 + 1, 4, Map.empty)
    }
    assert(e.getMessage.contains("concurrent writer"))
    // the concurrent writer's manifest survives untouched
    val in = fs.open(conflicting)
    assert(new String(in.readAllBytes(), "UTF-8").startsWith("#buckets=4")); in.close()
  }

  test("snapshot isolation: a reader opened before an upsert keeps its version") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_iso").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite(Seq((1L, "old"), (2L, "x")).toDF("user_id", "v"))
    val reader = store.read().get // lazy plan pinned to version-1 files
    store.upsert(Seq((1L, "new")).toDF("user_id", "v"))
    // old files were not deleted or renamed, so the pinned plan still works
    assert(reader.filter(col("user_id") === 1L).select("v").head().getString(0) == "old")
    assert(store.read().get.filter(col("user_id") === 1L)
      .select("v").head().getString(0) == "new")
  }

  test("vacuum removes files of dropped versions and keeps the live ones") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_vac").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 2)
    store.overwrite(Seq((1L, "a"), (2L, "b")).toDF("user_id", "v"))
    store.upsert(Seq((1L, "a2")).toDF("user_id", "v"))
    // grace period respected: fresh files survive a default vacuum
    assert(store.vacuum(keepVersions = 1) == 0L,
      "files younger than the retention grace must never be reclaimed")
    val deleted = store.vacuum(keepVersions = 1, minAgeMs = 0L)
    assert(deleted >= 1, "version-1 file for user 1's bucket must be reclaimed")
    val got = store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a2", 2L -> "b"))
    assert(store.vacuum(minAgeMs = 0L) == 0L, "second vacuum finds nothing")
  }

  test("a store reopened with a different bucket count upserts without duplicating keys") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_bc").toString + "/snap"
    new SnapshotStore(spark, dir, buckets = 32)
      .overwrite((1L to 50L).map(i => (i, s"v$i")).toDF("user_id", "v"))
    // different constructor bucket count must hash with the RECORDED one
    val reopened = new SnapshotStore(spark, dir, buckets = 8)
    reopened.upsert(Seq((7L, "updated")).toDF("user_id", "v"))
    val rows = reopened.read().get.filter(col("user_id") === 7L).collect()
    assert(rows.length == 1 && rows.head.getString(1) == "updated",
      s"key 7 must appear exactly once, got ${rows.toSeq}")
    assert(reopened.read().get.count() == 50)
  }

  test("partitioned layout: readPartitions opens only the requested values' files") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_pcol").toString + "/snap"
    val store = new SnapshotStore(spark, dir, key = "id", buckets = 4,
      partitionCol = Some("cell"))
    store.overwrite((1L to 100L).map(i => (i, (i % 8).toInt, s"v$i")).toDF("id", "cell", "v"))

    val files2 = store.filesForPartitions(Seq(2))
    assert(files2.nonEmpty && files2.size < store.liveFileCount,
      s"a one-value probe must open a strict subset: ${files2.size} of ${store.liveFileCount}")
    assert(files2.forall(_.contains("snap_part=2/")),
      s"pruned list must only hold the requested value's files, got $files2")
    // the partition column survives as DATA (layout uses a copy), and
    // the pruned read returns exactly the requested value's rows
    val got = store.readPartitions(Seq(2, 5)).get
    assert(got.columns.contains("cell"))
    assert(got.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 100L).filter(i => i % 8 == 2 || i % 8 == 5))

    // upsert through a handle OPENED WITHOUT the partition column: the
    // RECORDED layout wins — pruning must keep working afterwards
    val reopened = new SnapshotStore(spark, dir, key = "id", buckets = 4)
    reopened.upsert(Seq((10L, 2, "updated")).toDF("id", "cell", "v"))
    val after = reopened.readPartitions(Seq(2)).get
    assert(after.filter(col("id") === 10L).select("v").head().getString(0) == "updated")
    assert(reopened.filesForPartitions(Seq(2)).forall(_.contains("snap_part=2/")),
      "post-upsert files must still carry the partition layout")
    assert(reopened.read().get.count() == 100)
  }

  test("readForKeys/keysFor/validateWrite open only the probed keys' buckets") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_keyed").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 8)
    store.overwrite((1L to 200L).map(i => (i, s"v$i")).toDF("user_id", "v"))

    val probe = Seq(5L, 6L).toDF("user_id")
    val opened = store.filesForKeys(probe)
    assert(opened.nonEmpty && opened.size < store.liveFileCount,
      s"a 2-key probe must open a strict subset of buckets: ${opened.size} of ${store.liveFileCount}")
    val got = store.readForKeys(probe).get
    assert(got.filter(col("user_id").isin(5L, 6L)).count() == 2)

    // the anti-join contract: "which probe keys are new" is identical
    // against the pruned keysFor() and the full keys()
    val mixed = Seq(5L, 6L, 901L, 902L).toDF("user_id")
    def newOnes(right: org.apache.spark.sql.DataFrame) =
      mixed.join(right, Seq("user_id"), "left_anti")
        .collect().map(_.getLong(0)).toSet
    assert(newOnes(store.keysFor(mixed)) == Set(901L, 902L))
    assert(newOnes(store.keysFor(mixed)) == newOnes(store.keys()))

    assert(store.validateWrite(Seq((5L, "v5")).toDF("user_id", "v")) == 0L)
    assert(store.validateWrite(Seq((999L, "x")).toDF("user_id", "v")) == 1L)
  }

  test("insert-only upsert appends new files; no existing file is rewritten") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_insfast").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite((1L to 40L).map(i => (i, s"v$i")).toDF("user_id", "v"))
    val (_, before) = store.latestManifest().get

    // fresh keys only: every pre-existing file must survive verbatim
    // (copy-on-write is per COLLIDING bucket, and there are none)
    store.upsert(Seq((101L, "new1"), (102L, "new2")).toDF("user_id", "v"))
    val (_, after) = store.latestManifest().get
    before.foreach { case (b, files) =>
      assert(files.forall(after.getOrElse(b, Nil).contains),
        s"insert-only upsert must not rewrite bucket $b's files")
    }
    assert(store.read().get.count() == 42)

    // mixed batch: one colliding key, one fresh key — only the
    // colliding key's bucket may lose files
    store.upsert(Seq((1L, "updated"), (103L, "new3")).toDF("user_id", "v"))
    val (_, after2) = store.latestManifest().get
    val rewritten = after.keySet.filter(b =>
      !after(b).forall(after2.getOrElse(b, Nil).contains))
    assert(rewritten.size <= 1,
      s"only the colliding bucket may be rewritten, got $rewritten")
    val got = store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "updated" && got(103L) == "new3" && got.size == 43)
  }

  test("bloom sidecar clears fresh-key probes without scanning; falls open when absent") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_bloom").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite((1L to 200L).map(i => (i, s"v$i")).toDF("user_id", "v"))

    // fresh keys: every touched bucket must be bloom-cleared — zero
    // buckets key-scanned on the ingest path
    store.upsert(Seq((901L, "n1"), (902L, "n2"), (903L, "n3")).toDF("user_id", "v"))
    assert(store.lastProbeStats._1 == 0 && store.lastProbeStats._2 > 0,
      s"fresh keys must skip the key scan entirely, got ${store.lastProbeStats}")

    // a colliding key's bucket must NOT be cleared (no false negatives
    // by construction: blooms overapproximate)
    store.upsert(Seq((7L, "updated")).toDF("user_id", "v"))
    assert(store.lastProbeStats._1 >= 1,
      s"a stored key must force its bucket through the key scan, got ${store.lastProbeStats}")
    val got = store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(7L) == "updated" && got(901L) == "n1" && got.size == 203)

    // pre-bloom generations (sidecar missing) fail OPEN into the scan
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (st <- fsys.listStatus(new org.apache.hadoop.fs.Path(dir))
         if st.isDirectory && st.getPath.getName.startsWith("data-")) {
      val b = new org.apache.hadoop.fs.Path(st.getPath, ".blooms")
      if (fsys.exists(b)) fsys.delete(b, false)
    }
    store.upsert(Seq((905L, "n5")).toDF("user_id", "v"))
    assert(store.lastProbeStats._1 > 0 && store.lastProbeStats._2 == 0,
      s"missing sidecars must fall back to the key scan, got ${store.lastProbeStats}")
    assert(store.read().get.count() == 204)
  }

  test("salted bloom build (buckets < cores) still clears fresh keys and blocks stored ones") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_bloom1").toString + "/snap"
    // ONE bucket + a partition column — the corpus-sized floor-1
    // layout: the bloom exchange salts across cores, and every salted
    // task's partial for the bucket merges into one correct filter
    val store = new SnapshotStore(spark, dir, buckets = 1, partitionCol = Some("p"))
    store.overwrite((1L to 500L).map(i => (i, (i % 7).toInt, s"v$i"))
      .toDF("user_id", "p", "v"))
    // fresh keys clear: the merged filter holds ALL stored keys, so a
    // disjoint delta skips the key scan
    store.upsert(Seq((9001L, 1, "n1"), (9002L, 2, "n2")).toDF("user_id", "p", "v"))
    assert(store.lastProbeStats._1 == 0 && store.lastProbeStats._2 > 0,
      s"fresh keys must bloom-clear the single bucket, got ${store.lastProbeStats}")
    // every stored key is found (no false negatives from the salted
    // merge): a replace of an old key forces the scan and lands
    store.upsert(Seq((42L, 0, "updated")).toDF("user_id", "p", "v"))
    assert(store.lastProbeStats._1 == 1,
      s"a stored key must force the key scan, got ${store.lastProbeStats}")
    val got = store.read().get.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(42L) == "updated" && got(9001L) == "n1" && got.size == 502)
  }

  test("two interleaved upserts both land: the loser re-merges and retries") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_retry").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite(Seq((1L, "a"), (2L, "b")).toDF("user_id", "v"))
    val other = new SnapshotStore(spark, dir, buckets = 4)
    // deterministic race: a competing writer publishes in the window
    // between this writer's merge and its manifest commit, exactly once
    var fired = false
    store.onBeforeCommit = () =>
      if (!fired) { fired = true; other.upsert(Seq((2L, "concurrent")).toDF("user_id", "v")) }
    try store.upsert(Seq((1L, "mine")).toDF("user_id", "v"))
    finally store.onBeforeCommit = () => ()
    assert(fired, "the race hook must have fired")
    val got = store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "mine", 2L -> "concurrent"),
      s"both writers' rows must land (loser re-merged against the winner), got $got")
    // three committed versions: base, winner, retried loser
    assert(store.versions().size == 3, s"expected 3 versions, got ${store.versions()}")
  }

  test("delete removes keys O(touched buckets); absent keys are a version-free no-op") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_del").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 8)
    store.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("user_id", "v"))
    val (v1, before) = store.latestManifest().get

    val removed = store.delete(Seq(5L, 6L).toDF("user_id"))
    assert(removed == 2L)
    val (v2, after) = store.latestManifest().get
    assert(v2 == v1 + 1)
    // only the doomed keys' buckets were rewritten; the rest reference
    // the same immutable files
    val changed = (before.keySet ++ after.keySet).filter(b => before.get(b) != after.get(b))
    assert(changed.size <= 2, s"2-key delete must touch <= 2 buckets, got $changed")
    val got = store.read().get.select("user_id").collect().map(_.getLong(0)).toSet
    assert(got == (1L to 100L).toSet -- Set(5L, 6L))

    // deleting absent keys: no rewrite, NO new manifest version —
    // replayed takedowns don't churn the version history
    assert(store.delete(Seq(5L, 999L).toDF("user_id")) == 0L)
    assert(store.versions().last == v2, "absent-key delete must not commit")

    // multi-row-per-key store semantics: every row of the key goes
    store.upsert(Seq((200L, "x")).toDF("user_id", "v"))
    assert(store.read().get.filter(col("user_id") === 200L).count() == 1)
    assert(store.delete(Seq(200L).toDF("user_id")) == 1L)
  }

  test("delete: snapshot isolation for pinned readers; vacuum makes the bytes unrecoverable") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_del_iso").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite((1L to 20L).map(i => (i, s"v$i")).toDF("user_id", "v"))
    val pinned = store.read().get // plan pins the pre-delete file list
    assert(store.delete(Seq(7L).toDF("user_id")) == 1L)
    assert(pinned.filter(col("user_id") === 7L).count() == 1,
      "a reader opened before the delete keeps its version")
    assert(store.read().get.filter(col("user_id") === 7L).count() == 0,
      "a reader opened after the delete must not see the key")
    // vacuum reclaims the superseded generation — the takedown's bytes
    assert(store.vacuum(keepVersions = 1, minAgeMs = 0L) > 0)
    assert(store.read().get.count() == 19)
  }

  test("delete drops an all-deleted bucket from the manifest entirely") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_del_all").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.overwrite((1L to 40L).map(i => (i, s"v$i")).toDF("user_id", "v"))
    // delete EVERY key of one bucket: derive membership the same way
    // the store lays it out — each key's file path carries its
    // snap_bucket=B segment (filesForKeys probes exactly that bucket)
    def bucketOf(k: Long): Int = store.filesForKeys(Seq(k).toDF("user_id"))
      .head.split('/').find(_.startsWith("snap_bucket="))
      .get.stripPrefix("snap_bucket=").toInt
    val byBucket = (1L to 40L).groupBy(bucketOf)
    val (doomedBucket, doomed) = byBucket.head
    assert(store.delete(doomed.toDF("user_id")) == doomed.size.toLong)
    val (_, mapping) = store.latestManifest().get
    assert(!mapping.contains(doomedBucket),
      s"an all-deleted bucket must leave the manifest, got ${mapping.keySet}")
    assert(store.read().get.count() == 40L - doomed.size)
  }

  test("compact racing an upsert: both land in some serial order, rows identical") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_race2").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 2)
    // several upserts over-split the buckets so compact has real work
    store.overwrite((1L to 20L).map(i => (i, "base")).toDF("user_id", "v"))
    store.upsert((1L to 20L).map(i => (i, "gen2")).toDF("user_id", "v"))
    store.upsert((1L to 20L).map(i => (i, "gen3")).toDF("user_id", "v"))
    val other = new SnapshotStore(spark, dir, buckets = 2)
    var fired = false
    // the hook fires inside compact's commit window (and again inside
    // the injected upsert's own commit — guard makes it one-shot)
    store.onBeforeCommit = () =>
      if (!fired) { fired = true; other.upsert(Seq((21L, "racer")).toDF("user_id", "v")) }
    val compacted = try store.compact() finally store.onBeforeCommit = () => ()
    assert(fired, "the race hook must have fired")
    assert(compacted > 0, "compact must have retried and still compacted")
    val got = store.read().get.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = (1L to 20L).map(_ -> "gen3").toMap + (21L -> "racer")
    assert(got == expect,
      "the racer's row must survive compaction (no resurrection of replaced rows)")
  }

  test("upsert inserts unseen keys and validateWrite sees them") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_ins").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 4)
    store.upsert(Seq((1L, "a"), (2L, "b")).toDF("user_id", "v"))
    store.upsert(Seq((2L, "B"), (9L, "c")).toDF("user_id", "v"))
    val got = store.read().get.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 9L -> "c"))
    assert(store.validateWrite(Seq((9L, "c")).toDF("user_id", "v")) == 0L)
  }
}
