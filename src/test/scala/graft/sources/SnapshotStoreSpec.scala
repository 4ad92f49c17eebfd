package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class SnapshotStoreSpec extends SparkSpec {

  /** parquet files per bucket directory (dir name → file names). */
  private def bucketFiles(root: String): Map[String, Set[String]] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .toSeq
      .groupBy(_.getParent.getFileName.toString)
      .map { case (d, fs) => d -> fs.map(_.getFileName.toString).toSet }

  test("upsert touching one user rewrites exactly one bucket partition") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_snap_part").toString + "/snap"
    val store = new SnapshotStore(spark, dir, buckets = 8)
    store.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("user_id", "v"))
    val before = bucketFiles(dir)
    assert(before.size > 1, "100 users over 8 buckets must span several partitions")

    store.upsert(Seq((5L, "updated")).toDF("user_id", "v"))
    val after = bucketFiles(dir)
    val changed = after.keySet.union(before.keySet)
      .filter(d => before.get(d) != after.get(d))
    assert(changed.size == 1, s"one-user upsert must rewrite one bucket, got $changed")

    val snap = store.read().get
    assert(snap.count() == 100)
    assert(snap.filter(col("user_id") === 5L).select("v").head().getString(0) == "updated")
    // logical schema hides the partition column
    assert(snap.columns.toSeq == Seq("user_id", "v"))
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
