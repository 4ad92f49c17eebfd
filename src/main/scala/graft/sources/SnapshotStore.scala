package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed snapshot store with UPSERT semantics — the Spark-native
  * stand-in for the reference's MySQL `user_tags` table and its
  * `INSERT ... ON DUPLICATE KEY UPDATE` writer (reference:
  * src/writers/optimized_mysql_writer.py:73-178).
  *
  * Layout: parquet hash-partitioned into `buckets` directories on
  * `hash(key) % buckets`. An upsert touches ONLY the bucket
  * directories its keys fall in — the incremental nightly batch
  * (thousands of users against a billions-row snapshot) re-reads and
  * rewrites a bounded slice instead of O(snapshot) I/O per call.
  * Merged buckets are written to a temp dir first and swapped in
  * per-directory, so a failed job never corrupts the snapshot and we
  * never overwrite a path we are lazily reading.
  * On a lakehouse table format (Delta/Iceberg) the same call maps to
  * `MERGE INTO` — the API is the contract, not the file layout.
  */
final class SnapshotStore(spark: SparkSession, path: String, key: String = "user_id",
                          buckets: Int = 32) {

  /** Partition column — internal to the store; never surfaced by read(). */
  private val BucketCol = "snap_bucket"

  private def fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn(BucketCol, pmod(hash(col(key)), lit(buckets)))

  def exists: Boolean = fs.exists(new Path(path))

  /** The snapshot in its logical schema (partition column dropped). */
  def read(): Option[DataFrame] =
    if (exists) Some(spark.read.parquet(path).drop(BucketCol)) else None

  /** Full overwrite (safe swap of the whole snapshot). */
  def overwrite(df: DataFrame): Unit = {
    val tmp = path + ".__tmp__"
    withBucket(df).write.partitionBy(BucketCol).mode("overwrite").parquet(tmp)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmp), new Path(path))
  }

  /** UPSERT: rows in `df` replace snapshot rows with the same key; all
    * other snapshot rows are kept (mysql_writer UPSERT semantics).
    * Only the bucket partitions containing incoming keys are read
    * (partition pruning on the filter), merged (one key-partitioned
    * anti-join + union), and swapped — untouched bucket directories
    * are never opened. The touched-bucket list is a ≤`buckets`-element
    * driver collect, not a data-sized one. */
  def upsert(df: DataFrame): Unit = read() match {
    case None => overwrite(df)
    case Some(existing) =>
      val incoming = withBucket(df.select(existing.columns.map(col).toIndexedSeq: _*))
      val touched = incoming.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).sorted
      val existingTouched = spark.read.parquet(path)
        .filter(col(BucketCol).isin(touched.map(Integer.valueOf).toIndexedSeq: _*))
      val kept = existingTouched.join(df.select(key).distinct(), Seq(key), "left_anti")
      val merged = kept.unionByName(incoming.select(existingTouched.columns.map(col).toIndexedSeq: _*))
      val tmp = path + ".__tmp__"
      merged.write.partitionBy(BucketCol).mode("overwrite").parquet(tmp)
      touched.foreach { b =>
        val dir = s"$BucketCol=$b"
        fs.delete(new Path(path, dir), true)
        fs.rename(new Path(tmp, dir), new Path(path, dir))
      }
      fs.delete(new Path(tmp), true)
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
