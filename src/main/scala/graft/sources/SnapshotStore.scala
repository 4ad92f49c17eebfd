package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed snapshot store with UPSERT semantics — the Spark-native
  * stand-in for the reference's MySQL `user_tags` table and its
  * `INSERT ... ON DUPLICATE KEY UPDATE` writer (reference:
  * src/writers/optimized_mysql_writer.py:73-178).
  *
  * Implementation: parquet read-merge-write keyed on `user_id`
  * (incoming row wins; absent users carried forward). Writes go to a
  * temp dir then atomically swap, so a failed job never corrupts the
  * snapshot and we never overwrite a path we are lazily reading.
  * On a lakehouse table format (Delta/Iceberg) the same call maps to
  * `MERGE INTO` — the API is the contract, not the file layout.
  */
final class SnapshotStore(spark: SparkSession, path: String, key: String = "user_id") {

  def exists: Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def read(): Option[DataFrame] =
    if (exists) Some(spark.read.parquet(path)) else None

  /** Full overwrite (safe swap). */
  def overwrite(df: DataFrame): Unit = {
    val tmp = path + ".__tmp__"
    df.write.mode("overwrite").parquet(tmp)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmp), new Path(path))
  }

  /** UPSERT: rows in `df` replace snapshot rows with the same key;
    * all other snapshot rows are kept (mysql_writer UPSERT semantics).
    * One key-partitioned anti-join + union — both sides shuffle on the
    * key once; AQE handles skew. */
  def upsert(df: DataFrame): Unit = read() match {
    case None => overwrite(df)
    case Some(existing) =>
      val kept = existing.join(df.select(key).distinct(), Seq(key), "left_anti")
      overwrite(kept.unionByName(df.select(existing.columns.map(col): _*)))
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
