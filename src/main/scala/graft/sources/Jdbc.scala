package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin JDBC reader/writer facade — the Spark-native counterpart of the
  * reference's MySQL reader/writer pair (reference:
  * src/writers/optimized_mysql_writer.py:73-178 and the readers
  * package).
  *
  * Reads partition on a numeric column so every executor pulls its own
  * slice (the reference reads single-threaded). Writes batch through
  * the JDBC driver with `rewriteBatchedStatements`-style throughput
  * left to the driver; true UPSERT on a lakehouse belongs to
  * [[SnapshotStore]] — JDBC `SaveMode.Append/Overwrite` is what Spark
  * can guarantee portably.
  *
  * No JDBC driver ships in this container, so this facade is
  * compile-checked only; every call is a direct delegation to
  * `spark.read.jdbc` / `df.write.jdbc`.
  */
object Jdbc {

  /** Parallel partitioned read over `[lower, upper]` of `partitionCol`. */
  def read(spark: SparkSession, url: String, table: String,
           partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
           props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  /** Single-partition read (small dims only). */
  def read(spark: SparkSession, url: String, table: String,
           props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Batched write; `batchSize` maps to the JDBC fetch/batch size the
    * reference tunes per-partition (optimized_mysql_writer.py:95), and
    * `retries` to its retry-with-backoff loop around failed batches.
    *
    * Retrying is only safe when the write is idempotent: a re-run of
    * `Append` after a partial failure duplicates the partitions that
    * already committed (the reference's per-batch retry is idempotent
    * because it upserts ON DUPLICATE KEY). Append therefore gets ONE
    * attempt unless the caller explicitly opts in via
    * `retryNonIdempotent` (e.g. the target has a primary key that
    * rejects duplicates, or the table is staged-then-swapped). */
  def write(df: DataFrame, url: String, table: String, mode: SaveMode,
            batchSize: Int = 5000, retries: Int = 3,
            retryNonIdempotent: Boolean = false,
            props: Properties = new Properties()): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    val attempts =
      if (mode == SaveMode.Append && !retryNonIdempotent) 1 else retries
    Retry.withRetry(attempts) {
      df.write.mode(mode).jdbc(url, table, props)
    }
  }
}
