package graft.sources

import java.sql.{DriverManager, PreparedStatement, Types}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

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
  * Exercised end-to-end against embedded Derby (the one JDBC engine on
  * the Spark classpath) in JdbcSpec: partitioned read, batched keyed
  * upsert with per-batch retry, and read-back validation.
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

  /** Distributed batched keyed UPSERT — the reference writer's core
    * loop (reference: optimized_mysql_writer.py:73-178: per-partition
    * batches + retry-with-backoff + ON DUPLICATE KEY semantics),
    * Spark-first: every partition opens its own connection and streams
    * its rows in `batchSize` transactions, so write parallelism equals
    * data parallelism instead of one driver-side loop.
    *
    * Upsert is expressed portably as delete-keys-then-insert inside ONE
    * transaction per batch — identical end state to `INSERT … ON
    * DUPLICATE KEY UPDATE` and valid SQL on every engine (MySQL's form
    * is proprietary; Derby's MERGE source must be a table). Each batch
    * commits atomically and is retried as a unit after rollback, which
    * keeps the retry idempotent — exactly the property the reference
    * relies on for its per-batch retry.
    *
    * `onBatchStart` is a fault-injection/instrumentation hook (specs
    * use it to force a first-attempt failure and prove the retry). */
  def upsertPartitioned(df: DataFrame, url: String, table: String,
                        keyCols: Seq[String], batchSize: Int = 1000,
                        retries: Int = 3, props: Properties = new Properties(),
                        onBatchStart: () => Unit = () => ()): Unit = {
    val cols = df.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"key columns $keyCols must be non-empty and drawn from $cols")
    val sqlTypes = df.schema.fields.map(f => jdbcType(f.dataType))
    val keyIdx = keyCols.map(cols.indexOf)
    val deleteSql = s"DELETE FROM $table WHERE " +
      keyCols.map(k => s"$k = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (" +
      cols.map(_ => "?").mkString(", ") + ")"
    // one row per key: two versions of a key in one batch would insert
    // the same PK twice after the delete — a deterministic violation no
    // retry can fix (survivor among true in-frame duplicates is
    // arbitrary, as with any unordered upsert source)
    df.dropDuplicates(keyCols).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        var conn: java.sql.Connection = null
        def closeQuietly(): Unit =
          if (conn != null) { try conn.close() catch { case _: Throwable => () }; conn = null }
        try {
          rows.grouped(batchSize).foreach { batch =>
            Retry.withRetry(retries) {
              onBatchStart()
              // reconnect per attempt when the connection died — the
              // canonical transient JDBC failure the retry exists for
              if (conn == null || !conn.isValid(5)) {
                closeQuietly()
                conn = DriverManager.getConnection(url, props)
                conn.setAutoCommit(false)
              }
              val del = conn.prepareStatement(deleteSql)
              val ins = conn.prepareStatement(insertSql)
              try {
                batch.foreach { r =>
                  keyIdx.zipWithIndex.foreach { case (ci, pi) =>
                    setParam(del, pi + 1, r.get(ci), sqlTypes(ci)) }
                  del.addBatch()
                  cols.indices.foreach { ci =>
                    setParam(ins, ci + 1, r.get(ci), sqlTypes(ci)) }
                  ins.addBatch()
                }
                del.executeBatch()
                ins.executeBatch()
                conn.commit()
              } catch {
                case e: Throwable =>
                  // rollback best-effort: its own failure (dead conn)
                  // must not mask the write error the caller retries on
                  try conn.rollback() catch { case re: Throwable => e.addSuppressed(re) }
                  throw e
              } finally {
                try del.close() catch { case _: Throwable => () }
                try ins.close() catch { case _: Throwable => () }
              }
            }
          }
        } finally closeQuietly()
      }
    }
  }

  /** Read-back validation (the reference's post-write check,
    * optimized_mysql_writer.py:180-220): how many of `expected`'s keys
    * are missing from the target table. 0 = write verified. */
  def missingAfterWrite(spark: SparkSession, url: String, table: String,
                        expected: DataFrame, keyCols: Seq[String],
                        props: Properties = new Properties()): Long = {
    val written = read(spark, url, table, props)
    expected.select(keyCols.head, keyCols.tail: _*)
      .join(written.select(keyCols.head, keyCols.tail: _*), keyCols, "left_anti")
      .count()
  }

  private def jdbcType(dt: DataType): Int = dt match {
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case ShortType => Types.SMALLINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case DateType => Types.DATE
    case TimestampType => Types.TIMESTAMP
    case _: DecimalType => Types.DECIMAL
    case StringType => Types.VARCHAR
    case other => sys.error(s"upsertPartitioned: unsupported column type $other")
  }

  private def setParam(st: PreparedStatement, i: Int, v: Any, sqlType: Int): Unit =
    if (v == null) st.setNull(i, sqlType) else st.setObject(i, v, sqlType)
}
