package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction — one place for the configs every
  * entry point (Verify, Bench, tests, user code) needs:
  *
  *  - AQE on (runtime partition coalescing + skew-join splitting);
  *  - shuffle partitions sized to the local core count (on a real
  *    cluster leave AQE to coalesce from a higher initial number);
  *  - `nanosAsLong` so parquet TIMESTAMP(NANOS) columns read as longs
  *    instead of erroring (Spark has no nanos type; see Tables.load);
  *  - UTC session timezone for deterministic date arithmetic.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions) // SQL access to graft's native functions
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local-mode file splitting: the test/bench parquet files are a
      // few MB, which the 128 MB default maps to ONE partition — every
      // scan-side operator would run on one core. 4 MB keeps tiny
      // inputs parallel; measured: 1 MB is a net loss at sf0.1 (task
      // overhead on the heavy queries outweighs the extra splits). On
      // a real cluster with TB-scale inputs, override back to the
      // default (or higher) at submit time.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")

  def local(cores: Int): SparkSession = {
    // per-JVM derby home + warehouse: two local sessions in the same
    // working directory otherwise fight over metastore_db's exclusive
    // lock and every catalog operation (saveAsTable, bucketed writes)
    // in the second JVM dies
    val scratch = java.nio.file.Files.createTempDirectory("graft_session").toString
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", scratch)
    val s = builder(s"local[$cores]", cores)
      .config("spark.sql.warehouse.dir", s"$scratch/warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
