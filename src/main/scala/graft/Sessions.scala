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
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
