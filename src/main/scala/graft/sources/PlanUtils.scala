package graft.sources

import org.apache.spark.sql.DataFrame

/** Plan-shaping helpers. */
object PlanUtils {

  /** Ensure `df` has at least the session's default parallelism in
    * partitions before a compute-heavy stage (pair joins, signature
    * scans). A small parquet file arrives as ONE partition, which
    * serializes everything downstream on a single core; a 100 TB table
    * is already wide, in which case this is a no-op — so the check is
    * on the actual partition count, not unconditional. */
  def fanout(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
