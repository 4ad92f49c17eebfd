package graft.sources

import org.apache.spark.sql.{Column, DataFrame}

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

  /** [[fanout]] keyed on a deterministic high-cardinality expression —
    * the r15 form for UNSPLITTABLE inputs (guide §2.5: a single-row-
    * group parquet file scans as one task however small
    * `maxPartitionBytes` is set). Hash repartitioning skips the local
    * sort round-robin repartition pays (`sortBeforeRepartition`, on by
    * default since SPARK-23207, exists so RETRIED round-robin tasks
    * reproduce their row→partition assignment; a hash of a
    * deterministic key needs no such crutch), so the serial scan task
    * does strictly less work. Same adaptivity contract as [[fanout]]:
    * a no-op whenever the scan is already at least as parallel as the
    * session, i.e. every real multi-row-group layout. Callers pick a
    * key with ≫ parallelism distinct values (guide §2.5's 20-100×
    * rule) so the hash spreads evenly. */
  def fanoutBy(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, key) else df
  }

  /** UNCONDITIONAL keyed exchange — the materialization-barrier form.
    * [[fanout]]/[[fanoutBy]] are conditional (no-op once the input is
    * parallel), which makes them unusable as exchange-REUSE barriers:
    * a multi-consumer subtree behind a conditional barrier silently
    * recomputes per consumer the moment something upstream widens the
    * input (exactly what happened when r15's scan fanout landed below
    * the old `fanout(...)` barriers). This one always materializes:
    * every consumer of the returned frame reads ONE shuffle output
    * instead of re-executing the subtree (guide §2.4 "two operations
    * keyed the same way can often share one exchange"). The partition
    * count is PINNED to `defaultParallelism` (AQE respects explicit
    * counts) so size-based coalescing cannot collapse a small-byte /
    * compute-heavy frame onto one core — the simhashPairs lesson
    * (22 min single-task block join on a degenerate corpus). Key on a
    * high-cardinality deterministic column; keyed hashing skips
    * round-robin's sortBeforeRepartition pass. */
  def barrierBy(df: DataFrame, key: Column): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, key)
}
