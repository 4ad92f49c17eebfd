package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities. AQE's skew-join splitting (on in
  * [[graft.Sessions]]) covers sort-merge joins at runtime; these cover
  * the two cases it can't:
  *
  *  - a hash AGGREGATION with a hot key (one reducer gets the world):
  *    [[saltedAgg]] splits each key into `buckets` sub-groups, partial-
  *    aggregates them in parallel, then merges the small per-key
  *    bucket results;
  *  - a broadcast-able but HOT-KEY join where one stream partition
  *    still explodes: [[saltedBroadcastJoin]] replicates the small
  *    side per salt bucket so hot-key rows spread across tasks.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from `src` (any column with
    * spread — an id, or the whole row's hash). */
  def saltFrom(src: Column, buckets: Int): Column = pmod(hash(src), lit(buckets))

  /** Two-phase (salted) aggregation:
    * `df.groupBy(keys :+ salt).agg(partial) .groupBy(keys).agg(merge)`.
    *
    * `partial` aggregates raw rows inside one (key, salt) bucket;
    * `merge` combines the bucket rows per key — its inputs are the
    * columns `partial` produced. Example (avg by key):
    * {{{
    *   Skew.saltedAgg(df, Seq("k"), col("id"), 32,
    *     partial = Seq(sum("v").as("s"), count(lit(1)).as("c")),
    *     merge   = Seq((sum("s") / sum("c")).as("avg_v")))
    * }}} */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltSrc: Column, buckets: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(partial.nonEmpty && merge.nonEmpty)
    val salted = df.withColumn("__salt", saltFrom(saltSrc, buckets))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Measure key skew on a sample and suggest a salt factor: the ratio
    * of the hottest key's share to a uniform share, clamped to
    * [1, maxBuckets]. 1 means "don't salt" — salting un-skewed data
    * only adds a merge phase. The sample is a single small aggregation
    * (never a full-data histogram); `fraction` rows decide, which is
    * plenty: a key hot enough to matter dominates any sample. */
  def suggestSaltFactor(df: DataFrame, key: String, fraction: Double = 0.05,
                        maxBuckets: Int = 64, seed: Long = 42L): Int = {
    val counts = df.sample(fraction, seed).groupBy(col(key)).count()
      .agg(coalesce(max(col("count")), lit(0L)).as("hottest"),
        coalesce(sum(col("count")), lit(0L)).as("n"),
        count(lit(1)).as("n_keys"))
      .head()
    val (hottest, n, nKeys) =
      (counts.getLong(0), counts.getLong(1), counts.getLong(2))
    if (n == 0L || nKeys == 0L) 1
    else {
      val uniform = n.toDouble / nKeys
      math.min(maxBuckets, math.max(1, math.ceil(hottest / uniform).toInt))
    }
  }

  /** Hot-key-tolerant broadcast join: the big side gets a salt, the
    * (small) right side is replicated once per bucket, and the join
    * key becomes (key, salt) — so a key whose rows would all land in
    * one task now spread over `buckets` tasks. Join type: inner or
    * left_outer (the replication preserves both). */
  def saltedBroadcastJoin(big: DataFrame, small: DataFrame, key: String,
                          saltSrc: Column, buckets: Int,
                          joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltFrom(saltSrc, buckets))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(broadcast(replicated), Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
