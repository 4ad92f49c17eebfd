package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the r15 plan-shaping contracts:
  *
  *  - [[PlanUtils.fanout]]/[[PlanUtils.fanoutBy]] are CONDITIONAL: they
  *    repartition a narrow input up to the session's parallelism and
  *    are a structural no-op (zero added Exchange) once the input is
  *    at least that wide — the property that keeps every r15 scan
  *    fanout from becoming a local[32]-only constant (on a real
  *    multi-row-group layout the plan is untouched).
  *  - [[PlanUtils.barrierBy]] is UNCONDITIONAL: it must materialize an
  *    exchange even on already-parallel input, because its callers use
  *    it as an exchange-REUSE barrier over multi-consumer subtrees (a
  *    conditional barrier silently re-executes the subtree per
  *    consumer the moment something upstream widens the input), and
  *    its partition count is PINNED so AQE's size-based coalescing
  *    cannot fold a small-byte / compute-heavy frame onto one core.
  */
class PlanUtilsSpec extends SparkSpec {

  // sparkPlan, not executedPlan: under AQE the executed plan prints as
  // an unevaluated AdaptiveSparkPlan wrapper whose string hides the
  // exchange nodes until stages actually run
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.sparkPlan.toString
      .linesIterator.count(l => l.contains("Exchange") && !l.contains("Broadcast"))

  private def narrow = {
    val s = spark
    import s.implicits._
    (1L to 1000L).map(i => (i, i % 7)).toDF("id", "v").coalesce(1)
  }

  // the projection above the repartition matters: adjacent
  // repartitions would otherwise be merged by CollapseRepartition and
  // the barrier test below would measure the optimizer, not barrierBy
  private def wide = {
    val s = spark
    import s.implicits._
    (1L to 1000L).map(i => (i, i % 7)).toDF("id", "v")
      .repartition(spark.sparkContext.defaultParallelism * 2, col("id"))
      .withColumn("w", col("v") * 2)
  }

  test("fanoutBy widens a narrow input to the session parallelism") {
    val out = PlanUtils.fanoutBy(narrow, col("id"))
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // keyed, not round-robin: same key -> same partition
    val parts = out.select(col("id"), spark_partition_id().as("p"))
      .groupBy("id").agg(countDistinct("p").as("n")).agg(max("n")).head().getLong(0)
    assert(parts == 1L)
  }

  test("fanout and fanoutBy are structural no-ops on already-parallel input") {
    val w = wide
    assert(PlanUtils.fanout(w) eq w)
    assert(PlanUtils.fanoutBy(w, col("id")) eq w)
  }

  test("barrierBy always materializes an exchange, even on parallel input") {
    val w = wide
    val out = PlanUtils.barrierBy(w, col("id"))
    assert(out ne w)
    assert(exchanges(out) > exchanges(w),
      "barrierBy must add its exchange unconditionally — it is a reuse barrier")
  }

  test("barrierBy pins the partition count against AQE size-coalescing") {
    // tiny bytes: AQE's advisory size would coalesce an unpinned
    // exchange to 1 partition; the pinned count must survive execution
    val out = PlanUtils.barrierBy(narrow, col("id"))
    val distinctParts = out.select(spark_partition_id().as("p")).distinct().count()
    assert(distinctParts > 1L,
      s"expected >1 executed partitions, got $distinctParts — AQE coalesced the pinned exchange")
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("fanoutBy preserves rows exactly") {
    val in = narrow
    val out = PlanUtils.fanoutBy(in, col("id"))
    assert(out.orderBy("id").collect().toSeq == in.orderBy("id").collect().toSeq)
  }
}
