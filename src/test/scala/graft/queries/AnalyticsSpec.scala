package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Correctness is covered by the DuckDB oracle gate; these specs pin
  * the PLAN shape — the properties that decide whether the query
  * survives 100 TB. */
class AnalyticsSpec extends SparkSpec {
  private def dir = sf("any")

  private def plan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q1 pushes the shipdate filter into the parquet scan and prunes columns") {
    val s = formatted(AnalyticsQueries.q1PricingSummary(spark, dir))
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), s)
    // 7 needed columns only — no full-width scan
    assert(!s.contains("l_orderkey"), "scan should prune unused columns:\n" + s)
  }

  test("q5 broadcasts every dimension (no shuffle for dims)") {
    val df = AnalyticsQueries.q5RegionRevenue(spark, dir)
    df.collect() // materialize so AQE finalizes the plan
    val s = plan(df).toString
    val joins = "BroadcastHashJoin".r.findAllIn(s).size
    assert(joins >= 4, s"expected >=4 broadcast joins, got $joins in:\n$s")
  }

  test("sessionize is a single shuffle end-to-end") {
    val df = AnalyticsQueries.eventsSessionize(spark, dir)
    df.collect()
    val s = plan(df).toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(s).size
    assert(shuffles == 1,
      s"windows+groupBy all partition on user_id -> exactly 1 shuffle, got $shuffles in:\n$s")
  }

  test("asof join: every event gets the latest prior order, ties to max key") {
    import spark.implicits._
    val out = AnalyticsQueries.asofJoinEventsOrders(spark, dir)
    // spot-check one user against a driver-side reference computation
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select("user_id", "event_id", "ts").as[(Long, Long, java.sql.Timestamp)]
      .collect().filter(_._1 == 3L)
    val ords = graft.sources.Tables.load(spark, dir, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect().filter(_._1 == 3L)
    val got = out.filter($"user_id" === 3L).select("event_id", "o_orderkey")
      .as[(Long, Long)].collect().toMap
    for ((_, eid, ts) <- ev) {
      val expected = ords.filter(!_._3.after(ts)).sortBy(o => (o._3.getTime, o._2)).lastOption
      assert(got.get(eid).map(Some(_)) == expected.map(o => Some(o._2)).orElse(Some(None)).filter(_ => expected.nonEmpty) ||
             got.get(eid) == expected.map(_._2),
        s"event $eid: got ${got.get(eid)}, expected ${expected.map(_._2)}")
    }
  }

  test("window_running is monotone per user and covers all events") {
    import spark.implicits._
    val out = AnalyticsQueries.windowRunning(spark, dir)
    val rows = out.select("user_id", "running_value").as[(Long, Double)].collect()
    assert(rows.length == graft.sources.Tables.load(spark, dir, "events").count())
    assert(rows.forall(_._2 >= 0))
  }
}
