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

  test("value_quantiles_approx: within the sketch's rank-error band of the exact twin") {
    def keyed(df: DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = keyed(AnalyticsQueries.valueQuantiles(spark, dir))
    val approx = keyed(AnalyticsQueries.valueQuantilesApprox(spark, dir))
    assert(approx.keySet == exact.keySet, "same (event_type, level) grid")
    // accuracy=10000 ⇒ rank error ≤ n/10000 < 1 row at this scale: the
    // sketch must return a genuine element adjacent to the exact value.
    // Exact `percentile` interpolates between elements, so allow the
    // one-element gap plus a small relative band.
    for ((k, e) <- exact) {
      val a = approx(k)
      assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 0.5),
        s"$k: approx $a too far from exact $e")
    }
    // and no global sort in the plan: the sketch is a hash aggregate
    val p = plan(AnalyticsQueries.valueQuantilesApprox(spark, dir)).toString
    assert(!p.contains("Sort "), s"approx quantiles must not sort:\n$p")
  }

  test("events_cohorts_approx: HLL counts within the rsd band of exact countDistinct") {
    def keyed(df: DataFrame) = df.collect()
      .map(r => (r.get(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    val exact = keyed(AnalyticsQueries.eventsCohorts(spark, dir))
    val approx = keyed(AnalyticsQueries.eventsCohortsApprox(spark, dir))
    assert(approx.keySet == exact.keySet, "same (cohort, offset) grid")
    for ((k, e) <- exact) {
      val a = approx(k)
      // rsd 2% default; allow 5 sigma plus integer slack on small groups
      assert(math.abs(a - e) <= math.max(0.10 * e, 2.0),
        s"$k: approx $a outside the error band of exact $e")
    }
    // the point of the swap: no exact-distinct expand — the plan has
    // exactly the two aggregation exchanges (cohort derivation + the
    // final rollup), not countDistinct's extra expand stage
    val p = plan(AnalyticsQueries.eventsCohortsApprox(spark, dir)).toString
    assert(!p.contains("Expand"), s"HLL path must not expand distincts:\n$p")
  }

  test("user_rfm_approx: no global sort; scores track the ntile twin within one notch") {
    def keyed(df: DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getInt(5), r.getInt(6), r.getString(7))).toMap
    val exact = keyed(AnalyticsQueries.userRfm(spark, dir))
    val approx = keyed(AnalyticsQueries.userRfmApprox(spark, dir))
    assert(approx.keySet == exact.keySet, "same user universe")
    val n = exact.size
    def within1(f: ((Int, Int, Int, String)) => Int) =
      exact.count { case (u, ex) => math.abs(f(ex) - f(approx(u))) <= 1 }.toDouble / n
    // range-mapping agrees with ntile except near breakpoints/ties —
    // at least 90% of users within one notch on every axis
    assert(within1(_._1) >= 0.9, f"r_score drift: ${within1(_._1)}%.3f")
    assert(within1(_._2) >= 0.9, f"f_score drift: ${within1(_._2)}%.3f")
    assert(within1(_._3) >= 0.9, f"m_score drift: ${within1(_._3)}%.3f")
    val segAgree = exact.count { case (u, ex) => ex._4 == approx(u)._4 }.toDouble / n
    assert(segAgree >= 0.7, f"segment agreement collapsed: $segAgree%.3f")
    // the point of the swap: no ntile total-order sort in the plan
    val p = plan(AnalyticsQueries.userRfmApprox(spark, dir)).toString
    assert(!p.contains("Window") && !p.contains("Sort "), s"approx RFM must not sort a total order:\n$p")
  }

  test("robust outliers: a masking mega-spike hides the z-score's catch but not the MAD's; MAD=0 emits nothing") {
    val s = spark
    import s.implicits._
    // group t: 100 small values (cycle -3..3, median 0, MAD 2), one
    // 50-spike, one 1e6 mega-spike. The mega-spike inflates the
    // classic stddev to ~1e5, burying the 50-spike at |z| ≈ 0.1 —
    // the exact masking failure the robust form exists for
    val vals = (1L to 100L).map(i => (i, "t", (i % 7 - 3).toDouble)) ++
      Seq((101L, "t", 50.0), (102L, "t", 1e6)) ++
      // group u: >50% of mass at one value -> MAD = 0 -> the group is
      // excluded entirely (documented: no div-by-zero infinities)
      (200L to 210L).map(i => (i, "u", 5.0)) :+ ((211L, "u", 100.0))
    val ev = vals.toDF("event_id", "event_type", "value")
    val robust = AnalyticsQueries.outliersRobustOn(ev)
      .collect().map(_.getLong(0)).toSet
    assert(robust.contains(101L) && robust.contains(102L),
      s"both spikes flagged by the modified z-score: $robust")
    assert(robust.forall(_ <= 102L), s"MAD=0 group must emit nothing: $robust")
    assert(!robust.exists(id => id >= 1L && id <= 100L),
      s"the small cycle is not outlying (|rz| ≈ 1): $robust")
    // and the masking claim itself: the classic z of the 50-spike on
    // this data really is far under the 3σ bar
    val xs = vals.filter(_._2 == "t").map(_._3)
    val mean = xs.sum / xs.size
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1))
    assert(math.abs((50.0 - mean) / sd) < 0.2,
      f"precondition: the z-score must hide the 50-spike, z=${(50.0 - mean) / sd}%.3f")
  }
}
