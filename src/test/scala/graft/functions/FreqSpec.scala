package graft.functions

import graft.SparkSpec
import graft.functions.expr.MgState
import org.apache.spark.sql.functions._

/** Misra–Gries summary + the two-pass exact heavy-hitters queries built
  * on it. The MG guarantees are exercised on planted Zipf data whose
  * cardinality far exceeds k — the regime the testdata (uniform, low
  * cardinality) can't produce. */
class FreqSpec extends SparkSpec {

  /** Zipf-ish stream: item i (1-based) appears ~N/i times, shuffled
    * deterministically. Cardinality 2000 >> k. */
  private def zipf(n: Int, seed: Int): (Seq[String], Map[String, Long]) = {
    val items = (1 to 2000).flatMap(i => Seq.fill(math.max(n / i, 1))(s"item_$i"))
    val rnd = new scala.util.Random(seed)
    val shuffled = rnd.shuffle(items)
    (shuffled, shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap)
  }

  test("MgState: count bounds f - n/(k+1) <= c <= f and superset of phi-hitters") {
    val (stream, freqs) = zipf(3000, 11)
    val k = 64
    val st = new MgState(k)
    stream.foreach(st.add)
    assert(st.n == stream.size)
    val bound = st.n / (k + 1) + 1
    import scala.jdk.CollectionConverters._
    st.counts.asScala.foreach { case (item, c) =>
      val f = freqs(item)
      assert(c <= f, s"$item: stored $c > true $f")
      assert(f - c <= bound, s"$item: undercount ${f - c} > n/(k+1)=$bound")
    }
    // every item with f > n/(k+1) must be present
    freqs.filter(_._2 > bound).keys.foreach { item =>
      assert(st.counts.containsKey(item), s"heavy item $item missing from summary")
    }
  }

  test("MgState merge keeps the combined bound (mergeable summaries)") {
    val (stream, freqs) = zipf(3000, 23)
    val k = 48
    val parts = stream.grouped(stream.size / 7 + 1).toSeq
    val states = parts.map { p => val s = new MgState(k); p.foreach(s.add); s }
    val merged = states.reduce { (a, b) => a.mergeFrom(b); a }
    assert(merged.n == stream.size)
    assert(merged.counts.size <= k)
    val bound = merged.n / (k + 1) + 1
    import scala.jdk.CollectionConverters._
    merged.counts.asScala.foreach { case (item, c) =>
      assert(c <= freqs(item) && freqs(item) - c <= bound,
        s"$item: c=$c f=${freqs(item)} bound=$bound")
    }
    freqs.filter(_._2 > bound).keys.foreach { item =>
      assert(merged.counts.containsKey(item), s"heavy item $item lost in merge")
    }
  }

  test("mg_summary SQL aggregate + exact recount == plain GROUP BY heavy hitters") {
    import spark.implicits._
    val (stream, freqs) = zipf(2000, 42)
    val n = stream.size.toLong
    val phi = 0.01
    val k = 256 // > 2/phi
    val df = stream.toDF("item").repartition(8)
    df.createOrReplaceTempView("mg_items")
    val s = spark.sql(s"SELECT mg_summary(item, $k) AS s FROM mg_items")
      .selectExpr("s.n AS n", "explode(s.items.item) AS item")
    assert(s.select("n").first().getLong(0) == n)
    val cand = s.select("item").as[String].collect().toSet
    val threshold = math.ceil(phi * n).toLong
    val exact = freqs.filter(_._2 >= threshold)
    // candidate superset (phi > 1/(k+1) so every hitter survives)
    exact.keys.foreach(i => assert(cand.contains(i), s"hitter $i not a candidate"))
    // recount pass: exact result regardless of MG count noise
    val recount = df.filter(col("item").isInCollection(cand))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .as[(String, Long)].collect().toMap
    assert(recount == exact)
  }

  test("events_heavy_hitters matches plain groupBy/having on testdata") {
    import spark.implicits._
    val got = graft.queries.AnalyticsQueries.eventsHeavyHitters(spark, sf("any"))
      .as[(String, Long)].collect().toMap
    val ev = graft.sources.Tables.load(spark, sf("any"), "events")
    val n = ev.count()
    val expect = ev.groupBy("props").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.ceil(0.005 * n).toLong)
      .as[(String, Long)].collect().toMap
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("heavy-hitters plan: no full-cardinality shuffle before the candidate filter") {
    val df = graft.queries.AnalyticsQueries.eventsHeavyHitters(spark, sf("any"))
    val plan = df.queryExecution.executedPlan.toString
    // pass 2's aggregation must sit behind the broadcast semi-join
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"candidates must broadcast:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"MG pass must partial-aggregate:\n$plan")
  }

  test("heavy-hitter knobs: phi/k parameterized; the k+1 > 1/phi guard rejects droppy configs") {
    import spark.implicits._
    import graft.queries.{AnalyticsQueries => AQ, StreamQueries => SQ}
    val dir = sf("any")
    // a looser phi admits a superset of a tighter phi's hitters
    val loose = AQ.eventsHeavyHitters(spark, dir, phi = 0.002, k = 1000)
      .select("props").as[String].collect().toSet
    val tight = AQ.eventsHeavyHitters(spark, dir, phi = 0.02, k = 100)
      .select("props").as[String].collect().toSet
    assert(tight.subsetOf(loose), s"phi=0.02 hitters must all be phi=0.002 hitters")
    assert(loose.size >= tight.size)
    // explicit defaults == the gate entry
    val viaKnobs = AQ.eventsHeavyHitters(spark, dir, AQ.HhPhi, AQ.HhK)
      .as[(String, Long)].collect().toMap
    val viaGate = AQ.queries("events_heavy_hitters")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(viaKnobs == viaGate)
    // the guarantee guard: k too small for phi would silently DROP
    // true hitters from the candidate superset -- must throw instead
    intercept[IllegalArgumentException] {
      AQ.eventsHeavyHitters(spark, dir, phi = 0.001, k = 400)
    }
    intercept[IllegalArgumentException] {
      SQ.streamHeavyHitters(spark, dir, phi = 0.001, k = 200)
    }
    // streaming twin honors a custom window + knobs and stays exact
    val st = SQ.streamHeavyHitters(spark, dir, phi = 0.02, k = 100, windowLen = "1 day")
      .select("window_start", "props", "cnt")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val exact = ev.select(window(col("ts"), "1 day").getField("start").as("w"), col("props"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .join(ev.select(window(col("ts"), "1 day").getField("start").as("w"), col("props"))
        .groupBy("w", "props").agg(count(lit(1)).as("cnt")), Seq("w"))
      .filter(col("cnt") >= ceil(col("n") * lit(0.02)).cast("long"))
      .select("w", "props", "cnt")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(st == exact, "parameterized streaming hitters must equal the exact per-window set")
  }
}
