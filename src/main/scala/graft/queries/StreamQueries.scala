package graft.queries

import graft.engine.TagRule
import graft.rules._
import graft.sources.Tables
import graft.streaming.{Ev, Streaming}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch executions of the streaming code paths (SURVEY.md §2.G).
  * Each query runs the EXACT transform the streaming job uses — on the
  * static events table here (for the DuckDB gate), on a MemoryStream
  * in StreamingSpec. Identical plans either way is the point. */
object StreamQueries {

  val eventRules: Seq[TagRule] = Seq(
    TagRule(301, "purchaser", "stream", Cond("event_type", "=", "purchase")),
    TagRule(302, "big_ticket", "stream", And(Seq(
      Cond("event_type", "=", "purchase"), Cond("value", ">=", 400L)))),
    TagRule(303, "engaged", "stream", Cond("event_type", "in", Seq("click", "view"))))

  /** Rules over the enriched (event ⋈ customer-dim) stream. */
  val enrichedRules: Seq[TagRule] = Seq(
    TagRule(311, "building_buyer", "stream", And(Seq(
      Cond("event_type", "=", "purchase"), Cond("c_mktsegment", "=", "BUILDING")))),
    TagRule(312, "machinery_browser", "stream", And(Seq(
      Cond("event_type", "in", Seq("view", "click")),
      Cond("c_mktsegment", "=", "MACHINERY")))))

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")

  def streamWindowedCounts(spark: SparkSession, dir: String): DataFrame =
    Streaming.windowedCounts(events(spark, dir))

  def streamTagging(spark: SparkSession, dir: String): DataFrame =
    Streaming.tagStream(events(spark, dir), eventRules, current_date())

  /** Stream-static enrichment then tagging: the dim broadcast-joins
    * onto the event stream and rules see both sides' columns. */
  def streamEnrichedTagging(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val enriched = Streaming.enrich(events(spark, dir), dim,
      col("user_id") === col("c_custkey"))
    Streaming.tagStream(enriched, enrichedRules, current_date())
  }

  /** Batch twin of the stream-stream attribution join: purchases
    * matched to same-user views in the preceding hour. */
  def streamAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    Streaming.attributionJoin(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"))
  }

  def streamSessionize(spark: SparkSession, dir: String): DataFrame = {
    val s = spark
    import s.implicits._
    Streaming.sessionize(
      events(spark, dir).select(col("user_id"), col("event_id"), col("ts")).as[Ev]
    ).toDF()
  }

  /** Per-window exact heavy hitters from the streaming MG sketch: the
    * windowed `mg_summary` candidates (the part that runs on the
    * stream, O(k) state per window) are recounted exactly against the
    * same events and filtered at `count ≥ ceil(φ·window_n)` — the
    * deterministic per-window φ-hitter set, independent of how the
    * stream was partitioned or replayed. Batch execution of the same
    * transforms here for the gate; stream==batch pinned in
    * StreamingSpec. */
  def streamHeavyHitters(spark: SparkSession, dir: String,
                         phi: Double = StreamHhPhi, k: Int = StreamHhK,
                         windowLen: String = "1 day"): DataFrame = {
    // same MG guarantee as the batch twin: k+1 > 1/φ or true hitters
    // can be silently dropped from the candidate superset
    require(phi > 0 && phi <= 1, s"phi must be in (0,1], got $phi")
    require(k + 1 > 1.0 / phi,
      s"k=$k cannot guarantee phi=$phi hitters: need k+1 > 1/phi (${1.0 / phi})")
    val ev = events(spark, dir)
    val cand = Streaming.windowedHeavyHitters(ev, col("props"), windowLen, k = k)
      .select(col("window_start"), col("n"), explode(col("items")).as("props"))
    ev.select(window(col("ts"), windowLen).getField("start").as("window_start"), col("props"))
      .join(broadcast(cand), Seq("window_start", "props"))
      .groupBy(col("window_start"), col("props"), col("n"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= ceil(col("n") * lit(phi)).cast("long"))
      .select(col("window_start"), col("props"), col("cnt"))
  }

  /** Gate defaults; overrides must stay inside the k+1 > 1/φ region. */
  val StreamHhPhi = 0.01
  val StreamHhK = 200

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_heavy_hitters" -> ((s: SparkSession, d: String) => streamHeavyHitters(s, d)),
    "stream_windowed_counts" -> (streamWindowedCounts _),
    "stream_tagging" -> GateFormat.js(streamTagging _),
    "stream_enriched_tagging" -> GateFormat.js(streamEnrichedTagging _),
    "stream_attribution" -> (streamAttribution _),
    "stream_sessionize" -> (streamSessionize _))

  val oracles: Map[String, String] = Map(
    // identical semantics to events_windowed — same oracle
    "stream_windowed_counts" -> AnalyticsQueries.oracles("events_windowed"),
    "stream_tagging" -> GateFormat.j(
      """SELECT user_id, ts, tag_ids FROM (
        |  SELECT user_id, ts,
        |         list_filter([CASE WHEN event_type = 'purchase' THEN 301 END,
        |                      CASE WHEN event_type = 'purchase' AND value >= 400 THEN 302 END,
        |                      CASE WHEN event_type IN ('click', 'view') THEN 303 END],
        |                     x -> x IS NOT NULL) AS tag_ids
        |  FROM events)
        |WHERE len(tag_ids) > 0""".stripMargin),
    "stream_enriched_tagging" -> GateFormat.j(
      """SELECT user_id, ts, tag_ids FROM (
        |  SELECT user_id, ts,
        |         list_filter([CASE WHEN event_type = 'purchase' AND c_mktsegment = 'BUILDING' THEN 311 END,
        |                      CASE WHEN event_type IN ('view', 'click') AND c_mktsegment = 'MACHINERY' THEN 312 END],
        |                     x -> x IS NOT NULL) AS tag_ids
        |  FROM events JOIN customer ON user_id = c_custkey)
        |WHERE len(tag_ids) > 0""".stripMargin),
    "stream_attribution" ->
      """SELECT v.user_id, p.event_id AS purchase_event_id, v.event_id AS view_event_id,
        |       p.ts AS purchase_ts, v.ts AS view_ts
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR""".stripMargin,
    // the stateful session machine must reproduce the SQL sessionization
    "stream_sessionize" -> AnalyticsQueries.oracles("events_sessionize"),
    // deterministic despite the MG sketch: candidates are a guaranteed
    // superset and the recount + HAVING reproduces plain GROUP BY
    "stream_heavy_hitters" ->
      s"""WITH e AS (SELECT date_trunc('day', ts) AS window_start, props FROM events),
         |n AS (SELECT window_start, count(*) AS wn FROM e GROUP BY window_start)
         |SELECT e.window_start, props, count(*) AS cnt
         |FROM e JOIN n USING (window_start)
         |GROUP BY e.window_start, props, n.wn
         |HAVING count(*) >= CAST(ceil($StreamHhPhi * n.wn) AS BIGINT)""".stripMargin)
}
