package graft

import graft.queries.{AnalyticsQueries, DedupQueries, MultimodalQueries, PipelineQueries, SimilarityQueries, StreamQueries, TagQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's query surface
  * (SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent SQL for
  * the driver's correctness gate.
  */
object SparkEntry {
  /** Flagship query: single-pass multi-tag profile computation on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TagQueries.profiles(spark, "/root/testdata/sf0.001")

  def queryGroups: Seq[Map[String, (SparkSession, String) => DataFrame]] = Seq(
    TagQueries.queries,
    AnalyticsQueries.queries,
    TextQueries.queries,
    DedupQueries.queries,
    SimilarityQueries.queries,
    MultimodalQueries.queries,
    StreamQueries.queries,
    PipelineQueries.queries)

  def oracleGroups: Seq[Map[String, String]] = Seq(
    TagQueries.oracles,
    AnalyticsQueries.oracles,
    TextQueries.oracles,
    DedupQueries.oracles,
    SimilarityQueries.oracles,
    MultimodalQueries.oracles,
    StreamQueries.oracles,
    PipelineQueries.oracles)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryGroups.reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    oracleGroups.reduce(_ ++ _)

  /** Register gate queries as session temp views `graft_<name>` over
    * the warehouse at `dir` — the SQL-only surface: a user who writes
    * `spark.sql("SELECT * FROM graft_q1_pricing_summary")` gets the
    * registry operator, composable with further SQL (joins, filters —
    * Catalyst plans through the view, so pushdown and pruning still
    * apply). READS of a view are lazy, but some operators do bounded
    * eager work when their frame is CONSTRUCTED (ANN model fits,
    * stream replays, the decontamination bloom build) — so `only`
    * restricts registration to the names actually needed (the CLI
    * passes the names its SQL references); empty = register all.
    * Returns the registered view names, sorted. */
  def registerViews(spark: SparkSession, dir: String,
                    only: Set[String] = Set.empty): Seq[String] =
    queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        val view = s"graft_$name"
        fn(spark, dir).createOrReplaceTempView(view)
        view
      }
}
