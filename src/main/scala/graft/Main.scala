package graft

import graft.engine.TagEngine
import graft.merge.TagMerger
import graft.rules.RuleCatalog
import graft.sources.{DataQuality, SnapshotStore, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top-level batch runner — the reference's scheduler entry point
  * (reference: main.py, src/scheduler/main_scheduler.py:84-276:
  * `run_full_tag_compute` / `run_incremental_compute` /
  * `run_specific_tags`) re-expressed as one declarative pipeline:
  * rules table → per-source-table quality gate → single-pass tag
  * compute per table → memory merge → snapshot upsert → run statistics.
  *
  * Usage (all configuration via GRAFT_* env, see [[GraftConfig]]):
  * {{{
  *   runMain graft.Main full                   # all users × all tags
  *   runMain graft.Main incremental            # users absent from the snapshot
  *   runMain graft.Main full tags=1,3,8        # tag subset, merged with snapshot
  *   runMain graft.Main full users=1,7,13      # user subset
  * }}}
  *
  * Unlike the reference — which runs one Spark job per rule and eagerly
  * counts each result (tag_computer.py:60) — every run here is: one
  * scan per source table, one merge shuffle, one upsert, regardless of
  * rule count.
  */
object Main {

  final case class RunStats(
      command: String,
      usersTagged: Long,
      totalAssignments: Long,
      perTagHits: Map[Int, Long],
      invalidRules: Seq[(Int, String)],
      skippedTables: Seq[String],
      missingAfterWrite: Long,
      durationSec: Double)

  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv()
    val spark = cfg.session()
    val stats = run(spark, cfg, args.toSeq)
    println(statsJson(stats))
    spark.stop()
  }

  /** One batch run; separated from `main` so specs drive it directly. */
  def run(spark: org.apache.spark.sql.SparkSession, cfg: GraftConfig,
          args: Seq[String]): RunStats = {
    val t0 = System.nanoTime()
    val command = args.headOption.filterNot(_.contains("=")).getOrElse("full")
    val tagScope = argIds(args, "tags=").map(_.map(_.toInt).toSet)
    val userScope = argIds(args, "users=")

    val store = new SnapshotStore(spark, cfg.snapshotPath)
    val engine = cfg.anchorDate.map(TagEngine.at).getOrElse(new TagEngine())

    // rules-as-data (reference rule_reader): bad rules are reported,
    // not fatal — matching the reference's skip-and-log behavior.
    // Source precedence: JDBC (the reference reads rules from MySQL)
    // over parquet path.
    val rulesDf = (cfg.rulesJdbcUrl, cfg.rulesPath) match {
      case (Some(url), _) =>
        graft.sources.Jdbc.read(spark, url, cfg.rulesJdbcTable, new java.util.Properties())
      case (None, Some(p)) => spark.read.parquet(p)
      case _ => sys.error("GRAFT_RULES (parquet) or GRAFT_RULES_JDBC_URL must point to a " +
        "rules table with tag_id, tag_name, tag_category, source_table, rule_json")
    }
    val (entries, invalid) = RuleCatalog.fromDataFrame(rulesDf)
    val scoped = tagScope.fold(entries)(ids => entries.filter(e => ids(e.tagRule.tagId)))
    require(scoped.nonEmpty, "no valid rules in scope")

    val byTable = RuleCatalog.byTable(scoped)
    val required = RuleCatalog.requiredFields(scoped)

    // per-table: quality gate → scope users → one single-pass compute
    val skipped = Seq.newBuilder[String]
    val perTable = byTable.toSeq.sortBy(_._1).flatMap { case (table, rules) =>
      val ucol = cfg.userCol(table)
      val df = Tables.load(spark, cfg.dataDir, table)
      val report = DataQuality.validate(df, table, ucol +: required(table),
        cfg.minRowCount, cfg.maxNullRate)
      if (!report.passed) {
        System.err.println(s"[graft] SKIP $table: ${report.failures.mkString("; ")}")
        skipped += table
        None
      } else {
        val users = userScope.fold(df)(ids => df.filter(col(ucol).isin(ids: _*)))
        Some(engine.tagAssignments(users, rules, ucol))
      }
    }
    require(perTable.nonEmpty, "every source table failed its quality gate")

    val assignments = perTable.reduce(_.unionByName(_)).localCheckpoint()
    val profiles = TagMerger.memoryMerge(Seq(assignments))

    // incremental = only users absent from the snapshot
    // (main_scheduler.run_incremental_compute); a tag subset merges
    // with existing tags so out-of-scope tags survive
    val scopedUsers =
      if (command == "incremental") profiles.join(store.keys(), Seq("user_id"), "left_anti")
      else profiles
    val result = (tagScope, store.read()) match {
      case (Some(_), Some(existing)) =>
        TagMerger.mergeWithExisting(scopedUsers, existing.select("user_id", "tag_ids"))
      case _ => scopedUsers
    }

    val snap = result.localCheckpoint()
    store.upsert(snap)
    val missing = store.validateWrite(snap)

    // stats reflect the WRITTEN delta (the reference scheduler reports
    // per-run counts): an incremental run must not report hits for
    // users its anti-join excluded, and a tag-subset run must not count
    // the whole merged snapshot as "tagged this run" — so every number
    // below is restricted to the users this run actually touched
    val touched = scopedUsers.select("user_id")
    val written = snap.join(touched, Seq("user_id"), "left_semi")
    val hits = assignments.join(touched, Seq("user_id"), "left_semi")
      .groupBy("tag_id").count().collect()
      .map(r => r.getAs[Number]("tag_id").intValue() -> r.getLong(1)).toMap
    RunStats(
      command = command,
      usersTagged = written.count(),
      totalAssignments = written.agg(coalesce(sum(size(col("tag_ids"))), lit(0L)))
        .head().getLong(0),
      perTagHits = hits,
      invalidRules = invalid,
      skippedTables = skipped.result(),
      missingAfterWrite = missing,
      durationSec = (System.nanoTime() - t0) / 1e9)
  }

  private def argIds(args: Seq[String], prefix: String): Option[Seq[Long]] =
    args.find(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).split(",").toSeq.filter(_.nonEmpty).map(_.trim.toLong))

  private def statsJson(s: RunStats): String = {
    val hits = s.perTagHits.toSeq.sortBy(_._1)
      .map { case (id, n) => s""""$id":$n""" }.mkString("{", ",", "}")
    s"""{"command":"${s.command}","users_tagged":${s.usersTagged},""" +
      s""""total_assignments":${s.totalAssignments},"per_tag_hits":$hits,""" +
      s""""invalid_rules":${s.invalidRules.size},"skipped_tables":${s.skippedTables.size},""" +
      s""""missing_after_write":${s.missingAfterWrite},"duration_sec":${s.durationSec}}"""
  }
}
