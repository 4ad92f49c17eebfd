package graft.queries

import graft.engine.{TagEngine, TagRule}
import graft.merge.TagMerger
import graft.rules._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The rule-engine / tagging query surface (SURVEY.md §2.A), mapped to
  * the driver's TPC-H-ish test tables: `customer` = users, `orders` =
  * behavior. Every query has a DuckDB oracle (see SparkEntry.oracleSql)
  * unless noted.
  *
  * Date-relative rules pin the anchor to 2001-08-01 (the max order
  * date) so results are deterministic — the engine's default anchor is
  * `current_date()`, matching the reference (rule_parser.py:148).
  */
object TagQueries {
  val OrdersAnchor = "2001-08-01"

  /** Demo tag catalog over customer attributes — exercises every
    * operator family the reference's rule_parser supports. */
  val customerRules: Seq[TagRule] = Seq(
    TagRule(1, "high_balance", "wealth", Cond("c_acctbal", ">=", 5000L)),
    TagRule(2, "overdrawn", "wealth", Cond("c_acctbal", "<", 0L)),
    TagRule(3, "builder", "segment", Cond("c_mktsegment", "=", "BUILDING")),
    TagRule(4, "mobile", "segment", Or(Seq(
      Cond("c_mktsegment", "=", "AUTOMOBILE"),
      Cond("c_mktsegment", "=", "MACHINERY")))),
    TagRule(5, "mid_balance", "wealth", Cond("c_acctbal", "in_range", Seq(1000L, 3000L))),
    TagRule(6, "lucky_seven", "meta", Cond("c_name", "ends_with", "7")),
    TagRule(7, "not_household", "segment", Not(Seq(Cond("c_mktsegment", "=", "HOUSEHOLD")))),
    TagRule(8, "top_nations", "geo", Cond("c_nationkey", "in", Seq(1L, 5L, 10L, 15L, 20L))))

  /** Behavioral tags over the per-user activity rollup (last_order). */
  val activityRules: Seq[TagRule] = Seq(
    TagRule(201, "active_90d", "activity", Cond("last_order", "recent_days", 90)),
    TagRule(202, "dormant_1y", "activity", Cond("last_order", "days_ago", 365)),
    TagRule(203, "y2000_cohort", "activity",
      Cond("last_order", "date_between", Seq("2000-01-01", "2001-01-01"))))

  private def engine = TagEngine.at(OrdersAnchor)

  def customer(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")

  def orders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")

  /** Per-user activity rollup feeding the date rules (the reference's
    * `user_activity_summary` shape). */
  def lastOrder(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir).groupBy(col("o_custkey").as("user_id"))
      .agg(max(col("o_orderdate")).as("last_order"))

  // ---- single-operator rule queries (one per operator family) ----

  def ruleNumeric(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).filter(Cond("c_acctbal", ">=", 5000L).compile)
      .select(col("c_custkey").as("user_id"), col("c_acctbal"))

  def ruleAnd(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).filter(And(Seq(
      Cond("c_acctbal", ">=", 5000L),
      Cond("c_mktsegment", "=", "BUILDING"))).compile)
      .select(col("c_custkey").as("user_id"))

  def ruleOr(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).filter(Or(Seq(
      Cond("c_mktsegment", "=", "AUTOMOBILE"),
      Cond("c_acctbal", "<", 0L))).compile)
      .select(col("c_custkey").as("user_id"))

  def ruleNot(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).filter(Not(Seq(
      Cond("c_mktsegment", "=", "HOUSEHOLD"),
      Cond("c_acctbal", ">=", 0L))).compile)
      .select(col("c_custkey").as("user_id"))

  def ruleIn(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).filter(And(Seq(
      Cond("c_mktsegment", "in", Seq("BUILDING", "MACHINERY")),
      Cond("c_nationkey", "not_in", Seq(3L, 7L, 11L)))).compile)
      .select(col("c_custkey").as("user_id"))

  def ruleRange(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).filter(And(Seq(
      Cond("c_acctbal", "in_range", Seq(1000L, 3000L)),
      Cond("c_nationkey", "not_in_range", Seq(20L, 24L)))).compile)
      .select(col("c_custkey").as("user_id"), col("c_acctbal"))

  def ruleString(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir).filter(And(Seq(
      Cond("c_name", "starts_with", "Customer#"),
      Cond("c_name", "contains", "00001"),
      Cond("c_name", "not_contains", "9"),
      Cond("c_name", "ends_with", "7"))).compile)
      .select(col("c_custkey").as("user_id"), col("c_name"))

  /** is_null / is_not_null over join-produced nulls: users with no
    * URGENT order. */
  def ruleNull(spark: SparkSession, dir: String): DataFrame = {
    val urgent = orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("urgent_user")).distinct()
    customer(spark, dir)
      .join(urgent, col("c_custkey") === col("urgent_user"), "left")
      .filter(Cond("urgent_user", "is_null").compile)
      .select(col("c_custkey").as("user_id"))
  }

  /** recent_days / days_ago / date_between over the activity rollup. */
  def ruleDates(spark: SparkSession, dir: String): DataFrame =
    engine.tagProfiles(lastOrder(spark, dir), activityRules)

  // ---- multi-tag single-pass queries ----

  def profiles(spark: SparkSession, dir: String): DataFrame =
    engine.tagProfiles(customer(spark, dir), customerRules, "c_custkey")

  def assignments(spark: SparkSession, dir: String): DataFrame =
    engine.tagAssignments(customer(spark, dir), customerRules, "c_custkey")

  def details(spark: SparkSession, dir: String): DataFrame =
    engine.tagDetails(customer(spark, dir), customerRules, "c_custkey")
      .drop("computed_date") // anchor-derived; excluded from oracle compare

  /** Memory merge across two sources: attribute tags ∪ activity tags
    * (reference scenario: rules grouped per source table,
    * rule_reader.py:146-204, then merged). */
  def mergeMemory(spark: SparkSession, dir: String): DataFrame = {
    val attr = engine.tagAssignments(customer(spark, dir), customerRules, "c_custkey")
    val act = engine.tagAssignments(lastOrder(spark, dir), activityRules)
    TagMerger.memoryMerge(Seq(attr, act))
  }

  /** Merge with an "existing snapshot" (simulated: every 3rd user
    * already carries tag 900). */
  def mergeExisting(spark: SparkSession, dir: String): DataFrame = {
    val existing = customer(spark, dir)
      .filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("user_id"), array(lit(900)).as("tag_ids"))
    val newTags = engine.tagProfiles(customer(spark, dir), customerRules, "c_custkey")
    TagMerger.mergeWithExisting(newTags, existing)
  }

  /** Incremental-user detection (scenario_scheduler.py:487-512): users
    * with an order in the 120 days before the anchor, minus users
    * already in the snapshot (simulated: custkey % 3 == 0). */
  def incrementalUsers(spark: SparkSession, dir: String): DataFrame = {
    val recent = orders(spark, dir)
      .filter(Cond("o_orderdate", "recent_days", 120).compile(lit(OrdersAnchor).cast("date")))
      .select(col("o_custkey").as("user_id")).distinct()
    val snapshot = customer(spark, dir).filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("user_id"))
    recent.join(snapshot, Seq("user_id"), "left_anti")
  }

  /** Specific-user scoping (scenario 5/6 shape). */
  def specificUsers(spark: SparkSession, dir: String): DataFrame =
    engine.tagProfiles(
      customer(spark, dir).filter(col("c_custkey").isin(1L, 7L, 13L, 25L, 42L, 99L)),
      customerRules, "c_custkey")

  /** Coverage statistics over the profile table. */
  def stats(spark: SparkSession, dir: String): DataFrame =
    TagMerger.statistics(profiles(spark, dir))

  /** Per-tag user counts — the reference logs a hit count per computed
    * tag (tag_computer.py:60, an eager action per rule!); here it is
    * one scan + one small aggregation over the exploded assignments. */
  def hitCounts(spark: SparkSession, dir: String): DataFrame =
    engine.tagAssignments(customer(spark, dir), customerRules, "c_custkey")
      .groupBy("tag_id").agg(count(lit(1)).as("n_users"))

  /** Rules-as-data end-to-end (reference rule_reader pipeline): rules
    * live in a DataFrame with JSON rule bodies, grouped per source
    * table, one single-pass engine run per table, memory-merged. */
  def rulesFromTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rulesDf = Seq(
      (1, "high_balance", "wealth", "customer",
        """{"conditions":[{"field":"c_acctbal","operator":">=","value":5000}]}"""),
      (3, "builder", "segment", "customer",
        """{"conditions":[{"field":"c_mktsegment","operator":"=","value":"BUILDING"}]}"""),
      (8, "top_nations", "geo", "customer",
        """{"conditions":[{"field":"c_nationkey","operator":"in","value":[1,5,10,15,20]}]}"""),
      (201, "active_90d", "activity", "user_activity",
        """{"logic":"AND","conditions":[{"field":"last_order","operator":"recent_days","value":90}]}"""),
      (999, "broken", "meta", "customer", """{"conditions":[{"field":"x"}]}"""))
      .toDF("tag_id", "tag_name", "tag_category", "source_table", "rule_json")
    val (entries, invalid) = RuleCatalog.fromDataFrame(rulesDf)
    require(invalid.map(_._1) == Seq(999), s"exactly the malformed rule is rejected: $invalid")
    val byTable = RuleCatalog.byTable(entries)
    val perTable = Seq(
      engine.tagAssignments(customer(spark, dir), byTable("customer"), "c_custkey"),
      engine.tagAssignments(lastOrder(spark, dir), byTable("user_activity")))
    TagMerger.memoryMerge(perTable)
  }

  // ---- DuckDB oracles ----

  /** Tag-hit CASE expression per customer rule, for list-building oracles. */
  private val caseItems: String = Seq(
    "CASE WHEN c_acctbal >= 5000 THEN 1 END",
    "CASE WHEN c_acctbal < 0 THEN 2 END",
    "CASE WHEN c_mktsegment = 'BUILDING' THEN 3 END",
    "CASE WHEN c_mktsegment = 'AUTOMOBILE' OR c_mktsegment = 'MACHINERY' THEN 4 END",
    "CASE WHEN c_acctbal BETWEEN 1000 AND 3000 THEN 5 END",
    "CASE WHEN ends_with(c_name, '7') THEN 6 END",
    "CASE WHEN NOT (c_mktsegment = 'HOUSEHOLD') THEN 7 END",
    "CASE WHEN c_nationkey IN (1, 5, 10, 15, 20) THEN 8 END").mkString(", ")

  private val profilesSql: String =
    s"""SELECT user_id, tag_ids FROM (
       |  SELECT c_custkey AS user_id,
       |         list_sort(list_filter([$caseItems], x -> x IS NOT NULL)) AS tag_ids
       |  FROM customer)
       |WHERE len(tag_ids) > 0""".stripMargin

  /** Struct-valued CASE items for the tag_details oracle. */
  private val detailCaseItems: String = customerRules.sortBy(_.tagId).map { r =>
    val cond = r.tagId match {
      case 1 => "c_acctbal >= 5000"
      case 2 => "c_acctbal < 0"
      case 3 => "c_mktsegment = 'BUILDING'"
      case 4 => "c_mktsegment = 'AUTOMOBILE' OR c_mktsegment = 'MACHINERY'"
      case 5 => "c_acctbal BETWEEN 1000 AND 3000"
      case 6 => "ends_with(c_name, '7')"
      case 7 => "NOT (c_mktsegment = 'HOUSEHOLD')"
      case 8 => "c_nationkey IN (1, 5, 10, 15, 20)"
    }
    s"CASE WHEN $cond THEN {'tag_id': '${r.tagId}', 'tag_name': '${r.tagName}', 'tag_category': '${r.tagCategory}'} END"
  }.mkString(", ")

  private val detailsSql: String =
    s"""SELECT user_id,
       |       list_sort(list(CAST(tag_id AS INTEGER))) AS tag_ids,
       |       '{' || string_agg(
       |                '"' || tag_id || '":' ||
       |                CAST(json_object('tag_name', tag_name, 'tag_category', tag_category) AS VARCHAR),
       |                ',' ORDER BY CAST(tag_id AS INTEGER)) || '}' AS tag_details
       |FROM (
       |  SELECT c_custkey AS user_id,
       |         unnest(list_filter([$detailCaseItems], x -> x IS NOT NULL), recursive := true)
       |  FROM customer)
       |GROUP BY user_id""".stripMargin

  private val activityCaseItems: String = Seq(
    s"CASE WHEN last_order >= DATE '$OrdersAnchor' - 90 THEN 201 END",
    s"CASE WHEN last_order <= DATE '$OrdersAnchor' - 365 THEN 202 END",
    "CASE WHEN last_order BETWEEN '2000-01-01' AND '2001-01-01' THEN 203 END").mkString(", ")

  private val ruleDatesSql: String =
    s"""SELECT user_id, tag_ids FROM (
       |  SELECT user_id,
       |         list_sort(list_filter([$activityCaseItems], x -> x IS NOT NULL)) AS tag_ids
       |  FROM (SELECT o_custkey AS user_id, max(o_orderdate) AS last_order FROM orders GROUP BY 1))
       |WHERE len(tag_ids) > 0""".stripMargin

  import GateFormat.{j, js}

  val oracles: Map[String, String] = Map(
    "tag_rule_numeric" ->
      "SELECT c_custkey AS user_id, c_acctbal FROM customer WHERE c_acctbal >= 5000",
    "tag_rule_and" ->
      "SELECT c_custkey AS user_id FROM customer WHERE c_acctbal >= 5000 AND c_mktsegment = 'BUILDING'",
    "tag_rule_or" ->
      "SELECT c_custkey AS user_id FROM customer WHERE c_mktsegment = 'AUTOMOBILE' OR c_acctbal < 0",
    "tag_rule_not" ->
      "SELECT c_custkey AS user_id FROM customer WHERE NOT (c_mktsegment = 'HOUSEHOLD' AND c_acctbal >= 0)",
    "tag_rule_in" ->
      "SELECT c_custkey AS user_id FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_nationkey NOT IN (3, 7, 11)",
    "tag_rule_range" ->
      "SELECT c_custkey AS user_id, c_acctbal FROM customer WHERE c_acctbal BETWEEN 1000 AND 3000 AND c_nationkey NOT BETWEEN 20 AND 24",
    "tag_rule_string" ->
      "SELECT c_custkey AS user_id, c_name FROM customer WHERE starts_with(c_name, 'Customer#') AND contains(c_name, '00001') AND NOT contains(c_name, '9') AND ends_with(c_name, '7')",
    "tag_rule_null" ->
      "SELECT c_custkey AS user_id FROM customer c LEFT JOIN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') u ON c.c_custkey = u.o_custkey WHERE u.o_custkey IS NULL",
    "tag_rule_dates" -> j(ruleDatesSql),
    "tag_profiles" -> j(profilesSql),
    "tag_details" -> j(detailsSql),
    "tag_assignments" ->
      s"""SELECT user_id, CAST(tag_id AS INTEGER) AS tag_id FROM (
         |  SELECT c_custkey AS user_id,
         |         unnest(list_filter([$caseItems], x -> x IS NOT NULL)) AS tag_id
         |  FROM customer)""".stripMargin,
    "tag_merge_memory" -> j(
      s"""SELECT user_id, list_sort(list(DISTINCT tag_id)) AS tag_ids FROM (
         |  SELECT c_custkey AS user_id,
         |         unnest(list_filter([$caseItems], x -> x IS NOT NULL)) AS tag_id
         |  FROM customer
         |  UNION ALL
         |  SELECT user_id, unnest(list_filter([$activityCaseItems], x -> x IS NOT NULL)) AS tag_id
         |  FROM (SELECT o_custkey AS user_id, max(o_orderdate) AS last_order FROM orders GROUP BY 1))
         |GROUP BY user_id""".stripMargin),
    "tag_merge_existing" -> j(
      s"""WITH new_tags AS ($profilesSql),
         |existing AS (SELECT c_custkey AS user_id, [900] AS tag_ids FROM customer WHERE c_custkey % 3 = 0)
         |SELECT n.user_id,
         |       list_sort(list_distinct(list_concat(coalesce(e.tag_ids, []), n.tag_ids))) AS tag_ids
         |FROM new_tags n LEFT JOIN existing e USING (user_id)""".stripMargin),
    "tag_incremental_users" ->
      s"""SELECT DISTINCT o_custkey AS user_id FROM orders
         |WHERE o_orderdate >= DATE '$OrdersAnchor' - 120 AND o_custkey % 3 != 0""".stripMargin,
    "tag_specific_users" -> j(
      s"""SELECT user_id, tag_ids FROM (
         |  SELECT c_custkey AS user_id,
         |         list_sort(list_filter([$caseItems], x -> x IS NOT NULL)) AS tag_ids
         |  FROM customer WHERE c_custkey IN (1, 7, 13, 25, 42, 99))
         |WHERE len(tag_ids) > 0""".stripMargin),
    "tag_rules_from_table" -> j(
      s"""SELECT user_id, list_sort(list(DISTINCT tag_id)) AS tag_ids FROM (
         |  SELECT c_custkey AS user_id,
         |         unnest(list_filter([CASE WHEN c_acctbal >= 5000 THEN 1 END,
         |                             CASE WHEN c_mktsegment = 'BUILDING' THEN 3 END,
         |                             CASE WHEN c_nationkey IN (1, 5, 10, 15, 20) THEN 8 END],
         |                            x -> x IS NOT NULL)) AS tag_id
         |  FROM customer
         |  UNION ALL
         |  SELECT user_id,
         |         unnest(list_filter([CASE WHEN last_order >= DATE '$OrdersAnchor' - 90 THEN 201 END],
         |                            x -> x IS NOT NULL)) AS tag_id
         |  FROM (SELECT o_custkey AS user_id, max(o_orderdate) AS last_order FROM orders GROUP BY 1))
         |GROUP BY user_id""".stripMargin),
    "tag_hit_counts" ->
      s"""SELECT CAST(tag_id AS INTEGER) AS tag_id, count(*) AS n_users FROM (
         |  SELECT unnest(list_filter([$caseItems], x -> x IS NOT NULL)) AS tag_id
         |  FROM customer)
         |GROUP BY tag_id""".stripMargin,
    "tag_stats" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS total_users,
         |       CAST(sum(len(tag_ids)) AS BIGINT) AS total_tag_assignments,
         |       round(avg(len(tag_ids)), 2) AS avg_tags_per_user,
         |       CAST(max(len(tag_ids)) AS INTEGER) AS max_tags_per_user,
         |       CAST(min(len(tag_ids)) AS INTEGER) AS min_tags_per_user
         |FROM ($profilesSql)""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tag_rule_numeric" -> (ruleNumeric _),
    "tag_rule_and" -> (ruleAnd _),
    "tag_rule_or" -> (ruleOr _),
    "tag_rule_not" -> (ruleNot _),
    "tag_rule_in" -> (ruleIn _),
    "tag_rule_range" -> (ruleRange _),
    "tag_rule_string" -> (ruleString _),
    "tag_rule_null" -> (ruleNull _),
    "tag_rule_dates" -> js(ruleDates _),
    "tag_profiles" -> js(profiles _),
    "tag_details" -> js(details _),
    "tag_assignments" -> (assignments _),
    "tag_merge_memory" -> js(mergeMemory _),
    "tag_merge_existing" -> js(mergeExisting _),
    "tag_incremental_users" -> (incrementalUsers _),
    "tag_specific_users" -> js(specificUsers _),
    "tag_rules_from_table" -> js(rulesFromTable _),
    "tag_hit_counts" -> (hitCounts _),
    "tag_stats" -> (stats _))
}
