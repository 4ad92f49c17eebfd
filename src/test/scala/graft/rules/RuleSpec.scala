package graft.rules

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RuleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alice@gmail.com", 150000.0, "verified", "VIP1", "2001-07-25"),
    (2L, "bob@yahoo.com", 500.0, "pending", "BRONZE", "2000-01-15"),
    (3L, "carol@gmail.com", 75000.0, "verified", "VIP2", "1999-03-01"),
    (4L, null, -20.0, null, "SILVER", "2001-08-01"))
    .toDF("user_id", "email", "total_asset_value", "kyc_status", "user_level", "d")
    .withColumn("last_login", col("d").cast("date")).drop("d")

  private val anchor = lit("2001-08-01").cast("date")

  private def ids(r: Rule): Set[Long] =
    df.filter(r.compile(anchor)).select("user_id").as[Long].collect().toSet

  test("comparison operators") {
    assert(ids(Cond("total_asset_value", ">=", 100000L)) == Set(1L))
    assert(ids(Cond("total_asset_value", "<", 0L)) == Set(4L))
    assert(ids(Cond("kyc_status", "=", "verified")) == Set(1L, 3L))
    assert(ids(Cond("kyc_status", "!=", "verified")) == Set(2L)) // null ≠ hit (SQL semantics)
  }

  test("set + range operators") {
    assert(ids(Cond("user_level", "in", Seq("VIP1", "VIP2"))) == Set(1L, 3L))
    assert(ids(Cond("user_level", "not_in", Seq("VIP1", "VIP2"))) == Set(2L, 4L))
    assert(ids(Cond("total_asset_value", "in_range", Seq(400L, 80000L))) == Set(2L, 3L))
    assert(ids(Cond("total_asset_value", "not_in_range", Seq(400L, 80000L))) == Set(1L, 4L))
  }

  test("string operators") {
    assert(ids(Cond("email", "contains", "gmail")) == Set(1L, 3L))
    assert(ids(Cond("email", "not_contains", "gmail")) == Set(2L))
    assert(ids(Cond("email", "starts_with", "bob")) == Set(2L))
    assert(ids(Cond("email", "ends_with", ".com")) == Set(1L, 2L, 3L))
  }

  test("null operators") {
    assert(ids(Cond("kyc_status", "is_null")) == Set(4L))
    assert(ids(Cond("kyc_status", "is_not_null")) == Set(1L, 2L, 3L))
  }

  test("date operators against the anchor") {
    assert(ids(Cond("last_login", "recent_days", 30)) == Set(1L, 4L))
    assert(ids(Cond("last_login", "days_ago", 365)) == Set(2L, 3L))
    assert(ids(Cond("last_login", "days_ago_between", Seq(1, 30))) == Set(1L))
    assert(ids(Cond("last_login", "date_between", Seq("1999-01-01", "2000-12-31"))) == Set(2L, 3L))
  }

  test("logic combinators; empty group is true; NOT = NOT(AND(...))") {
    assert(ids(And(Seq(Cond("kyc_status", "=", "verified"),
      Cond("total_asset_value", ">=", 100000L)))) == Set(1L))
    assert(ids(Or(Seq(Cond("user_level", "=", "BRONZE"),
      Cond("user_level", "=", "SILVER")))) == Set(2L, 4L))
    assert(ids(Not(Seq(Cond("kyc_status", "=", "verified")))) == Set(2L))
    assert(ids(And(Nil)) == Set(1L, 2L, 3L, 4L))
  }

  test("JSON wire-format parsing (reference README shape)") {
    val rule = RuleJson.parse(
      """{"logic": "AND", "conditions": [
        |  {"field": "total_asset_value", "operator": ">=", "value": 100000, "type": "number"},
        |  {"field": "kyc_status", "operator": "=", "value": "verified", "type": "string"}
        |]}""".stripMargin)
    assert(rule == And(Seq(
      Cond("total_asset_value", ">=", 100000L),
      Cond("kyc_status", "=", "verified"))))
    assert(ids(rule) == Set(1L))
    assert(rule.fields == Seq("total_asset_value", "kyc_status"))
  }

  test("nested groups (superset of reference)") {
    val rule = RuleJson.parse(
      """{"logic": "OR", "conditions": [
        |  {"field": "user_level", "operator": "in", "value": ["VIP1", "VIP2"]},
        |  {"logic": "AND", "conditions": [
        |    {"field": "total_asset_value", "operator": "<", "value": 0}]}
        |]}""".stripMargin)
    assert(ids(rule) == Set(1L, 3L, 4L))
  }
}
