package graft.engine

import graft.SparkSpec
import graft.rules._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class TagEngineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val users = Seq(
    (1L, 150000.0, "verified"),
    (2L, 500.0, "pending"),
    (3L, 75000.0, "verified"),
    (4L, -20.0, "rejected"))
    .toDF("user_id", "assets", "kyc")

  private val rules = Seq(
    TagRule(1, "rich", "wealth", Cond("assets", ">=", 50000L)),
    TagRule(2, "kyc_ok", "compliance", Cond("kyc", "=", "verified")),
    TagRule(3, "broke", "wealth", Cond("assets", "<", 0L)))

  private val engine = TagEngine.at("2024-01-01")

  test("tagProfiles: one row per tagged user, sorted distinct tag array") {
    val out = engine.tagProfiles(users, rules).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out == Map(1L -> Seq(1, 2), 2L -> Seq.empty, 3L -> Seq(1, 2), 4L -> Seq(3))
      .filter(_._2.nonEmpty))
  }

  test("tagProfiles drops users with no hits") {
    assert(engine.tagProfiles(users, rules).filter($"user_id" === 2L).count() == 0)
  }

  test("tagAssignments explodes to (user_id, tag_id)") {
    val out = engine.tagAssignments(users, rules).as[(Long, Int)].collect().toSet
    assert(out == Set((1L, 1), (1L, 2), (3L, 1), (3L, 2), (4L, 3)))
  }

  test("tagDetails produces reference-shaped JSON map keyed by tag_id") {
    val row = engine.tagDetails(users, rules).filter($"user_id" === 1L).head()
    assert(row.getSeq[Int](row.fieldIndex("tag_ids")) == Seq(1, 2))
    assert(row.getAs[String]("tag_details") ==
      """{"1":{"tag_name":"rich","tag_category":"wealth"},"2":{"tag_name":"kyc_ok","tag_category":"compliance"}}""")
    assert(row.getAs[Any]("computed_date").toString == "2024-01-01")
  }

  test("computeSingleTag matches reference output shape") {
    val out = engine.computeSingleTag(users, rules.head)
    assert(out.columns.toSeq == Seq("user_id", "tag_id", "tag_detail"))
    val row = out.filter($"user_id" === 1L).head()
    assert(row.getInt(1) == 1)
    assert(row.getString(2).contains("\"value\":\"150000.0\""))
  }

  test("single-pass plan: one scan, no shuffle before the filter") {
    val plan = engine.tagProfiles(users, rules).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("exchange"), s"unexpected shuffle in:\n$plan")
  }
}
