package graft.merge

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TagMergerSpec extends SparkSpec {
  import spark.implicits._

  test("memoryMerge unions, dedups and aggregates sorted arrays") {
    val a = Seq((1L, 10), (1L, 11), (2L, 10)).toDF("user_id", "tag_id")
    val b = Seq((1L, 10), (2L, 12), (3L, 13)).toDF("user_id", "tag_id") // (1,10) dup
    val out = TagMerger.memoryMerge(Seq(a, b)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(out == Map(1L -> Seq(10, 11), 2L -> Seq(10, 12), 3L -> Seq(13)))
  }

  test("mergeWithExisting: sorted(set(old ∪ new)), left-join semantics") {
    val newTags = Seq((1L, Seq(5, 1)), (2L, Seq(2))).toDF("user_id", "tag_ids")
    val existing = Seq((1L, Seq(3, 1)), (9L, Seq(9))).toDF("user_id", "tag_ids")
    val out = TagMerger.mergeWithExisting(newTags, existing).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Seq[Int]]("tag_ids")).toMap
    assert(out == Map(1L -> Seq(1, 3, 5), 2L -> Seq(2))) // user 9 untouched (upsert keeps it)
  }

  test("statistics") {
    val tags = Seq((1L, Seq(1, 2, 3)), (2L, Seq(1))).toDF("user_id", "tag_ids")
    val row = TagMerger.statistics(tags).head()
    assert(row.getAs[Long]("total_users") == 2L)
    assert(row.getAs[Long]("total_tag_assignments") == 4L)
    assert(row.getAs[Double]("avg_tags_per_user") == 2.0)
    assert(row.getAs[Int]("max_tags_per_user") == 3)
    assert(row.getAs[Int]("min_tags_per_user") == 1)
  }
}
