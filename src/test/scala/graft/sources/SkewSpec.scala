package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedAgg == plain agg on a skewed distribution") {
    val s = spark
    import s.implicits._
    // 90% of rows share one key — the classic hot-key aggregation
    val df = (1 to 10000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong, i * 0.5))
      .toDF("k", "id", "v")
    val plain = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,6)")).cast("double").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, Seq("k"), col("id"), 16,
      partial = Seq(sum(col("v").cast("decimal(18,6)")).as("s"), count(lit(1)).as("c")),
      merge = Seq(sum("s").cast("double").as("sum_v"), sum("c").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedBroadcastJoin == plain join (inner and left_outer)") {
    val s = spark
    import s.implicits._
    val big = (1 to 5000).map(i => (if (i % 5 == 0) 1L else (i % 50).toLong, i.toLong)).toDF("k", "id")
    val small = Seq((1L, "one"), (2L, "two"), (7L, "seven")).toDF("k", "name")
    for (jt <- Seq("inner", "left_outer")) {
      val plain = big.join(small, Seq("k"), jt)
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      val salted = Skew.saltedBroadcastJoin(big, small, "k", col("id"), 8, jt)
        .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
      assert(salted == plain, s"join type $jt")
    }
  }

  test("salt actually spreads the hot key across buckets") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => ("HOT", i.toLong)).toDF("k", "id")
    val buckets = df.select(Skew.saltFrom(col("id"), 16).as("b"))
      .distinct().count()
    assert(buckets >= 12, s"expected most of 16 buckets used, got $buckets")
  }

  test("suggestSaltFactor: high for a dominant key, 1 for uniform keys") {
    val s = spark
    import s.implicits._
    // one key holds ~90% of rows across 11 keys
    val skewed = ((1 to 9000).map(i => ("HOT", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 10}", i.toLong))).toDF("k", "id")
    val hotFactor = Skew.suggestSaltFactor(skewed, "k", fraction = 0.5)
    assert(hotFactor >= 4, s"dominant key must demand salting, got $hotFactor")
    val uniform = (1 to 10000).map(i => (s"k${i % 100}", i.toLong)).toDF("k", "id")
    val uniFactor = Skew.suggestSaltFactor(uniform, "k", fraction = 0.5)
    assert(uniFactor <= 2, s"uniform keys must not demand salting, got $uniFactor")
    assert(Skew.suggestSaltFactor(skewed.limit(0), "k", fraction = 0.5) == 1)
  }
}
