package graft.functions

import graft.SparkSpec
import graft.functions.expr.TopKState
import graft.similarity.Similarity
import org.apache.spark.sql.functions._
class TopKSpec extends SparkSpec {

  test("TopKState matches sort-based reference on random streams (with ties)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val xs = List.fill(rnd.nextInt(40))(
        (math.rint(rnd.nextDouble() * 20) / 20, rnd.nextInt(50).toLong))
      val st = new TopKState(5)
      xs.foreach { case (s, id) => st.insert(s, id) }
      val expect = xs.sortBy { case (s, id) => (-s, id) }.take(5)
      val got = (0 until st.size).map(i => (st.scores(i), st.ids(i))).toList
      assert(got == expect, s"input=$xs")
    }
  }

  test("merge across states == single-state inserts") {
    val a = new TopKState(4); val b = new TopKState(4); val all = new TopKState(4)
    val xs = Seq((0.5, 1L), (0.9, 2L), (0.5, 0L), (0.1, 9L), (0.9, 7L), (0.7, 3L))
    xs.take(3).foreach { case (s, i) => a.insert(s, i); all.insert(s, i) }
    xs.drop(3).foreach { case (s, i) => b.insert(s, i); all.insert(s, i) }
    a.mergeFrom(b)
    assert((0 until a.size).map(i => (a.scores(i), a.ids(i))) ==
           (0 until all.size).map(i => (all.scores(i), all.ids(i))))
  }

  test("agg-based top-k plan is partial-aggregated (ObjectHashAggregate x2, no window shuffle of all pairs)") {
    val df = Similarity.bruteForceTopK(
      graft.queries.SimilarityQueries.queriesDf(spark, sf("any")),
      graft.sources.Tables.load(spark, sf("any"), "embeddings")
        .select(col("vec_id").as("id"), col("embedding").as("vec")), 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val aggs = "ObjectHashAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final ObjectHashAggregate, got $aggs:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window"),
      "top-k must not use a window")
  }
}
