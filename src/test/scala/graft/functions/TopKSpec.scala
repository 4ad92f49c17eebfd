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

  test("heap mode (large k) selects and orders exactly like the sorted reference; cross-mode merge agrees") {
    val rnd = new scala.util.Random(11)
    // k above HeapMinK → heap layout; stream sizes straddle k so both
    // the filling phase and the replace-root phase are exercised,
    // with heavy score ties (the id tie-break must decide identically)
    val k = graft.functions.expr.TopKState.HeapMinK + 72
    for (trial <- 1 to 20) {
      val n = rnd.nextInt(3 * k) + 1
      // distinct ids (the production shape: one row per candidate) —
      // heavy score ties remain, so the id tie-break decides
      val xs = rnd.shuffle(List.tabulate(n)(i =>
        (math.rint(rnd.nextDouble() * 50) / 50, i.toLong)))
      val st = new TopKState(k)
      xs.foreach { case (s, id) => st.insert(s, id) }
      val expect = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      val (os, oi) = st.ordered()
      val got = (0 until st.size).map(i => (os(i), oi(i))).toList
      assert(got == expect && st.size == math.min(k, n),
        s"trial $trial: heap selection must equal the sorted reference")
    }
    // serialize → deserialize → merge round-trips the heap layout
    val a = new TopKState(k); val b = new TopKState(k); val all = new TopKState(k)
    val xs = List.tabulate(2 * k)(i => (math.rint(i * 0.37) / 10, i.toLong))
    xs.take(k).foreach { case (s, i) => a.insert(s, i); all.insert(s, i) }
    xs.drop(k).foreach { case (s, i) => b.insert(s, i); all.insert(s, i) }
    a.mergeFrom(b)
    val (as, ai) = a.ordered(); val (es, ei) = all.ordered()
    assert((0 until a.size).map(i => (as(i), ai(i))) ==
      (0 until all.size).map(i => (es(i), ei(i))))
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
