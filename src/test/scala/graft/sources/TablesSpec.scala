package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TablesSpec extends SparkSpec {
  private def dir = sf("any")

  private def scanLine(df: org.apache.spark.sql.DataFrame): String = {
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    s.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
      .mkString("\n")
  }

  test("filters and projections push into the parquet scan") {
    val df = Tables.load(spark, dir, "customer")
      .filter(col("c_acctbal") >= 5000)
      .select("c_custkey", "c_acctbal")
    val s = scanLine(df)
    assert(s.contains("GreaterThanOrEqual(c_acctbal,5000"), s)
    assert(s.contains("c_custkey") && !s.contains("c_mktsegment"),
      "ReadSchema must prune to the 2 selected columns:\n" + s)
  }

  test("incremental load pushes the date range down") {
    val df = Tables.loadIncremental(spark, dir, "orders", "o_orderdate", 30, "2001-08-01")
    val s = scanLine(df)
    assert(s.contains("GreaterThanOrEqual(o_orderdate") && s.contains("LessThanOrEqual(o_orderdate"), s)
  }

  test("column-pruned load selects exactly the requested columns") {
    val df = Tables.load(spark, dir, "customer", Seq("c_custkey", "c_name"))
    assert(df.columns.toSeq == Seq("c_custkey", "c_name"))
  }

  test("csv / json / orc round-trip through the generic reader") {
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val src = Tables.load(spark, dir, "nation")
    for (fmt <- Seq("csv", "json", "orc")) {
      val path = s"$base/$fmt"
      src.write.format(fmt).option("header", "true").save(path)
      val opts: Map[String, String] =
        if (fmt == "csv") Map("header" -> "true", "inferSchema" -> "true")
        else Map.empty[String, String]
      val back = Tables.load(spark, path, fmt, opts)
      assert(back.count() == src.count(), s"$fmt row count")
      assert(back.columns.sorted.sameElements(src.columns.sorted), s"$fmt columns")
    }
  }

  test("bucketed tables join WITHOUT a shuffle (co-located buckets)") {
    for (t <- Seq("g_orders_b", "g_customer_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    val a = Tables.load(spark, dir, "orders")
      .select(col("o_custkey").as("user_id"), col("o_totalprice"))
    val b = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("user_id"), col("c_acctbal"))
    Tables.writeBucketed(a, "g_orders_b", "user_id", 8)
    Tables.writeBucketed(b, "g_customer_b", "user_id", 8)
    // force the sort-merge path: with broadcast on, the planner would
    // (correctly) skip bucketing for the tiny test table
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("g_orders_b").join(spark.table("g_customer_b"), Seq("user_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle either side:\n" + plan)
      assert(plan.contains("Bucketed: true"), "scan should use buckets:\n" + plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("snapshot events ts arrives as microsecond timestamp despite nanos parquet") {
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType.typeName == "timestamp")
    val r = df.orderBy("event_id").select("ts").head().getTimestamp(0)
    assert(r.getNanos % 1000 == 0, "micros precision expected")
  }

  /** Data-contract regression: the testdata's `ts` physical encoding
    * has changed shape twice across rounds (TIMESTAMP(NANOS) →
    * TIMESTAMP(MICROS, NTZ)); each change silently broke queries. This
    * pins the loader contract itself: BOTH encodings of the SAME
    * instants load as identical `TimestampType` values. */
  test("ts contract: nanos-as-long and NTZ-micros encodings normalize identically") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ts").toString
    // the same three instants (micros since epoch), one arbitrary-sub-ms
    val micros = Seq(0L, 1_000_000_123_456L, 1_700_000_000_999_999L)
    // encoding 1: nanos-since-epoch long named `ts` — exactly what the
    // nanosAsLong session flag turns a parquet TIMESTAMP(NANOS) into
    micros.zipWithIndex.map { case (us, i) => (i, us * 1000L) }
      .toDF("event_id", "ts").write.parquet(s"$base/ev_nanos.parquet")
    // encoding 2: TimestampNTZType — what parquet TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) reads as
    micros.zipWithIndex
      .map { case (us, i) => (i, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)) }
      .toDF("event_id", "ts").write.parquet(s"$base/ev_ntz.parquet")
    val a = Tables.load(spark, base, "ev_nanos").orderBy("event_id")
    val b = Tables.load(spark, base, "ev_ntz").orderBy("event_id")
    assert(a.schema("ts").dataType.typeName == "timestamp", a.schema.treeString)
    assert(b.schema("ts").dataType.typeName == "timestamp", b.schema.treeString)
    val va = a.select(unix_micros(col("ts"))).as[Long].collect().toSeq
    val vb = b.select(unix_micros(col("ts"))).as[Long].collect().toSeq
    assert(va == micros, s"nanos path values drifted: $va")
    assert(vb == micros, s"NTZ path values drifted: $vb")
  }

  test("hot-table cache: repeated loads reuse one in-memory relation") {
    try {
      val first = Tables.loadCached(spark, dir, "nation")
      first.count() // materialize the block cache
      val second = Tables.loadCached(spark, dir, "nation")
      assert(first eq second, "same session+table must return the memoized frame")
      val plan = second.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), s"expected cached scan:\n$plan")
      assert(second.count() == Tables.load(spark, dir, "nation").count())
    } finally Tables.uncache(spark)
  }

  test("retry: backoff schedule doubles and caps; exhaustion rethrows") {
    var calls = 0
    val sleeps = scala.collection.mutable.Buffer.empty[Long]
    val got = Retry.withRetry(attempts = 5, initialBackoffMs = 100, maxBackoffMs = 400,
      onRetry = (_, _) => (), sleep = sleeps += _) {
      calls += 1
      if (calls < 4) sys.error(s"boom $calls") else "ok"
    }
    assert(got == "ok" && calls == 4 && sleeps.toSeq == Seq(100L, 200L, 400L))
    val ex = intercept[Retry.RetriesExhausted] {
      Retry.withRetry(attempts = 2, onRetry = (_, _) => (), sleep = _ => ()) {
        sys.error("always")
      }
    }
    assert(ex.getCause.getMessage == "always")
  }
}
