package graft.sources

import graft.SparkSpec
import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.SaveMode

/** Exercises the JDBC facade end-to-end against embedded Derby (the
  * JDBC engine already on the Spark classpath): distributed batched
  * keyed upsert, per-batch retry after an injected failure, read-back
  * validation, and the plain SaveMode write path — the semantics of
  * the reference's MySQL writer (optimized_mysql_writer.py:73-220)
  * proven against a real database instead of compile-checked. */
class JdbcSpec extends SparkSpec {

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft-derby").toString
  private lazy val url = s"jdbc:derby:$dbDir/db;create=true"

  private def ddl(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { c.createStatement().executeUpdate(sql); () } finally c.close()
  }

  test("keyed upsert: inserts, then updates-in-place + inserts on overlap; validation 0") {
    val s = spark
    import s.implicits._
    ddl("CREATE TABLE user_tags (user_id BIGINT PRIMARY KEY, n_tags INT, segment VARCHAR(32))")
    val v1 = (1L to 100L).map(i => (i, (i % 5).toInt, s"seg${i % 3}"))
      .toDF("user_id", "n_tags", "segment").repartition(4)
    Jdbc.upsertPartitioned(v1, url, "user_tags", Seq("user_id"), batchSize = 16)
    val back1 = Jdbc.read(spark, url, "user_tags", "user_id", 1L, 100L, 4)
    assert(back1.count() == 100)
    assert(Jdbc.missingAfterWrite(spark, url, "user_tags", v1, Seq("user_id")) == 0)

    // second wave overlaps 51..100 (updates) and adds 101..125 (inserts)
    val v2 = (51L to 125L).map(i => (i, 99, "updated"))
      .toDF("user_id", "n_tags", "segment").repartition(3)
    Jdbc.upsertPartitioned(v2, url, "user_tags", Seq("user_id"), batchSize = 16)
    val rows = Jdbc.read(spark, url, "user_tags", new Properties).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(rows.size == 125, "upsert must not duplicate overlapping keys")
    assert(rows(60L) == ((99, "updated")), "overlapping key must take the new values")
    assert(rows(10L) == ((10 % 5, s"seg${10 % 3}")), "untouched key must keep the old values")
    assert(Jdbc.missingAfterWrite(spark, url, "user_tags", v2, Seq("user_id")) == 0)
  }

  test("per-batch retry: injected first-attempt failure rolls back and the retry lands every row") {
    val s = spark
    import s.implicits._
    ddl("CREATE TABLE retry_target (k BIGINT PRIMARY KEY, v INT)")
    JdbcSpecHooks.reset(failures = 1)
    val df = (1L to 40L).map(i => (i, i.toInt)).toDF("k", "v").coalesce(1)
    Jdbc.upsertPartitioned(df, url, "retry_target", Seq("k"), batchSize = 100,
      retries = 3, onBatchStart = JdbcSpecHooks.hook)
    assert(JdbcSpecHooks.calls.get() >= 2, "the batch must have been attempted twice")
    assert(Jdbc.missingAfterWrite(spark, url, "retry_target", df, Seq("k")) == 0)
    assert(Jdbc.read(spark, url, "retry_target", new Properties).count() == 40)
  }

  test("retries exhausted surfaces the failure (no silent partial write)") {
    val s = spark
    import s.implicits._
    ddl("CREATE TABLE fail_target (k BIGINT PRIMARY KEY, v INT)")
    JdbcSpecHooks.reset(failures = 99)
    val df = (1L to 5L).map(i => (i, i.toInt)).toDF("k", "v").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      Jdbc.upsertPartitioned(df, url, "fail_target", Seq("k"), batchSize = 100,
        retries = 2, onBatchStart = JdbcSpecHooks.hook)
    }
    assert(e.getMessage.contains("injected") ||
      Option(e.getCause).exists(_.getMessage.contains("attempts")))
    assert(Jdbc.read(spark, url, "fail_target", new Properties).count() == 0,
      "rolled-back batches must leave nothing behind")
  }

  test("SaveMode path: Overwrite creates, Append extends (one attempt, documented)") {
    val s = spark
    import s.implicits._
    val a = (1L to 30L).map(i => (i, s"a$i")).toDF("id", "payload")
    Jdbc.write(a, url, "plain_writes", SaveMode.Overwrite)
    assert(Jdbc.read(spark, url, "plain_writes", new Properties).count() == 30)
    val b = (31L to 45L).map(i => (i, s"b$i")).toDF("id", "payload")
    Jdbc.write(b, url, "plain_writes", SaveMode.Append)
    assert(Jdbc.read(spark, url, "plain_writes", new Properties).count() == 45)
  }
}

/** Executor-visible fault injection (local mode shares the JVM): the
  * first `failFirst` batch attempts throw a transient error. */
object JdbcSpecHooks {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var failFirst = 0
  def reset(failures: Int): Unit = { calls.set(0); failFirst = failures }
  val hook: () => Unit = () => {
    val n = calls.incrementAndGet()
    if (n <= failFirst) throw new RuntimeException(s"injected transient failure $n")
  }
}
