package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The round-5 lesson, pinned: a broken query must FAIL LOUDLY in both
  * harness artifacts. Bench recorded a failed query's time-to-exception
  * as its best number; Verify let the query vanish from the correctness
  * JSON (an absent row, not an error row). Both contracts live here. */
class HarnessSpec extends SparkSpec {

  private val broken: (SparkSession, String) => DataFrame =
    (s, _) => s.range(1).selectExpr("unix_micros(id)") // analysis error: id is bigint

  private val fine: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).selectExpr("id", "id * 2 as twice")

  test("bench: a throwing query yields Left, never a timing") {
    val r = Bench.runOne(spark, "broken", broken, sf("any"), iters = 2)
    assert(r.isLeft, "failed query must not produce a number")
    assert(r.left.toOption.get.toLowerCase.contains("unix_micros"))
    val ok = Bench.runOne(spark, "fine", fine, sf("any"), iters = 2)
    assert(ok.isRight && ok.toOption.get._1 > 0.0)
  }

  test("bench: failed queries land in failures, not queries, in the JSON") {
    val json = Bench.renderJson(
      Seq("good" -> Right((1.25, 0.9)), "bad" -> Left("boom \"quoted\"")),
      "/tmp/sf", """"cpus":4""")
    assert(json.contains(""""queries":{"good":1.25}"""), json)
    assert(json.contains(""""failures":{"bad":"boom \"quoted\""}"""), json)
    assert(json.contains("\"n_ok\":1") && json.contains("\"n_failed\":1"), json)
    assert(!json.contains(""""bad":0"""), "no fabricated timing for the failure")
  }

  test("bench JSON rounds timings to 3 decimals — the line must fit the driver's capture") {
    val json = Bench.renderJson(
      Seq("a" -> Right((1.23456789012345, 0.98765432109876))),
      "/tmp/sf", """"cpus":4""")
    assert(json.contains(""""queries":{"a":1.235}"""), json)
    assert(json.contains(""""cpu_sec":{"a":0.988}"""), json)
    assert(json.contains(""""value":1.235"""), json)
  }

  test("bench JSON key order: wall-time queries map is LAST; cpu_sec droppable") {
    // the file record keeps queries as the final key (a truncating
    // reader loses the header, never wall times) and cpu_sec before it
    val results = Seq[(String, Either[String, (Double, Double)])](
      "a" -> Right((1.0, 0.8)), "b" -> Right((2.0, 1.6)))
    val full = Bench.renderJson(results, "/tmp/sf", """"cpus":4""")
    assert(full.endsWith(""""queries":{"a":1.0,"b":2.0}}"""), full)
    assert(full.indexOf("\"cpu_sec\"") < full.indexOf("\"queries\""), full)
    val lean = Bench.renderJson(results, "/tmp/sf", """"cpus":4""", includeCpu = false)
    assert(!lean.contains("cpu_sec"), lean)
    assert(lean.endsWith(""""queries":{"a":1.0,"b":2.0}}"""), lean)
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(lean) // both modes stay valid JSON
    JsonMethods.parse(full)
  }

  test("bench STDOUT line is the bounded summary: no per-query map, ever") {
    // rounds 8 and 9 both shipped a driver-side record that truncated
    // mid-map (`parsed: null`) despite trimming — the stdout line must
    // therefore carry NO per-query map at any query count, only the
    // totals and a pointer to the file that has the map
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val many = (1 to 500).map(i =>
      s"query_with_a_long_name_$i" ->
        (Right((i * 0.001, i * 0.0008)): Either[String, (Double, Double)]))
    val line = Bench.renderSummaryJson(many :+ ("bad" -> Left("boom")),
      "/tmp/sf", """"cpus":4,"load_avg_start":0.1""")
    assert(line.length < 300, s"summary must stay bounded: ${line.length} chars")
    assert(!line.contains("query_with_a_long_name"), line)
    val parsed = JsonMethods.parse(line)
    assert((parsed \ "n_ok") == JInt(500) && (parsed \ "n_failed") == JInt(1))
    assert((parsed \ "queries_file") == JString("bench_out.json"))
    val JDouble(total) = (parsed \ "value"): @unchecked
    assert(math.abs(total - (1 to 500).map(_ * 0.001).sum) < 0.01)
  }

  test("bench JSON is machine-parseable, including pathological failure messages") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // the nastiest realistic failure text: quotes, backslashes (Windows
    // paths / regexes), newlines and tabs from wrapped analysis errors
    val json = Bench.renderJson(
      Seq("ok" -> Right((0.5, 0.4)),
        "bad" -> Left("line1\nline2\t\"quoted\" C:\\path \u0001ctrl")),
      "/tmp/sf \"dir\"", """"cpus":4,"load_avg_start":0.5""")
    val parsed = JsonMethods.parse(json)
    assert((parsed \ "queries" \ "ok") == JDouble(0.5))
    assert((parsed \ "cpu_sec" \ "ok") == JDouble(0.4))
    val JString(msg) = (parsed \ "failures" \ "bad"): @unchecked
    assert(msg.contains("line1\nline2") && msg.contains("\"quoted\""))
    assert((parsed \ "n_failed") == JInt(1))
  }

  test("verify: a throwing query writes an .ERROR marker, a good one writes parquet") {
    val out = Files.createTempDirectory("graft_verify_spec").toString
    val bad = Verify.dumpOne(spark, "broken", broken, sf("any"), out)
    assert(bad.isLeft)
    val marker = Paths.get(s"$out/broken.ERROR")
    assert(Files.exists(marker), "failed query must leave an explicit error file")
    assert(Files.readString(marker).toLowerCase.contains("unix_micros"))
    val good = Verify.dumpOne(spark, "fine", fine, sf("any"), out)
    assert(good.isRight)
    assert(spark.read.parquet(s"$out/fine").count() == 10)
    assert(!Files.exists(Paths.get(s"$out/fine.ERROR")))
  }
}
