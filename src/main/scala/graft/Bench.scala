package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every SparkEntry query end-to-end on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Queries run through the `noop` sink, NOT `.count()` — count lets
  * Catalyst prune every projection (a fingerprint query would "run" in
  * 0ms without hashing anything). noop executes the full plan and
  * discards rows, which is the honest cost of producing the result.
  *
  * Warmup: every query once at sf0.001 (same generated code, so JIT +
  * codegen caches are hot) plus one scan of each target-SF table (OS
  * page cache + parquet footers). Without this the first query to
  * touch a big table absorbs the whole cold-start cost — round 1
  * recorded q1 at 31.5s that is 2s warm.
  *
  * Failures are LOUD: a query that throws is excluded from "queries"
  * and listed under "failures" with its message — round 5 recorded a
  * broken query's time-to-exception (0.09s) as the suite's best
  * number, which reads as a success. Exit code is non-zero when any
  * query failed so a wrapper that only checks rc can't miss it either.
  *
  * Per-query process CPU time rides along with wall time: a run on a
  * contended host shows wall >> cpu/cores per query, which self-
  * identifies contamination that end-of-run loadavg markers missed in
  * round 5 (co-tenant steal is invisible to this JVM's loadavg).
  *
  * The JSON line is printed AFTER spark.stop() so it is the final
  * stdout line (Spark logs go to stderr), and also written to
  * `bench_out.json` for parsers that prefer a file. */
object Bench {

  /** One timed query: min-of-`iters` wall seconds plus the process CPU
    * seconds consumed during the winning (min-wall) iteration. Any
    * iteration throwing ⇒ Left(message) — a failed query must never
    * yield a number. Factored out of main so BenchSpec can pin the
    * failure contract without running the whole suite. */
  def runOne(spark: SparkSession, name: String,
             fn: (SparkSession, String) => DataFrame,
             sfDir: String, iters: Int): Either[String, (Double, Double)] = {
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    try {
      val runs = (1 to iters).map { _ =>
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
      }
      Right(runs.minBy(_._1))
    } catch {
      // NonFatal only: an OutOfMemoryError/StackOverflowError leaves
      // the JVM in an unknown state — converting it to a per-query
      // "failure" and timing the REMAINING queries on that JVM would
      // contaminate their numbers. Fatal errors abort the run.
      case scala.util.control.NonFatal(e) =>
        Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
    }
  }

  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  // Double.toString of the rounded value (not a locale-aware "%.3f"
  // format, which could emit comma decimals): 1.234567890123 → 1.235
  private def r3(x: Double): Double = math.rint(x * 1000) / 1000

  /** Assemble the FILE record (`bench_out.json` — no size bound).
    * Failed queries appear ONLY in "failures" (name → message); their
    * absence from "queries" plus the explicit list is unambiguous to
    * both humans and parsers. Timings are rounded to 3 decimals (ms
    * resolution — below the run-to-run noise floor). Key ORDER: the
    * wall-time "queries" map is the LAST key, so a reader that
    * truncates loses the header, never wall numbers. */
  def renderJson(results: Seq[(String, Either[String, (Double, Double)])],
                 sfDir: String, env: String, includeCpu: Boolean = true): String = {
    val ok = results.collect { case (k, Right(v)) => (k, v) }
    val failed = results.collect { case (k, Left(m)) => (k, m) }
    val qs = ok.map { case (k, (w, _)) => jstr(k) + ":" + r3(w) }.mkString("{", ",", "}")
    val cpu =
      if (includeCpu)
        ok.map { case (k, (_, c)) => jstr(k) + ":" + r3(c) }
          .mkString(""""cpu_sec":{""", ",", "},")
      else ""
    val fj = failed.map { case (k, m) => jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    val total = r3(ok.map(_._2._1).sum)
    s"""{"metric":"total","value":$total,"unit":"sec","sf":${jstr(sfDir)},$env,""" +
      s""""failures":$fj,"n_failed":${failed.size},"n_ok":${ok.size},""" +
      cpu + s""""queries":$qs}"""
  }

  /** The STDOUT line: totals only, NO per-query map. Rounds 5-9 tried
    * to fit the 91→103-query wall map into the driver's bounded stdout
    * tail by trimming (3-decimal timings, cpu_sec dropped, queries
    * last, empty failures omitted) and the line STILL truncated
    * mid-map two rounds running (BENCH_r08/r09 `parsed: null`). The
    * map cannot win that fight at this query count, so it no longer
    * plays: stdout carries the summary a driver needs to grade the run
    * (total/n_ok/n_failed + host-load markers in `env`), and the
    * per-query walls live exclusively in `bench_out.json`, named here
    * by `queries_file` so a reader knows where to look. */
  def renderSummaryJson(results: Seq[(String, Either[String, (Double, Double)])],
                        sfDir: String, env: String,
                        queriesFile: String = "bench_out.json"): String = {
    val ok = results.collect { case (k, Right(v)) => (k, v) }
    val nFailed = results.count(_._2.isLeft)
    val total = r3(ok.map(_._2._1).sum)
    s"""{"metric":"total","value":$total,"unit":"sec","sf":${jstr(sfDir)},$env,""" +
      s""""n_ok":${ok.size},"n_failed":$nFailed,"queries_file":${jstr(queriesFile)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val warmDir = "/root/testdata/sf0.001"
    val loadAtStart =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val spark = Sessions.local(cpus)
    // ERROR, not the session default WARN: the exact global-window
    // twins emit a WindowExec WARN per execution, and that wall is
    // what buried the summary line in the driver's bounded output
    // capture three rounds running (BENCH_r08..r10 `parsed: null`)
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run — scaling
    // experiments above sf1 exclude the documented-quadratic exact
    // baselines, which would otherwise dominate the run by design
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // untimed warmup: JVM/codegen/parquet-reader paths on the tiny SF
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir)
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // untimed warmup: target-SF files into the OS page cache
    // (listFiles is null for a missing/non-directory path — fall
    // through and let each timed query report its own failure)
    Option(new java.io.File(sfDir).listFiles((_, n) => n.endsWith(".parquet")))
      .getOrElse(Array.empty)
      .foreach(f => spark.read.parquet(f.getPath)
        .write.format("noop").mode("overwrite").save())
    // min of 2 runs per query: the honest steady-state number — a GC
    // pause or compaction stall in one run doesn't misreport the plan
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val results = names.map { name =>
      val r = runOne(spark, name, SparkEntry.queries(name), sfDir, iters)
      // stderr progress per query: a hung/pathological query at a new
      // SF is identifiable without thread dumps
      r match {
        case Right((w, c)) => System.err.println(f"[bench] $name $w%.2fs (cpu $c%.2fs)")
        case Left(m)       => System.err.println(s"[bench] $name FAILED: $m")
      }
      name -> r
    }
    // load markers: a run that shared the host with other work is
    // self-identifying (round 3's driver bench recorded 2-3× inflated
    // times that round 4 would otherwise chase as regressions). A
    // loadavg well above this JVM's own parallelism at the END of the
    // run means the numbers above were taken on a contended machine.
    // cpu_sec per query (above) is the finer-grained marker: loadavg
    // missed round 5's contamination entirely.
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // Double.toString, not f"%.2f": the interpolator is locale-aware
    // and a comma-decimal default locale would emit invalid JSON
    def r2(x: Double): Double = math.rint(x * 100) / 100
    // quiet_host self-annotation: the repo's committed-record protocol
    // is load_avg_start < 1.5 (PLANS.md) — a record taken on a loaded
    // host carries its own disqualification instead of relying on a
    // reader to notice the loadavg fields (the r12 driver record ran
    // at 2.11 and could be mistaken for canonical). Deliberately
    // START-based only: load_avg_end includes this JVM's OWN
    // parallelism (a fully-warm run legitimately ends near its thread
    // count — 2.8 measured on an otherwise-idle host), so an
    // end-load threshold would misflag clean runs while a co-tenant
    // below it slips through. MID-run contamination is what the
    // per-query cpu_sec column detects (wall >> cpu/cores — the round-5
    // lesson): quiet_host certifies the protocol PREcondition, cpu_sec
    // carries the in-run evidence.
    val quiet = loadAtStart >= 0 && loadAtStart < 1.5
    val env = s""""cpus":$cpus,"host_cores":${os.getAvailableProcessors},""" +
      s""""load_avg_start":${r2(loadAtStart)},"load_avg_end":${r2(os.getSystemLoadAverage)},""" +
      s""""quiet_host":$quiet"""
    // the FULL record (per-query walls + cpu_sec + failures) goes to
    // the file; stdout gets only the summary line — see renderSummaryJson
    Files.writeString(Paths.get("bench_out.json"),
      renderJson(results, sfDir, env, includeCpu = true) + "\n")
    val json = renderSummaryJson(results, sfDir, env)
    spark.stop()
    // last stdout line, after all Spark lifecycle logging
    println(json)
    System.out.flush()
    if (results.exists(_._2.isLeft)) sys.exit(1)
  }
}
