package graft

import java.nio.file.{Files, Paths}

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
  * The JSON line is printed AFTER spark.stop() so it is the final
  * stdout line (Spark logs go to stderr), and also written to
  * `bench_out.json` for parsers that prefer a file. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val warmDir = "/root/testdata/sf0.001"
    val loadAtStart =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val spark = Sessions.local(cpus)
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
      catch { case _: Throwable => () }
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
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // stderr progress per query: a hung/pathological query at a new
      // SF is identifiable without thread dumps
      System.err.println(f"[bench] $name ${times.min}%.2fs")
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // load markers: a run that shared the host with other work is
    // self-identifying (round 3's driver bench recorded 2-3× inflated
    // times that round 4 would otherwise chase as regressions). A
    // loadavg well above this JVM's own parallelism at the END of the
    // run means the numbers above were taken on a contended machine.
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // Double.toString, not f"%.2f": the interpolator is locale-aware
    // and a comma-decimal default locale would emit invalid JSON
    def r2(x: Double): Double = math.rint(x * 100) / 100
    val env = s""""cpus":$cpus,"host_cores":${os.getAvailableProcessors},""" +
      s""""load_avg_start":${r2(loadAtStart)},"load_avg_end":${r2(os.getSystemLoadAverage)}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",$env}"""
    Files.writeString(Paths.get("bench_out.json"), json + "\n")
    spark.stop()
    // last stdout line, after all Spark lifecycle logging
    println(json)
    System.out.flush()
  }
}
