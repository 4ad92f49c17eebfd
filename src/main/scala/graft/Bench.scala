package graft

/** Benchmark main: times every SparkEntry query end-to-end on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Queries run through the `noop` sink, NOT `.count()` — count lets
  * Catalyst prune every projection (a fingerprint query would "run" in
  * 0ms without hashing anything). noop executes the full plan and
  * discards rows, which is the honest cost of producing the result. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus)
    // untimed warmup: JVM/codegen/parquet-reader paths
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
