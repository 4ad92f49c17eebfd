package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry}

/** Dump `.explain("formatted")` for every SparkEntry query (or the
  * comma-separated subset in args(1)) to `<outDir>/<name>_<tag>.txt`.
  *
  * Usage: PlanDump <outDir> [names] [tag]
  *   outDir — where the .txt files land (created if missing)
  *   names  — comma-separated query names; empty/"all" = every query
  *   tag    — filename suffix, default "before"
  *
  * The plan is captured WITHOUT executing the query (explain is
  * planning-only), so this is safe to run alongside other work; AQE
  * plans print `isFinalPlan=false`, which is the expected shape for a
  * static audit. Data dir comes from SPARK_GRAFT_SF_DIR (default
  * sf0.1 — the driver's bench scale, so plan shapes match the timed
  * runs). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names0 = if (args.length > 1) args(1) else "all"
    val tag = if (args.length > 2) args(2) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (names0.isEmpty || names0 == "all") SparkEntry.queries.keys.toSeq.sorted
      else names0.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
        System.err.println(s"[plandump] $name ok (${plan.length} chars)")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
