package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Failures are LOUD: a query that throws leaves `<name>.ERROR` (its
  * message) next to where its parquet would be, and every failure is
  * also collected into `_failures.json`. Round 5's one broken query
  * simply VANISHED from the correctness artifact — an absent row is
  * far easier to miss than an explicit error row. */
object Verify {

  /** Dump one query; Left(message) on failure. Factored out of main so
    * VerifySpec can pin the failure contract cheaply. */
  def dumpOne(spark: SparkSession, name: String,
              fn: (SparkSession, String) => DataFrame,
              sfDir: String, outDir: String): Either[String, Unit] =
    try {
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      Right(())
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        Files.writeString(Paths.get(s"$outDir/$name.ERROR"), msg + "\n")
        Left(msg)
    }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus)
    // keep the driver's bounded output capture free of the per-query
    // WindowExec WARN wall (see Bench.main)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      dumpOne(spark, name, fn, sfDir, outDir) match {
        case Left(msg) =>
          System.err.println(s"[verify] $name FAILED: $msg")
          Some(name -> msg)
        case Right(_) => None
      }
    }
    val fj = failures.map { case (k, v) => s"${q(k)}: ${q(v.take(300))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), fj)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} queries FAILED: " +
        failures.map(_._1).mkString(", "))
      sys.exit(1)
    }
  }
}
