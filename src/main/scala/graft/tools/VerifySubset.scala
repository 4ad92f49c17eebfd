package graft.tools

import java.nio.file.{Files, Paths}

import graft.{Sessions, SparkEntry, Verify}

/** [[graft.Verify]] restricted to a comma-separated query subset — the
  * optimization-loop companion: after touching one operator, dump just
  * its queries + their oracle SQL and run `tools/check.py` on the
  * subset instead of paying the full 109-query gate per iteration.
  * Same dump path (`Verify.dumpOne`) and the same oracle_sql.json
  * contract, so `check.py` works unchanged on the output dir.
  *
  * Usage: VerifySubset <sfDir> <outDir> <name1,name2,...>
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, nameList) = args.take(3)
    val names = nameList.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val failures = names.flatMap { name =>
      Verify.dumpOne(spark, name, SparkEntry.queries(name), sfDir, outDir) match {
        case Left(msg) =>
          System.err.println(s"[verify-subset] $name FAILED: $msg")
          Some(name -> msg)
        case Right(_) =>
          System.err.println(s"[verify-subset] $name ok")
          None
      }
    }
    val oracleJson = SparkEntry.oracleSql.view.filterKeys(n => names.contains(n)).toSeq
      .sortBy(_._1)
      .map { case (k, v) => s"${Verify.q(k)}: ${Verify.q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), oracleJson)
    val fj = failures.map { case (k, v) => s"${Verify.q(k)}: ${Verify.q(v.take(300))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), fj)
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
