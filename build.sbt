ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdata_tag_systemspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// The driver invokes `sbt "runMain graft.Bench"` and tail-parses the
// combined output for the final bare-JSON summary line. Two traps,
// both hit in rounds 8-10 (`parsed: null`):
//   1. the bare `run / fork` key is NOT what the run/runMain runner
//      consults — it reads `Compile / run / fork` (runMain shares
//      run's runner, per sbt's lintUnused), so the bench ran
//      IN-PROCESS and sbt's logger decorated every line
//      (`[info] {...}` / `[error] WARN ...`);
//   2. the default forked outputStrategy is LoggedOutput — same
//      decoration. StdoutOutput passes the child's streams through raw.
Compile / run / fork := true
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// The driver tail-parses stdout for graft.Bench's one-line metric
// JSON; sbt's trailing "[success] Total time" line must not follow it.
Global / showSuccess := false
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
