ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "veraxspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Specs must pin the lanes' validation machinery, not the box weather:
// disable the contention backoff sleeps and the steal-gate contended
// conversion inside `sbt test` (both stay ON for Bench/lane mains).
Test / envVars ++= Map("SPARK_GRAFT_BACKOFF" -> "0", "SPARK_GRAFT_STEAL_GATE" -> "0",
  "SPARK_GRAFT_CALIBRATION" -> "off", "SPARK_GRAFT_LANE_LEDGER" -> "off")
// The driver parses the bench/verify JSON from the tail of stdout:
// pass the forked app's stdout through verbatim (no "[info] " prefix)
// and drop sbt's trailing "[success] Total time" line so the JSON stays
// the last line of output.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += run / outputStrategy
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: local[32] runs 32 concurrent tasks in one JVM; at 8g
  // that is 250 MB of unified memory per task — far tighter than any
  // plausible executor sizing (the 128 GiB box would provision 2-4 GB
  // per core). The dedup scale lane's 500k-doc anchor aggregation was
  // the first workload to hit the cliff.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
