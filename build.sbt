ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tundradbspark"
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
// Pass forked program output straight through to this process's
// stdout/stderr instead of sbt's logger: the logger prefixes every line
// with "[info] ", which breaks any harness that json-parses the single
// {"metric":...} line Bench prints (the per-round BENCH_r*.json showed
// parsed:null each round for exactly this reason).
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
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
// The log4j2 config serves the repo's own entry points and tests; a
// LIBRARY jar must not impose a logging config on its host application's
// classpath (log4j2 picks up the first log4j2.properties it finds).
Compile / packageBin / mappings ~=
  (_.filterNot(_._2 == "log4j2.properties"))
// …but sbt's batch runMain executes from that packaged jar, so the
// config vanished from every Bench/Verify fork (measured r14: the
// forked JVM fell back to Spark's bundled defaults and the
// accumulator-spam RegexFilter never applied — the source of the
// anonymous DAGScheduler stack fragments in booked bench tails).
// Point the run fork at the source file explicitly; tests run from the
// classes directory and find it on the classpath as before.
run / javaOptions +=
  s"-Dlog4j2.configurationFile=${baseDirectory.value / "src" / "main" / "resources" / "log4j2.properties"}"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
