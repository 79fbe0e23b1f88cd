ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hazelcastjetcontribspark"
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
// Send forked-run output straight to stdout: sbt's LoggedOutput prefixes
// every line with "[info] ", which breaks machine parsing of Bench's JSON
// metric line by the driver harness.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Suites assert the COUNT-rule sweep semantics on fixtures committed
// seconds apart; the time leg of the generation grace (production
// default 6h — see graft.core.GenDir.MaxScanAgeKey) is pinned off for
// the whole shared test session. Its own tests set the session conf.
Test / javaOptions += "-Dspark.graft.maxScanAgeMs=0"
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pinned heap + GC for run-to-run bench stability: a fixed-size G1 heap
  // removes grow/shrink pauses that otherwise swing sub-second queries
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseG1GC",
)
