ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "catlasspark"
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
// The driver parses Bench's one-line JSON from a short stdout tail; sbt's
// trailing "[success] Total time: ..." line would otherwise follow it and
// break the parse (BENCH_r01/r02 "parsed": null).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// BENCH_r03 still had "parsed": null: sbt's default LoggedOutput relabels the
// forked JVM's stdout as "[info] {...}", which the driver's JSON parse
// rejects. StdoutOutput passes the child's stdout through verbatim (and its
// stderr to stderr), so the bench line reaches the driver unprefixed.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: Bench runs 117 queries in one JVM at local[32]; at 8g the
  // late-alphabet queries showed multi-second GC-pause outliers (t10 1.4s →
  // 10s on one run) that were pure heap pressure, not plan cost
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
