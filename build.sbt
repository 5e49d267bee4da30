ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "searchenginespark"
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
// local-cluster[...] masters (Bench's executor-scaling phase,
// ScalingProbe cluster mode) need SPARK_HOME in the forked JVM's env so
// the in-process standalone worker can launch executor JVMs — and
// SPARK_SCALA_VERSION, because the worker builds the executor command
// through the launcher library directly (never bin/spark-class, whose
// load-spark-env.sh would otherwise set it); without it
// getScalaVersion() dies with "Cannot find any build directories".
// SPARK_LOCAL_DIRS: standalone workers IGNORE spark.local.dir (the
// "overridden by the cluster manager" warning) and default executor
// shuffle/spill to disk — on this one-disk VM that serializes the
// 4-executor side (measured: n4 build 17.6 s -> 32.6 s, efficiency
// 0.87 -> 0.54). The env var is the only channel that reaches the
// in-process worker; tmpfs IS this VM's stand-in for per-executor SSDs.
run / envVars ++= Map(
  "SPARK_HOME" -> sys.env.getOrElse("SPARK_HOME", "/opt/spark"),
  "SPARK_SCALA_VERSION" -> "2.13",
  "SPARK_LOCAL_DIRS" -> "/dev/shm/graft-local")
Test / envVars ++= Map(
  "SPARK_HOME" -> sys.env.getOrElse("SPARK_HOME", "/opt/spark"),
  "SPARK_SCALA_VERSION" -> "2.13",
  "SPARK_LOCAL_DIRS" -> "/dev/shm/graft-local")
// Forked mains print RAW to stdout (no sbt "[info] " prefix) so the
// driver can json-parse Bench's one-line output directly from stdout.
outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
  .flatMap(_.split(" ").filter(_.nonEmpty))
