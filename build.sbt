ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ds2ispark"
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
// The driver parses graft.Bench's single stdout JSON line from the tail
// of the combined sbt output. sbt's default LoggedOutput strategy
// prefixes every forked-stdout line with "[info] " and appends a
// "[success] Total time..." line after the run — both of which defeat a
// parser looking for a raw JSON line (BENCH_r01-r03 all parsed:null
// with the JSON sitting verbatim in the tail). StdoutOutput inherits
// the child's stdout/stderr raw; showSuccess kills the trailer.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the shell command loop, not by a task — sbt's
// unused-key lint cannot see that.
Global / excludeLintKeys += showSuccess
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
  // 10g, not 32g: the guest advertises 125 GiB but the host backs only
  // ~10 GiB at RAM speed — a JVM growing past it acquires pages at
  // ~0.3 GiB/s and idle pages get reclaimed+re-faulted (measured:
  // pre-touching 8g = 1.2s, 16g = 40s, 24g = 97s). A heap that stays
  // under the cliff and lets Spark spill beats one that grows into it.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "10g")}",
)
