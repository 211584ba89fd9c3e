ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "clonebasspark"
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
// Pass the forked process's stdout through verbatim (no "[info] " prefix) so
// the driver can machine-parse Bench's JSON line.
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
javaOptions ++= sys.env.get("GRAFT_PROFILE").map(_ => "-Dgraft.profile=1").toSeq
// GC experiment hook: GRAFT_GC=Parallel|G1|Z
javaOptions ++= sys.env.get("GRAFT_GC").map(g => s"-XX:+Use${g}GC").toSeq
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local-mode Spark = driver-only JVM: heap serves executor threads,
  // shuffle buffers, and localCheckpoint blocks; 8g thrashes GC on the
  // bench corpora (box has 128 GiB). Xms = Xmx matches what spark-submit
  // sets on real executors and stops G1 from uncommitting + re-faulting
  // heap pages between bench legs (round-5: fresh-page faults tripled the
  // single-thread cost of the allocation probe on this virtualized box).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
