ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scicatingestorspark"
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
// Forked `run` output normally passes through sbt's logger, which wraps
// every stdout line in "[info] " — that prefix made the driver's bench
// JSON capture unparseable for two rounds. StdoutOutput inherits sbt's
// raw stdout instead, so Bench/Verify JSON lines arrive bare.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default (r18): local[32] runs 32 concurrent task threads in
  // ONE JVM — at 8g the full 238-query chain spent seconds per query
  // in young-GC stalls (stage probe: layout_skip_workload 5.3 s GC +
  // 38 s of run-vs-cpu stall at 8g → 1.3 s GC at 24g; full-chain
  // total 412 s → 310 s with NO other change). The env override
  // stays; a cluster deployment sizes executor memory per core the
  // same way (~0.75 GB/core here).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
