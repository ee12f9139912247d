ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lightweightragspark"
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
// the subprocess protocol reads one JSON request from stdin
run / connectInput := true
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
  // single-JVM local mode hosts driver + all "executors". Fixed pre-touched
  // heap: G1 grow/shrink cycles re-fault gigabytes of heap mid-job, and at
  // 32 threads the page-fault + memcg-charge path becomes the bottleneck
  // (measured: 50%+ kernel time, 2-5x phase slowdowns). Paying the faults
  // once at JVM start removes the noise.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("GRAFT_GC_LOG").map(_ => "-Xlog:gc").toSeq

// glibc malloc mmaps/munmaps every large (direct-buffer) allocation by
// default; at 32 executor threads the per-process mmap_lock serializes and
// the kernel burns >50% sys in page faults (measured: 10-40s stalls per
// build). Keep big allocations inside the arenas instead of the mmap path.
val mallocTuning = Map(
  "MALLOC_MMAP_THRESHOLD_" -> "268435456",
  "MALLOC_TRIM_THRESHOLD_" -> "268435456",
  "MALLOC_ARENA_MAX" -> "8")
run / envVars ++= mallocTuning
Test / envVars ++= mallocTuning
Test / run / envVars ++= mallocTuning
