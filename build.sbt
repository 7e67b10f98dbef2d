ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "divoltecollectorspark"
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
// glibc serves >128KB mallocs with mmap and returns them with munmap; C2
// JIT arenas for whole-stage-codegen methods allocate/free such chunks
// constantly, and every munmap broadcasts TLB-shootdown IPIs to all ~400
// JVM threads — measured at tens of KERNEL-cpu-minutes per run on
// virtualized hosts where each IPI is a VM exit. Route large mallocs to
// the sbrk heap and never trim it back: 3.5x wall-clock on the bench.
val mallocNoMmapChurn = Map(
  "MALLOC_MMAP_THRESHOLD_" -> "1073741824",
  "MALLOC_TRIM_THRESHOLD_" -> "1073741824",
  "MALLOC_ARENA_MAX" -> "4",
)
run / envVars ++= mallocNoMmapChurn
Test / envVars ++= mallocNoMmapChurn
// Pass the forked JVM's stdout straight through (no "[info] " log prefix):
// Bench/Verify print machine-read JSON lines that must stay parseable.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Whole-stage codegen emits hundreds of distinct classes across the query
  // corpus; the default 240MB JIT code cache fills mid-run and the VM then
  // sweeps/re-JITs hot methods continuously.
  "-XX:ReservedCodeCacheSize=1g",
  // Fault the whole heap in ONCE at boot (fixed size, pre-touched, THP):
  // page-fault handling on this kernel serializes badly under concurrent
  // load, so letting 32 task threads grow the heap mid-query turns each
  // heap expansion into a multi-second whole-JVM stall charged to whatever
  // query was running. One-time cost at startup instead; madvise-THP cuts
  // the fault count 512x.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseTransparentHugePages",
)
