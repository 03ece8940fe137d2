ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "agnispark"
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
// Forked run output passes through UNPREFIXED: the default LoggedOutput
// strategy stamps every line with "[info] ", which made the driver's
// bench-line parse fail two rounds running (it expects a naked JSON
// line on stdout).
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
// scratch hook for perf experiments (e.g. -Dspark.storage.memoryMapThreshold=1g)
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
  .flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 48g of the box's 128 GiB: at 24g the 185-query bench suite's
  // accumulated fixture caches tipped individual reps into GC/eviction
  // storms (one rep of ts_promql_native_hist_stats burned 574 CPU-s vs
  // a ~6 CPU-s norm; round 9 documented the same anomaly once)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // JIT-starvation storms (round-13 finding, OPTIMIZATION_r13.md): the
  // suite generates thousands of codegen classes; JDK 17's DYNAMIC
  // compiler-thread scaling starts with ONE C2 thread and ramps too
  // late, so the compile queue backs up (observed: >40k queued tasks,
  // C2 thread 74 CPU-s behind) and whole-stage-codegen hot loops run
  // INTERPRETED for minutes — single reps of sub-second queries burned
  // 100-380 CPU-s (thread dumps: TimSort/SizeEstimator interpreted,
  // app threads idle, C2 pegged). Pinning a full complement of
  // compiler threads and sizing the code cache so warm methods are
  // never flushed halved steady-state query CPU on the storm-prone
  // subset (36.4 -> 18.7 CPU-s, reps=8) and capped storm reps at ~27
  // CPU-s (was 315). Harness JVM health only — results unaffected.
  "-XX:-UseDynamicNumberOfCompilerThreads",
  "-XX:CICompilerCount=12",
  "-XX:ReservedCodeCacheSize=1g",
)
