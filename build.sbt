ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "easydb_serverspark"
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
// The driver tails this process's output and parses the LAST line as the
// bench JSON; sbt's "[success] Total time: ..." banner printed after the
// forked main returns has defeated that parse in every prior round
// (BENCH_r0{1..4}.json all show parsed:null). Suppress it globally.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Forward forked run output raw (no "[info] " logger prefix) so the JSON
// line is parseable exactly as printed.
run / connectInput := false
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
  // Single-JVM local[32] is the contract (driver brief: 32 threads,
  // 128 GiB box). The old 8g default — a v0 leftover — gave 32 tasks
  // ~150 MB of execution memory each: at 10x data the window sorts and
  // hashed relations spilled 13 GB per heavy query and GC ate 20-40%
  // of wall. 48g removes the spill entirely (measured: sql_shingle_
  // jaccard 10x warm 36s/13GB spill -> 35s/0 spill, cold 59 -> 43s)
  // while leaving room for a second concurrent fork (loaded-run
  // reproductions) plus sbt itself on the 125 GB machine.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // ~60 queries x whole-stage-codegen classes overflow the default
  // 240m JIT code cache mid-bench, silently de-optimizing later
  // queries (observed: q01 1.7s -> 23s depending on run order).
  "-XX:ReservedCodeCacheSize=1g",
  // Tungsten page size for this single-JVM local session. The default
  // heuristic (heap/cores-derived) lands at 64 MB here, so EVERY
  // aggregate/join task allocates a 64 MB page up front — at the gate
  // SFs most tasks hold KBs, and the dead 64 MB allocations are pure
  // G1 churn (measured: sim_topk_pq cold GC 6.2 s -> 2.8 s, quality_
  // classifier warm 7.7 -> 4.8 s with 2 MB pages; no query regressed).
  // A cluster deployment with 100 MB-1 GB partitions keeps the Spark
  // default (unset SPARK_GRAFT_PAGE_SIZE => remove the flag there);
  // page chaining makes large per-task state correct either way, just
  // with a few more page switches.
  s"-Dspark.buffer.pageSize=${sys.env.getOrElse("SPARK_GRAFT_PAGE_SIZE", "2m")}",
) ++ sys.env.get("SPARK_GRAFT_GC").map(g => s"-XX:+Use${g}GC").toSeq
