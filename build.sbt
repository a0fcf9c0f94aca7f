ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mastonspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession and a streaming test stops all active
// queries — keep suites sequential.
Test / parallelExecution := false
run / fork := true
// The bench/verify harness parses the forked main's JSON line from raw
// stdout; sbt's default LoggedOutput would prefix every line with "[info] "
// and break that parse.
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
// Heap sized to the host instead of the old fixed -Xmx8g: 32 local-mode
// tasks against 8g spent ~40% of suite wall in GC (213 s task GC per
// 520 s pass at sf0.1, 32 cpus); a quarter of host RAM clamped to
// [8, 24] GiB, with a matching -Xms and a relaxed G1 pause goal,
// measured ZERO task GC in both passes and 447/385 s pass totals on the
// same box and code (OPTIMIZATION_r17.md §2). This is the §5
// memory-sizing rule of the optimization guide, not a local[32] tune:
// production sizes executor heap to its task slots the same way, the
// value scales with the machine, and SPARK_DRIVER_MEM still overrides
// (override skips -Xms so a smaller explicit heap never conflicts).
val hostHeapGb: Long = {
  val phys =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getTotalMemorySize
    catch { case _: Throwable => 0L }
  // in a container the cgroup limit, not host RAM, is the real budget —
  // a heap sized off the host would get the fork OOM-killed
  def cgLimit(path: String): Long =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path))).trim
      if (s == "max") Long.MaxValue else s.toLong
    } catch { case _: Throwable => Long.MaxValue }
  val budget = Seq(if (phys > 0) phys else Long.MaxValue,
    cgLimit("/sys/fs/cgroup/memory.max"),
    cgLimit("/sys/fs/cgroup/memory/memory.limit_in_bytes")).min
  if (budget == Long.MaxValue) 8L
  else math.max(8L, math.min(24L, (budget / 4) >> 30))
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${hostHeapGb}g")}",
  // batch bench, no latency SLO: a relaxed pause goal lets G1 keep a
  // large young gen instead of collecting every few hundred MB
  "-XX:MaxGCPauseMillis=800",
) ++ (if (sys.env.contains("SPARK_DRIVER_MEM")) Seq.empty[String]
      // pre-touch the committed heap at JVM start: otherwise the first
      // allocation-heavy phase (the untimed index prime) absorbs the
      // zero-fill page faults of 24 GiB of fresh heap (measured: primeSec
      // 42 s -> 112 s with -Xms24g alone)
      else Seq(s"-Xms${hostHeapGb}g", "-XX:+AlwaysPreTouch")) ++
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
    .flatMap(_.split("\\s+")).filter(_.nonEmpty)
