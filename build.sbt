ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hamaspark"
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
// sbt's `run`/`runMain` delegate to bgRun/bgRunMain, which by default COPY
// the full run classpath (here: every jar in /opt/spark/jars, ~370 MB) into
// target/bg-jobs before forking, so a background job survives a rebuild.
// We never rebuild mid-run, and on a host with throttled file I/O that copy
// alone can exceed an external harness timeout (r4 diagnosis: jstack showed
// 180 s of CPU inside AbstractBackgroundJobService.copyClasspath before the
// JVM ever forked). Run from the jars in place.
Compile / bgRun / bgCopyClasspath := false
Compile / bgRunMain / bgCopyClasspath := false
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
// Default heap: min(12g, half of physical RAM). Measured on the bench VM:
// FIRST-TOUCH of fresh anonymous pages can be throttled host-side to
// ~0.1-2 GB/s (a consumable budget that recovers slowly), while re-use of
// already-faulted pages runs at full speed — so total fresh pages touched,
// i.e. the heap G1 cycles through, is the scarce resource. A 32g heap let
// the suite crawl 10× under throttle; 12g bounds the fresh-page bill at a
// ~10% GC-overhead cost when memory is cheap. SPARK_DRIVER_MEM overrides.
val defaultHeap: String = {
  val memTotalGb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        l.trim.split("\\s+")(1).toLong / (1024 * 1024) }
      .getOrElse(64L)
    catch { case _: Throwable => 64L }
  s"${math.max(4L, math.min(12L, memTotalGb / 2))}g"
}
val heap = sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)
// Opt-in ONLY (r3 postmortem): -Xms=-Xmx + AlwaysPreTouch force the JVM to
// fault the entire heap at startup. On hosts whose first-touch page budget
// is throttled, that startup fault bill can exceed any external timeout
// covering the run (measured: `java -version` with these flags > 120 s).
// A healthy bench box may opt in via SPARK_GRAFT_PRETOUCH=1 to move the
// fault bill to startup instead of mid-suite; default is OFF so a forked
// JVM always starts promptly.
val pretouchOpts: Seq[String] =
  if (sys.env.get("SPARK_GRAFT_PRETOUCH").contains("1"))
    Seq(s"-Xms$heap", "-XX:+AlwaysPreTouch")
  else Seq.empty
// Opt-in: madvise-THP (host kernel: enabled=madvise) batches heap
// first-touch into 2 MB faults without AlwaysPreTouch's startup bill —
// canary-verified 7 s forked-JVM startup WITH the flag. Kept out of the
// default/graded config because an A/B at sf0.1 was inconclusive: the
// host's throttle noise (same-config repeats varied 8 s → 20 s on one
// query) swamps any THP effect, and the recorded BASELINE numbers were
// produced without it. A healthy box can measure via SPARK_GRAFT_THP=1.
val thpOpts: Seq[String] =
  if (sys.env.get("SPARK_GRAFT_THP").contains("1"))
    Seq("-XX:+UseTransparentHugePages")
  else Seq.empty
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$heap",
  // 32m G1 regions: Tungsten execution pages (spark.buffer.pageSize=8m,
  // set in GraftSession) then allocate as NORMAL objects, not humongous —
  // humongous allocations land in fresh regions every time and re-pay the
  // throttled first-touch cost; normal allocations recycle warm TLAB/eden
  // pages. Measured: q_text_tfidf 115 s → ~22 s under host throttle.
  "-XX:G1HeapRegionSize=32m",
  // 89 queries × several codegen stages each outgrow the 240m JIT code
  // cache default; when it fills, compilation stops and generated code
  // runs interpreted — multi-× tail-of-suite slowdowns with no warning
  // in the app log. Headroom is cheap; interpreted codegen is not.
  "-XX:ReservedCodeCacheSize=512m",
) ++ thpOpts ++ pretouchOpts
