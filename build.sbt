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
// Default heap: min(32g, half of physical RAM) — 32 threads × shuffle/agg/
// string-hash working sets GC-thrash at 8g on the 128 GiB bench box, but a
// hard 32g default would OOM-kill smaller dev machines. SPARK_DRIVER_MEM
// overrides either way.
val defaultHeap: String = {
  val memTotalGb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        l.trim.split("\\s+")(1).toLong / (1024 * 1024) }
      .getOrElse(64L)
    catch { case _: Throwable => 64L }
  s"${math.max(4L, math.min(32L, memTotalGb / 2))}g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
  // 89 queries × several codegen stages each outgrow the 240m JIT code
  // cache default; when it fills, compilation stops and generated code
  // runs interpreted — multi-× tail-of-suite slowdowns with no warning
  // in the app log. Headroom is cheap; interpreted codegen is not.
  "-XX:ReservedCodeCacheSize=512m",
)
