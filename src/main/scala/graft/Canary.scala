package graft

/** Trivial forked-JVM liveness probe. `tools/bench.sh` runs this with a
  * short timeout BEFORE the query suite: if the JVM can't reach `main`
  * within the budget (e.g. a startup-cost flag like -XX:+AlwaysPreTouch
  * on a page-throttled host — the r3 gate failure), the harness aborts
  * loudly with the active flags instead of silently timing out mid-suite.
  */
object Canary {
  def main(args: Array[String]): Unit = {
    val flags = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments
    println(s"CANARY_OK heapFlags=${
      scala.jdk.CollectionConverters.ListHasAsScala(flags).asScala
        .filter(f => f.startsWith("-Xm") || f.startsWith("-XX:")).mkString(",")
    }")
  }
}
