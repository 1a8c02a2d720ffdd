package graft.examples

import graft._

/** scratch query-profiler for perf work (not part of the API surface):
  * runs each named query N times in one JVM to split cold (JIT + codegen +
  * planning) from warm (steady-state engine) cost.
  * Run: SPARK_GRAFT_SF_DIR=… sbt "runMain graft.examples.Prof q1 q2 …"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_simhash")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, d).foreach(_ => ())
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[prof] $name%-28s ${times.map(t => f"$t%6.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
