package graft.examples

import graft.{GraftSession, Tables}
import graft.plans.Iterate
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** One-off measurement harness for the small-graph iterative-loop fixed
  * costs (VERDICT r4 #3): runs the exact q_graph_pagerank loop shape at
  * sf0.1 under different checkpoint cadences and AQE coalesce settings,
  * printing wall seconds + Spark job count for each. Diagnostic only —
  * results recorded in BASELINE.md; the declared query ships whichever
  * config wins WITHOUT changing semantics.
  *
  * Run: sbt "runMain graft.examples.LoopTune"
  */
object LoopTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val jobs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    })
    val N = 200

    def pagerank(cadence: Int): Double = {
      val e = Tables(spark, sfDir, "orders")
        .select((col("o_orderkey") % N).as("src"), (col("o_custkey") % N).as("dst"))
        .groupBy("src", "dst").agg(min(lit(1)).as("w")).select("src", "dst")
      val vs = e.select(col("src").as("v"))
        .unionAll(e.select(col("dst").as("v"))).distinct().cache()
      val n = vs.count().toDouble
      val deg = e.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
      val e2 = e.join(deg, "src").cache()
      val zeros = vs.select(col("v"), lit(0.0).as("m")).cache()
      val init = vs.select(col("v"), lit(1.0 / n).as("rank"))
      val out = Iterate(init, 10, checkpointEvery = cadence) { (r, _) =>
        val contrib = e2.as("ee").join(r.as("rr"), col("ee.src") === col("rr.v"))
          .select(col("ee.dst").as("v"), (col("rr.rank") / col("ee.outdeg")).as("m"))
        contrib.unionAll(zeros)
          .groupBy("v")
          .agg((lit(0.15 / n) + lit(0.85) * sum("m")).as("rank"))
      }
      val chk = out.agg(sum("rank")).collect()(0).getDouble(0)
      vs.unpersist(); e2.unpersist(); zeros.unpersist()
      spark.catalog.clearCache()
      chk
    }

    def timed(label: String)(f: => Double): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val chk = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"tune":"$label","sec":$dt%.3f,"jobs":${jobs.get() - j0},"rank_sum":$chk%.4f}""")
    }

    // warm the session like Bench does
    Tables(spark, sfDir, "orders").count()
    pagerank(5)

    for (round <- 1 to 2) {
      timed(s"cadence5_r$round") { pagerank(5) }
      timed(s"cadence10_r$round") { pagerank(10) }
      timed(s"cadence4_r$round") { pagerank(4) }
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      timed(s"cadence10_noParFirst_r$round") { pagerank(10) }
      spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      timed(s"cadence10_noAqe_r$round") { pagerank(10) }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.stop()
  }
}
