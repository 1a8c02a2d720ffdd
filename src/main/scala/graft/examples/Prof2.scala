package graft.examples

import graft._
import org.apache.spark.scheduler._
import scala.collection.mutable

/** scratch planner-vs-executor profiler: splits DataFrame construction,
  * planning and execution, and logs per-job wall/task aggregates to find
  * where low-CPU execution time hides. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val jobStart = mutable.Map[Int, Long]()
    val jobLines = mutable.ArrayBuffer[String]()
    var taskTime = 0L
    var gcTime = 0L
    var nTasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobStart(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach { t0 =>
          jobLines += f"    job ${j.jobId}%3d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s"
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          taskTime += t.taskMetrics.executorRunTime
          gcTime += t.taskMetrics.jvmGCTime
          nTasks += 1
        }
      }
    })

    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_minhash")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { rep =>
        jobLines.clear(); taskTime = 0; gcTime = 0; nTasks = 0
        val t0 = System.nanoTime()
        val df = fn(spark, d)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        df.foreach(_ => ())
        val t3 = System.nanoTime()
        spark.catalog.clearCache()
        Thread.sleep(200) // let listener drain
        println(f"[prof2] $name%-26s rep$rep build=${(t1 - t0) / 1e9}%6.2f plan=${(t2 - t1) / 1e9}%6.2f exec=${(t3 - t2) / 1e9}%6.2f s  jobs=${jobLines.size} tasks=$nTasks taskTime=${taskTime / 1e3}%6.2f s gc=${gcTime / 1e3}%5.2f s")
        jobLines.foreach(println)
      }
    }
    spark.stop()
  }
}
