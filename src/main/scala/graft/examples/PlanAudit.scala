package graft.examples
import graft.GraftSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (q <- args) {
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, d)
      val plan = df.queryExecution.executedPlan.toString
      println("scans=" + "FileScan".r.findAllIn(plan).length +
        " exchanges=" + "Exchange".r.findAllIn(plan).length +
        " reused=" + "ReusedExchange".r.findAllIn(plan).length +
        " bhj=" + "BroadcastHashJoin".r.findAllIn(plan).length +
        " smj=" + "SortMergeJoin".r.findAllIn(plan).length +
        " shj=" + "ShuffledHashJoin".r.findAllIn(plan).length +
        " cartesian=" + "Cartesian".r.findAllIn(plan).length)
    }
    spark.stop()
  }
}
