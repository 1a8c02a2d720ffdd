package graft.examples

import graft.{GraftSession, SparkEntry}

/** Print formatted physical plans for selected declared queries — used to
  * audit pushdown / pruning / join strategy (SURVEY.md §4 posture).
  * Run: sbt "runMain graft.examples.Explain q_filter_pred q_join_3way"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val names = if (args.nonEmpty) args.toSeq
    else Seq("q_filter_pred", "q_join_3way", "q_agg_q1", "q_scan_project", "q_sim_topk")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
