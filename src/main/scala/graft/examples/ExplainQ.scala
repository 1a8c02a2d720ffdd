package graft.examples

/** Plan auditor: print `explain("formatted")` for any declared query by
  * name — the per-operator "is this the plan I'd want at 100 TB" check
  * (broadcasts present, filters pushed, no surprise exchanges).
  *
  * Usage: sbt "runMain graft.examples.ExplainQ q_join_salted q_sim_topk"
  *        (SPARK_GRAFT_SF_DIR selects the data dir, default sf0.01)
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = graft.GraftSession.get()
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      println(s"\n======== $q ========")
      graft.SparkEntry.queries(q)(s, d).explain("formatted")
    }
    s.stop()
  }
}
