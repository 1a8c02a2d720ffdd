package graft.examples

/** Plan auditor: print `explain("formatted")` for any declared query by
  * name — the per-operator "is this the plan I'd want at 100 TB" check
  * (broadcasts present, filters pushed, no surprise exchanges).
  *
  * Usage: sbt "runMain graft.examples.ExplainQ q_join_salted q_sim_topk"
  *        sbt "runMain graft.examples.ExplainQ all"   // every declared query
  *        (SPARK_GRAFT_SF_DIR selects the data dir, default sf0.01)
  *
  * With no args, prints a cheap representative subset — NOT the full map:
  * several query fns do heavy driver-side work at DataFrame-CONSTRUCTION
  * time (Pregel loops, live streaming runs, GD rounds), so "audit all
  * plans" actually executes a large chunk of the suite. Opt into that
  * with the explicit `all` keyword.
  */
object ExplainQ {
  private val cheapDefault = Seq(
    "q_agg_q1", "q_join_inner", "q_join_salted", "q_sim_topk",
    "q_text_tokens", "q_dedup_minhash", "q_sort_topk")
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val s = graft.GraftSession.get()
    val names =
      if (args.sameElements(Array("all"))) graft.SparkEntry.queries.keys.toSeq.sorted
      else if (args.nonEmpty) args.toSeq
      else cheapDefault
    for (q <- names) {
      println(s"\n======== $q ========")
      graft.SparkEntry.queries(q)(s, d).explain("formatted")
    }
    s.stop()
  }
}
