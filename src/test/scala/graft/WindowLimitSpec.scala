package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guarantee for the remaining rank-filter windows: Spark 4
  * plans `row_number().over(partitionBy(g).orderBy(o)) <= k` with
  * WindowGroupLimit (Partial before the exchange, Final after), so each
  * mapper ships at most k rows per group and a hot group never rides
  * the shuffle whole — the reason q_topk_window and its siblings are
  * NOT in the hot-key-window family the round-8 de-windowing removed.
  * This spec pins that plan shape so a regression (e.g. an expression
  * change that defeats the WindowGroupLimit pattern match) is caught
  * here rather than as a 100×-scale straggler.
  */
class WindowLimitSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def plansWithLimit(name: String): Unit = {
    val plan = SparkEntry.queries(name)(spark, TestSpark.sf0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"$name lost its WindowGroupLimit pushdown:\n${plan.take(2000)}")
    assert(plan.contains("Partial"),
      s"$name must partial-limit map-side before the exchange")
  }

  test("q_topk_window top-3-per-brand is WindowGroupLimit-bounded") {
    plansWithLimit("q_topk_window")
  }

  test("q_sort_topk ranking is WindowGroupLimit-bounded") {
    val plan = SparkEntry.queries("q_sort_topk")(spark, TestSpark.sf0)
      .queryExecution.executedPlan.toString
    // global top-k: either a TakeOrderedAndProject or a WindowGroupLimit
    // qualifies — both bound per-task state
    assert(plan.contains("WindowGroupLimit") || plan.contains("TakeOrdered"),
      s"q_sort_topk lost its bounded top-k plan:\n${plan.take(2000)}")
  }
}
