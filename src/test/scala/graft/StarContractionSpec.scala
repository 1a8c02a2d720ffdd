package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q_graph_cc_star's algorithm on the shape that motivates it: a
  * LONG CHAIN, where label propagation needs diameter rounds but star
  * contraction collapses in O(log² V). Uses the declared row end to end
  * (sf0.001 testdata) for engine parity with the propagation row, plus
  * a constructed 200-vertex chain + separate clique through the same
  * query to check component minima exactly. */
class StarContractionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("star contraction equals label propagation on the gate graph") {
    val star = SparkEntry.queries("q_graph_cc_star")(spark, TestSpark.sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val prop = SparkEntry.queries("q_graph_cc_fixpoint")(spark, TestSpark.sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star === prop, "both CC algorithms must land on identical minima")
  }

  test("a 200-vertex chain plus a shifted clique resolve to their minima") {
    // chain 1000→1001→…→1199 (diameter 199) and clique {1,3,5,7}
    val chain = (1000L until 1199L).map(i => (i, i + 1))
    val clique = for (a <- Seq(1L, 3L, 5L, 7L); b <- Seq(1L, 3L, 5L, 7L) if a < b)
      yield (a, b)
    val e = (chain ++ clique).toDF("src", "dst")
    val lbl = graft.operators.Graph.ccStarOn(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1000L to 1199L).forall(v => lbl(v) == 1000L),
      "every chain vertex must label to the chain minimum")
    assert(Seq(1L, 3L, 5L, 7L).forall(v => lbl(v) == 1L))
  }
}
