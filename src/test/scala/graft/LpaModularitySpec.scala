package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Modularity-scoring invariants. The derived benchmark graph is
  * edge-random, so Newman Q must sit near zero — a metric that reported
  * "strong communities" here would be wrong. */
class LpaModularitySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("modularity partition conserves vertices and respects bounds") {
    val rows = SparkEntry.queries("q_graph_modularity")(spark, TestSpark.sf0)
      .collect()
    val nVertices = SparkEntry.queries("q_graph_lpa")(spark, TestSpark.sf0).count()
    assert(rows.map(_.getLong(1)).sum == nVertices)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "intra edges exceed degree mass")
    }
    val q = rows.map(_.getDouble(4)).sum
    assert(q >= -0.5 - 1e-9 && q <= 1.0 + 1e-9, s"Q=$q out of range")
    assert(math.abs(q) < 0.1, s"Q=$q should be ~0 on the edge-random graph")
  }
}
