package graft

import graft.operators.GraphAdvanced
import org.scalatest.funsuite.AnyFunSuite

/** Structural-validity oracles for the seeded randomized graph algorithms —
  * the same check style as the reference's `BipartiteMatchingTest` /
  * `SemiClusterMatchingTest` (valid structure + seeded determinism), since
  * no SQL hash oracle exists for randomized greedy algorithms. */
class GraphAdvancedSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bipartite matching is a valid matching over real edges, deterministic per seed") {
    val m = GraphAdvanced.bipartiteMatching(spark, TestSpark.sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m.nonEmpty, "some pairs must match")
    // no endpoint matched twice
    assert(m.map(_._1).distinct.length === m.length)
    assert(m.map(_._2).distinct.length === m.length)
    // every matched pair is a real edge of the derived bipartite graph
    val e = Tables(spark, TestSpark.sf0, "orders")
      .selectExpr("o_custkey % 50 AS l", "o_orderkey % 80 + 1000 AS r")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    m.foreach(p => assert(e.contains(p), s"$p must be an edge"))
    // seeded determinism: a second run yields the identical matching
    val m2 = GraphAdvanced.bipartiteMatching(spark, TestSpark.sf0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(m.toSeq === m2.toSeq)
  }

  test("semi-clustering emits a best cluster per vertex within size bounds") {
    val rows = GraphAdvanced.semiClustering(spark, TestSpark.sf0).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, size, members) = (r.getLong(0), r.getInt(1), r.getString(3))
      assert(size >= 1 && size <= 4, s"cluster size $size out of [1,4]")
      val ids = members.split(",").map(_.toLong)
      assert(ids.contains(v), s"vertex $v must belong to its own best cluster")
      assert(ids.length === size)
      assert(ids.sorted.sameElements(ids), "members canonically sorted")
    }
    // multi-vertex clusters must actually form (the graph is connected enough)
    assert(rows.count(_.getInt(1) > 1) > 0, "some non-singleton clusters")
    // determinism
    val again = GraphAdvanced.semiClustering(spark, TestSpark.sf0).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
