package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force parity for q_graph_triangle: the degree-oriented wedge-join
  * count must equal a driver-side enumeration of all id-ordered triples
  * over the collected (tiny) derived graph — checking both the global
  * triangle count and every per-vertex count. */
class TriangleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("degree-oriented triangle counts equal brute-force enumeration") {
    val out = SparkEntry.queries("q_graph_triangle")(spark, TestSpark.sf0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // brute force on the same derived graph: src=o_orderkey%200,
    // dst=o_custkey%200, undirected, deduped, no self-loops in triangles
    val e = Tables(spark, TestSpark.sf0, "orders")
      .selectExpr("o_orderkey % 200 AS src", "o_custkey % 200 AS dst")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(_.swap)).distinct
      .groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2).toSet }
    val verts = adj.keys.toSeq.sorted
    val expected = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      a <- verts
      b <- adj(a) if b > a
      c <- adj(b) if c > b && adj(a).contains(c)
    } { expected(a) += 1; expected(b) += 1; expected(c) += 1 }

    assert(out.keySet === adj.keySet, "one row per vertex, zeros included")
    assert(out.values.sum === expected.values.sum * 1L, "global corner count")
    verts.foreach(v => assert(out(v) === expected(v), s"vertex $v"))
    assert(expected.values.sum > 0, "fixture graph must contain triangles")
  }
}
