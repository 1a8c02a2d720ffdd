package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for Adamic-Adar link prediction and k-truss decomposition. */
class LinkPredTrussSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  private def undirectedEdges = {
    val n = 200L
    Tables(spark, TestSpark.sf0, "orders")
      .select((col("o_orderkey") % n).as("src"), (col("o_custkey") % n).as("dst"))
      .distinct()
      .unionAll(Tables(spark, TestSpark.sf0, "orders")
        .select((col("o_custkey") % n).as("src"), (col("o_orderkey") % n).as("dst"))
        .distinct())
      .distinct()
  }

  test("adamic-adar predictions are non-adjacent pairs with shared neighbors") {
    val adj = undirectedEdges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = q("q_graph_adamic").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (u, v) = (r.getLong(0), r.getLong(1))
      assert(u < v)
      assert(!adj.contains((u, v)), s"($u,$v) is an existing edge")
      assert(r.getLong(3) >= 1) // common neighbors
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("adamic-adar ranking is consistent with the common-neighbor floor") {
    // score >= common / ln(maxDeg): each common neighbor contributes at
    // least 1/ln(max degree)
    val maxDeg = undirectedEdges.groupBy("src").count()
      .agg(max("count")).head.getLong(0).toDouble
    q("q_graph_adamic").collect().foreach { r =>
      assert(r.getDouble(2) >= r.getLong(3) / math.log(maxDeg) - 1e-6)
    }
  }

  test("k-truss reaches its fixpoint within the round budget") {
    // one MORE pruning round on the query's output must delete nothing
    val fin = q("q_graph_ktruss")
    assert(fin.filter(col("supp") < 2).count() == 0,
      "an edge below the support threshold survived: not a fixpoint")
  }

  test("k-truss edges are a subset of the oriented edge set") {
    val ori = undirectedEdges.filter(col("src") < col("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q("q_graph_ktruss").collect().foreach { r =>
      assert(ori.contains((r.getLong(0), r.getLong(1))))
    }
  }
}
