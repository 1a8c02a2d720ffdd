package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for HITS, weighted PageRank, and the NB confusion matrix. */
class HitsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  test("HITS scores are max-normalized into [0, 1] with a unit maximum") {
    val rows = q("q_graph_hits").collect()
    val hubs = rows.map(_.getDouble(1)); val auths = rows.map(_.getDouble(2))
    (hubs ++ auths).foreach(x => assert(x >= 0.0 && x <= 1.0 + 1e-9))
    assert(math.abs(hubs.max - 1.0) < 1e-6)
    assert(math.abs(auths.max - 1.0) < 1e-6)
  }

  test("weighted pagerank mass is positive and bounded by 1") {
    val ranks = q("q_graph_pagerank_weighted").collect().map(_.getDouble(1))
    ranks.foreach(r => assert(r > 0.0))
    val total = ranks.sum
    assert(total <= 1.0 + 1e-6, s"mass $total exceeds 1")
    assert(total > 0.5, s"mass $total implausibly low")
  }

  test("weighted and unweighted pagerank differ (weights actually matter)") {
    val wr = q("q_graph_pagerank_weighted").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ur = q("q_graph_pagerank").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wr.keySet == ur.keySet)
    assert(wr.exists { case (v, x) => math.abs(x - ur(v)) > 1e-6 })
  }

  test("NB confusion matrix conserves the test set") {
    val rows = q("q_ml_nb_confusion").collect()
    val total = rows.map(_.getLong(2)).sum
    val nTest = Tables(spark, TestSpark.sf0, "documents")
      .filter(col("doc_id") % 2 =!= 0).count()
    assert(total == nTest)
    // per-actual row sums equal the actual class sizes
    val byActual = rows.groupBy(_.getString(0)).map { case (k, v) =>
      k -> v.map(_.getLong(2)).sum
    }
    val want = Tables(spark, TestSpark.sf0, "documents")
      .filter(col("doc_id") % 2 =!= 0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byActual == want)
  }
}
