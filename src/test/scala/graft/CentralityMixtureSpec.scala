package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariants for the round-11 late additions: Katz + eigenvector
  * centrality, TextRank keywords, the EM Gaussian mixture, and the
  * feature-hashing vectorizer. */
class CentralityMixtureSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private def q(name: String) = SparkEntry.queries(name)(spark, TestSpark.sf0)

  test("katz is zero exactly on vertices with no in-edges, positive elsewhere") {
    val scores = q("q_graph_katz").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hasIn = Tables(spark, TestSpark.sf0, "orders")
      .select((col("o_custkey") % 200).as("dst")).distinct()
      .collect().map(_.getLong(0)).toSet
    scores.foreach { case (v, k) =>
      if (hasIn(v)) assert(k > 0.0, s"vertex $v has in-edges but katz 0")
      else assert(k == 0.0, s"vertex $v has no in-edges but katz $k")
    }
  }

  test("eigenvector centrality is non-negative with unit L2 norm") {
    val scores = q("q_graph_eigenvector").collect().map(_.getDouble(1))
    scores.foreach(x => assert(x >= 0.0))
    val norm = math.sqrt(scores.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"final norm $norm != 1")
  }

  test("textrank keeps the damping floor and returns a ranked top-20") {
    val rows = q("q_text_textrank").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val scores = rows.map(_.getDouble(1))
    // every score >= (1 - d) = 0.15, the teleport mass a vertex keeps
    scores.foreach(x => assert(x >= 0.15 - 1e-9))
    assert(scores.sameElements(scores.sortBy(-_)), "not score-descending")
  }

  test("EM strictly improves on the initial mixture likelihood") {
    val row = q("q_ml_gmm").collect()(0)
    val (pi1, v1, v2) = (row.getDouble(1), row.getDouble(3), row.getDouble(5))
    val avgLl = row.getDouble(6)
    assert(pi1 > 0.0 && pi1 < 1.0)
    assert(v1 > 0.0 && v2 > 0.0)
    // round-0 likelihood with the fixed init (pi .5, mu 3/6, var 1)
    def pdf(mu: Double) =
      exp(-((col("x") - mu) * (col("x") - mu)) / lit(2.0)) /
        lit(math.sqrt(2 * math.Pi))
    val ll0 = Tables(spark, TestSpark.sf0, "documents")
      .select(log(lit(1.0) + length(col("text")).cast("double")).as("x"))
      .agg(avg(log(lit(0.5) * pdf(3.0) + lit(0.5) * pdf(6.0))))
      .head.getDouble(0)
    assert(avgLl >= ll0 - 1e-9, s"EM did not improve: $avgLl < $ll0")
  }

  test("feature hashing buckets are bounded and signed sums cannot exceed mass") {
    val rows = q("q_text_feature_hash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bucket, v, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bucket >= 0 && bucket < 16)
      assert(n >= 1)
      assert(math.abs(v) <= n, s"|val| $v exceeds token mass $n")
      assert((v + n) % 2 == 0, "sign sum and count must share parity")
    }
  }
}
