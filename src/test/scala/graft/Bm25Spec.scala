package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the BM25 + RRF retrieval rows beyond the
  * oracle hash match. */
class Bm25Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def bm25 = SparkEntry.queries("q_text_bm25")(spark, TestSpark.sf0)
  private def rrf = SparkEntry.queries("q_sim_hybrid_rrf")(spark, TestSpark.sf0)

  test("bm25: five queries, ranks 1..5 each, scores non-increasing, all positive") {
    val rows = bm25.collect()
    assert(rows.length === 25)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to 5L))
      val scores = sorted.map(_.getDouble(3))
      assert(scores.forall(_ > 0), "BM25+ idf is floored at zero, scores must be positive")
      assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("bm25: candidates never include the query docs") {
    assert(bm25.filter(col("cand_id") < 5).count() === 0)
  }

  test("rrf: fused score is bounded by the two best possible ranks") {
    val rows = rrf.collect()
    assert(rows.length === 25)
    // max possible = 1/61 + 1/61; min for a top-5 row > 0
    rows.foreach { r =>
      val s = r.getDouble(3)
      assert(s > 0 && s <= 2.0 / 61 + 1e-9, s"rrf score $s out of range")
    }
  }

  test("rrf: a candidate ranked #1 by BOTH retrievers must fuse to #1") {
    // construct per-query: if lexical top-1 == vector top-1, fusion must
    // agree — the monotonicity RRF is supposed to guarantee
    val lexTop = bm25.filter(col("rank") === 1)
      .select(col("q_id"), col("cand_id").as("lex1"))
    val vecTop = SparkEntry.queries("q_sim_topk")(spark, TestSpark.sf0)
      .filter(col("rank") === 1)
      .select(col("q_id"), col("cand_id").as("vec1"))
    val agree = lexTop.join(vecTop, "q_id")
      .filter(col("lex1") === col("vec1"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    if (agree.nonEmpty) {
      val fusedTop = rrf.filter(col("rank") === 1)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      agree.foreach { case (q, c) =>
        assert(fusedTop(q) === c, s"q$q: both retrievers picked $c but fusion didn't")
      }
    }
  }
}
